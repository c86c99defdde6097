package graft

import org.scalatest.Tag

/** Suite wall-budget control: tests tagged HeavyTest AMPLIFY a property that
  * a default-run sibling already exercises (more random seeds, more stress
  * iterations — never a different assertion), so excluding them loses
  * breadth, not coverage. The default `sbt test` skips them to stay inside
  * the verify gate's wall budget; opt in with GRAFT_HEAVY_TESTS=1 (see
  * build.sbt) for the full amplification sweep. */
object HeavyTest extends Tag("graft.HeavyTest")
