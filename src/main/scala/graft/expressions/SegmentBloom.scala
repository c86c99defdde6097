package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Kernel for the manifest-level bloom probe: deserialize one segment's
  * serialized sketch ([[org.apache.spark.util.sketch.BloomFilter]] wire
  * format, the same bytes Spark's own `BloomFilterAggregate` emits) and
  * test a pre-hashed key. One evaluation per SEGMENT row — the sidecar
  * table holds one row per (table, column, segment), so per-row
  * deserialization IS the probe's total work, not a hot-path cost. */
object SegmentBloomKernels {
  def mightContain(bloom: Array[Byte], hash: Long): Boolean =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloom)).mightContainLong(hash)
}

/** might-contain over a serialized bloom COLUMN — the built-in
  * `BloomFilterMightContain` insists its bloom side is a constant or scalar
  * subquery (it was built for runtime join filtering); this engine probes a
  * whole TABLE of per-segment blooms with one distributed filter, so the
  * bloom argument must be an ordinary column. Null-intolerant: a null bloom
  * or key yields null, which the driver-side probe treats as a conservative
  * HIT (scan the segment) rather than a prune. Corrupt bloom bytes throw —
  * fail-loud beats silently pruning a segment that held the answer. */
case class SegmentBloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"segment_bloom_might_contain expects (binary, bigint), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(bloom: Any, hash: Any): Any =
    SegmentBloomKernels.mightContain(
      bloom.asInstanceOf[Array[Byte]], hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) => s"""
      ${ev.value} = graft.expressions.SegmentBloomKernels.mightContain($b, $h);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SegmentBloomMightContain =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "segment_bloom_might_contain"
}
