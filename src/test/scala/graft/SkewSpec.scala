package graft

import graft.llm.Dedup
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Skew validation for the LSH/embedding bucket joins (SCALE.md): a "hub"
  * band key — thousands of near-identical documents agreeing on one LSH
  * signature — lands every row in one shuffle partition of the candidate
  * self-join. AQE's skew-split must carve that partition so task times stay
  * bounded; this test engages it (thresholds scaled down to fixture size)
  * and asserts the executed plan actually split the hub ("skew=true" on the
  * join) while the pair set stays exactly right. At production scale the
  * same mechanism runs with default thresholds (256 MB); embeddings
  * hyperplane-LSH buckets and IVF hot cells have the same key shape, so the
  * same split applies. */
class SkewSpec extends SparkSpec {

  private val sigSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("mh0", StringType, nullable = false),
    StructField("mh1", StringType, nullable = false),
    StructField("mh2", StringType, nullable = false),
    StructField("mh3", StringType, nullable = false)))

  test("AQE skew-split engages on a hub LSH bucket and pairs stay exact") {
    // the hub must dominate the SHUFFLE INPUT of its partition: AQE splits
    // by partition input bytes (the quadratic pair OUTPUT is what the split
    // then bounds per task)
    val hub = 3000 // hub docs: all agree on every signature column
    val rows =
      (0 until hub).map(i => Row(i.toLong, "hubhubh0", "hubhubh1", "hubhubh2", "hubhubh3")) ++
        (hub until hub + 1000).map(i =>
          Row(i.toLong, f"a$i%07d", f"b$i%07d", f"c$i%07d", f"d$i%07d"))
    val sigs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8), sigSchema)

    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // production default is 256 MB; scale to the fixture so the hub
      // partition (a few KB) counts as skewed
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1kb")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16kb")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // keep the join a shuffled one, as it is at 100 TB (no tiny-fixture
      // broadcast shortcut)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val pairs = Dedup.lshCandidatePairs(sigs, bands = 2, rowsPerBand = 2)
      // drive THIS queryExecution (Dataset.count would spawn a separate one
      // whose final plan we couldn't inspect); the 4.5M-pair output is the
      // point — the hub bucket explodes quadratically and the split bounds
      // what each task materializes
      val n = pairs.queryExecution.toRdd.count()
      // hub yields C(hub,2) pairs (both bands collapse in the distinct)
      assert(n == hub.toLong * (hub - 1) / 2, s"got $n pairs")
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the hub partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
