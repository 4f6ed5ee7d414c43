package graft

import org.apache.spark.sql.functions._

/** Round-16 optimization pins: every internals change of the
  * optimization pass keeps its operator's RESULT identical to the
  * distributed form it replaced (or re-partitioned). */
class Round16OptSpec extends SparkSpec {

  // ------------------------------------------------- graph_scc round-0 tier

  test("graph_scc: round-0 driver Tarjan equals the distributed trim/color/extract fixpoint") {
    import spark.implicits._
    // the shipped path (gated collect → Tarjan on the memo rows)
    val viaTarjan = ops.Analytics.sccLabelRows(spark, sf01, producer = true)
      .as[(Long, Long)].collect().toMap
    // the above-gate path, forced: the full distributed fixpoint over
    // the same (memo-served) edge set
    val viaLoop = ops.Analytics
      .sccFrom(ops.Analytics.sccEdgeRows(spark, sf01, producer = false))
      .select(col("part"), col("scc_id"))
      .as[(Long, Long)].collect().toMap
    assert(viaTarjan === viaLoop,
      "round-0 Tarjan labels diverge from the distributed fixpoint")
    assert(viaTarjan.nonEmpty)
  }

  // ------------------------------------------- graph_condensation driver DP

  test("graph_condensation: driver Kahn DP equals the distributed relaxation") {
    ops.Analytics.sccLabelRows(spark, sf01, producer = true).count()
    assertSameRows(
      ops.Analytics.graphCondensation(spark, sf01),
      ops.Analytics.condensationDistributed(spark, sf01),
      "condensation driver-vs-distributed")
  }

  // ----------------------------------------------- recommend_als loop width

  test("recommend_als: scale-adaptive loop width leaves the recommendation table unchanged vs a full-width replay") {
    import spark.implicits._
    val got = ops.Analytics.recommendAls(spark, sf001)
      .as[(Long, Int, Long, Double)].collect().toSeq
    // full-width replay: pin the loop to the session shuffle width by
    // making the adaptive derivation saturate (the width formula floors
    // at 1 and the sf0.001 ratings table is far below one stride, so
    // the shipped run compiled 1-wide; Round13Spec's partitioning-
    // invariance pin covers arbitrary widths — here we re-run under a
    // DIFFERENT session width to confirm the readout is width-free too)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val again =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        ops.Analytics.recommendAls(spark, sf001)
          .as[(Long, Int, Long, Double)].collect().toSeq
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(got === again, "ALS readout changed across session widths")
    assert(got.nonEmpty)
  }

  // ----------------------------------------------- graph_hits keyed edges

  test("graph_hits: pre-partitioned edge forms leave scores identical to a fresh run (determinism held)") {
    import spark.implicits._
    val a = ops.Analytics.graphHits(spark, sf001)
      .as[(String, Long, Double)].collect().toSeq
    val b = ops.Analytics.graphHits(spark, sf001)
      .as[(String, Long, Double)].collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
