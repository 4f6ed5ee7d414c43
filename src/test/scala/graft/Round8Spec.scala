package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.{LlmPipeline, Quant}

/** Round-8 pins: approx tiers and scale-path variants added this round. */
class Round8Spec extends SparkSpec {

  test("dedup_containment_incremental: foreachBatch micro-batches over a persisted index == batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.io.Tables.documents(spark, sf01)
      .select(col("doc_id"), col("text"))
    // the static asset: built ONCE, persisted, reused by every batch
    val idx = LlmPipeline
      .containmentIndexOf(docs.where(col("doc_id") % 2 === 0)).persist()
    val arriving = docs.where(col("doc_id") % 2 === 1)
      .as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Long, Double)]()
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        LlmPipeline.scoreAgainstIndex(batch, idx).collect().foreach { r =>
          acc.add((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        }
      }
      .queryName("t_cinc").start()
    // 4 genuine micro-batches: drain the query between chunks
    arriving.grouped(math.max(1, arriving.length / 4 + 1)).foreach { chunk =>
      mem.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    idx.unpersist()
    val streamed = acc.toArray(Array.empty[(Long, Long, Long, Double)])
      .sortBy(_._1).toSeq
    val batchTwin = LlmPipeline.dedupContainmentIncremental(spark, sf01)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(batchTwin.nonEmpty, "vacuous: batch twin found no contained docs")
    assert(streamed == batchTwin,
      s"foreachBatch union differs from batch twin:\n$streamed\nvs\n$batchTwin")
  }

  test("analytics_pareto_approx: decile mass within epsilon of the exact form") {
    val exact = Quant.analyticsPareto(spark, sf01).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val approx = Quant.analyticsParetoApprox(spark, sf01).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(exact.nonEmpty, "vacuous: exact pareto produced no deciles")
    // same band structure and total population
    assert(approx.keySet == exact.keySet,
      s"decile sets differ: ${approx.keySet} vs ${exact.keySet}")
    assert(approx.values.map(_._1).sum == exact.values.map(_._1).sum,
      "approx bucketing lost or duplicated users")
    // sketch boundaries may shift band edges by at most the rank error
    // (n/10000 users per edge) — decile shares must stay within 2 pp
    exact.foreach { case (dec, (_, share, cum)) =>
      val (_, aShare, aCum) = approx(dec)
      assert(math.abs(aShare - share) < 0.02,
        s"decile $dec share $aShare vs exact $share")
      assert(math.abs(aCum - cum) < 0.02,
        s"decile $dec cum_share $aCum vs exact $cum")
    }
    // the Pareto read-off itself: top decile carries the largest share
    val topShare = approx(approx.keys.min)._2
    assert(approx.values.map(_._2).max == topShare,
      "top decile is not the largest band")
  }
}
