package graft

import org.apache.spark.sql.functions._
import graft.ops.LlmPipeline

/** Round-12: the composed IVF×PQ ANN rung + this round's scale guards
  * (SURVEY.md §2.24). */
class Round12Spec extends SparkSpec {

  test("knn_ivf_pq: 3 exact-scored rows per query, deterministic, recall vs brute") {
    val ivfpq = LlmPipeline.knnIvfPq(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val brute = LlmPipeline.knnCosine(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val nq = brute.map(_._1).distinct.length
    // shape: every query reports exactly 3 ranked neighbors
    assert(ivfpq.map(_._1).distinct.length == nq)
    assert(ivfpq.groupBy(_._1)
      .forall(_._2.map(_._2).sorted.sameElements(Seq(1, 2, 3))))
    // scores are EXACT fp32 rescores: any (a,b) pair reported by both
    // paths carries the identical rounded score
    val bruteScore = brute.map(t => ((t._1, t._3), t._4)).toMap
    ivfpq.foreach { case (a, _, b, sc) =>
      bruteScore.get((a, b)).foreach(bs =>
        assert(bs == sc, s"pair ($a,$b): ivfpq score $sc != brute $bs"))
    }
    // within-list ranking follows the shared (score desc, id asc) rule
    ivfpq.groupBy(_._1).values.foreach { rs =>
      val o = rs.sortBy(_._2).map(r => (-r._4, r._3))
      assert(o.sameElements(o.sorted), s"rank order violated in ${rs.toSeq}")
    }
    // recall@3 against brute: the two approximations stack (cell recall
    // × code recall), so the floor sits below both parents' pins
    // (knn_ivf 0.5, knn_pq 0.55) but must stay far above random
    val bruteTop = brute.groupBy(_._1)
      .map { case (a, rs) => a -> rs.map(_._3).toSet }
    val hit = ivfpq.count { case (a, _, b, _) => bruteTop(a).contains(b) }
    val recall = hit.toDouble / (nq * 3)
    info(f"knn_ivf_pq recall@3 = $recall%.3f")
    assert(recall >= 0.55, f"recall@3 $recall%.3f below pin 0.55 (measured 0.618)")
    // determinism: an independent second run reproduces the result
    val again = LlmPipeline.knnIvfPq(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(again.sameElements(ivfpq))
  }
}
