package graft

import org.apache.spark.sql.functions._
import graft.ops.LlmPipeline

/** Round-11b: product-quantization ANN (SURVEY.md §2.21). */
class Round11bSpec extends SparkSpec {

  test("knn_pq: 3 exact-scored rows per query, deterministic, recall vs brute") {
    val pq = LlmPipeline.knnPq(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val brute = LlmPipeline.knnCosine(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val nq = brute.map(_._1).distinct.length
    // shape: every query reports exactly 3 ranked neighbors
    assert(pq.map(_._1).distinct.length == nq)
    assert(pq.groupBy(_._1).forall(_._2.map(_._2).sorted.sameElements(Seq(1, 2, 3))))
    // scores are EXACT fp32 rescores: any (a,b) pair reported by both
    // paths carries the identical rounded score
    val bruteScore = brute.map(t => ((t._1, t._3), t._4)).toMap
    pq.foreach { case (a, _, b, sc) =>
      bruteScore.get((a, b)).foreach(bs =>
        assert(bs == sc, s"pair ($a,$b): pq score $sc != brute $bs"))
    }
    // within-list ranking follows the shared (score desc, id asc) rule
    pq.groupBy(_._1).values.foreach { rs =>
      val o = rs.sortBy(_._2).map(r => (-r._4, r._3))
      assert(o.sameElements(o.sorted), s"rank order violated in ${rs.toSeq}")
    }
    // recall@3 against brute force: PQ (m=8, k=16, one Lloyd step) + a
    // 32-candidate exact rescore on the 64-d fixture
    val bruteTop = brute.groupBy(_._1).map { case (a, rs) => a -> rs.map(_._3).toSet }
    val hit = pq.count { case (a, _, b, _) => bruteTop(a).contains(b) }
    val recall = hit.toDouble / (nq * 3)
    info(f"knn_pq recall@3 = $recall%.3f")
    assert(recall >= 0.55, f"recall@3 $recall%.3f below pin 0.55")
    // determinism: an independent second run reproduces the result
    val again = LlmPipeline.knnPq(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(again.sameElements(pq))
  }
}
