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

  test("per-user folds under hot-user skew: one user owns 16x the events, replay is exact") {
    import spark.implicits._
    // one bot user (7) with 16x the events of each of 30 normal users —
    // the layout the r11 verdict flagged: a whole-history heap buffer
    // per user would concentrate the bot's history in one task's memory;
    // the secondary-sort fold keeps O(1) state per open user
    val perNormal = 300
    val hot = (0 until 16 * perNormal).map { i =>
      (1000000L + i, 7L,
        new java.sql.Timestamp(1700000000000L + i.toLong * 731),
        "click", (i % 97).toDouble / 7.0)
    }
    val normal = (1 to 30).flatMap { u =>
      (0 until perNormal).map { i =>
        (2000000L + u * 10000L + i, 100L + u,
          new java.sql.Timestamp(1700000000000L + i.toLong * 60017 + u),
          "view", (i % 31).toDouble / 3.0)
      }
    }
    val rows = hot ++ normal
    val tmp = java.nio.file.Files.createTempDirectory("graft-hotuser").toString
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    // driver replay: identical arithmetic over the identical (ts, id)
    // total order, per user
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    def r4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    val byUser = rows.groupBy(_._2)
    val ewmaExp = byUser.map { case (u, es) =>
      val xs = es.sortBy(e => (us(e._3), e._1))
      var sm = xs.head._5
      var prev = us(xs.head._3)
      xs.tail.foreach { e =>
        val tu = us(e._3)
        val a = math.floor(
          math.exp(-((tu - prev).toDouble / 3.6e9)) * 1e6) / 1e6
        sm = a * sm + (1.0 - a) * e._5
        prev = tu
      }
      u -> (xs.length.toLong, r4(sm))
    }
    val holtExp = byUser.map { case (u, es) =>
      val xs = es.sortBy(e => (us(e._3), e._1)).map(_._5)
      var l = xs.head
      var b = 0.0
      xs.tail.foreach { v =>
        val l2 = 0.5 * v + 0.5 * (l + b)
        b = 0.25 * (l2 - l) + 0.75 * b
        l = l2
      }
      u -> (xs.length.toLong, r4(l), r4(b), r4(l + b))
    }
    val ewmaGot = graft.ops.Quant.tsEwmaTimedecay(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(ewmaGot == ewmaExp,
      s"ewma skew replay mismatch (hot user: got ${ewmaGot.get(7L)} " +
        s"expected ${ewmaExp.get(7L)})")
    val holtGot = graft.ops.Quant.tsHoltLinear(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(holtGot == holtExp,
      s"holt skew replay mismatch (hot user: got ${holtGot.get(7L)} " +
        s"expected ${holtExp.get(7L)})")
  }
}
