package graft

import org.apache.spark.sql.functions._
import graft.ops.LlmPipeline

/** Round-11b: product-quantization ANN + periodogram (SURVEY.md §2.21). */
class Round11bSpec extends SparkSpec {

  test("ts_periodogram: exact brute-force parity + harmonic-peak sanity") {
    val hourly = graft.io.Tables.events(spark, sf001)
      .select(expr("unix_timestamp(ts) div 3600 - 473352").as("t"))
      .collect().map(_.getLong(0))
      .groupBy(identity).map { case (t, g) => (t, g.length.toLong) }
    val expect = (1 to 8).map { k =>
      val w = 2 * math.Pi / 720
      var sc = 0L; var ss = 0L
      hourly.foreach { case (t, x) =>
        sc += math.floor(x * math.cos(w * k * t) * 1e4 + 0.5).toLong
        ss += math.floor(x * math.sin(w * k * t) * 1e4 + 0.5).toLong
      }
      val c = sc.toDouble / 1e4; val s2 = ss.toDouble / 1e4
      (k, math.floor((c * c + s2 * s2) / (720.0 * 720) * 1e6 + 0.5) / 1e6)
    }
    val got = graft.ops.Quant.tsPeriodogram(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    assert(got.toSeq == expect, s"periodogram mismatch: ${got.toSeq} vs $expect")
    // a planted pure cosine at harmonic 3 dominates the snapped DFT:
    // x_t = 100 + 50·cos(2π·3t/720) ⇒ power(3) ≈ (50·720/2 / 720)² = 625
    val w = 2 * math.Pi / 720
    val planted = (0 until 720).map(t =>
      (t.toLong, (100 + 50 * math.cos(w * 3 * t)).round))
    val powers = (1 to 8).map { k =>
      var sc = 0L; var ss = 0L
      planted.foreach { case (t, x) =>
        sc += math.floor(x * math.cos(w * k * t) * 1e4 + 0.5).toLong
        ss += math.floor(x * math.sin(w * k * t) * 1e4 + 0.5).toLong
      }
      val c = sc.toDouble / 1e4; val s = ss.toDouble / 1e4
      (k, (c * c + s * s) / (720.0 * 720))
    }.toMap
    assert(powers(3) > 600 && powers(3) < 650, s"peak ${powers(3)}")
    (1 to 8).filter(_ != 3).foreach(k =>
      assert(powers(k) < 1.0, s"leak at k=$k: ${powers(k)}"))
  }

  test("layout_hilbert: exhaustive order-4 bijection + unit-adjacency; zorder-locality win") {
    import graft.functions.{HilbertCode, MortonCode}
    // the DEFINING Hilbert property, checked exhaustively on the 16×16
    // grid: d is a bijection onto 0..255 and consecutive d's are grid-
    // ADJACENT (|Δx|+|Δy| = 1) — Z-order fails the adjacency half
    val cells = for (x <- 0 until 16; y <- 0 until 16)
      yield (HilbertCode.encode(4, x, y), (x, y))
    assert(cells.map(_._1).sorted == (0L until 256L),
      "order-4 curve is not a bijection onto 0..255")
    val byD = cells.sortBy(_._1).map(_._2)
    byD.zip(byD.drop(1)).foreach { case ((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step ($x1,$y1)->($x2,$y2)")
    }
    // order-16 expression path: the low-16-bit fold of the same recipe
    assert(HilbertCode.encode16(0L, 0L) == 0L)
    assert(cells.map { case (_, (x, y)) =>
      HilbertCode.encode(4, x.toLong, y.toLong)
    }.distinct.length == 256)
    // locality: mean |Δmorton| across the 255 Hilbert-adjacent steps is
    // far larger than mean |Δhilbert| across Z-adjacent steps — the
    // tighter-bounding-box claim in one number (Hilbert steps are unit,
    // Z-order takes quadrant-boundary jumps)
    val zByD = cells.map { case (_, (x, y)) =>
      (MortonCode.interleave(x.toLong, y.toLong), (x, y))
    }.sortBy(_._1).map(_._2)
    val zJumps = zByD.zip(zByD.drop(1)).map { case ((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }
    assert(zJumps.max > 1, "zorder unexpectedly unit-adjacent")
    assert(zJumps.sum > 255, "hilbert should strictly beat zorder locality here")
  }

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
