package graft

import org.apache.spark.sql.functions._
import graft.ops.{Drift, Windows}

/** Round-11b drift-monitor family (SURVEY.md §2.21): every statistic is
  * recomputed BRUTE-FORCE in plain Scala from the collected sf0.001
  * fixture rows and compared EXACTLY (same IEEE chain, same Det
  * rounding) against the operator output — a full-value pin on top of
  * the DuckDB oracle gate, and the place the formulas are spelled out
  * independently of both engines. */
class DriftSpec extends SparkSpec {

  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
  private def round4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
  private def round1(x: Double): Double = math.floor(x * 10 + 0.5) / 10.0

  /** (event_type, cents, isRef) with the split computed by Spark (the
    * shared projection all six monitors start from). */
  private lazy val rows: Seq[(String, Long, Boolean)] =
    graft.io.Tables.events(spark, sf001)
      .select(col("event_type"), floor(col("value") * 100 + 0.5).as("c"),
        (col("ts") < lit("2024-01-16 00:00:00").cast("timestamp")).as("isr"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq

  test("drift_psi: exact brute-force parity + conservation + nonnegative terms") {
    val ref = rows.filter(_._3).map(_._2)
    val cur = rows.filterNot(_._3).map(_._2)
    val na = ref.size.toLong
    val nb = cur.size.toLong
    val ltOf: Long => Long = v => ref.count(_ < v).toLong
    def bin(v: Long): Long = 1L + math.min(9L, 10L * ltOf(v) / na)
    val expect = (1L to 10L).flatMap { b =>
      val nr = ref.count(bin(_) == b).toLong
      val nc = cur.count(bin(_) == b).toLong
      if (nr > 0 && nc > 0)
        Some((b, nr, nc, round6(
          (nr.toDouble / na.toDouble - nc.toDouble / nb.toDouble) *
            math.log((nr * nb).toDouble / (nc * na).toDouble))))
      else None
    }
    val got = Drift.driftPsi(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == expect, s"psi mismatch: ${got.toSeq} vs $expect")
    // PSI terms are individually nonnegative ((p−q) and ln(p/q) share sign)
    assert(got.forall(_._4 >= 0.0))
    // populated-bin counts conserve both snapshots at this fixture
    assert(got.map(_._2).sum == na && got.map(_._3).sum == nb)
  }

  test("drift_ks: exact brute-force parity, d in [0,1]") {
    val byType = rows.groupBy(_._1)
    val expect = byType.toSeq.sortBy(_._1).map { case (t, rs) =>
      val a = rs.filter(_._3).map(_._2)
      val b = rs.filterNot(_._3).map(_._2)
      val na = a.size.toLong; val nb = b.size.toLong
      val grid = (a ++ b).distinct.sorted
      val cands = grid.map { v =>
        (math.abs(a.count(_ <= v) * nb - b.count(_ <= v) * na), v)
      }
      val mx = cands.map(_._1).max
      val at = cands.filter(_._1 == mx).map(_._2).min
      (t, na, nb, round6(mx.toDouble / (na * nb).toDouble), at)
    }
    val got = Drift.driftKs(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(got.toSeq == expect, s"ks mismatch: ${got.toSeq} vs $expect")
    assert(got.forall(g => g._4 >= 0.0 && g._4 <= 1.0))
  }

  test("drift_emd: exact brute-force parity, nonnegative, zero iff identical") {
    val byType = rows.groupBy(_._1)
    val expect = byType.toSeq.sortBy(_._1).map { case (t, rs) =>
      val a = rs.filter(_._3).map(_._2)
      val b = rs.filterNot(_._3).map(_._2)
      val na = a.size.toLong; val nb = b.size.toLong
      val grid = (a ++ b).distinct.sorted
      val num = grid.zip(grid.drop(1)).map { case (c, nxt) =>
        math.abs(a.count(_ <= c) * nb - b.count(_ <= c) * na) * (nxt - c)
      }.sum
      (t, na, nb, round6(num.toDouble / (na * nb).toDouble / 100.0))
    }
    val got = Drift.driftEmd(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == expect, s"emd mismatch: ${got.toSeq} vs $expect")
    assert(got.forall(_._4 >= 0.0))
    // W1 of a distribution against itself is 0 (sanity on the formula)
    val self = {
      val a = byType.head._2.map(_._2)
      val grid = a.distinct.sorted
      grid.zip(grid.drop(1)).map { case (c, nxt) =>
        math.abs(a.count(_ <= c) * a.size.toLong -
          a.count(_ <= c) * a.size.toLong) * (nxt - c)
      }.sum
    }
    assert(self == 0L)
  }

  test("drift_chi2 + drift_js: exact brute-force parity, nonnegative terms") {
    val byType = rows.groupBy(_._1)
    val na = rows.count(_._3).toLong
    val nb = rows.size - na
    val cells = byType.toSeq.sortBy(_._1).map { case (t, rs) =>
      (t, rs.count(_._3).toLong, rs.count(!_._3).toLong)
    }
    val expChi = cells.map { case (t, oa, ob) =>
      val g = na + nb; val rowt = oa + ob
      val nA = (oa * g - rowt * na).toDouble
      val nB = (ob * g - rowt * nb).toDouble
      (t, oa, ob, round6(nA * nA / (rowt * na * g).toDouble +
        nB * nB / (rowt * nb * g).toDouble))
    }
    val expJs = cells.map { case (t, oa, ob) =>
      val p = oa.toDouble / na.toDouble; val q = ob.toDouble / nb.toDouble
      val m = (p + q) / 2.0
      (t, oa, ob, round6(0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)))
    }
    val gotChi = Drift.driftChi2(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val gotJs = Drift.driftJs(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(gotChi.toSeq == expChi, s"chi2 mismatch: ${gotChi.toSeq} vs $expChi")
    assert(gotJs.toSeq == expJs, s"js mismatch: ${gotJs.toSeq} vs $expJs")
    assert(gotChi.forall(_._4 >= 0.0) && gotJs.forall(_._4 >= 0.0))
  }

  test("drift_mann_whitney: exact brute-force parity + U symmetry") {
    val byType = rows.groupBy(_._1)
    val expect = byType.toSeq.sortBy(_._1).map { case (t, rs) =>
      val hist = rs.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (c, g) =>
          (c, g.count(_._3).toLong, g.count(!_._3).toLong)
        }
      var cum = 0L; var ra2 = 0L; var nA = 0L; var nB = 0L; var ties = 0L
      hist.foreach { case (_, ca, cb) =>
        val cc = ca + cb
        val rank2 = 2 * cum + cc + 1
        ra2 += ca * rank2; cum += cc
        nA += ca; nB += cb; ties += cc * cc * cc - cc
      }
      val n = nA + nB
      val u = (ra2 - nA * (nA + 1)).toDouble / 2.0
      val mu = (nA * nB).toDouble / 2.0
      val sig2 = (nA * nB).toDouble / 12.0 *
        ((n + 1).toDouble - ties.toDouble / (n * (n - 1)).toDouble)
      (t, nA, nB, round1(u), round6((u - mu) / math.sqrt(sig2)))
    }
    val got = Drift.driftMannWhitney(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.toSeq == expect, s"mw mismatch: ${got.toSeq} vs $expect")
    // U_ref + U_cur = nA·nB (rank-sum complement identity), checked on
    // the unrounded brute values
    byType.toSeq.sortBy(_._1).foreach { case (_, rs) =>
      val hist = rs.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (c, g) => (c, g.count(_._3).toLong, g.count(!_._3).toLong) }
      var cum = 0L; var ra2 = 0L; var rb2 = 0L
      var nA = 0L; var nB = 0L
      hist.foreach { case (_, ca, cb) =>
        val cc = ca + cb; val rank2 = 2 * cum + cc + 1
        ra2 += ca * rank2; rb2 += cb * rank2; cum += cc; nA += ca; nB += cb
      }
      val uA2 = ra2 - nA * (nA + 1)
      val uB2 = rb2 - nB * (nB + 1)
      assert(uA2 + uB2 == 2 * nA * nB)
    }
  }

  test("drift_ttest_welch: exact brute-force parity") {
    val expect = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rs) =>
      def side(ref: Boolean): (Long, Double, Double) = {
        val xs = rs.filter(_._3 == ref).map(_._2)
        val n = xs.size.toLong
        val m0 = xs.sum / n
        val sd = xs.map(_ - m0).sum
        val sdd = xs.map(x => (x - m0) * (x - m0)).sum
        val mean = m0.toDouble + sd.toDouble / n.toDouble
        val s2 = (sdd.toDouble - sd.toDouble * sd.toDouble / n.toDouble) /
          (n - 1).toDouble
        (n, mean, s2)
      }
      val (n1, ma, va) = side(true); val (n2, mb, vb) = side(false)
      val seA = va / n1.toDouble; val seB = vb / n2.toDouble
      val se2 = seA + seB
      (t, n1, n2, round4(ma / 100.0), round4(mb / 100.0),
        round6((ma - mb) / math.sqrt(se2)),
        round4(se2 * se2 / (seA * seA / (n1 - 1).toDouble +
          seB * seB / (n2 - 1).toDouble)))
    }
    val got = Drift.driftTtestWelch(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq == expect, s"welch mismatch: ${got.toSeq} vs $expect")
  }

  test("win_ols_slope: exact brute-force parity on every user; linear ramp sanity") {
    val perUser = graft.io.Tables.events(spark, sf001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * 100 + 0.5).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val expect = perUser.toSeq.sortBy(_._1).flatMap { case (u, rs) =>
      val ordered = rs.sortBy(r => (r._3, r._2))
      ordered.zipWithIndex.drop(29).map { case ((_, eid, _, _), idx) =>
        val i = (idx + 1).toLong // 1-based row_number
        val win = ordered.slice(idx - 29, idx + 1)
        val sy = win.map(_._4).sum
        val siy = win.zipWithIndex.map { case ((_, _, _, c), j) =>
          (idx - 29 + j + 1).toLong * c
        }.sum
        (u, eid, round6((30 * (siy - (i - 30) * sy) - 465 * sy).toDouble /
          67425.0 / 100.0))
      }
    }
    val got = Windows.winOlsSlope(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == expect, s"ols mismatch (first diff: ${
      got.toSeq.zip(expect).find { case (a, b) => a != b }})")
    // sanity: a perfectly linear synthetic ramp has slope == step
    val n = 40
    val sy = (11 to 40).map(_ * 100L).sum
    val siy = (11 to 40).map(j => j.toLong * j * 100L).sum
    val slope = (30 * (siy - 10 * sy) - 465 * sy).toDouble / 67425.0 / 100.0
    assert(math.abs(slope - 1.0) < 1e-9, s"ramp slope $slope != 1.0 (n=$n)")
  }
}
