package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Analytics, Quant, SqlApi}

/** Round-6c (quantitative/statistics layer) invariants: each declarative
  * operator is pinned against a direct driver-side recompute or a
  * structural property independent of Spark's agg/window machinery.
  */
class Round6cSpec extends SparkSpec {

  private def med(xs: Seq[Double]): Double = {
    val a = xs.sorted
    val n = a.length
    if (n % 2 == 1) a(n / 2) else (a(n / 2 - 1) + a(n / 2)) / 2
  }

  private def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  private def eventsByUser = Tables.events(spark, sf01)
    .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    .collect()
    .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    .groupBy(_._1)
    .view.mapValues(_.sortBy(r => (r._2.getTime, r._2.getNanos, r._3)).toSeq)
    .toMap

  test("agg_gini: matches a direct per-lang recompute; 0 <= G < 1") {
    val got = Quant.aggGini(spark, sf01)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    val lens = Tables.documents(spark, sf01)
      .select(col("lang"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    got.foreach { case (lang, n, gini) =>
      val xs = lens(lang)
      assert(n === xs.length.toLong)
      val sx = xs.map(BigInt(_)).sum
      val six = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val expect = math.floor(
        (BigInt(2) * six - BigInt(n + 1) * sx).toDouble /
          (BigInt(n) * sx).toDouble * 1e6 + 0.5) / 1e6
      assert(gini === expect, s"gini($lang)")
      assert(gini >= 0 && gini < 1)
    }
  }

  test("feature_zscore_norm: matches a direct exact-cents recompute") {
    val got = Quant.featureZscoreNorm(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got.size > 1000, s"suspiciously few z rows: ${got.size}")
    eventsByUser.foreach { case (_, evs) =>
      val xs = evs.map(e => cents(e._4))
      val n = xs.length
      val s1 = xs.map(BigInt(_)).sum
      val s2 = xs.map(x => BigInt(x) * x).sum
      val num = BigInt(n) * s2 - s1 * s1
      if (n >= 2 && num > 0) {
        val mu = s1.toDouble / n
        val sd = math.sqrt(num.toDouble / (n.toLong * (n - 1)).toDouble)
        evs.foreach { case (_, _, eid, v) =>
          val z = math.floor((cents(v) - mu) / sd * 10000 + 0.5) / 10000
          assert(got(eid) === z, s"z of event $eid")
        }
      } else evs.foreach(e => assert(!got.contains(e._3)))
    }
  }

  test("win_pct_change: matches a direct lagged recompute") {
    val got = Quant.winPctChange(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    var checked = 0
    eventsByUser.foreach { case (_, evs) =>
      evs.sliding(2).foreach {
        case Seq(a, b) =>
          val prev = cents(a._4)
          if (prev != 0) {
            val expect =
              math.floor((cents(b._4) - prev).toDouble / prev * 1e6 + 0.5) / 1e6
            assert(got(b._3) === expect, s"pct_change of event ${b._3}")
            checked += 1
          }
        case _ =>
      }
    }
    assert(checked === got.size, "row count differs from recompute")
  }

  test("ts_anomaly_mad: flag set == direct median/MAD recompute") {
    val flagged = Quant.tsAnomalyMad(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(flagged.nonEmpty, "zero flagged rows — vacuous at sf0.01")
    assert(flagged.forall(_._2 >= 3.5))
    val expected = eventsByUser.flatMap { case (_, evs) =>
      val n = evs.length
      if (n < 12) Seq.empty
      else {
        val xs = evs.map(e => cents(e._4).toDouble)
        val m = med(xs)
        val devs = xs.map(x => math.abs(x - m))
        val mad = med(devs)
        if (mad <= 0) Seq.empty
        else evs.zip(devs).flatMap { case ((_, _, eid, _), dev) =>
          val z = math.floor(dev / (1.4826 * mad) * 10000 + 0.5) / 10000
          if (z >= 3.5) Some(eid) else None
        }
      }
    }.toSet
    assert(flagged.map(_._1).toSet === expected)
  }

  test("seq_pmi_bigrams: matches a direct pair-count recompute") {
    val got = Quant.seqPmiBigrams(spark, sf01)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty)
    val types = Tables.events(spark, sf01)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(r => (r._2.getTime, r._2.getNanos, r._3))
        .map(_._4).toSeq)
    val pairs = types.values.flatMap(ts => ts.zip(ts.tail)).toSeq
    val nAb = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nA = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nB = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nTot = pairs.size.toLong
    val expected = nAb.filter(_._2 >= 5).map { case (p, ab) =>
      p -> (ab, math.floor(math.log(
        (BigInt(nTot) * ab).toDouble / (BigInt(nA(p._1)) * nB(p._2)).toDouble)
        * 10000 + 0.5) / 10000)
    }
    assert(got === expected)
  }

  test("graph_degree_stats: histogram == recompute; handshake sum holds") {
    val got = Quant.graphDegreeStats(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.nonEmpty)
    val edges = graft.ops.Analytics.coOrderPairs(spark, sf01)
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("n"))
      .where(col("n") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val hist = deg.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got === hist)
    assert(got.map { case (d, c) => d * c }.sum === 2L * edges.length)
  }

  test("cdc_deletes: upsert keys minus tombstoned-latest keys") {
    val got = Quant.cdcDeletes(spark, sf01)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val latest = Tables.events(spark, sf01)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getTimestamp(2), r.getLong(3))))
      .groupBy(_._1)
      .view.mapValues(_.map(_._2)
        .maxBy(t => (t._1.getTime, t._1.getNanos, t._2))._2)
      .toMap
    val expected = latest.filter { case (_, eid) => eid % 10 != 0 }
    assert(got === expected)
    assert(got.size < latest.size, "no key was tombstoned — vacuous")
  }

  test("ts_interpolate_linear: observed rows exact, interpolated rows bracketed") {
    val rows = Quant.tsInterpolateLinear(spark, sf01)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    val nInterp = rows.count(_._3 == 1)
    assert(nInterp > 0, "no interpolated buckets at sf0.01 — vacuous")
    rows.groupBy(_._2).values.foreach { g =>
      val byH = g.sortBy(_._1.getTime)
      // every interpolated value lies within [min, max] of the two
      // bracketing OBSERVED buckets (linearity bound)
      byH.zipWithIndex.foreach { case ((_, _, interp, v), i) =>
        if (interp == 1) {
          val prev = byH.take(i).reverse.find(_._3 == 0).map(_._4)
          val next = byH.drop(i + 1).find(_._3 == 0).map(_._4)
          assert(prev.nonEmpty && next.nonEmpty, "unbracketed interpolated row")
          val (lo, hi) = (math.min(prev.get, next.get), math.max(prev.get, next.get))
          assert(v >= lo - 1e-9 && v <= hi + 1e-9, "outside linear bracket")
        }
      }
    }
  }

  test("text_readability: matches a direct regex recompute") {
    val got = Quant.textReadability(spark, sf01)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))))
      .toMap
    val docs = Tables.documents(spark, sf01)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty && got.size === docs.length)
    docs.foreach { case (id, text) =>
      val w = text.split(" ", -1).length.toLong
      val sn = math.max(1L, "[.!?]+".r.findAllIn(text).length.toLong)
      val sy = "[aeiouy]+".r.findAllIn(text.toLowerCase).length.toLong
      val f = math.floor(
        (206.835 - 1.015 * (w.toDouble / sn) - 84.6 * (sy.toDouble / w))
          * 10000 + 0.5) / 10000
      assert(got(id) === ((w, sn, sy, f)), s"doc $id")
    }
  }

  test("corpus_curriculum: balanced phases, ordered by rounded TTR") {
    val got = Quant.corpusCurriculum(spark, sf01)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).values.foreach { g =>
      val n = g.length
      val sizes = g.groupBy(_._4).view.mapValues(_.size).toMap
      assert(sizes.keySet.subsetOf(Set(1, 2, 3, 4)))
      sizes.values.foreach(sz =>
        assert(sz >= n / 4 && sz <= n / 4 + 1, s"unbalanced phase: $sizes"))
      // phase boundaries respect the rounded-TTR order
      (1 to 3).foreach { k =>
        val cur = g.filter(_._4 == k).map(_._3)
        val nxt = g.filter(_._4 == k + 1).map(_._3)
        if (cur.nonEmpty && nxt.nonEmpty)
          assert(cur.max <= nxt.min + 1e-12, s"phase $k overlaps ${k + 1}")
      }
    }
  }

  test("embedding_dim_stats: full coverage per dim, min <= mean <= max") {
    val got = Quant.embeddingDimStats(spark, sf01)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val nVec = Tables.embeddings(spark, sf01).count()
    assert(got.length === 64)
    got.foreach { case (_, n, mean, mn, mx) =>
      assert(n === nVec)
      assert(mn <= mean + 1e-9 && mean <= mx + 1e-9)
    }
  }

  private def quantile(xs: Seq[Double], q: Double): Double = {
    val a = xs.sorted
    val pos = q * (a.length - 1)
    val lo = pos.toInt
    val frac = pos - lo
    if (lo + 1 >= a.length) a(lo) else a(lo) + (a(lo + 1) - a(lo)) * frac
  }

  test("agg_quantile_bands: monotone bands, p50 == direct median") {
    val got = Quant.aggQuantileBands(spark, sf01)
      .collect().map(r => (r.getString(0), (r.getLong(1),
        (2 to 6).map(r.getDouble))))
    assert(got.nonEmpty)
    val byType = Tables.events(spark, sf01)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    got.foreach { case (t, (n, bands)) =>
      assert(n === byType(t).length.toLong)
      assert(bands === bands.sorted, s"non-monotone bands for $t")
      val p50 = math.floor(quantile(byType(t), 0.5) * 10000 + 0.5) / 10000
      assert(bands(2) === p50, s"p50 of $t")
    }
  }

  test("feature_robust_scale: matches a direct median/IQR recompute") {
    val got = Quant.featureRobustScale(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got.size > 1000)
    eventsByUser.foreach { case (_, evs) =>
      val xs = evs.map(e => cents(e._4).toDouble)
      val (m, q1, q3) =
        (quantile(xs, 0.5), quantile(xs, 0.25), quantile(xs, 0.75))
      if (xs.length >= 2 && q3 > q1)
        evs.foreach { case (_, _, eid, v) =>
          val expect =
            math.floor((cents(v) - m) / (q3 - q1) * 10000 + 0.5) / 10000
          assert(got(eid) === expect, s"robust scale of event $eid")
        }
      else evs.foreach(e => assert(!got.contains(e._3)))
    }
  }

  test("analytics_dau: matches a direct distinct-pair recompute") {
    val got = Quant.analyticsDau(spark, sf01)
      .collect().map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate,
        (r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(got.nonEmpty)
    val pairs = Tables.events(spark, sf01)
      .select(col("ts"), col("user_id"))
      .collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate, r.getLong(1)))
      .distinct
    val mau = pairs.map(p => (p._1.withDayOfMonth(1), p._2)).distinct
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    got.foreach { case (day, (dau, wau7, m)) =>
      assert(dau === pairs.count(_._1 == day).toLong)
      assert(wau7 === pairs.filter { case (d, _) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(6))
      }.map(_._2).distinct.length.toLong)
      assert(m === mau(day.withDayOfMonth(1)))
    }
  }

  test("graph_edge_jaccard: matches a direct set-overlap recompute") {
    val got = Quant.graphEdgeJaccard(spark, sf01)
      .collect().map(r => ((r.getLong(1), r.getLong(0)), // p2 joined first
        (r.getLong(2), r.getDouble(3))))
    val gotMap = got.map { case ((p2, p1), v) => ((p1, p2), v) }.toMap
    assert(gotMap.nonEmpty)
    val dl = Tables.lineitem(spark, sf01)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byPart = dl.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    gotMap.foreach { case ((p1, p2), (nAb, jac)) =>
      val (a, b) = (byPart(p1), byPart(p2))
      assert(nAb === (a & b).size.toLong)
      val expect =
        math.floor(nAb.toDouble / (a | b).size * 1e6 + 0.5) / 1e6
      assert(jac === expect, s"jaccard($p1,$p2)")
    }
  }

  test("fn_agg_bool: matches direct predicate counts") {
    val got = Quant.fnAggBool(spark, sf01)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))).toMap
    val vals = Tables.events(spark, sf01)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(got.keySet === vals.keySet)
    vals.foreach { case (t, xs) =>
      assert(got(t) === ((xs.count(_ > 100).toLong, xs.count(_ > 400).toLong,
        if (xs.forall(_ > 0)) 1 else 0, if (xs.exists(_ > 480)) 1 else 0)))
    }
    assert(got.values.map(_._4).toSet.size > 1,
      "any_near_max constant across types — vacuous predicate")
  }

  test("ts_weekday_profile: exact per-(type, weekday) mean recompute") {
    val got = Quant.tsWeekdayProfile(spark, sf01)
      .collect().map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size === 35, s"expected full 5x7 grid, got ${got.size}")
    val rows = Tables.events(spark, sf01)
      .select(col("event_type"), col("ts"), col("value"))
      .collect().map { r =>
        val wd = r.getTimestamp(1).toLocalDateTime.getDayOfWeek.getValue - 1
        ((r.getString(0), wd), cents(r.getDouble(2)))
      }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { case (k, xs) =>
      val mean = math.floor(
        xs.sum.toDouble / xs.length / 1e2 * 10000 + 0.5) / 10000
      assert(got(k) === ((xs.length.toLong, mean)), s"weekday cell $k")
    }
  }

  test("sql_lateral_topn: per-customer top-2 == direct recompute") {
    val got = graft.ops.SqlApi.sqlLateralTopn(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    val building = Tables.customer(spark, sf01)
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val orders = Tables.orders(spark, sf01)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val expected = building.flatMap { ck =>
      orders.getOrElse(ck, Array.empty[(Long, Long, Double)])
        .sortBy(o => (-o._3, o._2)).take(2).map(o => (ck, o._2))
    }
    assert(got === expected)
  }

  test("fn_url_parse: every component extracted on every row") {
    val got = Quant.fnUrlParse(spark, sf01).collect()
    assert(got.length === 500)
    got.foreach { r =>
      val (id, url) = (r.getLong(0), r.getString(1))
      assert(r.getString(2) === "https")
      assert(r.getString(3).endsWith(".example.com") &&
        url.startsWith("https://" + r.getString(3)))
      assert(r.getString(4) === s"/docs/$id")
      assert(r.getString(5).nonEmpty && url.endsWith("?lang=" + r.getString(5)))
    }
  }

  test("ts_cusum: matches a direct recompute; final deviation sums to zero") {
    val got = Quant.tsCusum(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got.size === 10000)
    eventsByUser.foreach { case (_, evs) =>
      val xs = evs.map(e => cents(e._4))
      val st = xs.sum
      val mu = st.toDouble / xs.length
      var si = 0L
      evs.zipWithIndex.foreach { case ((_, _, eid, _), i) =>
        si += xs(i)
        val expect = math.floor((si - (i + 1) * mu) / 1e2 * 10000 + 0.5) / 10000
        assert(got(eid) === expect, s"cusum of event $eid")
      }
      // CUSUM returns to ~0 at the last event by construction
      assert(math.abs(si - xs.length * mu) < 1e-3)
    }
  }

  test("analytics_pareto: shares sum to 1, cum_share monotone, top decile dominates") {
    val got = Quant.analyticsPareto(spark, sf01)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.map(_._1).toSeq === (1 to 10))
    val nUsers = Tables.events(spark, sf01)
      .select(col("user_id")).distinct().count()
    assert(got.map(_._2).sum === nUsers)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-4)
    val cums = got.sortBy(_._1).map(_._4)
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b + 1e-12 })
    assert(math.abs(cums.last - 1.0) < 1e-6)
    // deciles rank by spend DESC, so shares must be non-increasing
    val shares = got.sortBy(_._1).map(_._3)
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b - 1e-12 })
  }

  test("agg_grouping_id: levels partition the fact table, gid marks depth") {
    val got = Quant.aggGroupingId(spark, sf01)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val total = Tables.lineitem(spark, sf01).count()
    Seq(0L, 1L, 3L).foreach { gid =>
      val lvl = got.filter(_._3 == gid)
      assert(lvl.nonEmpty, s"missing rollup level gid=$gid")
      assert(lvl.map(_._4).sum === total, s"level gid=$gid does not partition")
    }
    assert(got.filter(_._3 == 3L).map(t => (t._1, t._2)).toSeq ===
      Seq(("ALL", "ALL")))
    // cents roll up exactly level-to-level
    assert(got.filter(_._3 == 0L).map(_._5).sum ===
      got.filter(_._3 == 3L).map(_._5).head)
  }

  test("text_boilerplate_ratio: matches a direct shingle recompute") {
    val got = Quant.textBoilerplateRatio(spark, sf01)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got.values.map(_._2).sum > 0, "no boilerplate found — vacuous")
    val docs = Tables.documents(spark, sf01)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= 3)
    val shingles = docs.map { case (id, ws) =>
      (id, ws.sliding(3).map(_.mkString(" ")).toSet)
    }
    val docFreq = shingles.flatMap(_._2.map(s => (s, 1)))
      .groupBy(_._1).view.mapValues(_.size).toMap
    shingles.foreach { case (id, sh) =>
      val boiler = sh.count(docFreq(_) >= 5).toLong
      assert(got(id) === ((sh.size.toLong, boiler)), s"doc $id")
    }
    assert(got.size === shingles.length)
  }

  test("corpus_kl_balance: nonnegative, zero iff uniform, matches recompute") {
    val got = Quant.corpusKlBalance(spark, sf01).collect()
    assert(got.length === 1)
    val (k, kl) = (got.head.getLong(0), got.head.getDouble(1))
    val counts = Tables.documents(spark, sf01)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(k === counts.length.toLong)
    val n = counts.map(_._2).sum.toDouble
    var run = 0.0
    counts.foreach { case (_, nl) =>
      val p = nl / n
      run += p * math.log(k * p)
    }
    assert(kl === math.floor(run * 1e6 + 0.5) / 1e6)
    assert(kl > 0, "fixture lang mix is non-uniform — KL must be positive")
  }

  test("ts_seasonal_residual: matches a direct two-way baseline recompute") {
    val got = Quant.tsSeasonalResidual(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got.size === 10000)
    val rows = Tables.events(spark, sf01)
      .select(col("event_id"), col("ts"), col("value"))
      .collect().map { r =>
        val ldt = r.getTimestamp(1).toLocalDateTime
        (r.getLong(0), ldt.getDayOfWeek.getValue - 1, ldt.getHour,
          cents(r.getDouble(2)))
      }
    def mean(xs: Iterable[Long]): Double =
      xs.sum.toDouble / xs.size / 1e2
    val wdm = rows.groupBy(_._2).view.mapValues(g => mean(g.map(_._4))).toMap
    val hm = rows.groupBy(_._3).view.mapValues(g => mean(g.map(_._4))).toMap
    val gm = mean(rows.map(_._4))
    rows.foreach { case (eid, wd, hod, xc) =>
      val expect = math.floor(
        (xc / 1e2 - (wdm(wd) + hm(hod) - gm)) * 10000 + 0.5) / 10000
      assert(got(eid) === expect, s"residual of event $eid")
    }
  }

  test("fn_variant_json: typed variant extraction matches the raw JSON payload") {
    val got = Quant.fnVariantJson(spark, sf01).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getString(2), r.getInt(3))))
      .toMap
    assert(got.size === 10000)
    Tables.events(spark, sf01).select(col("event_id"), col("props"))
      .collect().foreach { r =>
        val k = """"k"\s*:\s*(\d+)""".r
          .findFirstMatchIn(r.getString(1)).get.group(1).toInt
        assert(got(r.getLong(0)) === ((k, k.toString, k * 2)))
      }
  }

  test("ts_rolling_zscore: matches a direct 20-frame recompute") {
    val got = Quant.tsRollingZscore(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    var checked = 0
    eventsByUser.foreach { case (_, evs) =>
      val xs = evs.map(e => cents(e._4))
      evs.indices.drop(19).foreach { i =>
        val frame = xs.slice(i - 19, i + 1)
        val s1 = frame.map(BigInt(_)).sum
        val s2 = frame.map(x => BigInt(x) * x).sum
        val num = BigInt(20) * s2 - s1 * s1
        val eid = evs(i)._3
        if (num > 0) {
          val z = math.floor((xs(i) - s1.toDouble / 2e1) /
            math.sqrt(num.toDouble / 380.0) * 10000 + 0.5) / 10000
          assert(got(eid) === z, s"rolling z of event $eid")
          checked += 1
        } else assert(!got.contains(eid))
      }
    }
    assert(checked === got.size)
  }

  test("graph_cc_sizes: sizes partition the vertex set") {
    val got = Quant.graphCcSizes(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nVerts = Tables.embeddings(spark, sf01).count()
    assert(got.map { case (sz, n) => sz * n }.sum === nVerts)
    assert(got.length > 1, "degenerate single-size histogram")
  }

  test("text_ngram_novelty: matches a direct first-owner recompute") {
    val got = Quant.textNgramNovelty(spark, sf01)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val docs = Tables.documents(spark, sf01)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= 3)
    val shingles = docs.map { case (id, ws) =>
      (id, ws.sliding(3).map(_.mkString(" ")).toSet)
    }
    val firstOwner = shingles.flatMap { case (id, sh) => sh.map((_, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    shingles.foreach { case (id, sh) =>
      val novel = sh.count(firstOwner(_) == id).toLong
      assert(got(id) === ((sh.size.toLong, novel)), s"doc $id")
    }
    // novelty must not be constant-1 (shared shingles exist at sf0.01)
    assert(got.exists { case (_, (n, novel)) => novel < n },
      "every shingle novel — vacuous against boilerplate evidence")
  }

  test("agg_weighted_mean: matches a direct exact-product recompute") {
    val got = Quant.aggWeightedMean(spark, sf01)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val rows = Tables.lineitem(spark, sf01)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1).toLong,
        cents(r.getDouble(2))))
      .groupBy(_._1)
    assert(got.keySet === rows.keySet)
    rows.foreach { case (f, ls) =>
      val sq = ls.map(l => BigInt(l._2)).sum
      val sqp = ls.map(l => BigInt(l._2) * l._3).sum
      val expect =
        math.floor(sqp.toDouble / sq.toDouble / 1e2 * 10000 + 0.5) / 10000
      assert(got(f) === expect, s"wavg of $f")
    }
  }

  test("ts_interarrival_stats: matches a direct gap recompute") {
    val got = Quant.tsInterarrivalStats(spark, sf01)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    eventsByUser.foreach { case (uid, evs) =>
      if (evs.length >= 2) {
        val secs = evs.map(_._2.toInstant.getEpochSecond)
        val gaps = secs.zip(secs.tail).map { case (a, b) => b - a }
        val mean = math.floor(
          gaps.sum.toDouble / gaps.length * 10000 + 0.5) / 10000
        assert(got(uid) === ((gaps.length.toLong, mean, gaps.max)), s"user $uid")
      } else assert(!got.contains(uid))
    }
  }

  test("set_intersect_all / set_except_all: true multiset semantics") {
    val types = Tables.events(spark, sf01)
      .select(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val clicks = types.filter(_._2 == "click").groupBy(_._1)
      .view.mapValues(_.length).toMap
    val buys = types.filter(_._2 == "purchase").groupBy(_._1)
      .view.mapValues(_.length).toMap
    val inter = graft.ops.Relational.setIntersectAll(spark, sf01).count()
    val exc = graft.ops.Relational.setExceptAll(spark, sf01).count()
    val expInter = clicks.map { case (u, c) =>
      math.min(c, buys.getOrElse(u, 0)) }.sum.toLong
    val expExc = clicks.map { case (u, c) =>
      math.max(c - buys.getOrElse(u, 0), 0) }.sum.toLong
    assert(inter === expInter && exc === expExc)
    // bag semantics must differ from the distinct forms
    assert(inter > graft.ops.Relational.setIntersect(spark, sf01).count())
  }

  test("ts_autocorr_lag1: |acf| <= 1 and matches a direct recompute") {
    val got = Quant.tsAutocorrLag1(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    val byUser = eventsByUser
    got.foreach { case (uid, n, acf) =>
      assert(math.abs(acf) <= 1.0 + 1e-9)
      val xs = byUser(uid).map(e => cents(e._4))
      val pairs = xs.zip(xs.tail)
      assert(n === pairs.length.toLong)
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sy = pairs.map(p => BigInt(p._2)).sum
      val sx2 = pairs.map(p => BigInt(p._1) * p._1).sum
      val sy2 = pairs.map(p => BigInt(p._2) * p._2).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val nd = pairs.length.toDouble
      val expect = math.floor(
        (nd * sxy.toDouble - sx.toDouble * sy.toDouble) /
          math.sqrt((nd * sx2.toDouble - sx.toDouble * sx.toDouble) *
            (nd * sy2.toDouble - sy.toDouble * sy.toDouble)) * 1e6 + 0.5) / 1e6
      assert(acf === expect, s"acf1 of user $uid")
    }
  }

  test("pipeline_quality_funnel: cumulative gates match a direct recompute") {
    val rows = Quant.pipelineQualityFunnel(spark, sf01)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 4 && rows.map(_._1).toSeq === Seq(0, 1, 2, 3))
    val texts = Tables.documents(spark, sf01)
      .select(col("text")).collect().map(_.getString(0))
    val ws = texts.map(_.split(" ", -1).toSeq)
    val g1 = ws.count(_.length >= 20)
    val g2 = ws.count(w => w.length >= 20 &&
      w.distinct.length.toDouble / w.length >= 0.5)
    val g3 = texts.zip(ws).count { case (t, w) => w.length >= 20 &&
      w.distinct.length.toDouble / w.length >= 0.5 &&
      t.exists("!?.".contains(_)) }
    val exp = Seq(texts.length.toLong, g1.toLong, g2.toLong, g3.toLong)
    assert(rows.map(_._3).toSeq === exp)
    // funnel counts never increase; drops reconcile stage-to-stage
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._4 === a._3 - b._3)
    }
    assert(rows.head._4 === 0L)
  }

  test("agg_distinct_multi: tuple distinct matches a direct recompute") {
    val got = Quant.aggDistinctMulti(spark, sf01)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.nonEmpty)
    val evs = Tables.events(spark, sf01)
      .select(col("event_type"), col("user_id"),
        date_trunc("day", col("ts")).as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2)))
      .groupBy(_._1)
    evs.foreach { case (et, rs) =>
      val (du, dd, dud, n) = got(et)
      assert(du === rs.map(_._2).distinct.length.toLong, s"$et users")
      assert(dd === rs.map(_._3).distinct.length.toLong, s"$et days")
      assert(dud === rs.map(r => (r._2, r._3)).distinct.length.toLong,
        s"$et user-days")
      assert(n === rs.length.toLong)
      // tuple distinct dominates each marginal, bounded by row count
      assert(dud >= math.max(du, dd) && dud <= n)
    }
  }

  test("join_existence: flag partitions customers exactly as semi/anti would") {
    val rows = Quant.joinExistence(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val nCust = Tables.customer(spark, sf01).count()
    assert(rows.length.toLong === nCust, "flag form must keep every customer")
    assert(rows.map(_._1).distinct.length === rows.length)
    val withUrgent = Tables.orders(spark, sf01)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 100000.0)
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    rows.foreach { case (ck, flag) =>
      assert(flag === (if (withUrgent(ck)) 1 else 0), s"custkey $ck")
    }
    assert(rows.count(_._2 == 1) > 0 && rows.count(_._2 == 0) > 0)
  }

  test("sql_subquery_not_in: complements the EXISTS partition; NULL inner empties it") {
    val out = SqlApi.sqlSubqueryNotIn(spark, sf01)
      .collect().map(_.getLong(0)).toSet
    val exists = SqlApi.sqlSubqueryExists(spark, sf01)
      .collect().map(_.getLong(0)).toSet
    val nCust = Tables.customer(spark, sf01).count()
    assert(out.nonEmpty && exists.nonEmpty)
    assert((out & exists).isEmpty, "NOT IN and EXISTS must not overlap")
    assert(out.size + exists.size === nCust.toInt,
      "with no actual inner NULLs, NOT IN == NOT EXISTS")
    // the semantics the plain anti join gets wrong: one inner NULL makes
    // every membership test UNKNOWN and the result empty
    val withNull = spark.sql("""
      SELECT c_custkey FROM customer c WHERE c_custkey NOT IN (
        SELECT CASE WHEN o.o_orderkey % 1000 = 0 THEN NULL
                    ELSE o.o_custkey END
        FROM orders o)
    """)
    assert(withNull.count() === 0L, "inner NULL must empty a NOT IN")
  }

  test("join_null_safe: NULL key groups pair up; a plain equi-join drops them") {
    import graft.ops.Relational
    val rows = Relational.joinNullSafe(spark, sf01)
      .collect()
      .map(r => ((r.getTimestamp(0).toString, r.getString(1)),
        (r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.nonEmpty)
    val nullRows = rows.filter(_._1._2 == "(null)")
    assert(nullRows.nonEmpty, "the remapped-to-NULL click group must appear")
    // the null-safe join must have MATCHED the NULL groups: at sf0.01
    // every day has clicks above the value cut, so n_big > 0 — a plain
    // equi-join would have left these at the coalesced 0
    assert(nullRows.values.exists(_._2 > 0L),
      "NULL <=> NULL must match — every n_big=0 means the join dropped them")
    // spot-check one day against a direct recompute
    val base = Tables.events(spark, sf01)
      .select(date_trunc("day", col("ts")).as("day"),
        col("event_type"), col("value"))
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getDouble(2)))
    val day0 = base.map(_._1).min
    val clicks = base.filter(e => e._1 == day0 && e._2 == "click")
    assert(rows((day0, "(null)")) ===
      ((clicks.length.toLong, clicks.count(_._3 > 100.0).toLong)))
  }

  test("funnel_time_to_convert: matches a per-user driver recompute of the anchor chain") {
    val got = Analytics.funnelTimeToConvert(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.nonEmpty)
    got.values.foreach(us => assert(us > 0L, "conversion must take time"))
    val byUser = Tables.events(spark, sf01)
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime * 1000 +
        r.getTimestamp(2).getNanos / 1000 % 1000))
      .groupBy(_._1)
    val expect = byUser.flatMap { case (uid, evs) =>
      val t1 = evs.filter(_._2 == "click").map(_._3).minOption
      val t2 = t1.flatMap(a =>
        evs.filter(e => e._2 == "view" && e._3 > a).map(_._3).minOption)
      val t3 = t2.flatMap(a =>
        evs.filter(e => e._2 == "purchase" && e._3 > a).map(_._3).minOption)
      t3.map(t => uid -> (t - t1.get))
    }
    assert(got === expect)
  }
}
