package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Analytics, LlmPipeline}

/** Round-6b operators: each declarative implementation is pinned against
  * a direct driver-side recompute on the same session.
  *  - anomaly_zscore / ts_ewma / agg_skew_kurt vs exact Scala recomputes
  *    from collected values (independent of Spark's agg/window machinery).
  *  - graph_triangle_count vs a brute-force triangle enumeration over the
  *    collected edge list.
  *  - text_pii_redact: the regexes fire on EVERY row and nothing
  *    PII-shaped survives.
  *  - corpus_interleave: stride semantics — within-source order preserved,
  *    occupancy of the first 200 proportional to weight.
  */
class Round6bSpec extends SparkSpec {

  test("anomaly_zscore: flags == direct mean/std recompute per user") {
    val flagged = Analytics.anomalyZscore(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(flagged.nonEmpty, "zero flagged rows — vacuous at sf0.01")
    assert(flagged.forall { case (_, _, z) => math.abs(z) >= 2.5 })
    // independent recompute for every user that has a flagged event
    val byUser = Tables.events(spark, sf01)
      .select(col("event_id"), col("user_id"), col("value"))
      .collect().map(r => (r.getLong(1), (r.getLong(0), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = byUser.toSeq.flatMap { case (uid, evs) =>
      val n = evs.length
      if (n < 12) Seq.empty
      else {
        val mu = evs.map(_._2).sum / n
        val sd = math.sqrt(evs.map(v => (v._2 - mu) * (v._2 - mu)).sum / (n - 1))
        if (sd <= 0) Seq.empty
        else evs.flatMap { case (eid, v) =>
          val z = math.floor((v - mu) / sd * 10000 + 0.5) / 10000
          if (math.abs(z) >= 2.5) Some((eid, uid)) else None
        }
      }
    }.toSet
    assert(flagged.map(t => (t._1, t._2)).toSet === expected,
      "flag set differs from the direct recompute")
  }

  test("ts_ewma: matches a direct per-user recompute over the last 8 values") {
    val got = Analytics.tsEwma(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got.size > 1000, s"suspiciously few ewma rows: ${got.size}")
    val evs = Tables.events(spark, sf01)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val weights = (0 until 8).map(k => math.pow(0.5, k))
    evs.values.foreach { rows =>
      val ordered = rows.sortBy(r => (r._2.getTime, r._2.getNanos, r._3))
      ordered.indices.drop(7).foreach { i =>
        val window = (0 until 8).map(k => ordered(i - k)._4)
        val raw = window.zip(weights).map { case (v, w) => v * w }
          .reduceLeft(_ + _) / 1.9921875
        val exp = math.floor(raw * 1000000 + 0.5) / 1000000
        val eid = ordered(i)._3
        assert(got.contains(eid), s"event $eid missing from ewma output")
        assert(got(eid) === exp, s"event $eid: ${got(eid)} != $exp")
      }
    }
  }

  test("graph_triangle_count: equals brute-force closure over the edge list") {
    val row = Analytics.graphTriangleCount(spark, sf01).collect().head
    val (nNodes, nEdges, nTri) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nTri > 0, "zero triangles — vacuous at sf0.01")
    // rebuild the same edge set directly and enumerate triangles
    val li = Tables.lineitem(spark, sf01)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // NB: .collect{case (e, occ) ... => e} here would rebuild a MAP (the
    // tuple-returning PF overload) and collapse edges sharing p1 — filter
    // + keySet keeps the full edge set
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keySet
    assert(nEdges === edges.size.toLong)
    assert(nNodes === edges.flatMap(e => Seq(e._1, e._2)).size.toLong)
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bruteTri = edges.toSeq.map { case (a, b) =>
      adj.getOrElse(a, Set.empty).count(c =>
        c > b && adj.getOrElse(b, Set.empty).contains(c))
    }.sum
    assert(nTri === bruteTri.toLong, s"$nTri triangles vs brute $bruteTri")
  }

  test("agg_skew_kurt: moments match a direct recompute; kurtosis sane") {
    val got = Analytics.aggSkewKurt(spark, sf01)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val byLang = Tables.documents(spark, sf01)
      .select(col("lang"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    byLang.foreach { case (lang, xs) =>
      val n = xs.length
      val mu = xs.sum / n
      def cm(p: Int) = xs.map(x => math.pow(x - mu, p)).sum / n
      val (m2, m3, m4) = (cm(2), cm(3), cm(4))
      val (skew, kurt) = (m3 / math.pow(m2, 1.5), m4 / (m2 * m2) - 3.0)
      val (gs, gk) = got(lang)
      // the op computes via power sums, the recompute via centered sums —
      // agreement within 1e-3 proves the algebra, not the bit pattern
      assert(math.abs(gs - skew) < 1e-3, s"$lang skew $gs vs $skew")
      assert(math.abs(gk - kurt) < 1e-3, s"$lang kurt $gk vs $kurt")
      assert(gk > -2.0 && gk < 10.0, s"$lang kurtosis implausible: $gk")
    }
  }

  test("text_pii_redact: both regexes fire on every row, nothing survives") {
    val rows = LlmPipeline.textPiiRedact(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nDocs = Tables.documents(spark, sf01).count()
    assert(rows.length.toLong === nDocs)
    rows.foreach { case (id, t) =>
      assert(t.contains("<EMAIL>"), s"doc $id: email not redacted")
      assert(t.contains("<PHONE>"), s"doc $id: phone not redacted")
      assert(!t.contains("@"), s"doc $id: raw email survives")
      assert(!t.contains("+1-555-"), s"doc $id: raw phone survives")
    }
    // the original text is untouched — redaction only hits the PII tail
    val orig = Tables.documents(spark, sf01)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, t) =>
      assert(t.startsWith(orig(id)), s"doc $id: document text was altered")
    }
  }

  test("corpus_interleave: within-source order kept, occupancy tracks weight") {
    val out = LlmPipeline.corpusInterleave(spark, sf01)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(out.length === 200)
    // schedule position recomputed; the result must be exactly the 200
    // smallest (pos, source, doc_id) keys over the whole corpus
    val all = Tables.documents(spark, sf01)
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.flatMap { case (src, ds) =>
        val w = src.drop(3).toInt % 3 + 1
        ds.map(_._2).sorted.zipWithIndex.map { case (id, i) =>
          ((i + 1).toDouble / w, src, id, i + 1, w)
        }
      }
    val expect = all.sortBy(t => (t._1, t._2, t._3)).take(200)
      .map(t => (t._2, t._3, t._4, t._5))
    assert(out.toSeq === expect.toSeq, "schedule differs from recompute")
    // weight-3 sources must out-occupy weight-1 sources ~3:1 in aggregate
    val byW = out.groupBy(_._4).view.mapValues(_.length).toMap
    assert(byW.getOrElse(3, 0) > byW.getOrElse(1, 0),
      s"weight-3 occupancy not dominant: $byW")
    // within each source the rn sequence is strictly increasing
    out.groupBy(_._1).values.foreach { rows =>
      val rns = rows.map(_._3).toSeq
      assert(rns == rns.sorted, "within-source order broken")
    }
  }

  test("win_streak: equals direct run-length scan per user") {
    val got = ops.Windows.winStreak(spark, sf01)
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val streams = Tables.events(spark, sf01)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val expected = streams.flatMap { case (uid, rows) =>
      val types = rows.sortBy(r => (r._2.getTime, r._2.getNanos, r._3)).map(_._4)
      // run-length encode, then per type: (longest run, run count)
      val runs = types.foldLeft(List.empty[(String, Long)]) {
        case ((t, n) :: rest, cur) if t == cur => (t, n + 1) :: rest
        case (acc, cur) => (cur, 1L) :: acc
      }
      runs.groupBy(_._1).map { case (t, rs) =>
        ((uid, t), (rs.map(_._2).max, rs.length.toLong))
      }
    }
    assert(got === expected.toMap, "streaks differ from direct scan")
  }

  test("agg_corr_exact: matches direct Pearson within 1e-9; corr in [-1,1]") {
    val got = Analytics.aggCorrExact(spark, sf01)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    val rows = Tables.lineitem(spark, sf01)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1),
        math.floor(r.getDouble(2) * 100 + 0.5) / 100))
      .groupBy(_._1)
    rows.foreach { case (flag, xs) =>
      val n = xs.length.toDouble
      val (mx, my) = (xs.map(_._2).sum / n, xs.map(_._3).sum / n)
      val cov = xs.map(t => (t._2 - mx) * (t._3 - my)).sum / (n - 1)
      val sdx = math.sqrt(xs.map(t => (t._2 - mx) * (t._2 - mx)).sum / (n - 1))
      val sdy = math.sqrt(xs.map(t => (t._3 - my) * (t._3 - my)).sum / (n - 1))
      val (gc, gv) = got(flag)
      assert(math.abs(gc) <= 1.0)
      assert(math.abs(gc - cov / (sdx * sdy)) < 1e-4, s"$flag corr")
      // op covariance is in cents·units — scale the recompute to match
      assert(math.abs(gv - cov * 100) / math.max(1.0, math.abs(cov * 100)) < 1e-4,
        s"$flag covar $gv vs ${cov * 100}")
    }
  }

  test("streaming anomaly flags == batch anomaly_zscore (static stats vs incremental feed)") {
    // the production shape: per-user mean/std are fitted on the reference
    // window (a batch job), broadcast-joined against the incoming event
    // stream, and each event gets a row-local verdict — arrival order
    // cannot change it, so the stream must admit exactly the batch flags.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // stats come from the SAME whole-partition window computation the
    // batch op uses (groupBy partial-agg would merge partial sums in a
    // different, scheduler-dependent order — ulp-level drift against the
    // batch mu/sd); first() collapses the identical per-row copies
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val stats = Tables.events(spark, sf01)
      .select(col("user_id"), col("value"))
      .withColumn("mu", avg(col("value")).over(w))
      .withColumn("sd", stddev_samp(col("value")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .where(col("n") >= 12 && col("sd") > 0)
      .groupBy(col("user_id"))
      .agg(first(col("mu")).as("mu"), first(col("sd")).as("sd"))
    val mem = MemoryStream[(Long, Long, Double)] // (event_id, user_id, value)
    val flagged = mem.toDS().toDF("event_id", "user_id", "value")
      .join(broadcast(stats), Seq("user_id"))
      .withColumn("z", graft.Det.round(
        (col("value") - col("mu")) / col("sd"), 4))
      .where(abs(col("z")) >= 2.5)
      .select(col("event_id"), col("user_id"), col("z"))
    val q = flagged.writeStream.format("memory").queryName("t_anomaly")
      .outputMode("append").start()
    val evs = Tables.events(spark, sf01)
      .select(col("event_id"), col("user_id"), col("value"))
      .as[(Long, Long, Double)].collect()
    val (b1, rest) = evs.splitAt(evs.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    Seq(b1, b2, b3).foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("t_anomaly")
    assertSameRows(
      streamed.orderBy(col("user_id"), col("event_id")),
      Analytics.anomalyZscore(spark, sf01),
      "stream-anomaly")
  }

  test("embedding_centroid: equals direct grid-snapped mean; one row per (label, dim)") {
    val got = LlmPipeline.embeddingCentroid(spark, sf01)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val vecs = Tables.embeddings(spark, sf01)
      .select(col("label"), col("embedding"))
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1)))
    val dims = vecs.head._2.length
    assert(got.size === vecs.map(_._1).distinct.length * dims)
    vecs.groupBy(_._1).foreach { case (label, vs) =>
      (0 until dims).foreach { j =>
        val snapped = vs.map(v => math.floor(v._2(j).toDouble * 1e6 + 0.5).toLong)
        val exp = math.floor(
          snapped.sum.toDouble / snapped.length / 1e6 * 1e6 + 0.5) / 1e6
        val (n, c) = got((label, j + 1))
        assert(n === snapped.length.toLong)
        assert(c === exp, s"label $label dim ${j + 1}: $c != $exp")
      }
    }
  }

  test("feature_minmax_norm: values span [0,1] with exact 0 and 1 per user") {
    val rows = Analytics.featureMinmaxNorm(spark, sf01)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, v) => v >= 0.0 && v <= 1.0 })
    rows.groupBy(_._1).foreach { case (uid, vs) =>
      val sorted = vs.map(_._2)
      assert(sorted.min === 0.0, s"user $uid: min event not normalized to 0")
      assert(sorted.max === 1.0, s"user $uid: max event not normalized to 1")
    }
  }

  test("join_asof_tolerance: subset of the unbounded as-of, same survivor, gap <= 30 min") {
    val tol = ops.Relational.joinAsofTolerance(spark, sf01)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    val unbounded = ops.Relational.joinAsof(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(tol.nonEmpty, "tolerance join vacuous at sf0.01")
    assert(tol.size < unbounded.size,
      "tolerance dropped nothing — the bound is not binding at sf0.01")
    tol.foreach { case (pid, (cid, gap)) =>
      assert(gap >= 0 && gap <= 1800, s"purchase $pid: gap $gap out of bound")
      // when the purchase survives, it must pick the SAME latest-prior
      // click the unbounded as-of picks (the bound only filters, never
      // re-ranks)
      assert(unbounded(pid) === cid, s"purchase $pid: survivor changed")
    }
  }

  test("sql_recursive_cte: WITH RECURSIVE == driver-side BFS to depth 3") {
    val got = ops.SqlApi.sqlRecursiveBfs(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // rebuild the symmetric edge set and BFS from the smallest node
    val e0 = ops.Analytics.coOrderPairs(spark, sf01)
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e0 ++ e0.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val seed = adj.keys.min
    var dist = Map(seed -> 0)
    var frontier = Set(seed)
    (1 to 3).foreach { d =>
      frontier = frontier.flatMap(adj(_)).diff(dist.keySet)
      dist ++= frontier.map(_ -> d)
      ()
    }
    assert(got === dist.map { case (k, v) => (k, v) },
      "recursive CTE disagrees with driver BFS")
  }

  test("assoc_rules: confidence/lift match a direct recompute from raw counts") {
    val got = ops.Analytics.assocRules(spark, sf01)
      .collect()
      .map(r => ((r.getLong(1), r.getLong(0)), (r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap // columns: p2, p1 order after the joins — key normalized below
    val dl = Tables.lineitem(spark, sf01)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nPart = dl.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nTotal = dl.map(_._1).distinct.length.toLong
    val pairCounts = dl.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = pairCounts.collect { case ((a, b), nab) if nab >= 2 =>
      val conf = math.floor(nab.toDouble / nPart(a) * 1e6 + 0.5) / 1e6
      val lift = math.floor(
        nTotal.toDouble * nab / (nPart(a).toDouble * nPart(b)) * 1e6 + 0.5) / 1e6
      ((a, b), (nab, conf, lift))
    }.toMap
    // normalize got's key orientation (p1 < p2 always; col order asserted)
    val gotNorm = got.map { case ((x, y), v) =>
      (if (x < y) (x, y) else (y, x)) -> v
    }
    assert(gotNorm === expected, "rules differ from the direct recompute")
    gotNorm.values.foreach { case (_, conf, lift) =>
      assert(conf > 0.0 && conf <= 1.0)
      assert(lift > 0.0)
    }
  }

  test("text_keyword_logodds: 5 ranks per lang, scores non-increasing, lang-distinctive") {
    val rows = LlmPipeline.textKeywordLogodds(spark, sf01)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(4)))
    val langs = Tables.documents(spark, sf01)
      .select(col("lang")).distinct().count()
    assert(rows.length === langs * 5)
    rows.groupBy(_._1).values.foreach { ks =>
      val byRank = ks.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1 to 5).toSeq, "rank structure broken")
      val scores = byRank.map(_._4).toSeq
      assert(scores == scores.sorted.reverse, "scores not non-increasing in rank")
      // a lang's top keyword should score strictly positive (more likely
      // in-lang than out) on this fixture's lang-skewed vocabulary
      assert(scores.head > 0.0, s"top keyword not distinctive: $byRank")
    }
  }

  test("seq_transition_matrix: rows sum to 1 per state; pair total == n_events - n_users") {
    val rows = ops.Analytics.seqTransitionMatrix(spark, sf01)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val types = Tables.events(spark, sf01)
      .select(col("event_type")).distinct().collect().map(_.getString(0)).toSet
    assert(rows.forall(r => types(r._1) && types(r._2)))
    // every adjacent pair in every user stream is counted exactly once
    val nEvents = Tables.events(spark, sf01).count()
    val nUsers = Tables.events(spark, sf01)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_._3).sum === nEvents - nUsers, "pair total")
    rows.groupBy(_._1).values.foreach { out =>
      val total = out.map(_._4).sum
      assert(math.abs(total - 1.0) < out.length * 1e-6 + 1e-9,
        s"P(next|${out.head._1}) sums to $total")
    }
  }

  test("seq_session_paths: valid segments, descending counts, top-1 dominates") {
    val rows = ops.Analytics.seqSessionPaths(spark, sf01)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length === 20)
    val counts = rows.map(_._2)
    assert(counts.toSeq == counts.sortBy(-_).toSeq, "not ranked by frequency")
    val types = Tables.events(spark, sf01)
      .select(col("event_type")).distinct().collect().map(_.getString(0)).toSet
    rows.foreach { case (path, n) =>
      val segs = path.split(">")
      assert(segs.nonEmpty && segs.length <= 5 && segs.forall(types),
        s"malformed path: $path")
      assert(n >= 1)
    }
  }

  test("text_ttr: equals direct distinct/total recompute; ratio in (0,1]") {
    val got = LlmPipeline.textTtr(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(got.length === 500)
    val texts = Tables.documents(spark, sf01)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, nTok, nUniq, ttr) =>
      val toks = texts(id).split(" ", -1)
      assert(nTok === toks.length, s"doc $id token count")
      assert(nUniq === toks.distinct.length, s"doc $id distinct count")
      assert(ttr > 0.0 && ttr <= 1.0)
      val exp = math.floor(nUniq.toDouble / nTok * 10000 + 0.5) / 10000
      assert(ttr === exp, s"doc $id ttr")
    }
  }
}
