package graft

import org.apache.spark.sql.functions._
import graft.ops.{Analytics, Govern, SqlApi}

/** Round-11c: governance audits, the learned quality classifier, the
  * neighborhood-function sketch, and GROUP/ORDER BY ALL (SURVEY §2.22). */
class Round11cSpec extends SparkSpec {

  // ------------------------------------------------------------ classifier

  /** Single-node replay of the EXACT distributed IRLS rule: same
    * left-assoc dot product, same clamp, same per-row integer-grid
    * snapping of the Hessian/score/loss terms, then the same
    * newtonStep — the snapped-sum design claims bit-identical
    * weights, so the assert is equality, not tolerance. */
  private def replayTrain(rows: Array[(Array[Double], Double)])
      : (Array[Double], Double, Double) = {
    val dDim = Govern.FeatNames.size
    val w = Array.fill(dDim)(0.0)
    var lastLoss = 0.0; var lastAcc = 0.0
    val n = rows.length
    for (_ <- 1 to Govern.Iters) {
      val h = Array.ofDim[Long](dDim, dDim)
      val g = Array.fill(dDim)(0L)
      var loss = 0L; var correct = 0L
      rows.foreach { case (x, y) =>
        var z = x(0) * w(0)
        var j = 1
        while (j < dDim) { z = z + x(j) * w(j); j += 1 }
        val p0 = 1.0 / (1.0 + math.exp(-z))
        val p = math.min(math.max(p0, 1e-12), 1.0 - 1e-12)
        val r = p * (1.0 - p)
        j = 0
        while (j < dDim) {
          var k = j
          while (k < dDim) {
            h(j)(k) += math.floor(r * x(j) * x(k) * 1e8).toLong; k += 1
          }
          g(j) += math.floor((y - p) * x(j) * 1e8).toLong
          j += 1
        }
        loss += math.floor(-(y * math.log(p) + (1.0 - y) * math.log(1.0 - p)) * 1e6).toLong
        correct += (if ((p >= 0.5) == (y >= 0.5)) 1L else 0L)
      }
      Govern.newtonStep(w, n, (j, k) => h(j)(k), j => g(j))
      lastLoss = loss.toDouble / 1e6 / n
      lastAcc = correct.toDouble / n
    }
    (w, lastLoss, lastAcc)
  }

  private def featRows(d: String): Array[(Array[Double], Double)] =
    Govern.featurize(spark, d)
      .select(col("len_norm"), col("stopword_ratio"), col("ttr"),
        col("mean_word_len"), col("queryish_ratio"), col("label"))
      .collect()
      .map(r => (Array(1.0, r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)), r.getDouble(5)))

  test("classifier_quality_train: distributed GD == single-node replay, bit-exact") {
    val (dw, dloss, dacc, dn) = Govern.trainLoop(Govern.featurize(spark, sf001))
    val rows = featRows(sf001)
    assert(dn == rows.length)
    val (rw, rloss, racc) = replayTrain(rows)
    assert(dw.toSeq == rw.toSeq, s"weights: ${dw.toSeq} vs ${rw.toSeq}")
    assert(dloss == rloss && dacc == racc, s"metrics: $dloss/$dacc vs $rloss/$racc")
  }

  test("classifier_quality_train: partitioning-invariant weights; separable labels learned") {
    val (dw, _, dacc, _) = Govern.trainLoop(Govern.featurize(spark, sf001))
    val (dw2, _, _, _) =
      Govern.trainLoop(Govern.featurize(spark, sf001).repartition(7))
    assert(dw.toSeq == dw2.toSeq, "weights depend on partitioning")
    assert(dacc >= 0.95, s"train accuracy $dacc — the rule is linear in the features")
    // the op's published artifact carries the same weights, snapped
    val out = Govern.classifierQualityTrain(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    Govern.FeatNames.zip(dw).foreach { case (f, v) =>
      assert(out(f) == math.floor(v * 1e9) / 1e9, s"weight row $f")
    }
    assert(out("final_accuracy") == math.floor(dacc * 1e9) / 1e9)
  }

  test("classifier_quality_score: sigmoid scores, consistent keep flag, high label agreement") {
    val rows = Govern.classifierQualityScore(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getDouble(1); val keep = r.getInt(2)
      assert(score >= 0.0 && score < 1.0, s"score $score outside [0,1)")
      assert(keep == (if (score >= 0.5) 1 else 0), "keep flag != 0.5 operating point")
    }
    val agree = rows.count(r => r.getInt(2) == r.getInt(3)).toDouble / rows.length
    assert(agree >= 0.95, s"keep-vs-label agreement $agree")
  }

  /** Single-node replay of the sparse hashed-feature IRLS: integer
    * sums over the collected sparse rows, same snapping, same
    * newtonStep. Per-doc z and every Hessian/score sum are LONG sums
    * of snapped terms, so accumulation order is irrelevant — equality
    * is exact. */
  private def replayHashed(
      sparse: Array[(Long, Int, Double)], labels: Map[Long, Double])
      : (Array[Double], Double, Double) = {
    val dDim = Govern.HashB + 1
    val w = Array.fill(dDim)(0.0)
    val byDoc = sparse.groupBy(_._1)
    val n = byDoc.size
    def pOf(doc: Long, rows: Array[(Long, Int, Double)]): Double = {
      val z = rows.map { case (_, b, x) =>
        math.floor(w(b) * x * 1e9).toLong }.sum / 1e9
      val p0 = 1.0 / (1.0 + math.exp(-z))
      math.min(math.max(p0, 1e-12), 1.0 - 1e-12)
    }
    for (_ <- 1 to Govern.HashedIters) {
      val h = scala.collection.mutable.Map.empty[(Int, Int), Long]
      val g = Array.fill(dDim)(0L)
      byDoc.foreach { case (doc, rows) =>
        val p = pOf(doc, rows)
        val r = p * (1.0 - p)
        val err = labels(doc) - p
        // term order mirrors the op: xab = xa·xb precomputed once,
        // then (xab * r) * 1e8
        for ((_, ja, xa) <- rows; (_, jb, xb) <- rows if ja <= jb)
          h((ja, jb)) = h.getOrElse((ja, jb), 0L) +
            math.floor(xa * xb * r * 1e8).toLong
        rows.foreach { case (_, b, x) =>
          g(b) += math.floor(err * x * 1e8).toLong }
      }
      Govern.newtonStep(w, n, (j, k) => h.getOrElse((j, k), 0L), j => g(j))
    }
    // metrics of the SHIPPED weights, matching the op
    var loss = 0L; var correct = 0L
    byDoc.foreach { case (doc, rows) =>
      val p = pOf(doc, rows)
      val y = labels(doc)
      loss += math.floor(-(y * math.log(p) + (1.0 - y) * math.log(1.0 - p)) * 1e6).toLong
      correct += (if ((p >= 0.5) == (y >= 0.5)) 1L else 0L)
    }
    (w, loss.toDouble / 1e6 / n, correct.toDouble / n)
  }

  test("classifier_hashed_train: sparse distributed IRLS == single-node replay, bit-exact") {
    val (sp, lb) = Govern.hashedFeatures(spark, sf001)
    val (dw, dloss, dacc, dn) = Govern.hashedTrainLoop(sp, lb)
    val sparse = sp.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val labels = lb.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(dn == labels.size)
    val (rw, rloss, racc) = replayHashed(sparse, labels)
    assert(dw.toSeq == rw.toSeq, "hashed weights differ from replay")
    assert(dloss == rloss && dacc == racc)
    // partitioning invariance
    val (dw2, _, _, _) = Govern.hashedTrainLoop(sp.repartition(7), lb.repartition(3))
    assert(dw.toSeq == dw2.toSeq, "weights depend on partitioning")
  }

  test("classifier_hashed_train: learns the BoW-representable rule; stopword buckets dominate") {
    val out = Govern.classifierHashedTrain(spark, sf01).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("final_accuracy") >= 0.95, s"accuracy ${out("final_accuracy")}")
    // the label is stopword-driven: the buckets 'a' and 'the' hash to
    // must carry the LARGEST positive weights of the whole table
    import org.apache.spark.sql.functions.{lit => flit}
    val bkts = spark.range(1)
      .select(
        pmod(xxhash64(flit("a")), flit(Govern.HashB.toLong)).cast("int"),
        pmod(xxhash64(flit("the")), flit(Govern.HashB.toLong)).cast("int"))
      .head()
    val swBuckets = Set(bkts.getInt(0), bkts.getInt(1)).map(b => s"bucket_$b")
    val weights = out.filter(_._1.startsWith("bucket_"))
    val top = weights.toSeq.sortBy(-_._2).take(swBuckets.size).map(_._1).toSet
    assert(top == swBuckets, s"top weights $top != stopword buckets $swBuckets")
  }

  test("corpus_perplexity_buckets: terciles partition each language, ranks respected") {
    val rows = graft.ops.LlmPipeline.corpusPerplexityBuckets(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3), r.getString(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (lang, g) =>
      val n = g.length
      val byB = g.groupBy(_._4).view.mapValues(_.length).toMap
      assert(byB.keySet.subsetOf(Set(1, 2, 3)), s"$lang buckets $byB")
      // tercile sizes within 1 of n/3 modulo ties crossing the edge:
      // ties share a bucket, so just check ordering consistency — every
      // head score >= every middle score >= every tail score
      def scores(b: Int) = g.filter(_._4 == b).map(_._3)
      if (byB.contains(1) && byB.contains(2))
        assert(scores(1).min >= scores(2).max, s"$lang head/middle overlap")
      if (byB.contains(2) && byB.contains(3))
        assert(scores(2).min >= scores(3).max, s"$lang middle/tail overlap")
      assert(math.abs(byB.getOrElse(1, 0) - n / 3.0) <= n / 3.0 * 0.5 + 2,
        s"$lang head size ${byB.getOrElse(1, 0)} of $n")
      val tiers = g.map(r => (r._4, r._5)).toSet
      tiers.foreach { case (b, t) =>
        assert(t == Seq("", "head", "middle", "tail")(b)) }
    }
  }

  test("pipeline_dedup_report: fractions consistent, units positive") {
    val rep = graft.ops.LlmPipeline.pipelineDedupReport(spark, sf01).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rep.map(_._1).toSeq ==
      Seq("cdc_chunk", "exact_doc", "near_doc_jaccard", "paragraph_seg",
        "substring_window"))
    rep.foreach { case (m, n, f, frac) =>
      assert(n > 0, s"$m units")
      assert(f >= 0 && f <= n, s"$m flagged $f of $n")
      assert(math.abs(frac - math.floor(f / n * 1e6 + 0.5) / 1e6) < 1e-12, s"$m frac")
    }
  }

  // --------------------------------------------------------------- privacy

  test("privacy_k_anonymity: classes partition the table; k flag exact") {
    val rows = Govern.privacyKAnonymity(spark, sf01).collect()
    val total = graft.io.Tables.customer(spark, sf01).count()
    assert(rows.map(_.getLong(3)).sum == total, "class sizes must partition customers")
    rows.foreach { r =>
      assert(r.getInt(4) == (if (r.getLong(3) >= 5) 1 else 0))
    }
  }

  test("privacy_l_diversity: exact recompute (l, entropy) per QI class") {
    val got = Govern.privacyLDiversity(spark, sf01).collect()
      .map(r => ((r.getInt(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val cust = graft.io.Tables.customer(spark, sf01)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("bigint").as("band"))
      .collect()
      .map(r => ((r.getInt(0), r.getString(1)), r.getLong(2)))
    val expect = cust.groupBy(_._1).map { case (k, g) =>
      val size = g.length.toLong
      val bands = g.groupBy(_._2).map(_._2.length.toLong)
      val ent = bands.toSeq.map { c =>
        val p = c.toDouble / size.toDouble
        math.floor(-(p * math.log(p)) * 1e6 + 0.5).toLong
      }.sum.toDouble / 1e6
      k -> ((size, bands.size.toLong, ent))
    }
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, v) =>
      assert(got(k) == v, s"class $k: ${got(k)} vs $v")
      assert(v._2 <= v._1, "l cannot exceed class size")
      assert((v._3 == 0.0) == (v._2 == 1L), "entropy 0 iff single band")
    }
  }

  test("privacy_dp_noisy_count: key-derived Laplace — reproducible, sf-invariant per key, sane") {
    val a = Govern.privacyDpNoisyCount(spark, sf001).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val b = Govern.privacyDpNoisyCount(spark, sf01).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val common = a.keySet.intersect(b.keySet)
    assert(common.size >= 100, s"only ${common.size} shared (type, day) cells")
    // noise is a function of the slice KEY alone — identical across
    // corpora (and runs); the true counts underneath differ
    common.foreach(k => assert(a(k)._2 == b(k)._2, s"noise differs at $k"))
    assert(common.exists(k => a(k)._1 != b(k)._1), "true counts should differ")
    // released = max(0, round(true + noise)) (noise printed at 1e-6:
    // re-derive within grid tolerance)
    b.values.foreach { case (t, noise, rel) =>
      val cand = math.max(0L, math.floor(t + noise + 0.5).toLong)
      assert(math.abs(rel - cand) <= 1, s"release $rel vs $cand (t=$t, n=$noise)")
    }
    val noises = b.values.map(_._2).toSeq
    val absMed = noises.map(math.abs).sorted.apply(noises.size / 2)
    assert(absMed > 0.1 && absMed < 2.5, s"median |noise| $absMed vs b·ln2 ≈ 0.69")
    val negFrac = noises.count(_ < 0).toDouble / noises.size
    assert(negFrac > 0.2 && negFrac < 0.8, s"sign skew $negFrac")
    assert(noises.distinct.size > noises.size / 2, "noise values suspiciously repeated")
  }

  test("stream_privacy_dp: day-window release == privacy_dp_noisy_count on the shared keys") {
    // same key-derived noise chain ⇒ the streaming form's maintained
    // table reads out to the SAME release the batch audit publishes
    val st = graft.ops.Govern.streamPrivacyDp(spark, sf01).collect()
      .map(r => ((r.getString(1), r.getTimestamp(0).toString.take(10)),
        (r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val ba = graft.ops.Govern.privacyDpNoisyCount(spark, sf01).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(st.keySet == ba.keySet, "day-window keys must match the date grid")
    st.foreach { case (k, v) => assert(ba(k) == v, s"release differs at $k") }
  }

  test("pipeline_privacy_report: composition consistent with its two audits") {
    val rep = graft.ops.Govern.pipelinePrivacyReport(spark, sf01).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    val segs = rep.keys.map(_._2).toSet
    assert(segs.size == 5, s"expected 5 segments, got $segs")
    segs.foreach { s0 =>
      assert(rep(("kanon_violation_classes", s0)) <= rep(("kanon_total_classes", s0)))
      assert(rep(("kanon_min_class", s0)) >= 1.0)
      assert(rep(("ldiv_min_l", s0)) >= 1.0)
      assert(rep(("ldiv_min_entropy", s0)) >= 0.0)
    }
  }

  // ----------------------------------------------------------------- graph

  test("graph_neighborhood: exact BFS parity on the fixture graph") {
    val edges = Analytics.coOrderPairs(spark, sf001)
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select(col("p1"), col("p2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
    edges.foreach { case (u, v) =>
      adj(u) = v :: adj.getOrElse(u, Nil)
      adj(v) = u :: adj.getOrElse(v, Nil)
    }
    val nodes = adj.keys.toVector
    val nt = Array.fill(5)(0L)
    nodes.foreach { s0 =>
      var seen = Set(s0); var frontier = Set(s0)
      nt(0) += 1
      for (t <- 1 to 4) {
        frontier = frontier.flatMap(adj(_)).diff(seen)
        seen ++= frontier
        nt(t) += seen.size
      }
    }
    val got = Analytics.graphNeighborhood(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(4))).sortBy(_._1)
    assert(got.map(_._1).toSeq == (0 to 4), "one row per horizon")
    got.foreach { case (t, pairs, _) =>
      assert(pairs == nt(t), s"N($t): $pairs vs ${nt(t)}")
    }
    val horizon = nt(4).toDouble
    val effT = (0 to 4).find(nt(_) >= 0.9 * horizon).get
    got.foreach { case (t, _, flag) =>
      assert(flag == (if (t == effT) 1 else 0), s"eff-diameter flag at t=$t")
    }
  }

  test("graph_neighborhood_hll: 64-register estimate within ±25% of the exact bitset N(t)") {
    val exact = Analytics.graphNeighborhood(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val est = Analytics.graphNeighborhoodHll(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (t, n) =>
      val rel = est(t) / n
      assert(rel > 0.75 && rel < 1.25, s"t=$t est ${est(t)} vs exact $n (rel $rel)")
    }
    // registers only grow ⇒ the estimate is (near-)monotone in t
    (0 until 4).foreach { t =>
      assert(est(t + 1) >= est(t) * 0.98, s"estimate dropped at t=$t")
    }
    // deterministic: an approximation, but a bit-reproducible one
    val est2 = Analytics.graphNeighborhoodHll(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(est2 == est, "HLL estimate must be run-reproducible")
  }

  test("neighborhood kernel: star-graph analytic values, saturation early-exit") {
    import spark.implicits._
    val k = 50L
    val e = (1L to k).map(i => (0L, i)).toDF("src", "dst")
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val counts = Analytics.neighborhoodCounts(und, 4)
    // N(0)=k+1, N(1)=center k+1 + k leaves·2 = 3k+1, N(2)=(k+1)² — then
    // saturated: the loop runs ONE more confirming round and stops
    assert(counts == Vector(k + 1, 3 * k + 1, (k + 1) * (k + 1), (k + 1) * (k + 1)),
      s"star counts: $counts")
  }

  // ------------------------------------------------------------------- sql

  test("sql_group_by_all: GROUP BY ALL / ORDER BY ALL == explicit spelling") {
    val sugar = SqlApi.sqlGroupByAll(spark, sf001)
    val explicit = graft.io.Tables.events(spark, sf001)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + 0.5).cast("bigint")).as("cents"))
      .orderBy(col("event_type"), col("day"))
    assertSameRows(sugar, explicit, "group-by-all")
  }
}
