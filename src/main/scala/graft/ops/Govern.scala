package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Det.round
import graft.io.Tables

/** Round-11c governance + learned-curation operators (SURVEY.md §2.22).
  *
  * Two capability axes a production training-data feed needs beyond the
  * statistical monitors:
  *
  * 1. PRIVACY AUDITING — before a corpus ships, the pipeline answers
  *    "can rows be re-identified?" (k-anonymity over quasi-identifier
  *    classes), "do small classes leak the sensitive attribute?"
  *    (l-diversity / entropy-l), and "what can we publish?" (a
  *    differentially-private noisy release of the per-slice counts).
  *    The first two are plain grouped aggregation — oracle-gated with
  *    exact integer counts and the drift_js snapped-ln recipe for the
  *    entropy terms. The DP release derives its Laplace noise from
  *    xxhash64 of the slice key (deterministic, reproducible, and
  *    engine-specific — so that op is spec-pinned, not oracle-gated).
  *
  * 2. CLASSIFIER-BASED QUALITY CURATION — the FineWeb-Edu / CCNet
  *    shape: train a linear quality classifier ON the cluster (one
  *    partial-aggregable Newton aggregate — Hessian + score sums —
  *    per iteration, never a row collect), then score every document
  *    map-side with the broadcast-weight sigmoid. Training is
  *    bit-deterministic: every per-row Hessian/score/loss term snaps
  *    to a fixed integer grid before
  *    the sum, so the aggregated gradient is an order-independent
  *    integer — the same trick the drift family uses — and a plain
  *    single-node replay of the same updates reproduces the weights
  *    exactly (pinned in Round11cSpec).
  *
  * Scale: k-anonymity/l-diversity shuffle (qi, count) pairs bounded by
  * the QI-domain product, never rows. DP release is bounded by the
  * slice domain. Classifier training moves d+1 longs per iteration to
  * the driver (whitelisted, dimension-bounded); scoring is one
  * map-side pass with the 6 weights inlined as literals.
  */
object Govern {

  // ---------------------------------------------------------------- privacy

  /** k-anonymity audit over the customer quasi-identifier class
    * (nation, market segment, account-balance band): per equivalence
    * class its size and whether it meets k=5 — the table a privacy
    * review reads to find re-identifiable rows. Exact integer counts;
    * oracle-gated. Scale: shuffle carries one row per occupied QI
    * class (≤ |nation|·|segment|·|band| = 25·5·11, corpus-size
    * independent). */
  def privacyKAnonymity(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_nationkey").as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        floor(col("c_acctbal") / 1000).cast("bigint").as("acctbal_band"))
      .groupBy(col("nationkey"), col("mktsegment"), col("acctbal_band"))
      .agg(count(lit(1)).as("class_size"))
      .withColumn("meets_k5", (col("class_size") >= 5).cast("int"))
      .orderBy(col("nationkey"), col("mktsegment"), col("acctbal_band"))

  /** l-diversity of the sensitive attribute (account-balance band)
    * within each coarse QI class (nation, segment): distinct-l plus
    * entropy-l's exponent H = Σ −p·ln p — a class where everyone
    * shares one band leaks the attribute even at k≥5. Counts are
    * exact integers; each entropy term snaps to the 1e-6 grid before
    * the per-class sum (drift_js recipe) so the double accumulation
    * is order-independent and the DuckDB twin reproduces it exactly.
    * Scale: two stacked bounded groupBys — (qi, band) then qi. */
  def privacyLDiversity(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.customer(s, d)
      .select(
        col("c_nationkey").as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        floor(col("c_acctbal") / 1000).cast("bigint").as("band"))
      .groupBy(col("nationkey"), col("mktsegment"), col("band"))
      .agg(count(lit(1)).as("cnt"))
    val size = sum(col("cnt")).over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("nationkey"), col("mktsegment")))
    val p = col("cnt").cast("double") / col("class_size").cast("double")
    cells
      .withColumn("class_size", size)
      .withColumn("ent_term",
        floor(-(p * log(p)) * 1e6 + 0.5).cast("bigint"))
      .groupBy(col("nationkey"), col("mktsegment"), col("class_size"))
      .agg(
        count(lit(1)).as("l_distinct"),
        (sum(col("ent_term")) / 1e6).as("entropy_l"))
      .select(col("nationkey"), col("mktsegment"), col("class_size"),
        col("l_distinct"), col("entropy_l"))
      .orderBy(col("nationkey"), col("mktsegment"))
  }

  /** Query key `privacy_t_closeness`: the third audit of the governance
    * triad (k-anonymity → l-diversity → t-closeness): per coarse QI
    * class (nation, segment), the Wasserstein-1 distance between the
    * class's sensitive-attribute distribution (acctbal band — an ORDERED
    * attribute, which is exactly the case l-diversity mishandles and
    * t-closeness was introduced for) and the GLOBAL distribution.
    * Exact-integer EMD (the drift_emd recipe): on the global band grid,
    * W1 = Σ |cum_class·N − cum_global·n_c| · gap, an integer sum whose
    * products stay far inside 2^53 at gated SFs, with ONE divide by
    * (n_c·N) at the end and a second normalization by the band span for
    * the [0,1] t the threshold compares against (t ≤ 0.2 flag).
    *
    * Scale: the class × band frame is the QI-domain × band-domain grid
    * (≤ 25·5·11 rows at ANY corpus size); the only corpus-sized work is
    * the two bounded groupBys that build it. */
  def privacyTCloseness(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val bands = Tables.customer(s, d)
      .select(
        col("c_nationkey").as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        floor(col("c_acctbal") / 1000).cast("bigint").as("band"))
    val cells = bands
      .groupBy(col("nationkey"), col("mktsegment"), col("band"))
      .agg(count(lit(1)).as("cnt"))
    val global = bands.groupBy(col("band")).agg(count(lit(1)).as("gcnt"))
    // every class × every global band (absent cells count 0), so the
    // cumulative walks of class and global share one ordered grid
    val classes = cells.groupBy(col("nationkey"), col("mktsegment"))
      .agg(sum(col("cnt")).as("n_c"))
    val grid = classes.crossJoin(broadcast(global))
      .join(cells, Seq("nationkey", "mktsegment", "band"), "left_outer")
      .na.fill(0L, Seq("cnt"))
    val byClass = w.partitionBy(col("nationkey"), col("mktsegment"))
      .orderBy(col("band"))
    val scored = grid
      .withColumn("cum_c", sum(col("cnt")).over(byClass))
      .withColumn("cum_g", sum(col("gcnt")).over(byClass))
      .withColumn("nn", sum(col("gcnt")).over(
        w.partitionBy(col("nationkey"), col("mktsegment"))))
      .withColumn("gap", coalesce(lead(col("band"), 1).over(byClass) -
        col("band"), lit(0L)))
      .withColumn("term",
        abs(col("cum_c") * col("nn") - col("cum_g") * col("n_c")) * col("gap"))
    val span = max(col("band")).over(
      w.partitionBy(col("nationkey"), col("mktsegment"))) -
      min(col("band")).over(w.partitionBy(col("nationkey"), col("mktsegment")))
    scored
      .withColumn("span", span)
      .groupBy(col("nationkey"), col("mktsegment"), col("n_c"),
        col("nn"), col("span"))
      .agg(sum(col("term")).as("raw"))
      .select(col("nationkey"), col("mktsegment"), col("n_c").as("class_size"),
        (floor(col("raw").cast("double") /
          (col("n_c") * col("nn")).cast("double") * 1e6 + 0.5) / 1e6)
          .as("emd_bands"),
        (floor(col("raw").cast("double") /
          (col("n_c") * col("nn") * col("span")).cast("double") * 1e6 + 0.5)
          / 1e6).as("t"))
      .withColumn("meets_t02", (col("t") <= 0.2).cast("int"))
      .orderBy(col("nationkey"), col("mktsegment"))
  }

  /** Differentially-private release of the per-(event_type, day) event
    * counts: true count + Laplace(Δ/ε) noise with ε=1 and sensitivity
    * Δ=1 (one event changes one cell by one), plus the max(0, rounded)
    * published value. The noise is DERIVED, not sampled: u ∈ (0,1)
    * comes from the low 52 bits of xxhash64(type, day, seed) (the
    * engine's codegen'd hash — reproducible across runs, partitions,
    * and plans), inverted through the Laplace CDF
    * noise = −b·sgn(u−½)·ln(1−2|u−½|). Deterministic by construction,
    * engine-specific by construction — spec-pinned (Round11cSpec),
    * not oracle-gated.
    *
    * Scale: one partial-aggregable groupBy to the (type, day) grid
    * (|types|·|days| rows); the noise math is a map over that bounded
    * grid. */
  def privacyDpNoisyCount(s: SparkSession, d: String): DataFrame = {
    val grid = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("true_count"))
    grid
      .withColumn("noise0",
        laplaceNoise(col("event_type"), col("day").cast("string"), 1.0))
      .withColumn("released",
        greatest(lit(0L),
          floor(col("true_count") + col("noise0") + 0.5).cast("bigint")))
      .select(col("event_type"), col("day"), col("true_count"),
        round(col("noise0"), 6).as("noise"), col("released"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Query key `privacy_dp_topk`: differentially private top-k — the
    * report-noisy-max mechanism generalized to k = 3: each day's top
    * event types ranked by the SAME keyed Laplace release
    * [[privacyDpNoisyCount]] publishes (ranking on independently-noised
    * counts IS the repeated noisy-max release; privacy follows from the
    * counts' own DP by post-processing — no fresh budget is spent on
    * the ranking). Deterministic end-to-end: the noise is key-derived
    * (the family's no-RNG recipe), ties break by type. The rank window
    * partitions by day over the (days × types) released grid — the
    * bounded-histogram shape, never the fact table.
    *
    * Pins: equals a driver recompute from privacy_dp_noisy_count's own
    * output; k-monotonicity (top-2 is a prefix of top-3) (Round13Spec). */
  def privacyDpTopk(s: SparkSession, d: String): DataFrame = {
    val noisy = privacyDpNoisyCount(s, d)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("day"))
      .orderBy(col("released").desc, col("event_type").asc)
    noisy.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= 3)
      .select(col("day"), col("rank"), col("event_type"), col("released"))
      .orderBy(col("day"), col("rank"))
  }

  /** Key-derived Laplace(b) noise from (event_type, day-string) — the
    * shared chain of [[privacyDpNoisyCount]] and the streaming release:
    * u ∈ (0,1) from the low 52 bits of xxhash64(type, day, 42), then
    * the Laplace CDF inversion. Same key columns ⇒ same noise in every
    * form, which is what makes the stream == batch pin exact. */
  private def laplaceNoise(eventType: Column, dayStr: Column, b: Double): Column = {
    val u = (xxhash64(eventType, dayStr, lit(42L))
      .bitwiseAND(lit((1L << 52) - 1)).cast("double") + 0.5) / math.pow(2, 52)
    -lit(b) * signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))
  }

  /** The streamable half of the DP release: per (day window, type) true
    * counts — a plain watermark-evictable streaming aggregation (state
    * bounded by days-in-horizon × |types|). Shared verbatim by the
    * batch key and the StreamingParitySpec replay. */
  private[graft] def dpCountsTransform(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("true_count"))
      .select(col("w.start").as("day_start"), col("event_type"),
        col("true_count"))

  /** The map-side readout over the maintained count table: attach the
    * key-derived noise and the max(0, rounded) release. Pure column
    * transforms — runs identically on the streaming sink table and the
    * batch twin. */
  private[graft] def dpReleaseReadout(counts: DataFrame): DataFrame = {
    val noise = laplaceNoise(
      col("event_type"), to_date(col("day_start")).cast("string"), 1.0)
    counts
      .withColumn("noise0", noise)
      .withColumn("released",
        greatest(lit(0L),
          floor(col("true_count") + col("noise0") + 0.5).cast("bigint")))
      .select(col("day_start"), col("event_type"), col("true_count"),
        round(col("noise0"), 6).as("noise"), col("released"))
      .orderBy(col("day_start"), col("event_type"))
  }

  /** The DP release AS A STREAM (the governance twin of
    * stream_drift_psi): the stream maintains watermark-evictable
    * per-(day, type) counts; the readout attaches the key-derived
    * Laplace noise and publishes max(0, round(count + noise)) — a
    * privacy-budgeted daily dashboard that never re-reads history.
    * Because the noise is a function of the slice KEY, the streamed
    * release equals the batch release row-for-row (StreamingParitySpec,
    * both state-store backends) and equals [[privacyDpNoisyCount]]'s
    * release on the shared (type, date) keys (Round11cSpec).
    * Spec-pinned (✗): noise is engine-hash-derived. */
  def streamPrivacyDp(s: SparkSession, d: String): DataFrame =
    dpReleaseReadout(dpCountsTransform(Tables.events(s, d)))

  /** The composed privacy-review REPORT — the uniform (metric, key,
    * value) table a scheduled governance job publishes next to the
    * corpus: per market segment the worst k-anonymity class, the
    * violating/total class counts, and the worst l-diversity (min-l and
    * min-entropy). Pure plan-level aggregation over the two gated
    * audits; the ORACLE composes the same two DuckDB bodies verbatim,
    * so the composition itself is hash-gated (pipeline_drift_report's
    * recipe). */
  def pipelinePrivacyReport(s: SparkSession, d: String): DataFrame = {
    val k = privacyKAnonymity(s, d)
      .groupBy(col("mktsegment").as("key"))
      .agg(
        min(col("class_size")).cast("double").as("kanon_min_class"),
        sum((col("class_size") < 5).cast("bigint")).cast("double")
          .as("kanon_violation_classes"),
        count(lit(1)).cast("double").as("kanon_total_classes"))
    val l = privacyLDiversity(s, d)
      .groupBy(col("mktsegment").as("key"))
      .agg(
        min(col("l_distinct")).cast("double").as("ldiv_min_l"),
        min(col("entropy_l")).as("ldiv_min_entropy"))
    val t = privacyTCloseness(s, d)
      .groupBy(col("mktsegment").as("key"))
      .agg(max(col("t")).as("tclose_max_t"))
    def shaped(src: DataFrame, metric: String): DataFrame =
      src.select(lit(metric).as("metric"), col("key"),
        col(metric).as("value"))
    shaped(k, "kanon_min_class")
      .unionAll(shaped(k, "kanon_violation_classes"))
      .unionAll(shaped(k, "kanon_total_classes"))
      .unionAll(shaped(l, "ldiv_min_l"))
      .unionAll(shaped(l, "ldiv_min_entropy"))
      .unionAll(shaped(t, "tclose_max_t"))
      .orderBy(col("metric"), col("key"))
  }

  // ------------------------------------------------- learned quality filter

  /** Feature names, aligned with [[featurize]]'s column order. Index 0
    * is the bias. */
  private[graft] val FeatNames: Seq[String] =
    Seq("bias", "len_norm", "stopword_ratio", "ttr", "mean_word_len", "queryish_ratio")

  /** Newton (IRLS) rounds / ridge of the trainer. Fixed so the trained
    * weights are part of the operator's contract. IRLS because the
    * fixture labels are a median-threshold rule — the hardest possible
    * margin — where first-order GD needs ~10³ rounds (measured 0.82
    * accuracy at 60); Newton reaches 0.98 in 12. Each round is still
    * ONE partial-aggregable aggregate (d² Hessian + d gradient sums),
    * so the distributed shape is unchanged — just d² sums instead
    * of d. */
  private[graft] val Iters = 12
  private[graft] val Ridge = 1e-4

  /** Newton rounds of the HASHED trainer — 8, not [[Iters]]: the sparse
    * form pays ~5 stages per round, and measured accuracy at 8 rounds
    * is 0.97–0.99 across SFs (vs 0.97–0.99 at 12) — the extra rounds
    * buy nothing the 0.95 pin can see. */
  private[graft] val HashedIters = 8

  /** Deterministic per-document features + the synthetic label.
    * Each feature snaps to the 1e-6 grid (floor(x·1e6)/1e6) so any
    * replay sees bit-identical doubles. The label is a FIXED linear
    * rule over two of the features (4·stopword_ratio + ttr > 0.705 —
    * the fixture median of that combination), i.e. the training data
    * is linearly separable and a correct trainer must push accuracy
    * toward 1; the rule plays the role of the human quality labels a
    * production filter is trained on. */
  private[graft] def featurize(s: SparkSession, d: String): DataFrame = {
    def snap(c: Column): Column = floor(c * 1e6) / 1e6
    val ws = split(col("text"), " ")
    val nt = size(ws).cast("double")
    val sw = size(filter(ws, w => w.isin("a", "the"))).cast("double") / nt
    val ttr = size(array_distinct(ws)).cast("double") / nt
    val mwl = (col("n_chars").cast("double") - (nt - 1)) / nt / 10.0
    val qr = size(filter(ws, w => w.isin("scan", "table", "query"))).cast("double") / nt
    Tables.documents(s, d).select(
      col("doc_id"),
      snap(least(col("n_chars"), lit(600)).cast("double") / 600.0).as("len_norm"),
      snap(sw).as("stopword_ratio"),
      snap(ttr).as("ttr"),
      snap(mwl).as("mean_word_len"),
      snap(qr).as("queryish_ratio"),
      (lit(4.0) * snap(sw) + snap(ttr) > 0.705).cast("double").as("label"))
  }

  /** One IRLS iteration's aggregate row: n, the d(d+1)/2 snapped-integer
    * Hessian sums Σ r·xⱼ·xₖ (r = p(1−p)), the d snapped-integer score
    * sums Σ (y−p)·xⱼ, the snapped log-loss sum, and the correct-count.
    * Every per-row term floors onto an integer grid BEFORE the sum, so
    * the aggregate is order-independent — the whole reason a replay
    * can be bit-exact. */
  /** One IRLS iteration's sums as a single long array, laid out
    * [d(d+1)/2 Hessian | d score | n | loss | correct]. Computed by a
    * per-partition typed fold whose weights live in the CLOSURE (r17):
    * the r16 declarative aggregate embedded the round's weights as
    * LITERALS, so every Newton round generated different codegen source
    * and paid a fresh Janino compile — 12 compiles of a 30-aggregate
    * class were most of the key's wall time at sf0.1 (2.7 s wall over
    * 1.6 s of executor work). The per-row arithmetic below replays the
    * old aggregate's expression tree term by term, left-associated, on
    * the same grid (SQL floor(double) IS math.floor(x).toLong; exp/log
    * ARE Math.exp/Math.log), and per-partition exact-integer partials
    * merge on the driver — order-free, so the Round11cSpec replay and
    * repartition-invariance pins hold unchanged. The collect is
    * P·(d(d+1)/2 + d + 3) longs — dimension-bounded metadata, the
    * hessianScoreReadout adjudication. */
  private def newtonReadout(
      feats: org.apache.spark.sql.Dataset[
        (Long, Double, Double, Double, Double, Double, Double)],
      w: Array[Double]): Array[Long] = {
    val s = feats.sparkSession
    import s.implicits._
    val dDim = w.length
    val tri = dDim * (dDim + 1) / 2
    val wv = w.clone()
    val parts = feats.mapPartitions { it =>
      val acc = new Array[Long](tri + dDim + 3)
      val xs = new Array[Double](6)
      it.foreach { case (_, x1, x2, x3, x4, x5, label) =>
        xs(0) = 1.0; xs(1) = x1; xs(2) = x2; xs(3) = x3; xs(4) = x4
        xs(5) = x5
        var z = xs(0) * wv(0)
        var j = 1
        while (j < dDim) { z += xs(j) * wv(j); j += 1 }
        val p = math.min(math.max(1.0 / (1.0 + math.exp(-z)), 1e-12),
          1.0 - 1e-12)
        val r = p * (1.0 - p)
        var idx = 0
        j = 0
        while (j < dDim) {
          var k = j
          while (k < dDim) {
            acc(idx) += math.floor(r * xs(j) * xs(k) * 1e8).toLong
            idx += 1
            k += 1
          }
          acc(tri + j) += math.floor((label - p) * xs(j) * 1e8).toLong
          j += 1
        }
        acc(tri + dDim) += 1L
        acc(tri + dDim + 1) += math.floor(
          -(label * math.log(p) + (1.0 - label) * math.log(1.0 - p)) * 1e6)
          .toLong
        if ((p >= 0.5) == (label >= 0.5)) acc(tri + dDim + 2) += 1L
      }
      Iterator.single(acc)
    }.collect()
    val total = new Array[Long](tri + dDim + 3)
    parts.foreach { a =>
      var i = 0
      while (i < a.length) { total(i) += a(i); i += 1 }
    }
    total
  }

  /** Gaussian elimination with partial pivoting on the (dense, tiny)
    * d×d normal system — a fixed IEEE op sequence on inputs that are
    * themselves exact integer-grid sums, so the solve is deterministic
    * everywhere it runs. Shared by the operator and the spec replay. */
  private[graft] def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val nDim = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    for (c <- 0 until nDim) {
      var piv = c
      for (rr <- c + 1 until nDim) if (math.abs(a(rr)(c)) > math.abs(a(piv)(c))) piv = rr
      if (piv != c) { val t = a(c); a(c) = a(piv); a(piv) = t
        val tb = b(c); b(c) = b(piv); b(piv) = tb }
      for (rr <- c + 1 until nDim) {
        val f = a(rr)(c) / a(c)(c)
        for (cc <- c until nDim) a(rr)(cc) -= f * a(c)(cc)
        b(rr) -= f * b(c)
      }
    }
    val x = new Array[Double](nDim)
    for (c <- nDim - 1 to 0 by -1) {
      var s = b(c)
      for (cc <- c + 1 until nDim) s -= a(c)(cc) * x(cc)
      x(c) = s / a(c)(c)
    }
    x
  }

  /** One driver-side Newton update from an aggregate row: rebuild
    * H/n + λI and g/n from the snapped sums, solve, add. Shared by the
    * operator and the spec replay (the replay's claim is that its
    * LOCAL sums equal the distributed ones bit-for-bit; everything
    * after the sums is this same code). */
  private[graft] def newtonStep(
      w: Array[Double], n: Long,
      hSum: (Int, Int) => Long, gSum: Int => Long): Unit = {
    val dDim = w.length
    val h = Array.ofDim[Double](dDim, dDim)
    for (j <- 0 until dDim; k <- j until dDim) {
      val v = hSum(j, k).toDouble / 1e8 / n
      h(j)(k) = v; h(k)(j) = v
    }
    for (j <- 0 until dDim) h(j)(j) += Ridge
    val g = Array.tabulate(dDim)(j => gSum(j).toDouble / 1e8 / n)
    val step = solve(h, g)
    for (j <- 0 until dDim) w(j) += step(j)
  }

  /** In-session weights memo — read by the SCORE op only (a production
    * filter ships trained weights; scoring must not retrain). The
    * TRAIN op never reads it: corpus_bpe_train's round-10 lesson — a
    * memoized train op makes any min-of-N measurement time a cache
    * hit instead of the training loop it claims to measure. */
  private val cfCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Double], Double, Double, Long)]()
  private[graft] def trainedWeights(
      s: SparkSession, d: String): (Array[Double], Double, Double, Long) =
    cfCache.computeIfAbsent(s.hashCode() + "|" + d,
      _ => trainLoop(featurize(s, d)))

  /** The IRLS loop proper, over any featurized frame — one job per
    * iteration: a single partial-aggregable aggregate whose result is
    * d(d+1)/2 + d + 3 longs (the distributed-Newton shape; the
    * one-row head() is metadata-sized). Factored out so the spec can
    * run it under an adversarial repartition and against a
    * single-node replay. */
  private[graft] def trainLoop(
      featurized: DataFrame): (Array[Double], Double, Double, Long) = {
    val s = featurized.sparkSession
    import s.implicits._
    val feats = featurized
      .select(col("doc_id"), col("len_norm"), col("stopword_ratio"),
        col("ttr"), col("mean_word_len"), col("queryish_ratio"),
        col("label"))
      .as[(Long, Double, Double, Double, Double, Double, Double)]
      .cache()
    try {
      val dDim = FeatNames.size
      val tri = dDim * (dDim + 1) / 2
      val w = Array.fill(dDim)(0.0)
      var lastLoss = 0.0; var lastAcc = 0.0; var n = 0L
      for (_ <- 1 to Iters) {
        val t = newtonReadout(feats, w)
        n = t(tri + dDim)
        newtonStep(w, n,
          (j, k) => t(j * dDim - j * (j - 1) / 2 + (k - j)),
          j => t(tri + j))
        lastLoss = t(tri + dDim + 1).toDouble / 1e6 / n
        lastAcc = t(tri + dDim + 2).toDouble / n
      }
      (w, lastLoss, lastAcc, n)
    } finally feats.unpersist()
  }

  /** Distributed training of the linear quality classifier
    * (full-batch logistic regression by ridge-damped IRLS/Newton,
    * [[Iters]] rounds, [[Ridge]] fixed): emits
    * the weight table plus final-loss / final-accuracy metric rows —
    * the artifact a curation run publishes next to the corpus. The
    * gradient aggregate snaps every per-row term to an integer grid,
    * so training is bit-deterministic under any partitioning, and a
    * single-node replay of the same update rule reproduces the
    * weights exactly (both pinned). Spec-pinned (✗): no oracle could
    * train. */
  def classifierQualityTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // ALWAYS run the Newton loop (the op's benchmarked cost IS
    // training); refresh the memo so the score op reuses this result
    val (w, loss, acc, n) = trainLoop(featurize(s, d))
    cfCache.put(s.hashCode() + "|" + d, (w, loss, acc, n))
    val rows = FeatNames.zip(w).map { case (f, v) =>
      (f, math.floor(v * 1e9) / 1e9)
    } ++ Seq(("final_loss", math.floor(loss * 1e9) / 1e9),
      ("final_accuracy", math.floor(acc * 1e9) / 1e9),
      ("n_docs", n.toDouble))
    rows.toDF("term", "value")
  }

  // ---------------------------------------------- feature-hashing trainer

  /** Bucket count of the hashing-trick feature space (bias rides as
    * bucket index [[HashB]]). */
  private[graft] val HashB = 64

  /** Sparse hashed features: explode words, hash each word onto one of
    * [[HashB]] buckets with the engine's xxhash64 (collisions merge
    * counts — the feature-hashing contract), normalize by document
    * length, snap to the 1e-6 grid; plus a bias row (x = 1) per
    * document. The label is the BoW-REPRESENTABLE fixture rule
    * stopword_ratio > 0.0584 (the fixture median): a hashed
    * bag-of-words model can express it exactly (the [[featurize]]
    * rule's TTR term is outside any linear BoW hypothesis class — a
    * documented ceiling, not a trainer defect), so a correct trainer
    * must push accuracy toward 1 here too. */
  private[graft] def hashedFeatures(s: SparkSession, d: String): (DataFrame, DataFrame) =
    hashedFeaturesB(s, d, HashB)

  /** [[hashedFeatures]] at a caller-chosen bucket count — the bias rides
    * as bucket index `b` (so the weight dimension is b + 1). */
  private[graft] def hashedFeaturesB(
      s: SparkSession, d: String, b: Int): (DataFrame, DataFrame) = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val labels = docs.select(col("doc_id"),
      (floor(size(filter(col("ws"), w => w.isin("a", "the"))).cast("double") /
        size(col("ws")).cast("double") * 1e6) / 1e6 > 0.0584)
        .cast("double").as("label"))
    val sparse = docs
      .select(col("doc_id"), size(col("ws")).cast("double").as("nt"),
        explode(col("ws")).as("w"))
      .groupBy(col("doc_id"), col("nt"),
        pmod(xxhash64(col("w")), lit(b.toLong)).cast("int").as("bucket"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .select(col("doc_id"), col("bucket"),
        (floor(col("cnt") / col("nt") * 1e6) / 1e6).as("x"))
    val withBias = sparse.unionAll(
      docs.select(col("doc_id"), lit(b).as("bucket"), lit(1.0).as("x")))
    (withBias, labels)
  }

  /** IRLS over the SPARSE hashed features — the distributed-Newton
    * shape re-expressed relationally because d = 65 weight columns no
    * longer fit one aggregate row: per round (1) the margin z joins the
    * 65-row weight table to the sparse rows and sums 1e-9-snapped
    * integer terms per document, (2) the Hessian Σ r·xⱼ·xₖ comes from a
    * doc-keyed self-join of the sparse rows (j ≤ k) aggregated by
    * bucket pair — ≤ d(d+1)/2 output rows, input Σ nnz² per doc (nnz
    * bounded by document length; past d ≈ 10³ the production swap is
    * first-order GD/L-BFGS on the same sparse frame, documented), and
    * (3) the score vector aggregates by single bucket. Every per-row
    * term snaps to an integer grid before its sum, so the whole round
    * is order-independent and a single-node replay is bit-exact
    * (Round11cSpec). Driver traffic per round: ≤ 2145 + 65 + 1
    * metadata rows (whitelisted). */
  /** The trainers' shared fold frame: (doc_id, bucket, x, label) rows
    * cached PARTITIONED AND SORTED by doc_id, so one per-partition pass
    * streams every document's sparse rows consecutively with an
    * nnz-bounded buffer (the secondary-sort recipe applied to training).
    * Replaces the r12 pair self-join entirely: the nnz² Hessian work
    * happens inside a per-partition loop over each doc's buffered rows,
    * never as a 10⁷-row shuffled frame — measured 5.6 s → ~2 s for the
    * d = 64 IRLS key at sf0.1. */
  private def trainFoldFrame(sparse0: DataFrame, labels0: DataFrame)
      : org.apache.spark.sql.Dataset[(Long, Array[Int], Array[Double], Double)] = {
    val s = sparse0.sparkSession
    import s.implicits._
    // pack each doc's sparse rows into primitive arrays ONCE: the loop
    // then decodes |docs| cached rows per iteration instead of Σnnz
    // (~50× fewer row boundaries; all downstream sums are order-free
    // integer grids, so the in-array order is immaterial)
    sparse0.join(labels0, Seq("doc_id"))
      .select(col("doc_id"), col("bucket"), col("x"), col("label"))
      .as[(Long, Int, Double, Double)]
      .groupByKey(_._1)
      .mapGroups { (doc, it) =>
        val bs = scala.collection.mutable.ArrayBuilder.make[Int]
        val xs = scala.collection.mutable.ArrayBuilder.make[Double]
        var label = 0.0
        it.foreach { t => bs += t._2; xs += t._3; label = t._4 }
        (doc, bs.result(), xs.result(), label)
      }
      .cache()
  }

  /** ONE job per Newton/L-BFGS round: a per-partition fold computes
    * each doc's margin z (exact 1e-9-grid long sum), p, r, err, then
    * accumulates 1e-8-snapped score — and, when `withHessian`, Hessian
    * (ja ≤ jb) — terms into LOCAL long arrays; one flattened accumulator
    * row per partition reaches the driver (P·(d²+d) longs for d = 65,
    * P·d for the L-BFGS tier — dimension-bounded metadata), merged by
    * exact long adds, so the result is order-independent under any
    * partitioning and bit-identical to the r12 join/aggregate plan. */
  private def hessianScoreReadout(
      docRows: org.apache.spark.sql.Dataset[(Long, Array[Int], Array[Double], Double)],
      wv: Array[Double], dDim: Int, withHessian: Boolean)
      : (Array[Long], Array[Long]) = {
    val s = docRows.sparkSession
    import s.implicits._
    val bcW = graft.Broadcasts.track(s.sparkContext.broadcast(wv))
    val parts = docRows.mapPartitions { it =>
      val wloc = bcW.value
      val hess = new Array[Long](if (withHessian) dDim * dDim else 0)
      val score = new Array[Long](dDim)
      it.foreach { case (_, bs, xs, label) =>
        val m = bs.length
        var zL = 0L
        var i = 0
        while (i < m) { zL += math.floor(wloc(bs(i)) * xs(i) * 1e9).toLong; i += 1 }
        val z = zL.toDouble / 1e9
        val p = math.min(math.max(1.0 / (1.0 + math.exp(-z)), 1e-12),
          1.0 - 1e-12)
        val r = p * (1.0 - p)
        val err = label - p
        i = 0
        while (i < m) {
          score(bs(i)) += math.floor(xs(i) * err * 1e8).toLong
          if (withHessian) {
            var j = 0
            while (j < m) {
              if (bs(i) <= bs(j))
                hess(bs(i) * dDim + bs(j)) +=
                  math.floor(xs(i) * xs(j) * r * 1e8).toLong
              j += 1
            }
          }
          i += 1
        }
      }
      Iterator.single((hess, score))
    }.collect()
    val hessT = new Array[Long](if (withHessian) dDim * dDim else 0)
    val scoreT = new Array[Long](dDim)
    parts.foreach { case (h, g) =>
      var i = 0
      while (i < h.length) { hessT(i) += h(i); i += 1 }
      i = 0
      while (i < g.length) { scoreT(i) += g(i); i += 1 }
    }
    (hessT, scoreT)
  }

  /** Final loss/accuracy over the fold frame — same pass shape as
    * [[hessianScoreReadout]], two longs per partition to the driver. */
  private def lossAccReadout(
      docRows: org.apache.spark.sql.Dataset[(Long, Array[Int], Array[Double], Double)],
      wv: Array[Double]): (Long, Long) = {
    val s = docRows.sparkSession
    import s.implicits._
    val bcW = graft.Broadcasts.track(s.sparkContext.broadcast(wv))
    docRows.mapPartitions { it =>
      val wloc = bcW.value
      var lossL = 0L
      var correct = 0L
      it.foreach { case (_, bs, xs, label) =>
        var zL = 0L
        var i = 0
        while (i < bs.length) {
          zL += math.floor(wloc(bs(i)) * xs(i) * 1e9).toLong; i += 1
        }
        val z = zL.toDouble / 1e9
        val p = math.min(math.max(1.0 / (1.0 + math.exp(-z)), 1e-12),
          1.0 - 1e-12)
        lossL += math.floor(-(label * math.log(p) +
          (1.0 - label) * math.log(1.0 - p)) * 1e6).toLong
        if ((p >= 0.5) == (label >= 0.5)) correct += 1L
      }
      Iterator.single((lossL, correct))
    }.collect().foldLeft((0L, 0L)) { case ((a, b), (x, y)) => (a + x, b + y) }
  }

  private[graft] def hashedTrainLoop(
      sparse0: DataFrame, labels0: DataFrame): (Array[Double], Double, Double, Long) = {
    val docRows = trainFoldFrame(sparse0, labels0)
    try {
      val dDim = HashB + 1
      val w = Array.fill(dDim)(0.0)
      val n = labels0.count() // constant across rounds — ONE job up front
      for (_ <- 1 to HashedIters) {
        val (hess, score) = hessianScoreReadout(docRows, w, dDim,
          withHessian = true)
        newtonStep(w, n, (j, k) => hess(j * dDim + k), j => score(j))
      }
      // loss/accuracy are not consumed by the update — computed ONCE
      // after the loop with the shipped weights
      val (loss, correct) = lossAccReadout(docRows, w)
      (w, loss.toDouble / 1e6 / n, correct.toDouble / n, n)
    } finally { docRows.unpersist() }
  }

  /** Feature-HASHING classifier training (the fastText shape): hashed
    * bag-of-words frequencies → sparse distributed IRLS
    * ([[hashedTrainLoop]]) → the 65-row weight table + final
    * loss/accuracy rows. The published artifact decodes nothing — a
    * bucket IS the feature — but the spec pins that the two stopword
    * buckets carry the top positive weights, the replay is bit-exact,
    * training is partitioning-invariant, and accuracy ≥ 0.95 on the
    * BoW-representable rule. Spec-pinned (✗). */
  def classifierHashedTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (sparse, labels) = hashedFeatures(s, d)
    val (w, loss, acc, n) = hashedTrainLoop(sparse, labels)
    val rows = w.zipWithIndex.map { case (v, j) =>
      (if (j == HashB) "bias" else s"bucket_$j", math.floor(v * 1e9) / 1e9)
    }.toSeq ++ Seq(
      ("final_loss", math.floor(loss * 1e9) / 1e9),
      ("final_accuracy", math.floor(acc * 1e9) / 1e9),
      ("n_docs", n.toDouble))
    rows.toDF("term", "value")
  }

  /** Iteration count of the L-BFGS tier (each costs ONE bucket-keyed
    * gradient aggregate). */
  private[graft] val LbfgsIters = 12

  /** Bucket count of the L-BFGS tier — past d ≈ 10³, where the IRLS
    * pair join's d(d+1)/2 readout stops being metadata. */
  private[graft] val LbfgsB = 4096

  /** FIRST-ORDER training over the same sparse hashed frame — the
    * documented d ≈ 10³ swap of [[hashedTrainLoop]] made real: at
    * d = 4097 the IRLS Hessian readout would be d(d+1)/2 ≈ 8.4M rows,
    * so the Newton step is replaced by L-BFGS (history m = 5, two-loop
    * recursion on the driver over d-vector metadata) whose
    * per-iteration cluster cost is ONE per-partition fold over the
    * doc-sorted frame — P·d snapped-integer longs to the driver, no
    * pair frame anywhere.
    * The first step is diagonally preconditioned (0.25·Σxⱼ² is the
    * per-bucket Hessian bound of the sigmoid), after which the stored
    * (s, y) pairs scale the direction — no line search, so every
    * iteration is exactly one job.
    *
    * Determinism: per-doc margins and per-bucket gradient terms snap to
    * the same integer grids as IRLS (1e-9 / 1e-8) before their sums, so
    * the collected gradient is an order-independent integer vector
    * under ANY partitioning, and the driver-side two-loop is a pure
    * function of those integers — a single-node replay of the identical
    * recipe reproduces the weights bit-exactly (Round12Spec).
    *
    * Scale: driver traffic per iteration is P·d longs (dimension-
    * bounded metadata, the whitelisted readout tier); the sparse frame
    * is cached doc-sorted and never self-joined. The d = 2¹⁶ tier is
    * MEASURED (Round13Spec: same loop, readout stays metadata-sized,
    * accuracy holds); at fastText-scale d = 2²¹ the same loop holds —
    * the readout is 16 MB of longs per partition per iteration,
    * independent of corpus size. */
  private[graft] def lbfgsTrainLoop(
      sparse0: DataFrame, labels0: DataFrame, dDim: Int)
      : (Array[Double], Double, Double, Long) = {
    val s = sparse0.sparkSession
    import s.implicits._
    val docRows = trainFoldFrame(sparse0, labels0)
    try {
      val n = labels0.count()
      // ONE job per iteration: the shared fold with the Hessian loop
      // off — per-bucket Σ floor(x·err·1e8), d longs per partition
      def gradReadout(wv: Array[Double]): Array[Long] =
        hessianScoreReadout(docRows, wv, dDim, withHessian = false)._2
      // per-bucket Σ floor(x²·1e8) — the diagonal preconditioner, ONE
      // job before the loop (weight-independent; the collect is P·d
      // longs of dimension-bounded metadata)
      val diag = {
        val dg = new Array[Long](dDim)
        docRows.mapPartitions { it =>
          val acc = new Array[Long](dDim)
          it.foreach { case (_, bs, xs, _) =>
            var i = 0
            while (i < bs.length) {
              acc(bs(i)) += math.floor(xs(i) * xs(i) * 1e8).toLong; i += 1
            }
          }
          Iterator.single(acc)
        }.collect().foreach { a =>
          var i = 0
          while (i < dDim) { dg(i) += a(i); i += 1 }
        }
        dg
      }
      val ridge = 1e-4
      val w = Array.fill(dDim)(0.0)
      val m = 5
      val sHist = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      val yHist = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      var prevW: Array[Double] = null
      var prevG: Array[Double] = null
      def minusGrad(raw: Array[Long]): Array[Double] =
        // minimization gradient of mean log-loss + ridge: the raw
        // readout is Σ err·x (the ASCENT direction of log-likelihood)
        Array.tabulate(dDim)(j => -(raw(j).toDouble / (1e8 * n)) + ridge * w(j))
      for (_ <- 1 to LbfgsIters) {
        val grad = minusGrad(gradReadout(w))
        if (prevG != null) {
          val sv = Array.tabulate(dDim)(j => w(j) - prevW(j))
          val yv = Array.tabulate(dDim)(j => grad(j) - prevG(j))
          var sy = 0.0
          var i = 0
          while (i < dDim) { sy += sv(i) * yv(i); i += 1 }
          if (sy > 1e-12) {
            sHist += sv; yHist += yv
            if (sHist.length > m) { sHist.remove(0); yHist.remove(0) }
          }
        }
        prevW = w.clone(); prevG = grad
        val dir =
          if (sHist.isEmpty) {
            // diagonal-Newton first step: 0.25·Σx² bounds the sigmoid
            // Hessian per bucket; + ridge keeps untouched buckets finite
            Array.tabulate(dDim) { j =>
              -grad(j) / (0.25 * diag(j).toDouble / (1e8 * n) + ridge)
            }
          } else {
            // standard two-loop recursion, H0 = γI from the newest pair
            val q = grad.clone()
            val k = sHist.length
            val alpha = new Array[Double](k)
            val rho = Array.tabulate(k) { i =>
              var d0 = 0.0
              var t = 0
              while (t < dDim) { d0 += sHist(i)(t) * yHist(i)(t); t += 1 }
              1.0 / d0
            }
            var i = k - 1
            while (i >= 0) {
              var d0 = 0.0
              var t = 0
              while (t < dDim) { d0 += sHist(i)(t) * q(t); t += 1 }
              alpha(i) = rho(i) * d0
              t = 0
              while (t < dDim) { q(t) -= alpha(i) * yHist(i)(t); t += 1 }
              i -= 1
            }
            var yy = 0.0
            var t = 0
            while (t < dDim) { yy += yHist(k - 1)(t) * yHist(k - 1)(t); t += 1 }
            val gamma = 1.0 / (rho(k - 1) * yy)
            t = 0
            while (t < dDim) { q(t) *= gamma; t += 1 }
            i = 0
            while (i < k) {
              var d0 = 0.0
              t = 0
              while (t < dDim) { d0 += yHist(i)(t) * q(t); t += 1 }
              val beta = rho(i) * d0
              t = 0
              while (t < dDim) { q(t) += (alpha(i) - beta) * sHist(i)(t); t += 1 }
              i += 1
            }
            Array.tabulate(dDim)(j => -q(j))
          }
        var j = 0
        while (j < dDim) { w(j) += dir(j); j += 1 }
      }
      val (loss, correct) = lossAccReadout(docRows, w)
      (w, loss.toDouble / 1e6 / n, correct.toDouble / n, n)
    } finally { docRows.unpersist() }
  }

  /** Query key `classifier_lbfgs_train`: the d = 4096 hashing-trick
    * trainer ([[lbfgsTrainLoop]]) — emits the full 4097-row weight
    * table plus final loss/accuracy/n rows. Accuracy parity with the
    * d = 64 IRLS tier on the BoW-representable rule, stopword-bucket
    * dominance, bit-exact single-node replay, and determinism are
    * pinned (Round12Spec). Spec-pinned (✗): no oracle could train. */
  def classifierLbfgsTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (sparse, labels) = hashedFeaturesB(s, d, LbfgsB)
    val (w, loss, acc, n) = lbfgsTrainLoop(sparse, labels, LbfgsB + 1)
    val rows = w.zipWithIndex.map { case (v, j) =>
      (if (j == LbfgsB) "bias" else s"bucket_$j", math.floor(v * 1e9) / 1e9)
    }.toSeq ++ Seq(
      ("final_loss", math.floor(loss * 1e9) / 1e9),
      ("final_accuracy", math.floor(acc * 1e9) / 1e9),
      ("n_docs", n.toDouble))
    rows.toDF("term", "value")
  }

  /** Map-side scoring with the trained classifier: per document the
    * sigmoid quality score (1e-6-snapped) and the keep decision at
    * the 0.5 operating point — the FineWeb-style learned filter
    * applied to the corpus. The 6 weights inline as literals
    * (broadcast-by-construction); one narrow pass, no shuffle beyond
    * the ordering. Spec-pinned (✗): scores depend on the trained
    * weights. */
  def classifierQualityScore(s: SparkSession, d: String): DataFrame = {
    val (w, _, _, _) = trainedWeights(s, d)
    val feats = featurize(s, d)
    val xs: Seq[Column] = lit(1.0) +: FeatNames.tail.map(col)
    val z = xs.zip(w).map { case (x, wi) => x * lit(wi) }.reduceLeft(_ + _)
    val p0 = lit(1.0) / (lit(1.0) + exp(-z))
    // same clamp as training: exp underflow saturates the sigmoid to
    // exactly 1.0 on confidently-kept docs; scores stay in (0, 1)
    val p = least(greatest(p0, lit(1e-12)), lit(1.0 - 1e-12))
    feats
      .withColumn("score", floor(p * 1e6) / 1e6)
      .withColumn("keep", (col("score") >= 0.5).cast("int"))
      .select(col("doc_id"), col("score"), col("keep"), col("label").cast("int").as("label"))
      .orderBy(col("doc_id"))
  }
}
