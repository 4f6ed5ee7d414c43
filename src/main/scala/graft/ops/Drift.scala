package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Det.round
import graft.io.Tables

/** Round-11b distribution-drift monitors (SURVEY.md §2.21): the
  * two-snapshot statistical tests a production training-data feed runs
  * between corpus/ingest generations — "did this week's data shift from
  * last week's?" — population stability index, Kolmogorov–Smirnov,
  * chi-square homogeneity, Jensen–Shannon divergence, Mann–Whitney
  * rank-sum, and Welch's t. The two snapshots are the fixture event
  * stream's two calendar halves (2024-01-01..15 reference vs
  * 2024-01-16..30 current — FIXTURES.md events domain), the split every
  * op shares.
  *
  * All oracle-gated (OracleSql twins). Determinism contract (§5.3):
  * values snap to integer cents once (`floor(v·100+0.5)`), every
  * accumulation is exact integer arithmetic, and the floating algebra is
  * applied ONCE to identical integers on both sides — the KS sup runs on
  * cross-multiplied integer counts, Mann–Whitney mid-ranks ride a 2×
  * integer scaling, Welch's variance centers on an integer floor-mean so
  * no sum ever leaves the double-exact 2^53 range, and the PSI decile
  * edges are derived ARITHMETICALLY from the histogram's cumulative
  * counts (never from an interpolated percentile two engines could
  * round apart).
  *
  * Scale: every op aggregates the event stream to its value HISTOGRAM
  * first — a table bounded by the cents grid (≤ 49 001 rows at any
  * corpus size, FIXTURES.md value domain) or by |event_type| (5) — so
  * the only full-data pass is one partial-aggregable groupBy; the
  * single-partition windows that follow run on the bounded histogram,
  * not on rows. That is the shape that survives 100 TB: the shuffle
  * carries (value, count) pairs, never events.
  */
object Drift {

  private def events(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)

  /** Snapshot split point: the event stream's calendar midpoint. */
  private val SplitTs = "2024-01-16 00:00:00"

  /** (cents, is_ref) projection every drift op starts from. */
  private def snapped(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("event_type"),
      floor(col("value") * 100 + 0.5).as("c"),
      (col("ts") < lit(SplitTs).cast("timestamp")).cast("bigint").as("isr"))

  private def histAll(s: SparkSession, d: String): DataFrame =
    snapped(s, d).groupBy(col("c"))
      .agg(sum(col("isr")).as("ca"), sum(lit(1) - col("isr")).as("cb"))

  private def histByType(s: SparkSession, d: String): DataFrame =
    snapped(s, d).groupBy(col("event_type"), col("c"))
      .agg(sum(col("isr")).as("ca"), sum(lit(1) - col("isr")).as("cb"))

  /** Per-event_type side counts (the 5-row contingency table). */
  private def typeCounts(s: SparkSession, d: String): DataFrame =
    snapped(s, d).groupBy(col("event_type"))
      .agg(sum(col("isr")).as("oa"), sum(lit(1) - col("isr")).as("ob"))

  private def dbl(c: Column): Column = c.cast("double")

  /** Population stability index of event values, current vs reference
    * snapshot, over REFERENCE-decile bins — the standard drift score
    * model monitors alert on (PSI > 0.2 ⇒ investigate). One row per
    * populated bin; the scalar PSI is the sum of the ≤ 10 `psi_term`s.
    *
    * The decile edges never materialize: a value v lands in bin
    * 1 + min(9, ⌊10·|{ref < v}|/n_ref⌋), which is EQUIVALENT to binning
    * by the nine order-statistic edges (edge_k < v ⟺ ceil(n·k/10) ≤
    * |{ref < v}| ⟺ k ≤ ⌊10·|{ref < v}|/n⌋) but needs only the
    * histogram's running reference count — exact integer division, no
    * percentile interpolation, no edge join.
    *
    * Scale: one partial-aggregable groupBy(cents) over the stream, then
    * one window + one 10-row aggregate on the ≤ 49k-row histogram. */
  def driftPsi(s: SparkSession, d: String): DataFrame = {
    val wCum = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    histAll(s, d)
      .withColumn("na", sum(col("ca")).over(wAll))
      .withColumn("nb", sum(col("cb")).over(wAll))
      .withColumn("lt", sum(col("ca")).over(wCum) - col("ca"))
      .withColumn("bin", lit(1) + least(lit(9), expr("(10 * lt) div na")))
      .groupBy(col("bin"))
      .agg(sum(col("ca")).as("n_ref"), sum(col("cb")).as("n_cur"),
        max(col("na")).as("na"), max(col("nb")).as("nb"))
      .where(col("n_ref") > 0 && col("n_cur") > 0)
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round((dbl(col("n_ref")) / dbl(col("na")) -
            dbl(col("n_cur")) / dbl(col("nb"))) *
          log(dbl(col("n_ref") * col("nb")) / dbl(col("n_cur") * col("na"))),
          6).as("psi_term"))
      .orderBy(col("bin"))
  }

  /** Two-sample Kolmogorov–Smirnov per event_type: D = sup over the
    * value grid of |F_ref − F_cur|, with the value the sup is attained
    * at (`d_at_cents`, smallest on ties). The sup search runs ENTIRELY
    * on integers — |cumA·n_cur − cumB·n_ref| — so engine max() sees
    * identical exact values; the one double divide lands at the end.
    *
    * Scale: groupBy(type, cents) histogram, per-type windows (parallel
    * across types), 5-row result. */
  def driftKs(s: SparkSession, d: String): DataFrame = {
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    histByType(s, d)
      .withColumn("cumA", sum(col("ca")).over(wCum))
      .withColumn("cumB", sum(col("cb")).over(wCum))
      .withColumn("na", sum(col("ca")).over(wAll))
      .withColumn("nb", sum(col("cb")).over(wAll))
      .withColumn("dnum", abs(col("cumA") * col("nb") - col("cumB") * col("na")))
      .withColumn("mx", max(col("dnum")).over(wAll))
      .groupBy(col("event_type"))
      .agg(max(col("na")).as("n_ref"), max(col("nb")).as("n_cur"),
        round(dbl(max(col("dnum"))) / dbl(max(col("na") * col("nb"))), 6)
          .as("d"),
        min(when(col("dnum") === col("mx"), col("c"))).as("d_at_cents"))
      .orderBy(col("event_type"))
  }

  /** Earth mover's distance (Wasserstein-1) between the two snapshots'
    * value distributions per event_type — the drift metric with units
    * (average dollars a reference observation must "move" to become the
    * current distribution; the standard embedding/feature-drift
    * distance). On a 1-D grid W₁ = ∫|F_ref − F_cur| dx, which the
    * histogram makes EXACT: Σ over grid steps of |cumA·n_cur −
    * cumB·n_ref| · (next_c − c), an integer sum that telescopes to at
    * most max|·|·(cents range) — always inside 2^53 — with the
    * na·nb·100 division applied once at the end.
    *
    * Scale: same bounded-histogram shape as drift_ks — one keyed
    * groupBy over rows, per-type windows on the value grid. */
  def driftEmd(s: SparkSession, d: String): DataFrame = {
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("c"))
    val wAll = Window.partitionBy(col("event_type"))
    histByType(s, d)
      .withColumn("cumA", sum(col("ca")).over(wCum))
      .withColumn("cumB", sum(col("cb")).over(wCum))
      .withColumn("na", sum(col("ca")).over(wAll))
      .withColumn("nb", sum(col("cb")).over(wAll))
      .withColumn("gap", coalesce(lead(col("c"), 1).over(wOrd) - col("c"),
        lit(0L)))
      .groupBy(col("event_type"))
      .agg(max(col("na")).as("n_ref"), max(col("nb")).as("n_cur"),
        sum(abs(col("cumA") * col("nb") - col("cumB") * col("na")) *
          col("gap")).as("emd_num"),
        max(col("na") * col("nb")).as("nanb"))
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        round(dbl(col("emd_num")) / dbl(col("nanb")) / lit(100.0), 6)
          .as("emd"))
      .orderBy(col("event_type"))
  }

  /** Chi-square homogeneity of the event_type mix across the two
    * snapshots: per-type contribution (o−e)²/e summed over the type's
    * two cells, computed as ((o·g − rowt·colt)²)/(rowt·colt·g) so the
    * numerator is an exact integer difference squared in double (every
    * product ≤ 2^53 at the gated scale factors). The scalar χ² (df =
    * |types|−1) is the sum of the 5 `chi2_term`s.
    *
    * Scale: one 5-row contingency aggregate; the grand totals fold
    * back as a one-row broadcast. */
  def driftChi2(s: SparkSession, d: String): DataFrame = {
    val g = col("na") + col("nb")
    val rowt = col("oa") + col("ob")
    val numA = dbl(col("oa") * g - rowt * col("na"))
    val numB = dbl(col("ob") * g - rowt * col("nb"))
    val tc = typeCounts(s, d)
    // grand totals fold back as a one-row broadcast (the declared
    // scalar-fold shape), never a partition-less window
    tc.crossJoin(broadcast(
        tc.agg(sum(col("oa")).as("na"), sum(col("ob")).as("nb"))))
      .select(col("event_type"), col("oa").as("n_ref"), col("ob").as("n_cur"),
        round(numA * numA / dbl(rowt * col("na") * g) +
          numB * numB / dbl(rowt * col("nb") * g), 6).as("chi2_term"))
      .orderBy(col("event_type"))
  }

  /** Jensen–Shannon divergence of the event_type categorical mix
    * between snapshots: per-type term ½p·ln(p/m) + ½q·ln(q/m) with
    * m = (p+q)/2; the scalar JSD (0 ≤ JSD ≤ ln 2) is the sum of the 5
    * `js_term`s. p and q are single divides of exact counts; the ln
    * ratio argument is built from the same doubles in both engines.
    *
    * Scale: identical to drift_chi2 — one tiny contingency aggregate. */
  def driftJs(s: SparkSession, d: String): DataFrame = {
    val p = dbl(col("oa")) / dbl(col("na"))
    val q = dbl(col("ob")) / dbl(col("nb"))
    val m = (p + q) / lit(2.0)
    val tc = typeCounts(s, d)
    tc.crossJoin(broadcast(
        tc.agg(sum(col("oa")).as("na"), sum(col("ob")).as("nb"))))
      .select(col("event_type"), col("oa").as("n_ref"), col("ob").as("n_cur"),
        round(lit(0.5) * p * log(p / m) + lit(0.5) * q * log(q / m), 6)
          .as("js_term"))
      .orderBy(col("event_type"))
  }

  /** Mann–Whitney rank-sum test per event_type (the nonparametric
    * location-shift detector — robust where Welch's t assumes moments).
    * Mid-ranks for ties ride a 2× integer scaling (rank2 = 2·|{< v}| +
    * cnt(v) + 1 is EXACTLY twice the average rank of value v's block),
    * so U = (Σ ca·rank2 − n_ref·(n_ref+1))/2 is computed from exact
    * integers — the /2 is an exact binary halving. z carries the
    * standard tie-corrected variance; no continuity correction (both
    * engines apply the same formula to the same integers).
    *
    * Scale: groupBy(type, cents) histogram + per-type windows, like
    * drift_ks. */
  def driftMannWhitney(s: SparkSession, d: String): DataFrame = {
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cc = col("ca") + col("cb")
    val grouped = histByType(s, d)
      .withColumn("rank2",
        lit(2) * (sum(cc).over(wCum) - cc) + cc + lit(1))
      .groupBy(col("event_type"))
      .agg(sum(col("ca")).as("nA"), sum(col("cb")).as("nB"),
        sum(col("ca") * col("rank2")).as("ra2"),
        sum(cc * cc * cc - cc).as("ties"))
    val n = col("nA") + col("nB")
    val u = dbl(col("ra2") - col("nA") * (col("nA") + lit(1))) / lit(2.0)
    val mu = dbl(col("nA") * col("nB")) / lit(2.0)
    val sig2 = dbl(col("nA") * col("nB")) / lit(12.0) *
      (dbl(n + lit(1)) - dbl(col("ties")) / dbl(n * (n - lit(1))))
    grouped.select(col("event_type"),
        col("nA").as("n_ref"), col("nB").as("n_cur"),
        round(u, 1).as("u"), round((u - mu) / sqrt(sig2), 6).as("z"))
      .orderBy(col("event_type"))
  }

  /** Static side of the STREAMING drift monitor: the reference half's
    * decile bins in interval form — 10 rows of (bin, (lo, hi], n_ref,
    * na), derived from the same arithmetic edge rule as [[driftPsi]]
    * (edge_k = the ceil(na·k/10)-th smallest reference cents, recovered
    * from the histogram's running count by exploding each histogram row
    * to the ks whose rank it covers — `sequence` guarded ascending).
    * This is the table a production monitor computes ONCE per reference
    * snapshot and broadcasts against the live stream. */
  private[graft] def driftPsiRefBins(ev: DataFrame): DataFrame = {
    val wCum = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val binned = ev.where(col("ts") < lit(SplitTs).cast("timestamp"))
      .select(floor(col("value") * 100 + 0.5).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("ca"))
      .withColumn("cum", sum(col("ca")).over(wCum))
      .withColumn("na", sum(col("ca")).over(wAll))
      .withColumn("prev", col("cum") - col("ca"))
      .withColumn("bin", lit(1) + least(lit(9), expr("(10 * prev) div na")))
    val perBin = binned.groupBy(col("bin"))
      .agg(sum(col("ca")).as("n_ref"), max(col("na")).as("na"))
    val edges = binned
      .where(expr("(10 * prev) div na + 1") <=
        least(lit(9), expr("(10 * cum) div na")))
      .select(explode(sequence(expr("(10 * prev) div na + 1"),
        least(lit(9), expr("(10 * cum) div na")))).as("bn"), col("c"))
    val intervals = edges.select(col("bn").as("bin"), col("c").as("hi"))
      .join(edges.select((col("bn") + 1).as("bin"), col("c").as("lo")),
        Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("lo"), lit(Long.MinValue)).as("lo"),
        coalesce(col("hi"), lit(Long.MaxValue)).as("hi"))
    val wB = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    intervals.join(perBin, Seq("bin"), "left")
      .withColumn("na", max(col("na")).over(wB))
      .select(col("bin"), col("lo"), col("hi"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"), col("na"))
  }

  /** The STREAMABLE half of the per-day PSI: each arriving event bins
    * through a broadcast stream-static interval join (exactly one of 10
    * rows matches) and lands in a per-(day-window, bin) count — bounded
    * state (days-in-horizon × 10), watermark-evictable. The identical
    * column expressions run in batch and under readStream
    * (StreamingParitySpec). */
  private[graft] def driftPsiCountsTransform(
      cur: DataFrame, bins: DataFrame): DataFrame =
    cur.select(col("ts"), floor(col("value") * 100 + 0.5).as("c"))
      .join(broadcast(bins), col("c") > col("lo") && col("c") <= col("hi"))
      .groupBy(window(col("ts"), "1 day").as("w"), col("bin"),
        col("n_ref"), col("na"))
      .agg(count(lit(1)).as("n_cur"))
      .select(col("w.start").as("day_start"), col("bin"),
        col("n_ref"), col("n_cur"), col("na"))

  /** READOUT over the maintained (day, bin) count table — per-day
    * normalization + the PSI term algebra ([[driftPsi]]'s exact-integer
    * chain). Rank-style split per the streaming house rule: the stream
    * maintains counts, the readout derives the scores. */
  private[graft] def driftPsiReadout(counts: DataFrame): DataFrame = {
    val wDay = Window.partitionBy(col("day_start"))
    counts.withColumn("nb", sum(col("n_cur")).over(wDay))
      .where(col("n_ref") > 0)
      .select(col("day_start"), col("bin"), col("n_ref"), col("n_cur"),
        round((dbl(col("n_ref")) / dbl(col("na")) -
            dbl(col("n_cur")) / dbl(col("nb"))) *
          log(dbl(col("n_ref") * col("nb")) / dbl(col("n_cur") * col("na"))),
          6).as("psi_term"))
      .orderBy(col("day_start"), col("bin"))
  }

  /** Per-day PSI of the CURRENT half against the reference half — the
    * drift monitor as a stream: reference bins broadcast static, the
    * live feed maintains per-(day, bin) counts, the readout emits one
    * psi_term row per populated (day, bin). Batch-equivalent form here
    * (oracle-gated); runtime parity under readStream + complete mode is
    * the streaming gate (StreamingParitySpec).
    *
    * Scale: the static side is 10 rows; stream state is
    * days-in-horizon × 10 counters; nothing about the stream's volume
    * reaches the driver. */
  def streamDriftPsi(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val cur = ev.where(col("ts") >= lit(SplitTs).cast("timestamp"))
    driftPsiReadout(driftPsiCountsTransform(cur, driftPsiRefBins(ev)))
  }

  /** The composed drift REPORT — every monitor in the family as one
    * uniform (metric, key, n_ref, n_cur, value) table, the artifact a
    * scheduled corpus-health job actually publishes: KS distance, EMD
    * dollars, chi²/JS terms, Mann–Whitney z, Welch t per event_type,
    * and the ten PSI bin terms. Pure composition of the seven gated
    * monitors (each already exact); the oracle twin composes the same
    * seven DuckDB bodies, so the composition itself is hash-gated.
    *
    * Scale: seven bounded-histogram aggregates over the same snapped
    * projection — each is independently gated linear; the union is
    * plan-level only (no extra shuffle). */
  def pipelineDriftReport(s: SparkSession, d: String): DataFrame = {
    def shape(metric: String, df: DataFrame, key: Column,
        value: Column): DataFrame =
      df.select(lit(metric).as("metric"), key.cast("string").as("key"),
        col("n_ref"), col("n_cur"), value.as("value"))
    shape("chi2", driftChi2(s, d), col("event_type"), col("chi2_term"))
      .unionAll(shape("emd", driftEmd(s, d), col("event_type"), col("emd")))
      .unionAll(shape("js", driftJs(s, d), col("event_type"), col("js_term")))
      .unionAll(shape("ks", driftKs(s, d), col("event_type"), col("d")))
      .unionAll(shape("mw", driftMannWhitney(s, d), col("event_type"),
        col("z")))
      .unionAll(shape("psi", driftPsi(s, d), col("bin"), col("psi_term")))
      .unionAll(shape("welch", driftTtestWelch(s, d), col("event_type"),
        col("t")))
      .orderBy(col("metric"), col("key"))
  }

  /** Welch's unequal-variance t per event_type between snapshots, with
    * the Welch–Satterthwaite df. The variance centers on the integer
    * floor-mean m0 = Σc div n FIRST: the residual sum Σ(c−m0) is then
    * < n and Σ(c−m0)² stays far under 2^53, so
    * s² = (Σd² − (Σd)²/n)/(n−1) is an exact-input IEEE chain — the
    * naive n·Σc² − (Σc)² form overflows double exactness at sf0.1 and
    * is exactly what this formulation avoids.
    *
    * Scale: the (type, side) floor-mean window and the follow-up
    * aggregate share ONE (type, side)-keyed exchange; output is 5
    * rows. */
  def driftTtestWelch(s: SparkSession, d: String): DataFrame = {
    val sided = snapped(s, d)
      .withColumn("m0", expr(
        "sum(c) over (partition by event_type, isr) div " +
          "count(1) over (partition by event_type, isr)"))
      .withColumn("dev", col("c") - col("m0"))
      .groupBy(col("event_type"), col("isr"))
      .agg(count(lit(1)).as("n"), max(col("m0")).as("m0"),
        sum(col("dev")).as("sd"), sum(col("dev") * col("dev")).as("sdd"))
      .select(col("event_type"), col("isr"), col("n"),
        (dbl(col("m0")) + dbl(col("sd")) / dbl(col("n"))).as("mean_c"),
        ((dbl(col("sdd")) - dbl(col("sd")) * dbl(col("sd")) / dbl(col("n"))) /
          dbl(col("n") - lit(1))).as("s2"))
    val byType = sided.groupBy(col("event_type")).agg(
      max(when(col("isr") === 1, col("n"))).as("n_ref"),
      max(when(col("isr") === 0, col("n"))).as("n_cur"),
      max(when(col("isr") === 1, col("mean_c"))).as("ma"),
      max(when(col("isr") === 0, col("mean_c"))).as("mb"),
      max(when(col("isr") === 1, col("s2"))).as("va"),
      max(when(col("isr") === 0, col("s2"))).as("vb"))
    val seA = col("va") / dbl(col("n_ref"))
    val seB = col("vb") / dbl(col("n_cur"))
    val se2 = seA + seB
    byType.select(col("event_type"), col("n_ref"), col("n_cur"),
        round(col("ma") / lit(100.0), 4).as("mean_ref"),
        round(col("mb") / lit(100.0), 4).as("mean_cur"),
        round((col("ma") - col("mb")) / sqrt(se2), 6).as("t"),
        round(se2 * se2 / (seA * seA / dbl(col("n_ref") - lit(1)) +
          seB * seB / dbl(col("n_cur") - lit(1))), 4).as("df"))
      .orderBy(col("event_type"))
  }
}
