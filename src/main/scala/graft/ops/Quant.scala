package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Det.round
import graft.io.Tables

/** Round-6c quantitative/statistics operators (SURVEY.md §2.17): the
  * distribution-shape, normalization, and sequence-statistics layer a
  * training-data pipeline reads off its corpus and event feeds —
  * inequality measures, robust outliers, standard scaling, returns,
  * interpolation, PMI, graph degrees, CDC deletes.
  *
  * All oracle-gated (OracleSql twins). Determinism contract as §5.3:
  * exact-integer accumulation wherever a sum exists (cents snapping /
  * native int columns / DECIMAL(38,0) ≡ HUGEINT headroom), the floating
  * algebra applied ONCE to identical integers on both sides, Det.round
  * on every emitted double, total row order with unique tiebreakers.
  */
object Quant {

  private def events(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Per-language Gini coefficient of document lengths — the corpus-
    * balance diagnostic (how unequally is text volume distributed across
    * docs of a language?) that mixture re-weighting decisions read.
    * With lengths ranked ascending, G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ):
    * every sum is exact integer arithmetic (n_chars is int64; the rank
    * product rides DECIMAL(38,0) on the Spark side, HUGEINT in DuckDB),
    * so the single double divide sees identical operands in both engines.
    *
    * Scale: the rank is a per-lang window (one lang exchange, same
    * exchange the aggregate reuses); the agg collapses partial map-side.
    * Ranks must be unique for the formula — (n_chars, doc_id) total
    * order. */
  def aggGini(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars"), col("doc_id"))
    val ranked = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("i", row_number().over(w))
    val g = ranked.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("n_chars"))).as("sx"),
        sum(dec(col("i") * col("n_chars"))).as("six"))
    g.select(col("lang"), col("n"),
        round((lit(2) * col("six") - (col("n") + lit(1)) * col("sx"))
            .cast("double") /
          (dec(col("n")) * col("sx")).cast("double"), 6).as("gini"))
      .orderBy(col("lang"))
  }

  /** Per-user z-score standardization of event values (the standard-
    * scaler counterpart of feature_minmax_norm): mean and sample std are
    * derived from EXACT cent sums — Σx and Σx² accumulate as integers
    * (DECIMAL(38,0) ≡ HUGEINT headroom for the squares), then
    * z = (x − S₁/n) / √((n·S₂ − S₁²)/(n(n−1))) runs the same IEEE chain
    * on identical integers in both engines. Users with < 2 events or
    * zero variance (the integer numerator n·S₂ − S₁² = 0 — an EXACT
    * test, no epsilon) are excluded.
    *
    * Scale: three whole-partition window aggregates stack on ONE
    * user_id hash exchange — no groupBy + join-back, no second shuffle
    * at any event volume. */
  def featureZscoreNorm(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val num = dec(col("n")) * col("s2") - col("s1") * col("s1")
    val den = col("n") * (col("n") - lit(1L))
    val mu = col("s1").cast("double") / col("n").cast("double")
    val sd = sqrt(num.cast("double") / den.cast("double"))
    events(s, d)
      .select(col("event_id"), col("user_id"),
        floor(col("value") * 100 + 0.5).as("xc"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum(dec(col("xc"))).over(w))
      .withColumn("s2", sum(dec(col("xc") * col("xc"))).over(w))
      .where(col("n") >= 2 && num > 0)
      .select(col("event_id"), col("user_id"),
        round((col("xc").cast("double") - mu) / sd, 4).as("z_norm"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Robust per-user outlier flags via the modified z-score
    * (Iglewicz–Hoaglin): |x − median| / (1.4826·MAD) ≥ 3.5 — the
    * median/MAD counterpart of anomaly_zscore that heavy tails can't
    * drag. On cent integers both medians are EXACT: the 0.5-interpolation
    * between two int64s is exact IEEE (a + (b−a)·0.5, every term
    * representable), deviations land on a half-cent grid, and the MAD —
    * a median of those — is exact again. The one inexact product
    * (1.4826·MAD) feeds a Det-rounded score compared AFTER rounding on
    * both sides, so the flag set is engine-portable. Users with < 12
    * events or MAD = 0 are excluded.
    *
    * Scale: two stacked whole-partition windows (median, then MAD over
    * the derived deviations) on ONE user_id exchange. Exact medians
    * don't partial-aggregate — that's inherent to the statistic; at
    * 100 TB the per-user partition is still one node's work, and the
    * approx_percentile swap is the documented sketch path. */
  def tsAnomalyMad(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events(s, d)
      .select(col("event_id"), col("user_id"),
        floor(col("value") * 100 + 0.5).as("xc"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("med", percentile(col("xc"), lit(0.5)).over(w))
      .withColumn("dev", abs(col("xc").cast("double") - col("med")))
      .withColumn("mad", percentile(col("dev"), lit(0.5)).over(w))
      .where(col("n") >= 12 && col("mad") > 0)
      .withColumn("z_mad", round(col("dev") / (lit(1.4826) * col("mad")), 4))
      .where(col("z_mad") >= 3.5)
      .select(col("event_id"), col("user_id"), col("z_mad"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Pointwise mutual information of adjacent event-type bigrams —
    * which transitions happen MORE than independence predicts (the
    * sequence-association signal the raw transition matrix doesn't
    * normalize for). All four counts are exact integers off one lead();
    * PMI = ln(N·n_ab / (n_a·n_b)) is one integer-product divide + one
    * ln, Det-rounded; rank on the rounded score. Pairs with n_ab < 5
    * are noise-floored out.
    *
    * Scale: one user_id exchange for the lead, one (cur,nxt) partial
    * agg; the margins ride windows over the |types|²-row count table
    * (tiny at any data volume), N joins back as a one-row broadcast. */
  def seqPmiBigrams(s: SparkSession, d: String): DataFrame = {
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("cur"))
      .withColumn("nxt", lead(col("cur"), 1).over(wo))
      .where(col("nxt").isNotNull)
    val counts = pairs.groupBy(col("cur"), col("nxt"))
      .agg(count(lit(1)).as("n_ab"))
    counts
      .withColumn("n_a", sum(col("n_ab")).over(Window.partitionBy(col("cur"))))
      .withColumn("n_b", sum(col("n_ab")).over(Window.partitionBy(col("nxt"))))
      .crossJoin(broadcast(counts.agg(sum(col("n_ab")).as("n_tot"))))
      .where(col("n_ab") >= 5)
      .select(col("cur"), col("nxt"), col("n_ab"),
        round(log((dec(col("n_tot")) * col("n_ab")).cast("double") /
          (dec(col("n_a")) * col("n_b")).cast("double")), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("cur"), col("nxt"))
  }

  /** Degree distribution of the part co-occurrence graph (assoc_pairs
    * edges: pairs co-ordered in ≥ 2 orders) — the connectivity profile
    * that sizes graph passes (triangle count, connected components)
    * before they run. Pure integer counts end to end.
    *
    * Scale: edges reuse the bounded coOrderPairs kernel; degrees are one
    * partial-aggregable groupBy over 2·|E| key rows; the histogram
    * collapses to ≤ max-degree rows. */
  def graphDegreeStats(s: SparkSession, d: String): DataFrame = {
    val edges = Analytics.coOrderPairs(s, d)
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n_orders"))
      .where(col("n_orders") >= 2)
    val deg = edges.select(col("p1").as("p"))
      .unionAll(edges.select(col("p2").as("p")))
      .groupBy(col("p")).agg(count(lit(1)).as("degree"))
    deg.groupBy(col("degree")).agg(count(lit(1)).as("n_parts"))
      .orderBy(col("degree"))
  }

  /** Per-user percent change of event value vs the previous event (the
    * "returns" transform every event-stream feature set carries). Values
    * snap to cents on both sides, so Δ/prev is one double divide of
    * identical integers; first events (no predecessor) and zero
    * predecessors are excluded.
    *
    * Scale: one lag() on one user_id exchange; map-only otherwise. */
  def winPctChange(s: SparkSession, d: String): DataFrame = {
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"),
        floor(col("value") * 100 + 0.5).as("xc"))
      .withColumn("prev", lag(col("xc"), 1).over(wo))
      .where(col("prev").isNotNull && col("prev") =!= 0)
      .select(col("event_id"), col("user_id"),
        round((col("xc") - col("prev")).cast("double") /
          col("prev").cast("double"), 6).as("pct_change"))
      .orderBy(col("user_id"), col("event_id"))
  }
}
