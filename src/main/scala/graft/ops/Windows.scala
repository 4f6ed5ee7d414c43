package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Det.round
import graft.io.Tables

/** Window functions (SURVEY.md §2.5). Every window orderBy carries a unique
  * tiebreaker (event_id) — hash-match determinism demands it (§5.3.5).
  *
  * Scale note: all windows partition by user_id (1.5 k users at sf0.1,
  * millions at 100 TB) — high-cardinality partition keys distribute evenly;
  * no global-window (empty partitionBy) patterns anywhere, which would
  * funnel 100 TB through one task.
  */
object Windows {

  private def events(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)

  /** row_number / rank / dense_rank / ntile over users by value. */
  def winRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    events(s, d)
      .select(col("user_id"), col("event_id"), round(col("value"), 2).as("value"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("user_id"), col("rn"))
  }

  /** Per-user inter-event gap in seconds via lag(ts). */
  def winLagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events(s, d)
      .select(col("user_id"), col("event_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
          .as("gap_s"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Running sum of value per user (rows frame). */
  def winRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("user_id"), col("event_id"),
        round(sum(col("value")).over(w), 2).as("running_sum"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** 1-hour moving average per user (range frame over epoch seconds). */
  def winMovingRange(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_timestamp(col("ts")))
      .rangeBetween(-3600L, 0L)
    events(s, d)
      .select(col("user_id"), col("event_id"),
        round(avg(col("value")).over(w), 4).as("avg_1h"),
        count(lit(1)).over(w).as("n_1h"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Trailing-1h DISTINCT event-type count per user — the sliding
    * distinct aggregate (rolling-unique-visitors shape), the window
    * Spark has no native `count(DISTINCT) OVER` for: the frame's values
    * collect into an in-frame list and dedup per row. The frame is an
    * integer RANGE over epoch MICROSECONDS (not seconds), so frame
    * membership is decided on the full µs timestamp and matches the
    * oracle's INTERVAL arithmetic exactly; same-µs peers share a frame,
    * so the set (and its size) is peer-order-independent.
    *
    * Scale: one user_id exchange; window state per row is bounded by the
    * 1-hour frame population, never the partition — the time bound is
    * the memory bound. (A per-row HLL sketch is the extreme-frame
    * fallback; the exact form IS the contract here.) */
  def winRollingDistinct(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0L)
    events(s, d)
      .select(col("user_id"), col("event_id"),
        size(array_distinct(collect_list(col("event_type")).over(w)))
          .as("n_types_1h"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Top-3 events per user by value (classic top-k-per-group). */
  def winTopkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("user_id"), col("rn"), col("event_id"), round(col("value"), 2).as("value"))
      .orderBy(col("user_id"), col("rn"))
  }

  /** Same top-3-per-user semantics through the NATIVE partial top-k
    * operator ([[graft.plans.TopKPerGroup]] — custom LogicalPlan/Strategy/
    * partial+final SparkPlans): the map side keeps a bounded k-buffer per
    * group and ships ≤ k rows per (group, partition) into the shuffle,
    * where the window form ships EVERY row. Oracle-gated to the same SQL
    * as win_topk_per_group — a hash-matched custom physical operator. */
  def winTopkNative(s: SparkSession, d: String): DataFrame =
    graft.plans.TopKPerGroup
      .topK(
        events(s, d).select(col("user_id"), col("event_id"), col("value")),
        group = "user_id", order = "value", tie = "event_id", k = 3)
      .select(col("user_id"), col("rn"), col("event_id"),
        round(col("value"), 2).as("value"))
      .orderBy(col("user_id"), col("rn"))

  /** First/last event_type per user by time, with an explicit full frame
    * (first/last without a full frame silently read the default frame and
    * give order-dependent garbage). */
  def winFirstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events(s, d)
      .select(col("user_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"))
      .distinct()
      .orderBy(col("user_id"))
  }

  /** Distribution window functions: percent_rank, cume_dist, nth_value —
    * the remaining ranked-window surface. Unique (value, event_id) order
    * makes the ratios deterministic; rounded at 6 dp (exact k/n ratios,
    * rounding only guards float formatting differences). */
  def winDist(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").asc, col("event_id").asc)
    events(s, d)
      .select(
        col("user_id"), col("event_id"),
        graft.Det.round(percent_rank().over(w), 6).as("pct_rank"),
        graft.Det.round(cume_dist().over(w), 6).as("cume"),
        nth_value(col("event_id"), 2)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("second_event"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Time-series gap fill + forward fill: a dense hourly grid per
    * event_type (empty buckets materialized with n=0), then last-known
    * sum carried forward with an ignore-nulls running window — the
    * feature-store densification every time-series model input needs.
    * The grid comes from ONE sequence() over a single-row bounds
    * aggregate cross-joined with the distinct types (both broadcast-
    * sized); the only real shuffles are the hourly pre-aggregation —
    * which reduces events to buckets BEFORE joining — and the per-type
    * fill window. At 100 TB the grid is still hours × types (tiny);
    * the event volume only ever flows through the partial-aggregated
    * groupBy. */
  def tsGapfill(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(date_trunc("hour", col("ts")).as("h"),
        col("event_type"), col("value"))
    // The bucket aggregate feeds THREE consumers (grid bounds, type set,
    // the fill join). Unpersisted, Catalyst column-prunes each reference
    // into a different narrow aggregate — three full passes over raw
    // events. Persisting the buckets (hours × types rows — tiny at any
    // data scale) pins ONE events scan; every consumer reads the cache.
    val agg = ev.groupBy(col("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .persist()
    // bounds and the type set both derive from the AGGREGATED buckets
    // (every event contributes a bucket, so min/max/distinct over `agg`
    // equal those over `ev`)
    val hours = agg.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("h"))
    val grid = hours.crossJoin(agg.select(col("event_type")).distinct())
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("h", "event_type"), "left_outer")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("ffill_value",
        last(col("sum_value"), ignoreNulls = true).over(w))
      .orderBy(col("h"), col("event_type"))
  }

  /** Longest consecutive run (streak) of each event type per user — the
    * gaps-and-islands pattern via the rn-difference trick: within a user's
    * (ts, event_id)-ordered stream, rn_overall − rn_within_type is
    * constant exactly along a run of the same type, so grouping on that
    * difference isolates each streak. Integer window arithmetic end to
    * end — nothing to round.
    *
    * Scale: both row_numbers ride the SAME user_id exchange (one sort,
    * two stacked Window operators), then one (user, type, grp) partial
    * agg and one (user, type) max — no self-join, no session state. */
  def winStreak(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("grp",
        row_number().over(byUser) - row_number().over(byUserType))
      .groupBy(col("user_id"), col("event_type"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(col("len")).as("max_streak"), count(lit(1)).as("n_streaks"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** ntile quartiles of event value within each type — the equal-COUNT
    * bucketing window (vs agg_quantile_bands' value-boundary buckets;
    * both engines implement the SQL-standard larger-first-buckets rule).
    * Unique (value, event_id) order makes bucket edges deterministic.
    *
    * Scale: one window on the event_type partition key — at production
    * cardinality the partition key is the stratum, so no global funnel;
    * a GLOBAL equal-count split belongs to the broadcast-percentile
    * recipe (analytics_pareto / analytics_rfm), never a partition-less
    * ntile. */
  def winNtile(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").asc, col("event_id").asc)
    events(s, d)
      .select(col("event_id"), col("event_type"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("event_id"))
  }

  /** Rolling median of event value per user over the trailing 30 events
    * (full windows only) — the robust moving-location companion of
    * [[winOlsSlope]]'s moving trend (a spend-level tracker spikes can't
    * drag). Exact on the cent grid: 30 rows put the interpolation
    * position at 14.5, and a + 0.5·(b − a) is exact IEEE for int64
    * cents, so both engines see the identical median before the one
    * divide to dollars.
    *
    * Scale: row_number and the frame percentile stack on ONE user_id
    * exchange; the percentile buffers its 30-row frame, nothing more. */
  def winRollingMedian(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wF = w.rowsBetween(-29, 0)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value") * 100 + 0.5).as("xc"))
      .withColumn("i", row_number().over(w))
      .withColumn("med", percentile(col("xc"), lit(0.5)).over(wF))
      .where(col("i") >= 30)
      .select(col("user_id"), col("event_id"),
        round(col("med") / lit(100.0), 4).as("rolling_median"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Rolling Pearson correlation per user over the trailing 30 events
    * between the event value (cents) and the JSON payload's `k` field —
    * the windowed signal-coupling monitor ("is spend tracking the
    * engagement knob this month?"). All five windowed sums (Σx, Σy,
    * Σx², Σy², Σxy) accumulate as exact integers on one user_id
    * exchange; zero-variance windows are excluded by an EXACT integer
    * test (n·Σx² = (Σx)²), and the one floating chain runs on identical
    * integers in both engines. Full windows only.
    *
    * Scale: five frame sums + row_number stacked on ONE exchange, the
    * win_ols_slope shape with a second measure column. */
  def winRollingCorr(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wF = w.rowsBetween(-29, 0)
    val n = lit(30L)
    val num = n * col("sxy") - col("sx") * col("sy")
    val dx = n * col("sxx") - col("sx") * col("sx")
    val dy = n * col("syy") - col("sy") * col("sy")
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value") * 100 + 0.5).as("x"),
        expr("from_json(props, 'k INT').k").cast("bigint").as("y"))
      .withColumn("i", row_number().over(w))
      .withColumn("sx", sum(col("x")).over(wF))
      .withColumn("sy", sum(col("y")).over(wF))
      .withColumn("sxx", sum(col("x") * col("x")).over(wF))
      .withColumn("syy", sum(col("y") * col("y")).over(wF))
      .withColumn("sxy", sum(col("x") * col("y")).over(wF))
      .where(col("i") >= 30 && dx > 0 && dy > 0)
      .select(col("user_id"), col("event_id"),
        round(num.cast("double") /
          sqrt(dx.cast("double") * dy.cast("double")), 6).as("rolling_corr"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Rolling OLS regression slope of event value against event ordinal,
    * per user, over the trailing 30 events (full windows only) — the
    * windowed trend detector time-series monitors read (is this user's
    * spend accelerating?). With the regressor being the IN-WINDOW
    * ordinal x ∈ 1..30, Σx and Σx² are compile-time constants (465 /
    * 9455 ⇒ denominator 30·9455 − 465² = 67425) and the shifting-origin
    * trick Σ x·y = Σ i·y − (i_end−30)·Σ y turns the moving regression
    * into two plain windowed INTEGER sums over cents — every
    * accumulation exact, one double divide at the end (slope in
    * value-units per event step).
    *
    * Scale: row_number and the two frame sums stack on ONE user_id
    * exchange; nothing shuffles twice, nothing buffers beyond the
    * 30-row frame. */
  def winOlsSlope(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wF = w.rowsBetween(-29, 0)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value") * 100 + 0.5).as("c"))
      .withColumn("i", row_number().over(w).cast("bigint"))
      .withColumn("sy", sum(col("c")).over(wF))
      .withColumn("siy", sum(col("i") * col("c")).over(wF))
      .where(col("i") >= 30)
      .select(col("user_id"), col("event_id"),
        round((lit(30) * (col("siy") - (col("i") - 30) * col("sy")) -
            lit(465) * col("sy")).cast("double") / lit(67425.0) / lit(100.0),
          6).as("slope"))
      .orderBy(col("user_id"), col("event_id"))
  }

}
