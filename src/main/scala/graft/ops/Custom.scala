package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Det.round
import graft.io.Tables

/** Custom typed-aggregation surface (SURVEY.md §2.4 agg_custom_typed /
  * §2.11 udaf_typed): a Welford mean+variance `Aggregator[IN, BUF, OUT]`
  * registered via `functions.udaf` — the idiomatic Spark path for custom
  * aggregation (mergeable buffer ⇒ partial aggregation + single shuffle of
  * constant-size state; the same property HLL/minhash sketches rely on at
  * 100 TB).
  */
object Custom {

  case class WelfordBuf(n: Long, mean: Double, m2: Double)

  /** Numerically-stable streaming mean/M2 with Chan's parallel merge. */
  object WelfordAgg extends Aggregator[Double, WelfordBuf, WelfordBuf] {
    def zero: WelfordBuf = WelfordBuf(0L, 0.0, 0.0)
    def reduce(b: WelfordBuf, x: Double): WelfordBuf = {
      val n = b.n + 1
      val delta = x - b.mean
      val mean = b.mean + delta / n
      WelfordBuf(n, mean, b.m2 + delta * (x - mean))
    }
    def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val delta = b.mean - a.mean
        WelfordBuf(
          n,
          a.mean + delta * b.n / n,
          a.m2 + b.m2 + delta * delta * a.n * b.n / n)
      }
    }
    def finish(r: WelfordBuf): WelfordBuf = r
    def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
    def outputEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
  }

  /** Custom HLL sketch (TypedImperativeAggregate) per event_type —
    * oracle-exempt (sketch); ScalaTest asserts ±5% of exact. */
  def aggHllCustom(s: SparkSession, d: String): DataFrame = {
    graft.functions.HllSketch.register(s)
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(call_function("graft_hll", col("user_id")).as("hll_users"))
      .orderBy(col("event_type"))
  }

  /** The HLL sketch under ROLLUP — the property that makes sketches the
    * 100 TB distinct-count answer is MERGEABILITY, and grouping sets are
    * its sharpest test: every subtotal level re-merges the same partial
    * sketch states (per-type, then the grand total) without a second
    * scan. Oracle-exempt like the flat HLL; CustomSurfaceSpec pins every
    * level's estimate within ±5% of the exact distinct AND the plan to
    * one Expand (no per-level re-scan). */
  def aggHllRollup(s: SparkSession, d: String): DataFrame = {
    graft.functions.HllSketch.register(s)
    Tables.events(s, d)
      .rollup(col("event_type"))
      .agg(call_function("graft_hll", col("user_id")).as("hll_users"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        col("hll_users"))
      .orderBy(col("event_type"))
  }

  /** Custom EXACT-distinct bitmap aggregate per event_type — unlike the
    * HLL/t-digest sketches this one is oracle-GATED: bitmap-OR is exact,
    * so the result hash-matches DuckDB count(DISTINCT). Demonstrates a
    * custom TypedImperativeAggregate living under the same correctness
    * gate as the built-ins. */
  def aggBitmapDistinct(s: SparkSession, d: String): DataFrame = {
    graft.functions.BitmapDistinct.register(s)
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(call_function("graft_bitmap", col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  /** Custom t-digest quantile sketch (TypedImperativeAggregate) per
    * event_type: median and p95 from mergeable bounded-size centroid
    * state — oracle-exempt (merge order shifts centroid boundaries, as
    * with any t-digest); CustomSurfaceSpec bounds both quantiles against
    * exact percentile. */
  def aggTdigest(s: SparkSession, d: String): DataFrame = {
    graft.functions.TDigestQuantile.register(s)
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        call_function("graft_tdigest", col("value"), lit(0.5)).as("p50_approx"),
        call_function("graft_tdigest", col("value"), lit(0.95)).as("p95_approx"))
      .orderBy(col("event_type"))
  }

  /** Per-user Welford mean + sample variance over event values. The
    * oracle pairs it with avg/var_samp — mathematically identical;
    * floating summation order differs, absorbed by 4 dp rounding. */
  def aggCustomTyped(s: SparkSession, d: String): DataFrame = {
    val welford = udaf(WelfordAgg)
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(welford(col("value")).as("w"))
      .select(
        col("user_id"),
        col("w.n").as("n"),
        round(col("w.mean"), 4).as("mean_value"),
        round(when(col("w.n") > 1, col("w.m2") / (col("w.n") - 1))
          .otherwise(lit(null)), 4).as("var_value"))
      .orderBy(col("user_id"))
  }
}
