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

  /** Audience overlap from HLL sketch ALGEBRA — the scale tier of
    * analytics_audience_overlap: one scan builds a register sketch per
    * event type (graft_hll_regs, mergeable partial aggregation), then
    * every pairwise overlap falls out of register-max unions on the
    * DRIVER via inclusion–exclusion (|A∩B| ≈ |A|+|B|−|A∪B|) — T tiny
    * sketches answer T² audience questions with no second scan and no
    * per-user pair expansion at all, which is the 100 TB shape when the
    * exact pair kernel's per-user type-set work is already too much.
    * Oracle-exempt (sketch); CustomSurfaceSpec pins every estimated
    * overlap coefficient within ±0.05 of the exact kernel's. */
  def audienceOverlapHll(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.functions.HllRegisters.register(s)
    val sketches = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(call_function("graft_hll_regs", col("user_id")).as("regs"))
      .as[(String, Array[Byte])].collect().sortBy(_._1)
    val H = graft.functions.HllSketch
    val rows = for {
      i <- sketches.indices
      j <- (i + 1) until sketches.length
    } yield {
      val (ta, ra) = sketches(i)
      val (tb, rb) = sketches(j)
      val ea = H.estimate(ra)
      val eb = H.estimate(rb)
      val eu = H.estimate(H.union(ra, rb))
      val inter = math.max(0L, ea + eb - eu)
      (ta, tb, ea, eb, eu,
        math.floor(inter.toDouble / math.min(ea, eb).toDouble * 1e6 + 0.5) / 1e6)
    }
    rows.toDF("type_a", "type_b", "est_a", "est_b", "est_union",
      "est_overlap")
      .orderBy(col("type_a"), col("type_b"))
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
