package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Det.round
import graft.io.Tables

/** Relational operators: scans, projection/filter, joins, aggregations,
  * sorts/limits, set ops (SURVEY.md §2.1-2.7).
  *
  * Every query is a pure (SparkSession, sfDir) => DataFrame, declarative
  * DataFrame API only, so Catalyst does pushdown/pruning/join-selection.
  * Determinism contract (SURVEY.md §5.3): total ORDER BY with unique
  * tiebreakers, round(,2) money / round(,4) stats, UTC session.
  *
  * Scale notes are inline per operator: the fixtures are single files, but
  * each plan is written for the 1000-executor case — broadcast for dims
  * bounded by catalog size, shuffle joins keyed on high-cardinality int64,
  * partial aggregation always available (HashAggregateExec).
  */
object Relational {

  // ---------------------------------------------------------------- §2.1 scans

  /** Full scan shape: projection of every column plus a stable sort for the
    * oracle. Count-shape work happens in Bench via .count(). */
  def scanParquet(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Projection + predicate pushdown: the physical plan must show
    * PushedFilters for l_shipdate and ReadSchema with only 3 columns. */
  def scanPruned(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      // string→timestamp cast honors spark.sql.session.timeZone (UTC);
      // Timestamp.valueOf would parse in the JVM default TZ instead.
      .where(col("l_shipdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // ------------------------------------------------------- §2.2 project/filter

  /** Derived-column projection: revenue = extendedprice * (1 - discount). */
  def projectCompute(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 2)
          .as("charged"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** One query exercising comparison, AND/OR/NOT, BETWEEN, IN, LIKE. All
    * predicates are pushdown-eligible Catalyst filters. */
  def filterPred(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .where(
        col("o_orderstatus").isin("F", "O") &&
        col("o_totalprice").between(1000.0, 200000.0) &&
        (col("o_orderpriority").like("1-%") || col("o_orderpriority").like("2-%")) &&
        !(col("o_custkey") % 7 === 0))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))

  /** Regex predicate on the events stream table. */
  def filterRegex(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .where(col("event_type").rlike("^(click|view)$") && col("value") > 100.0)
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value"))
      .orderBy(col("event_id"))

  // ----------------------------------------------------------------- §2.3 joins

  /** Fact ⋈ small dims: customer ⋈ nation ⋈ region with explicit broadcast.
    * nation (25 rows) and region (5 rows) are catalog-bounded at any data
    * scale, so BroadcastHashJoin is the permanently correct choice — no
    * shuffle of the fact side at 100 TB. */
  def joinBroadcast(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .orderBy(col("r_name"), col("n_name"))

  /** Large ⋈ large on int64 equi-key: both sides shuffle-partitioned on the
    * key, SortMergeJoin at scale (neither fits a broadcast at 100 TB). */
  def joinSortmerge(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("o_orderstatus"))

  /** Same semantics via shuffled-hash join hint: avoids the sort when one
    * side per-partition fits memory — often faster for skew-free int keys. */
  def joinShuffledhash(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).hint("SHUFFLE_HASH")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("o_orderstatus"))

  /** Skew-immune large ⋈ large equi join via EXPLICIT salting — the manual
    * fallback when AQE's skew split can't help (e.g. the hot key's rows sit
    * in one unsplittable map output, or the engine predates runtime
    * re-planning). Fact rows fan the hot key across 8 salt buckets (salt
    * derived from non-key columns, uniform by hash); the dim side
    * replicates ×8 via explode, and the join key becomes (key, salt) — a
    * hot key's probe rows now land on 8 reducers instead of 1. Results are
    * provably identical to the unsalted join: each fact row matches exactly
    * the one dim copy carrying its salt. The oracle twin IS the plain
    * join — parity is the test. Cents-exact sum (BIGINT) so the aggregate
    * is merge-order-independent.
    *
    * Scale: replication factor 8 multiplies only the DIM side's shuffle
    * volume; pick salt ∝ observed skew. Salting composes with (doesn't
    * replace) AQE — this key is the technique as a runnable, parity-gated
    * plan. */
  def joinSalted(s: SparkSession, d: String): DataFrame = {
    val nSalt = 8
    val fact = Tables.lineitem(s, d)
      .withColumn("fsalt",
        pmod(xxhash64(col("l_partkey"), col("l_linenumber")), lit(nSalt.toLong)))
    val dim = Tables.orders(s, d)
      .withColumn("dsalt", explode(sequence(lit(0L), lit(nSalt - 1L))))
    fact.join(dim,
        col("l_orderkey") === col("o_orderkey") && col("fsalt") === col("dsalt"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        (sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
          .cast("double") / 100.0).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Left outer join manufacturing nulls: all customers, their order counts;
    * customers without orders keep null-safe zero counts. */
  def joinLeft(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).where(col("c_custkey") < 100)
      .join(Tables.orders(s, d).where(col("o_totalprice") > 150000.0),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_big_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("sum_big"))
      .orderBy(col("c_custkey"))

  /** Full outer join over two deliberately partial key sets. */
  def joinFull(s: SparkSession, d: String): DataFrame = {
    val left = Tables.orders(s, d).where(col("o_orderkey") % 2 === 0)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_even"))
    val right = Tables.orders(s, d).where(col("o_totalprice") > 180000.0)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
    // USING-style join coalesces the key into one column on full outer.
    left.join(right, Seq("o_custkey"), "full")
      .select(
        col("o_custkey").as("custkey"),
        coalesce(col("n_even"), lit(0L)).as("n_even"),
        coalesce(col("n_big"), lit(0L)).as("n_big"))
      .orderBy(col("custkey"))
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): two daily
    * aggregates keyed on a NULLABLE dimension ('click' mapped to NULL),
    * joined so the NULL groups pair up — the semantics a plain equi-join
    * silently drops (NULL = NULL is UNKNOWN). The groups are aggregated
    * BEFORE the join, so each side has at most one NULL row per day — no
    * NULL×NULL blow-up. The nullable key is coalesced to a sentinel only
    * in the OUTPUT (the join itself is null-safe).
    *
    * Scale: EqualNullSafe is a legal hash-join key in Catalyst
    * (ExtractEquiJoinKeys wraps it) — this stays a shuffled/broadcast
    * hash join, never a nested-loop fallback; plan-pinned. */
  def joinNullSafe(s: SparkSession, d: String): DataFrame = {
    def base = Tables.events(s, d).select(
      when(col("event_type") === "click", lit(null))
        .otherwise(col("event_type")).as("etype"),
      date_trunc("day", col("ts")).as("day"), col("value"))
    val all = base.groupBy(col("day"), col("etype"))
      .agg(count(lit(1)).as("n_all"))
    val big = base.where(col("value") > 100.0)
      .groupBy(col("day"), col("etype")).agg(count(lit(1)).as("n_big"))
    all.join(big,
        all("day") === big("day") && all("etype") <=> big("etype"), "left")
      .select(all("day"), coalesce(all("etype"), lit("(null)")).as("etype"),
        col("n_all"), coalesce(col("n_big"), lit(0L)).as("n_big"))
      .orderBy(col("day"), col("etype"))
  }

  /** Customers having at least one urgent order (left-semi ≡ EXISTS): no
    * duplication of the left side, right side reduced to its join keys. */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Customers with no URGENT order (left-anti ≡ NOT EXISTS). Targets a
    * filtered orders subset so the result is non-empty at every SF (every
    * customer has SOME order in the fixtures — the unfiltered anti-join
    * verified vacuously on 0 rows). */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Bloom-prefiltered semi join — the runtime-filter pattern written out
    * explicitly: build a bloom filter over the (filtered) build side's
    * join keys, broadcast it, and drop probe rows that cannot match
    * BEFORE they reach the shuffle. The residual semi join removes the
    * bloom's false positives, so the result is exactly [[joinSemi]]'s
    * (same oracle SQL). At 100 TB this is what saves the shuffle when the
    * build side is selective but too big to broadcast as a hash table —
    * the bloom is a fixed few MB regardless of build-side row width.
    * (Spark's own runtime row-level filtering does this automatically
    * for some shapes; the explicit operator makes it available to any.) */
  def joinBloomPrefilter(s: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(s, d)
      .where(col("o_orderpriority") === "1-URGENT")
    // Capacity sized from the build side itself: a fixed capacity silently
    // degrades fpp toward 1 once the true distinct count outgrows it,
    // turning the prefilter into a no-op at larger SFs. approx_count_distinct
    // is one cheap constant-state job; 1.25× headroom covers its ±5% error.
    val approxKeys = urgent
      .agg(approx_count_distinct(col("o_custkey")).as("n")).head().getLong(0)
    val bf = urgent.stat.bloomFilter(
      "o_custkey", math.max(1000L, approxKeys * 5L / 4L), 0.01)
    // Spark's native BloomFilterMightContain (the runtime-filter
    // expression, codegen'd) instead of a row-at-a-time UDF: the engine
    // exposes no public Column API for it, so GraftBridge wraps it; the
    // serialized filter rides the plan as a literal and each executor
    // deserializes it once, lazily.
    val filterBytes = {
      val os = new java.io.ByteArrayOutputStream()
      bf.writeTo(os)
      os.toByteArray
    }
    Tables.customer(s, d)
      .where(org.apache.spark.sql.GraftBridge.bloomMightContain(
        filterBytes, col("c_custkey").cast("long")))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Non-equi range join: pairs of events from the same user within 60 s.
    * The equi-conjunct on user_id makes this a hash join with a range
    * residual — NOT a nested-loop cross product. At 100 TB you additionally
    * bucketize ts into 60 s bins and join on (user_id, bin±1) so state per
    * key stays bounded; with per-user event counts in the tens this plan
    * already scales linearly in users. */
  def joinThetaRange(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(
      col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val a = e.toDF("a_id", "user_id", "a_ts", "a_type")
    val b = e.toDF("b_id", "b_user", "b_ts", "b_type")
    a.join(b,
        a("user_id") === b("b_user") &&
        b("b_ts") > a("a_ts") &&
        b("b_ts") <= a("a_ts") + expr("INTERVAL 60 SECONDS") &&
        a("a_id") =!= b("b_id"))
      .select(col("user_id"), col("a_id"), col("b_id"), col("a_type"), col("b_type"))
      .orderBy(col("user_id"), col("a_id"), col("b_id"))
  }

  /** The 100 TB twin of [[joinThetaRange]]: bucketize event time into 60 s
    * bins and make the bin part of the JOIN KEY. The probe side explodes
    * into its two candidate bins (range (a_ts, a_ts+60] spans at most
    * bucket(a_ts) and bucket(a_ts)+1; each b row carries one bin, so no
    * pair can match twice), the join hashes on (user, bin), and the exact
    * range predicate runs as a cheap residual filter. Per-key join state
    * is one user's events inside one minute — bounded regardless of how
    * long a user's history grows, which is what lets the same plan run as
    * a watermarked stream-stream join. Output (and oracle) identical to
    * joinThetaRange. */
  def joinRangeBucketed(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(
      col("event_id"), col("user_id"), col("ts"), col("event_type"))
    def bucket(c: Column): Column = floor(unix_timestamp(c) / 60)
    val a = e.toDF("a_id", "user_id", "a_ts", "a_type")
      .withColumn("bin",
        explode(array(bucket(col("a_ts")), bucket(col("a_ts")) + 1)))
    val b = e.toDF("b_id", "b_user", "b_ts", "b_type")
      .withColumn("b_bin", bucket(col("b_ts")))
    a.join(b,
        col("user_id") === col("b_user") && col("bin") === col("b_bin") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 60 SECONDS") &&
        col("a_id") =!= col("b_id"))
      .select(col("user_id"), col("a_id"), col("b_id"), col("a_type"), col("b_type"))
      .orderBy(col("user_id"), col("a_id"), col("b_id"))
  }

  /** As-of join: for each purchase event, the latest click by the same user
    * at/before the purchase time. No native as-of in Spark 4.1; equi-join on
    * user + time filter + row_number()=1 compiles to ONE shuffle on the equi
    * key — the same internal shape DuckDB/Flink use for ASOF. At 100 TB the
    * per-user fan-out is bounded by per-user activity, not table size, so
    * this stays linear; for heavy hitters, bucket ts and join (user, bucket)
    * ranges instead. */
  /** Forward as-of: for each purchase the FIRST click strictly AFTER it
    * (post-purchase attribution) — the direction mirror of [[joinAsof]],
    * completing the as-of family (backward window form, backward native
    * operator, forward window form). Same scale shape: the equi-conjunct
    * on user_id keeps the join hash-partitioned; the window ranks only a
    * user's own candidates. Ties break by min click_id. */
  def joinAsofForward(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val w = Window.partitionBy(col("purchase_id"))
      .orderBy(col("c_ts").asc, col("click_id").asc)
    p.join(c, p("user_id") === c("c_user") && col("c_ts") > col("p_ts"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("purchase_id"), col("user_id"), col("click_id"))
      .orderBy(col("purchase_id"))
  }

  /** NEAREST as-of: for each purchase the click with the smallest
    * |Δt| in EITHER direction within ±120 s — the third member of the
    * as-of family (backward, forward, nearest). The equi-conjunct on
    * user_id keeps the join hash-partitioned like its siblings; the
    * winner is a min_by over a fixed-width (|Δt µs| ‖ click_id)
    * composite key, so ties at equal distance break deterministically
    * toward the smaller click_id in both engines. */
  def joinAsofNearest(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val dtUs = abs(unix_micros(col("c_ts")) - unix_micros(col("p_ts")))
    val key = concat(
      lpad(dtUs.cast("string"), 20, "0"),
      lpad(col("click_id").cast("string"), 20, "0"))
    p.join(c, p("user_id") === c("c_user") && dtUs <= lit(120L * 1000000L))
      .groupBy(col("purchase_id"))
      .agg(
        min_by(col("click_id"), key).as("click_id"),
        min(dtUs).as("dt_us"),
        first(col("user_id")).as("user_id"))
      .select(col("purchase_id"), col("user_id"), col("click_id"), col("dt_us"))
      .orderBy(col("purchase_id"))
  }

  def joinAsof(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val w = Window.partitionBy(col("purchase_id"))
      .orderBy(col("c_ts").desc, col("click_id").desc)
    p.join(c, p("user_id") === c("c_user") && col("c_ts") <= col("p_ts"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("purchase_id"), col("user_id"), col("click_id"))
      .orderBy(col("purchase_id"))
  }

  /** Backward as-of with a 30-minute staleness tolerance: a purchase only
    * takes the latest PRIOR click if it is at most 30 minutes old —
    * feature-join freshness semantics (a stale feature row is worse than
    * no row). Purchases whose nearest click is older fall out entirely.
    *
    * Scale: the tolerance is part of the join predicate, so the range
    * bound SHRINKS the (purchase × earlier-click) candidate set the plain
    * as-of form materializes — the bounded-staleness variant is strictly
    * cheaper than the unbounded one at any volume. */
  def joinAsofTolerance(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val w = Window.partitionBy(col("purchase_id"))
      .orderBy(col("c_ts").desc, col("click_id").desc)
    p.join(c, p("user_id") === c("c_user") && col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("interval 30 minutes"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        (unix_timestamp(col("p_ts")) - unix_timestamp(col("c_ts"))).as("gap_s"))
      .orderBy(col("purchase_id"))
  }

  /** Same as-of semantics through the NATIVE operator
    * ([[graft.plans.AsOfJoin]] — custom LogicalPlan/Strategy/SparkPlan):
    * one shuffle per side and an O(n+m) per-partition merge with one
    * buffered row, instead of the join+window form's materialized
    * (purchase × earlier-click) candidate set. Oracle-gated with the same
    * SQL as join_asof — a hash-matched custom physical operator. */
  def joinAsofNative(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    graft.plans.AsOfJoin.asof(p, c,
        by = ("user_id", "c_user"), on = ("p_ts", "c_ts"), tie = ("purchase_id", "click_id"))
      .select(col("purchase_id"), col("user_id"), col("click_id"))
      .orderBy(col("purchase_id"))
  }

  /** Skew-mitigated join (salting): the fact side keys on event_type — 5
    * values, maximal skew; a plain shuffle join lands 1/5 of the table on
    * single reducers. The dim side is replicated ×16 with an explicit salt
    * and the fact salts deterministically, so partitioning becomes
    * (key, salt) — 80 evenly-loaded partitions instead of 5 hot ones.
    * Results are identical to the unsalted join (the oracle runs the plain
    * form). At 100 TB this is the manual fallback when AQE skew-join
    * splitting can't apply (e.g. aggregations keyed on the skewed column).
    */
  def joinSkewSalted(s: SparkSession, d: String): DataFrame = {
    val salts = 16
    val e = Tables.events(s, d)
    val dim = e.groupBy(col("event_type"))
      .agg(avg(col("value")).as("avg_value"))
    val saltedDim = dim.withColumn(
      "salt", explode(array((0 until salts).map(lit): _*)))
    val saltedFact = e.withColumn(
      "salt", pmod(col("event_id"), lit(salts.toLong)).cast("int"))
    saltedFact.hint("SHUFFLE_HASH")
      .join(saltedDim, Seq("event_type", "salt"))
      .select(col("event_id"), col("event_type"),
        round(col("avg_value"), 4).as("type_avg"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- §2.4 aggs

  /** Flagship: TPC-H Q1 shape over lineitem (FIXTURES.md template). */
  def aggPricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2)
          .as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Exact DECIMAL money aggregation — the alternative to cents-snapping:
    * prices cast to decimal(18,2) at the scan (HALF_UP, same rule as
    * DuckDB's ::DECIMAL cast on the identical doubles) and summed in
    * decimal128 space, where addition is associative — merge order
    * CANNOT perturb the result, unlike double sums. At 100 TB this is
    * the money-column contract: a sum over a trillion rows is exact and
    * partial-aggregable (decimal sums carry a 10^(38-18) overflow
    * headroom here), with no per-row floor() gymnastics. */
  def aggDecimalExact(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_extendedprice").cast("decimal(18,2)").as("price_dec"),
        col("l_quantity").cast("decimal(18,2)").as("qty_dec"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("price_dec")).as("sum_price_dec"),
        sum(col("qty_dec")).as("sum_qty_dec"),
        max(col("price_dec")).as("max_price_dec"),
        count(lit(1)).as("n"))
      // the SUM happens in decimal space (exact, associative); the final
      // cast to double is presentation only — both engines convert the
      // identical decimal to its nearest double (exact here: cents stay
      // under 2^53), sidestepping the two readers' decimal render
      // differences ("253942.00" vs "253942.0")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_price_dec").cast("double").as("sum_price"),
        col("sum_qty_dec").cast("double").as("sum_qty"),
        col("max_price_dec").cast("double").as("max_price"),
        col("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Grand totals, no grouping keys: single-row global aggregate (partial
    * per partition, final on one reducer — constant shuffle volume). */
  def aggGlobal(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(min(col("l_quantity")), 2).as("min_qty"),
        round(max(col("l_quantity")), 2).as("max_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"))

  /** Exact COUNT(DISTINCT user_id) per event type — expands to a two-phase
    * distinct aggregate (shuffle on (type,user) then on type). */
  def aggDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** Hot-dimension CACHING — the serving-layer idiom for a dim every
    * query touches: `.cache()` pins nation in executor memory and BOTH
    * readers below (the customer rollup and the region decoration) scan
    * the InMemoryRelation instead of re-reading parquet. PlanSpec pins
    * InMemoryTableScan in the executed plan. At 100 TB this is the
    * catalog-bounded dim tier (nations/regions/parts metadata), never
    * the fact — facts flow through, dims sit hot. */
  def cacheHotDim(s: SparkSession, d: String): DataFrame = {
    val n = Tables.nation(s, d).cache()
    val perNation = Tables.customer(s, d)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("n_regionkey"))
      .agg(count(lit(1)).as("n_cust"))
    perNation
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"), col("r_name"), col("n_cust"))
      .orderBy(col("n_name"))
  }

  /** Discrete percentiles (the value AT rank ⌈p·n⌉, never interpolated —
    * what "show me a real p95 event" dashboards want, and the semantics
    * `percentile_disc` has in ANSI SQL) via explicit rank selection so
    * BOTH engines share one definition: row_number over (value,
    * event_id) breaks duplicate-value ties identically, and the three
    * target ranks fall out of one conditional aggregation — no second
    * scan per percentile. Scale: one event_type shuffle (window + rollup
    * share the key), group state is 3 doubles. */
  def aggPercentileDisc(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    def at(p: Double) =
      round(max(when(col("rnk") === ceil(lit(p) * col("n")), col("value"))), 2)
    Tables.events(s, d)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wp))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        at(0.25).as("p25"), at(0.5).as("p50"), at(0.75).as("p75"))
      .orderBy(col("event_type"))
  }

  /** HLL++ approximate distinct — mergeable sketch, single shuffle of
    * constant-size state per key; THE scale answer for distinct counts.
    * Oracle-exempt (sketch): ScalaTest asserts ±2% of exact. */
  def aggApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy(col("event_type"))

  /** ROLLUP over (n_name within r_name): hierarchy totals + grouping ids. */
  def aggRollup(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_bal"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("r_name"), col("n_name"))

  /** CUBE over (mktsegment, orderstatus). */
  def aggCube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("c_mktsegment"), col("o_orderstatus"))

  /** Explicit GROUPING SETS: ((mktsegment), (orderstatus), ()). gid is a
    * portable CASE over the null pattern (valid because fixtures carry no
    * real NULLs, FIXTURES.md) — identical SQL shape runs on DuckDB. */
  def aggGroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .createOrReplaceTempView("ord_cust")
    s.sql(
      """SELECT c_mktsegment, o_orderstatus, count(1) AS n,
        |       round(sum(o_totalprice), 2) AS sum_price,
        |       (CASE WHEN c_mktsegment IS NULL THEN 2 ELSE 0 END) +
        |       (CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS gid
        |FROM ord_cust
        |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
        |ORDER BY gid, c_mktsegment, o_orderstatus""".stripMargin)
  }

  /** Statistical aggregates at 4 dp. */
  def aggStats(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qty_price"))
      .orderBy(col("l_returnflag"))

  /** Exact median & p90 per event type. Exact percentile (not the sketch)
    * so the oracle hash-matches; at 100 TB swap to approx_percentile and an
    * ε-bound check — noted here as the scale path. */
  /** Query key `agg_geometric_mean`: the multiplicative-mean rung of the
    * mean family (arithmetic agg_stats / winsorized / THIS) — the right
    * average for ratio-scaled positives (growth factors, latencies,
    * per-token losses: one 100× value moves the arithmetic mean 100×,
    * the geometric mean by ×100^(1/n)). exp(mean(ln x)) over value > 0;
    * each ln snaps to the 1e-6 grid BEFORE the sum (drift_js's ln
    * recipe — identical doubles ⇒ identical longs), the mean divides
    * exact integers, ONE exp at the end. Scale: one partial aggregate.
    * Oracle = identical SQL in DuckDB. */
  def aggGeometricMean(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .where(col("value") > 0)
      .select(col("event_type"),
        floor(log(col("value")) * 1e6 + 0.5).cast("long").as("g"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("g")).as("sg"))
      .select(col("event_type"), col("n"),
        round(exp(col("sg").cast("double") / col("n").cast("double") /
          lit(1e6)), 4).as("gmean"))
      .orderBy(col("event_type"))

  /** Query key `agg_winsorized_mean`: the robust-mean rung between the
    * plain mean (agg_stats) and the median (agg_percentile) — clip each
    * value into its type's [p5, p95] band, then average: the standard
    * way a metrics pipeline reports a per-segment mean that one bot
    * user or one refund cannot drag (feature_robust_scale is the
    * per-ROW robust transform; this is the per-GROUP robust summary).
    * Both engines interpolate percentiles identically (the
    * agg_percentile pin), the clip compares identical doubles, and
    * each clipped value snaps to the 1e-4 grid BEFORE the sum so the
    * mean divides exact integers.
    *
    * Scale: one percentile aggregate per type broadcast back (never a
    * rank window over the fact table), clip map-side, one partial
    * aggregate. Oracle = identical SQL in DuckDB. */
  def aggWinsorizedMean(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val bounds = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.05)").as("lo"),
        expr("percentile(value, 0.95)").as("hi"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .withColumn("g",
        floor(least(greatest(col("value"), col("lo")), col("hi")) * 1e4
          + 0.5).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("g")).as("sg"),
        min(col("lo")).as("lo0"), min(col("hi")).as("hi0"))
      .select(col("event_type"), col("n"),
        round(col("lo0"), 4).as("lo"), round(col("hi0"), 4).as("hi"),
        round(col("sg").cast("double") / col("n").cast("double") / lit(1e4),
          4).as("wmean"))
      .orderBy(col("event_type"))
  }

  def aggPercentile(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"))
      .orderBy(col("event_type"))

  /** CDC latest-snapshot upsert: one row per (user_id, event_type), the
    * most recent event wins — the feature-store "current state" compaction
    * every training pipeline runs over its event log. Written as an
    * AGGREGATION (max_by), not a window: partial aggregation combines
    * map-side, so the shuffle carries one candidate row per key per
    * partition instead of every event — the scale shape. Ties on ts break
    * by event_id DESC via a composite key, so the survivor is
    * deterministic even when two events share a timestamp (DuckDB 1.0's
    * arg_max can't order by a struct, so both sides key on a fixed-width
    * zero-padded string — lexicographic == numeric for the non-negative
    * epoch/id domains). */
  def cdcUpsertLatest(s: SparkSession, d: String): DataFrame =
    upsertLatestTransform(Tables.events(s, d))
      .orderBy(col("user_id"), col("event_type"))

  /** The latest-wins aggregation itself, shared between the oracle-gated
    * batch key above and the streaming parity test (StreamingParitySpec):
    * a pure declarative aggregate, so the SAME expression maintains the
    * current-state table incrementally under a multi-micro-batch replay
    * (complete mode) and in one shot over the batch table. */
  private[graft] def upsertLatestTransform(ev: DataFrame): DataFrame = {
    val key = latestTsIdKey(col("ts"), col("event_id"))
    ev.groupBy(col("user_id"), col("event_type"))
      .agg(
        max_by(col("event_id"), key).as("event_id"),
        round(max_by(col("value"), key), 2).as("value"),
        max(col("ts")).as("ts"))
  }

  /** Fixed-width composite key encoders — lexicographic == the intended
    * composite order for non-negative domains. Both engines' arg-max
    * family refuses struct keys (DuckDB 1.0 has no struct overload), so
    * deterministic tie-breaks encode as zero-padded strings; shared with
    * the property tests that pin the tie semantics on synthetic ties. */
  private[graft] def latestTsIdKey(ts: Column, id: Column): Column =
    concat(
      lpad(unix_micros(ts).cast("string"), 20, "0"),
      lpad(id.cast("string"), 20, "0"))

  /** Query key `sql_merge_upsert`: MERGE INTO semantics — the one CDC
    * shape the family still lacked (scd2 keeps history, upsert_latest
    * keeps latest state, cdc_deletes retires keys; MERGE is the ANSI
    * three-clause form a warehouse applies a change BATCH with: WHEN
    * MATCHED AND op='D' THEN DELETE / WHEN MATCHED THEN UPDATE / WHEN
    * NOT MATCHED AND op<>'D' THEN INSERT). Target = the current-state
    * compaction of the even-event_id half of the log; source = the
    * latest change per key from the odd half, tombstones derived
    * deterministically (odd ids: event_id % 5 = 0 → 'D', the
    * cdc_deletes convention shifted to the odd domain). MERGE requires
    * a UNIQUE source row per key — the latest-wins pre-compaction (the
    * same zero-padded (ts, event_id) arg-max as cdc_upsert_latest)
    * guarantees it by construction instead of failing at runtime.
    * Output carries an `action` column (delete rows are ABSENT;
    * keep/update/insert label the survivors) so the clause routing
    * itself is what the oracle checks.
    *
    * Spark has native MERGE INTO only for v2/transactional tables, so
    * over parquet the operator IS the relational expansion: two
    * partial-aggregable compactions + ONE full-outer equi-join on the
    * key — both sides shuffle once on (user_id, event_type) and
    * co-partition, the clause routing is map-side CASE logic after the
    * join. DuckDB 1.0.0 has no MERGE statement either (parser error,
    * measured), so the oracle spells the identical semantics in
    * portable SQL: same two compactions, same FULL OUTER JOIN, same
    * CASE routing. */
  def sqlMergeUpsert(s: SparkSession, d: String): DataFrame = {
    val key = latestTsIdKey(col("ts"), col("event_id"))
    def latest(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"), col("event_type"))
        .agg(
          max_by(col("event_id"), key).as("event_id"),
          max_by(col("ts"), key).as("ts"),
          round(max_by(col("value"), key), 2).as("value"))
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts"), col("value"))
    val target = latest(ev.where(col("event_id") % 2 === 0))
      .select(col("user_id"), col("event_type"),
        col("event_id").as("t_id"), col("ts").as("t_ts"),
        col("value").as("t_v"))
    val source = latest(ev.where(col("event_id") % 2 === 1))
      .select(col("user_id"), col("event_type"),
        col("event_id").as("s_id"), col("ts").as("s_ts"),
        col("value").as("s_v"),
        when(col("event_id") % 5 === 0, lit("D")).otherwise(lit("U"))
          .as("op"))
    target.join(source, Seq("user_id", "event_type"), "full_outer")
      // matched-delete drops the key; an unmatched tombstone is a no-op
      .where(col("op").isNull || col("op") === "U")
      .select(col("user_id"), col("event_type"),
        coalesce(col("s_id"), col("t_id")).as("event_id"),
        coalesce(col("s_ts"), col("t_ts")).as("ts"),
        coalesce(col("s_v"), col("t_v")).as("value"),
        when(col("op").isNull, lit("keep"))
          .when(col("t_id").isNotNull, lit("update"))
          .otherwise(lit("insert")).as("action"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Minimizing this key == (max count, then lexicographically min value).
    * Base = Long.MaxValue so the inversion stays non-negative (and the pad
    * fixed-width, hence order-preserving) for ANY possible count — a 1e6
    * base would go negative past a million rows per group and a '-'-prefixed
    * lpad silently breaks lexicographic order (ADVICE round-3). */
  private[graft] def invertedCountKey(n: Column, v: Column): Column =
    concat(lpad((lit(Long.MaxValue) - n).cast("string"), 19, "0"), v)

  /** Unpivot (melt) — the inverse reshaping op next to agg_pivot: the
    * per-(flag, status) pricing profile melted from wide to long, one row
    * per measure. `Dataset.unpivot` plans as a generator expand, not a
    * union of self-scans — the input is read once regardless of how many
    * measures melt. */
  def aggUnpivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"))
      .unpivot(
        Array(col("l_returnflag"), col("l_linestatus")),
        Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
        "measure", "value")
      .orderBy(col("l_returnflag"), col("l_linestatus"), col("measure"))

  /** Statistical mode per user — most frequent event_type, ties broken by
    * the lexicographically smallest value so the answer is deterministic
    * (both Spark's max_by and DuckDB's mode() pick arbitrarily on ties).
    * Two-level aggregation, both partial+final HashAggregates: the first
    * shuffle carries (user, type) counts, the second one row per user.
    * Tie-break via a fixed-width (inverted count ‖ value) string key,
    * minimized — the same encoding trick as cdc_upsert_latest, because
    * neither engine's arg-min orders by a struct. */
  def aggMode(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    counts.groupBy(col("user_id"))
      .agg(
        min_by(col("event_type"),
          invertedCountKey(col("n"), col("event_type"))).as("mode_event"),
        max(col("n")).as("n_mode"))
      .orderBy(col("user_id"))
  }

  /** Bitwise aggregates — bit_and / bit_or / bit_xor of the user-id set
    * per event type (the bitmask-rollup surface: permission masks,
    * feature flags, shard membership words all aggregate this way). All
    * three are commutative+associative integer folds, so they partial-
    * aggregate map-side and merge in any order with exact results. */
  def aggBitwise(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        expr("bit_and(user_id)").as("band"),
        expr("bit_or(user_id)").as("bor"),
        expr("bit_xor(user_id)").as("bxor"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Heavy hitters via count-min sketch: one mergeable fixed-size sketch
    * over the whole stream (eps=0.001, seed pinned), then point estimates
    * for the known candidate set. CMS is THE streaming heavy-hitter
    * structure: counters only, commutative merge, estimate = min over
    * rows — deterministic regardless of partition order. Estimates
    * overcount by at most eps·N, so the gate is a ScalaTest ε-bound
    * against exact counts (oracle-exempt, like the HLL family). The
    * sketch collect to the driver is a few KB — the same bounded-state
    * boundary as an approx_count_distinct final merge. */
  def aggHeavyHittersCms(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bytes = Tables.events(s, d)
      .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("sk"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    Seq("click", "view", "purchase", "signup", "error")
      .map(t => (t, cms.estimateCount(t)))
      .toDF("event_type", "est_n")
      .orderBy(col("event_type"))
  }

  /** Approximate percentile — the declared 100 TB path beside the exact
    * [[aggPercentile]]: a mergeable t-digest-style sketch (fixed accuracy
    * parameter ⇒ constant-size state per key, one shuffle) instead of the
    * exact percentile's full value collection per group. Oracle-exempt
    * (sketch); ScalaTest asserts the ε-bound against the exact form. */
  def aggApproxPercentile(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        round(expr("approx_percentile(value, 0.5, 1000)"), 4).as("p50"),
        round(expr("approx_percentile(value, 0.9, 1000)"), 4).as("p90"))
      .orderBy(col("event_type"))

  /** Deterministic collect: sorted list of event types per user. The list
    * is emitted as a comma-joined STRING — the collect/sort semantics are
    * fully exercised, but raw array columns crash the driver's pandas
    * row-sort comparator (unhashable ndarray), so oracle-gated output is
    * always scalar-typed. */
  def aggCollect(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(concat_ws(",", sort_array(collect_list(col("event_type")))).as("types"))
      .orderBy(col("user_id"))

  /** Pivot on the 5 fixed event types (explicit value list → no extra
    * distinct-values job; required at scale). */
  def aggPivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .count()
      .na.fill(0L)
      .orderBy(col("user_id"))

  // ------------------------------------------------------- §2.6 sort/limit

  /** Multi-key ORDER BY with mixed direction: RangePartitioning sort. */
  def sortMulti(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"), col("p_brand"), col("p_size"),
        round(col("p_retailprice"), 2).as("p_retailprice"))
      .orderBy(col("p_brand").asc, col("p_size").desc, col("p_partkey").asc)

  /** Global top-10 by totalprice: TakeOrderedAndProject — per-partition
    * top-k then driver merge, never a full sort at scale. */
  def topkGlobal(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** LIMIT/OFFSET page (Spark 3.4+ offset). */
  def limitOffset(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy(col("o_orderkey"))
      .offset(100)
      .limit(25)

  // ---------------------------------------------------------- §2.7 set ops

  /** UNION ALL then UNION-distinct of two event slices. */
  def setUnion(s: SparkSession, d: String): DataFrame = {
    val clicks = Tables.events(s, d).where(col("event_type") === "click")
      .select(col("user_id"))
    val purchases = Tables.events(s, d).where(col("event_type") === "purchase")
      .select(col("user_id"))
    clicks.unionByName(purchases).distinct()
      .orderBy(col("user_id"))
  }

  /** Schema-evolution-tolerant union: two feeds whose projections drifted
    * (clicks carry `value`, purchases carry a day stamp) merge by COLUMN
    * NAME with missing columns null-filled — `unionByName(allowMissing
    * Columns = true)`, the ingestion-side member of the set family
    * (positional union corrupts silently the day one side adds a
    * column). Nulls coalesce to sentinels for the scalar comparator.
    *
    * Scale: a union is plan-level concatenation — no shuffle but the
    * output sort. */
  def setUnionByName(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"),
        round(col("value"), 2).as("value"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        date_trunc("day", col("ts")).as("day"))
    clicks.unionByName(purchases, allowMissingColumns = true)
      .select(col("event_id"), col("user_id"),
        coalesce(col("value"), lit(-1.0)).as("value"),
        coalesce(col("day"), lit("1970-01-01").cast("timestamp")).as("day"))
      .orderBy(col("event_id"))
  }

  /** Clickers ∩ purchasers (INTERSECT = distinct semantics). */
  def setIntersect(s: SparkSession, d: String): DataFrame = {
    val clicks = Tables.events(s, d).where(col("event_type") === "click")
      .select(col("user_id"))
    val purchases = Tables.events(s, d).where(col("event_type") === "purchase")
      .select(col("user_id"))
    clicks.intersect(purchases).orderBy(col("user_id"))
  }

  /** High-value clickers ∖ high-value purchasers (EXCEPT = distinct
    * semantics). The value>300 slices genuinely differ at every SF; the
    * unconditioned clicker/purchaser sets were identical in the fixtures,
    * making the except verify vacuously on 0 rows. */
  def setExcept(s: SparkSession, d: String): DataFrame = {
    val clicks = Tables.events(s, d)
      .where(col("event_type") === "click" && col("value") > 300.0)
      .select(col("user_id"))
    val purchases = Tables.events(s, d)
      .where(col("event_type") === "purchase" && col("value") > 300.0)
      .select(col("user_id"))
    clicks.except(purchases).orderBy(col("user_id"))
  }

  /** Multiset INTERSECT ALL: each clicker-purchaser survives
    * min(#clicks, #purchases) times — the bag-semantics counterpart of
    * set_intersect (frequency-preserving overlap, what dedup accounting
    * actually needs). Spark plans a count-based aggregate + generate,
    * not a distinct. */
  def setIntersectAll(s: SparkSession, d: String): DataFrame = {
    val clicks = Tables.events(s, d).where(col("event_type") === "click")
      .select(col("user_id"))
    val purchases = Tables.events(s, d).where(col("event_type") === "purchase")
      .select(col("user_id"))
    clicks.intersectAll(purchases).orderBy(col("user_id"))
  }

  /** Multiset EXCEPT ALL: clicks minus purchases per user with
    * multiplicity (max(#clicks − #purchases, 0) copies survive). */
  def setExceptAll(s: SparkSession, d: String): DataFrame = {
    val clicks = Tables.events(s, d).where(col("event_type") === "click")
      .select(col("user_id"))
    val purchases = Tables.events(s, d).where(col("event_type") === "purchase")
      .select(col("user_id"))
    clicks.exceptAll(purchases).orderBy(col("user_id"))
  }

  /** Blocked fuzzy self-match on part names (entity resolution's core
    * join): name pairs within Levenshtein ≤ 4 sharing a blocking key
    * (the product noun — the last name token), each pair carrying how
    * many parts bear each spelling. The quadratic step runs on the
    * DISTINCT-NAME table — dedupe the join keys BEFORE the pairwise
    * scan, so the edit-distance work is vocabulary², not rows²; the
    * row-level weight (n_a/n_b) attaches as a pre-aggregated count.
    * Both engines run the identical exact Levenshtein, so the op is
    * oracle-gated.
    *
    * Scale: at 100 TB the name dictionary is still dictionary-sized;
    * blocking bounds each pairwise group, and the only row-level pass
    * is the distinct+count aggregate. */
  def joinFuzzyName(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n"))
      .withColumn("blk", substring_index(col("p_name"), " ", -1))
    val a = names.select(col("blk"), col("p_name").as("name_a"),
      col("n").as("n_a"))
    val b = names.select(col("blk"), col("p_name").as("name_b"),
      col("n").as("n_b"))
    a.join(b, Seq("blk"))
      .where(col("name_a") < col("name_b") &&
        levenshtein(col("name_a"), col("name_b")) <= 4)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).as("dist"),
        col("n_a"), col("n_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** Exact row dedup on documents.text with a DETERMINISTIC survivor:
    * keep min(doc_id) per text (raw dropDuplicates keeps an arbitrary row —
    * never acceptable in a hash-matched query, SURVEY.md §2.7). */
  def dedupExactRows(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
}
