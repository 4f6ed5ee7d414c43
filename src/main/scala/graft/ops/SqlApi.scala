package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}
import graft.io.Tables

/** The SQL front door (SURVEY.md §3: `spark.sql(...)` is the second entry
  * point next to the DataFrame API — a user of the reference engine writes
  * SQL). Tables register as temp views per session (idempotent, cheap:
  * view = named logical plan, no materialization). Both paths compile to
  * the same Catalyst plans; these queries pin that equivalence and add the
  * subquery surface (scalar + correlated), which only SQL expresses
  * directly and Catalyst decorrelates into joins
  * (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery).
  */
object SqlApi {

  // Re-registering 10 views costs analyzer work per call; remember which
  // sfDir each session's views currently point at and only re-register on
  // a change (tests hop between scale factors in one session).
  private val current =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  private def ensureViews(s: SparkSession, d: String): Unit =
    if (current.get(s) != d) {
      Tables.names.foreach { t =>
        Tables(s, d, t).createOrReplaceTempView(t)
      }
      // record AFTER registration succeeds — a mid-loop failure must not
      // leave half-stale views that later calls skip repairing
      current.put(s, d)
    }

  /** TPC-H-Q3-shaped 3-table join + agg + top-k, written as SQL. The plan
    * must be identical in kind to the DataFrame form: pushed filters,
    * broadcast of the dimension side under AQE, partial+final agg,
    * TakeOrderedAndProject. */
  def sqlTpchQ3(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT o.o_orderkey,
             floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 1e2 AS revenue,
             c.c_mktsegment
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
      GROUP BY o.o_orderkey, c.c_mktsegment
      ORDER BY revenue DESC, o_orderkey ASC
      LIMIT 10
    """)
  }

  /** TPC-H-Q5-shaped 6-table join composite — the join-ORDER stress case:
    * three fact-sized hops (customer→orders→lineitem) closed by the
    * local-supplier condition (c_nationkey = s_nationkey, a second equi
    * key on the supplier join) and two dim hops to the region filter.
    * The planner must push the region predicate down the dim chain and
    * broadcast every sub-threshold side; revenue is cents-snapped BEFORE
    * the sum (BIGINT), so the big-group aggregate is merge-order-exact
    * on both engines (the q3 per-order groups are small enough to dodge
    * double-sum nondeterminism; per-NATION groups are not). */
  def sqlTpchQ5(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT n.n_name,
             sum(cast(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) as bigint)) / 1e2 AS revenue
      FROM customer c
      JOIN orders o    ON c.c_custkey = o.o_custkey
      JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
      JOIN supplier s2 ON l.l_suppkey = s2.s_suppkey AND c.c_nationkey = s2.s_nationkey
      JOIN nation n    ON s2.s_nationkey = n.n_nationkey
      JOIN region r    ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= timestamp '1996-01-01'
        AND o.o_orderdate <  timestamp '1997-01-01'
      GROUP BY n.n_name
      ORDER BY revenue DESC, n_name
    """)
  }

  /** TPC-H-Q18-shaped large-order probe — the big-group HAVING pattern:
    * the inner aggregate sums quantity over EVERY order (the full fact
    * cardinality), keeps the rare heavy tail (> 250), and the outer query
    * semi-joins the fact tables back to that key set. The plan stress is
    * the opposite of Q5's: not join order but aggregate-then-rejoin —
    * the HAVING subquery must plan as ONE shuffle on l_orderkey that the
    * outer lineitem join reuses (same key), never a broadcast of an
    * unbounded key set. Quantities are integral doubles → BIGINT sums
    * are exact on both engines; o_totalprice cents-snapped. */
  def sqlTpchQ18(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT c.c_custkey, o.o_orderkey, o.o_orderdate,
             floor(o.o_totalprice * 100 + 0.5) / 1e2 AS o_totalprice,
             sum(cast(l.l_quantity as bigint)) AS total_qty
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(cast(l_quantity as bigint)) > 250)
      GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
      ORDER BY total_qty DESC, o_orderkey
    """)
  }

  /** TPC-H-Q10-shaped returned-item report — the wide-group top-k stress:
    * a quarter's returned lineitems roll up revenue per CUSTOMER (a
    * group-by key near customer cardinality, unlike Q5's 5-nation
    * groups), decorated by the nation dim, top-20 by lost revenue. The
    * plan wants the date+returnflag predicates pushed into both fact
    * scans, nation broadcast, and a TakeOrderedAndProject instead of a
    * global sort — the aggregate's width (|customers| rows) is exactly
    * why the final ORDER BY must stay a top-k, never a full exchange.
    * Revenue cents-snapped per row before the BIGINT sum (merge-order
    * exact); c_acctbal snapped for the hash compare. */
  def sqlTpchQ10(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT c.c_custkey, c.c_name,
             sum(cast(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) as bigint)) / 1e2 AS revenue,
             floor(c.c_acctbal * 100 + 0.5) / 1e2 AS c_acctbal,
             n.n_name
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderdate >= timestamp '1996-01-01'
        AND o.o_orderdate <  timestamp '1996-04-01'
        AND l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20
    """)
  }

  /** TPC-H-Q7-shaped cross-nation volume report — the DISJUNCTIVE dim
    * filter stress: nation joins BOTH fact sides (supplier's and
    * customer's nation via two aliases of the same dim) and the
    * predicate ((n1=A and n2=B) or (n1=B and n2=A)) spans the two
    * aliases, so it cannot push into either dim scan alone — the
    * optimizer must keep both tiny nation sides broadcast and apply the
    * cross-alias residual after the last join, while the shipdate range
    * still pushes into the fact scan. Cents snapped per row before the
    * per-(nation,nation,year) BIGINT sum. */
  def sqlTpchQ7(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             sum(cast(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) as bigint)) / 1e2 AS revenue
      FROM lineitem l
      JOIN supplier s2 ON s2.s_suppkey = l.l_suppkey
      JOIN orders o    ON o.o_orderkey = l.l_orderkey
      JOIN customer c  ON c.c_custkey = o.o_custkey
      JOIN nation n1   ON s2.s_nationkey = n1.n_nationkey
      JOIN nation n2   ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= timestamp '1996-01-01'
        AND l.l_shipdate <  timestamp '1998-01-01'
      GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
      ORDER BY supp_nation, cust_nation, l_year
    """)
  }

  /** Uncorrelated scalar subquery: orders priced above the global average.
    * Plans as a one-row subquery broadcast into the filter — no join
    * explosion, one extra tiny job. */
  def sqlSubqueryScalar(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT o_orderkey, floor(o_totalprice * 100 + 0.5) / 1e2 AS o_totalprice
      FROM orders
      WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
      ORDER BY o_orderkey
    """)
  }

  /** Correlated EXISTS subquery: customers with at least one order above
    * their nation's average account balance... kept simple: an EXISTS
    * correlated on the outer key, which RewritePredicateSubquery turns
    * into a LEFT SEMI join — the scalable decorrelated form (never a
    * per-row re-execution). */
  def sqlSubqueryExists(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT c_custkey, c_name
      FROM customer c
      WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
          AND o.o_totalprice > 100000.0
      )
      ORDER BY c_custkey
    """)
  }

  /** Correlated scalar subquery in the SELECT list: each nation's customer
    * count — decorrelated into an aggregate + left outer join. */
  def sqlSubqueryScalarCorr(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT n_nationkey, n_name,
             (SELECT count(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey)
               AS n_customers
      FROM nation n
      ORDER BY n_nationkey
    """)
  }

  /** NOT IN over a NULLABLE subquery column — the null-aware anti join.
    * Plain anti join (join_anti, EXISTS) is wrong for NOT IN when the
    * inner column can be NULL: one inner NULL makes every outer row's
    * membership UNKNOWN and the result empty. The `nullif` keeps the
    * column nullable (the planner cannot prove otherwise) while the data
    * has no actual NULLs, so the result is non-vacuous AND the plan is
    * the null-aware variant.
    *
    * Scale: Catalyst plans single-column null-aware NOT IN as a
    * broadcast hash anti join (isNullAware) — a streamed probe, not the
    * nested-loop fallback multi-column NOT IN would force. */
  def sqlSubqueryNotIn(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT c_custkey, c_name
      FROM customer c
      WHERE c_custkey NOT IN (
        SELECT nullif(o.o_custkey, -1) FROM orders o
        WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 100000.0
      )
      ORDER BY c_custkey
    """)
  }

  /** LATERAL correlated subquery — the per-row subplan surface (top-2
    * orders per BUILDING customer) that only SQL expresses directly.
    * Catalyst decorrelates the ORDER BY + LIMIT lateral into a window
    * rank over one join, NOT a per-customer re-execution — the same plan
    * a hand-written win_topk_per_group gets, which is what makes the
    * surface safe at 100 TB. Order on the ROUNDED price with unique
    * tiebreakers. */
  def sqlLateralTopn(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT c.c_custkey, t.o_orderkey,
             floor(t.o_totalprice * 100 + 0.5) / 1e2 AS o_totalprice
      FROM customer c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      WHERE c.c_mktsegment = 'BUILDING'
      ORDER BY c.c_custkey, o_totalprice DESC, t.o_orderkey
    """)
  }

  /** Recursive CTE (Spark 4's WITH RECURSIVE — UnionLoop under the hood):
    * BFS over the symmetric part co-occurrence graph from its smallest
    * node, depth ≤ 3, min-distance per reached part. The one SQL surface
    * recursion alone expresses (iterative DataFrame loops like pagerank
    * unroll the plan per round instead); the oracle twin is the SAME
    * statement — recursion semantics pinned engine-to-engine.
    *
    * Scale: each iteration is one equi-join of the frontier against the
    * edge table; the depth guard bounds the loop, but UNION ALL recursion
    * enumerates WALKS (Spark does not support UNION-dedup recursion yet —
    * UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so on a DENSE graph the walk
    * count explodes regardless of depth — measured: the 10× ScaleStress
    * graph hits RECURSION_ROW_LIMIT_EXCEEDED. This operator is the SQL-
    * surface demo on sparse graphs; the production-scale BFS/closure is
    * the iterative min-label loop (dedup_cluster_cc, graph_pagerank),
    * which dedups the frontier every round and is stress-tested. */
  def sqlRecursiveBfs(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    // Materialize the (symmetric) edge table ONCE behind a cached view:
    // Spark's UnionLoop re-evaluates the anchor's dependencies on every
    // iteration, so an edge table written as a CTE re-ran the full 600 k-
    // row pair build per depth step (measured 9.7 s at sf0.1 → 0.9 s).
    // DuckDB materializes multi-referenced CTEs once, so the oracle twin
    // keeps the same edges as a CTE — identical relation, different
    // caching idiom, and the recursion core below is shared verbatim.
    val e0 = Analytics.coPairCounts(s, d)
    // the bench harness owns this cache entry (it clears the SQL cache
    // between queries); the op keeps it alive for the whole recursion
    e0.select(col("p1").as("src"), col("p2").as("dst"))
      .union(e0.select(col("p2"), col("p1")))
      .persist()
      .createOrReplaceTempView("graft_co_edges")
    s.sql(SqlApi.recursiveBfsCore("graft_co_edges"))
  }

  /** SQL DDL round-trip — CREATE TABLE ... USING parquet AS SELECT, then
    * read the catalog table back: the materialize-then-serve pattern a
    * SQL-first user runs daily, exercising the session catalog + the
    * datasource writer through the SQL front door (not the DataFrame
    * writer API the sink_* keys use). The location is wiped first so the
    * key is idempotent under the bench's min-of-3 protocol; cents
    * snapped per row before the BIGINT sum as usual. */
  def sqlCtasReadback(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    val enc = d.getBytes("UTF-8").map(b => f"$b%02x").mkString
    val loc = s"${sys.props("java.io.tmpdir")}/graft_ctas_$enc"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    s.sql("DROP TABLE IF EXISTS g_ctas_priority")
    rm(new java.io.File(loc))
    s.sql(s"""
      CREATE TABLE g_ctas_priority USING parquet LOCATION '$loc' AS
      SELECT o.o_orderpriority,
             count(*) AS n_orders,
             sum(cast(floor(o.o_totalprice * 100 + 0.5) as bigint)) / 1e2 AS sum_price
      FROM orders o
      GROUP BY o.o_orderpriority
    """)
    s.sql("""
      SELECT o_orderpriority, n_orders, sum_price
      FROM g_ctas_priority
      ORDER BY o_orderpriority
    """)
  }

  /** SQL optimizer HINTS — the knob a SQL-first user reaches for when
    * the planner guesses wrong at scale: `/*+ BROADCAST(n) */` pins the
    * dim to a broadcast join regardless of size estimates. The result
    * must be hint-invariant (same rows as the unhinted form — that is
    * what the oracle certifies); the PLAN must actually honor the hint
    * (PlanSpec pins BroadcastHashJoin here and SortMergeJoin under a
    * MERGE hint on the same query). */
  def sqlJoinHints(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT /*+ BROADCAST(n) */ n.n_name, count(*) AS n_cust,
             sum(cast(floor(c.c_acctbal * 100 + 0.5) as bigint)) / 1e2 AS sum_bal
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
      ORDER BY n.n_name
    """)
  }

  /** SQL PIVOT clause through the front door — the wide-report surface
    * (the DataFrame twin is agg_pivot; this pins the PARSER path:
    * Catalyst rewrites PIVOT into the same conditional aggregation).
    * Cents stay BIGINT inside the pivot aggregate; the outer select does
    * the presentation divide, so every bucket sum is merge-order-exact. */
  def sqlPivot(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT event_type,
             q0 / 1e2 AS v0, q1 / 1e2 AS v1, q2 / 1e2 AS v2, q3 / 1e2 AS v3
      FROM (
        SELECT event_type, user_id % 4 AS quad,
               cast(floor(value * 100 + 0.5) as bigint) AS cents
        FROM events)
      PIVOT (sum(cents) FOR quad IN (0 AS q0, 1 AS q1, 2 AS q2, 3 AS q3))
      ORDER BY event_type
    """)
  }

  /** SQL UNPIVOT clause — the wide→long normalization surface (DataFrame
    * twin: agg_unpivot via stack()). The wide row is built from exact
    * integer/cents aggregates first, so unpivoting only reshapes. */
  def sqlUnpivot(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT event_type, metric, val
      FROM (
        SELECT event_type,
               cast(count(*) as double) AS n,
               sum(cast(floor(value * 100 + 0.5) as bigint)) / 1e2 AS sum_v,
               floor(max(value) * 100 + 0.5) / 1e2 AS max_v
        FROM events GROUP BY event_type)
      UNPIVOT (val FOR metric IN (n, sum_v, max_v))
      ORDER BY event_type, metric
    """)
  }

  /** The MERGE-hinted twin of [[sqlJoinHints]] (not a query key — the
    * PlanSpec pin runs it to assert the planner obeys the opposite
    * instruction on the identical query). */
  def sqlJoinHintsMerge(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT /*+ MERGE(n) */ n.n_name, count(*) AS n_cust,
             sum(cast(floor(c.c_acctbal * 100 + 0.5) as bigint)) / 1e2 AS sum_bal
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
      ORDER BY n.n_name
    """)
  }

  /** TPC-H-Q17-shaped small-quantity probe — the CORRELATED SCALAR AGG
    * subquery stress: every brand-filtered lineitem compares its quantity
    * against 0.2 × the per-part average quantity, a subquery correlated on
    * l_partkey. Catalyst must decorrelate
    * (RewriteCorrelatedScalarSubquery) into ONE aggregate over lineitem
    * keyed by partkey joined back to the probe side — never a per-row
    * re-scan. Quantities are integral doubles, so the inner avg is an
    * exact-integer-sum / count divide (merge-order-proof); revenue is
    * cents-snapped per row before the BIGINT sum, and the final /7 is a
    * divide of exact integers in double. (The reference Q17 filters one
    * brand to a scalar; grouping a brand triple keeps the identical
    * correlation shape with a non-degenerate result.) */
  def sqlTpchQ17(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT p.p_brand,
             sum(cast(floor(l.l_extendedprice * 100 + 0.5) as bigint)) / 7e0 / 1e2
               AS avg_yearly
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        AND l.l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey)
      GROUP BY p.p_brand
      ORDER BY p_brand
    """)
  }

  /** TPC-H-Q4-shaped late-shipment priority report — correlated EXISTS
    * whose residual references an OUTER-side EXPRESSION (l_shipdate >
    * o_orderdate + 60 days): RewritePredicateSubquery must decorrelate
    * into a left semi join keyed on o_orderkey carrying the shipdate
    * inequality as the join residual — one fact shuffle, no per-order
    * probe. The quarter filter pushes into the orders scan; counts are
    * exact integers. (Fixtures lack commit/receipt dates, so "late" =
    * shipped over 60 days after order date.) */
  def sqlTpchQ4(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT o.o_orderpriority, count(*) AS order_count
      FROM orders o
      WHERE o.o_orderdate >= timestamp '1996-01-01'
        AND o.o_orderdate <  timestamp '1996-04-01'
        AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS)
      GROUP BY o.o_orderpriority
      ORDER BY o_orderpriority
    """)
  }

  /** TPC-H-Q19-shaped disjunctive-predicate revenue — the OR-of-ANDs
    * pushdown stress: three (brand, size-range, quantity-range) arms
    * reference BOTH join sides, so the disjunction itself can only
    * evaluate after the join; the planner must still derive the
    * single-side implications (brand IN (…) into the part scan, the
    * quantity envelope into the lineitem scan) instead of scanning
    * either table fully. Grouped per brand; cents snapped before the
    * BIGINT sum. */
  def sqlTpchQ19(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT p.p_brand,
             sum(cast(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) as bigint)) / 1e2 AS revenue,
             count(*) AS n
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
             AND l.l_quantity >= 1 AND l.l_quantity <= 11)
         OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
             AND l.l_quantity >= 10 AND l.l_quantity <= 20)
         OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
             AND l.l_quantity >= 20 AND l.l_quantity <= 30)
      GROUP BY p.p_brand
      ORDER BY p_brand
    """)
  }

  /** TPC-H-Q21-shaped waiting-supplier report — the DOUBLE-correlated
    * EXISTS + NOT EXISTS stress (the hardest decorrelation in the TPC-H
    * suite): a supplier is "waiting" on a finished multi-supplier order
    * when some OTHER supplier shipped on the order (EXISTS → left semi on
    * l_orderkey) but nobody else shipped at-or-after it (NOT EXISTS with
    * a correlated INEQUALITY → left anti on l_orderkey with the
    * l_shipdate residual). Both rewrites must key the fact-to-fact joins
    * on l_orderkey — one shuffle key shared by semi, anti, and the probe;
    * a per-row subquery re-scan would be O(n²). The fixtures lack
    * commit/receipt dates, so "kept waiting" = strictly-latest shipdate
    * on the order (ties excluded by the >= on both engines). */
  def sqlTpchQ21(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT s.s_name, count(*) AS numwait
      FROM supplier s
      JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE o.o_orderstatus = 'F'
        AND n.n_name IN ('NATION_1', 'NATION_2')
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate >= l1.l_shipdate)
      GROUP BY s.s_name
      ORDER BY numwait DESC, s_name
      LIMIT 20
    """)
  }

  /** TPC-H-Q22-shaped dormant-customer report — uncorrelated scalar
    * subquery + NOT EXISTS anti join: rich customers (balance above the
    * positive-balance average) with no orders at all, rolled up per
    * market segment. The above-average comparison is the classic
    * cross-engine trap: avg() of doubles is merge-order-dependent, so a
    * boundary customer could flip between engines. Instead the predicate
    * cross-multiplies in EXACT integer space — cents(c) · |positives| >
    * Σ cents(positives) — two uncorrelated one-row subqueries both
    * engines evaluate exactly; no double ever carries an accumulated sum.
    * "Dormant" = no order since 2000-01-01 (every fixture customer has
    * SOME order, so the pure no-orders form would be vacuous); the date
    * predicate sits INSIDE the NOT EXISTS, so the rewrite must push it
    * into the anti join's build side, not post-filter the probe. The
    * NOT EXISTS plans as a left anti join of customer against the
    * filtered orders key set (broadcast at this SF, shuffled at scale —
    * either way keyed, never looped). */
  def sqlTpchQ22(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT c.c_mktsegment,
             count(*) AS numcust,
             sum(cast(floor(c.c_acctbal * 100 + 0.5) as bigint)) / 1e2 AS totacctbal
      FROM customer c
      WHERE cast(floor(c.c_acctbal * 100 + 0.5) as bigint)
              * (SELECT count(*) FROM customer c2 WHERE c2.c_acctbal > 0.0)
            > (SELECT sum(cast(floor(c3.c_acctbal * 100 + 0.5) as bigint))
               FROM customer c3 WHERE c3.c_acctbal > 0.0)
        AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= timestamp '2000-01-01')
      GROUP BY c.c_mktsegment
      ORDER BY c_mktsegment
    """)
  }

  /** TPC-H Q1 through the SQL front door — the pricing summary as the
    * reference user writes it (agg_pricing_summary is the DataFrame
    * twin, different column set): per-row cents snapping BEFORE every
    * money sum (BIGINT, merge-order-exact), quantity summed as BIGINT,
    * the one avg as exact-sum ÷ count in a single double divide. */
  def sqlTpchQ1(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT l_returnflag, l_linestatus,
             sum(cast(l_quantity as bigint)) AS sum_qty,
             sum(cast(floor(l_extendedprice * 100 + 0.5) as bigint)) / 1e2 AS sum_base_price,
             sum(cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) as bigint)) / 1e2 AS sum_disc_price,
             sum(cast(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) as bigint)) / 1e2 AS sum_charge,
             cast(sum(cast(l_quantity as bigint)) as double) / count(*) AS avg_qty,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= timestamp '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """)
  }

  /** TPC-H Q6 — the forecasting-revenue scan: ONE pass, no join, the
    * predicate trio (date range + discount band + quantity cap) must
    * reach the parquet scan as pushed filters; a single global sum of
    * per-row cents-snapped BIGINTs. */
  def sqlTpchQ6(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT sum(cast(floor(l_extendedprice * l_discount * 100 + 0.5) as bigint)) / 1e2 AS revenue
      FROM lineitem
      WHERE l_shipdate >= timestamp '1997-01-01' AND l_shipdate < timestamp '1998-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07
        AND l_quantity < 24
    """)
  }

  /** TPC-H Q8 (adapted to the fixture's flat p_type vocabulary and
    * NATION_n names) — the market-share composite: an 8-table join
    * with nation aliased TWICE (customer's nation chains to the region
    * filter, supplier's nation is the share dimension), conditional and
    * total cents sums in one aggregate, one double divide per year.
    * The planner must keep both nation hops broadcast and derive the
    * date/type filters into the scans. */
  def sqlTpchQ8(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT o_year,
             floor(1e6 * share_rev / total_rev + 0.5) / 1e6 AS mkt_share
      FROM (
        SELECT cast(year(o.o_orderdate) as bigint) AS o_year,
               sum(CASE WHEN n2.n_name = 'NATION_1'
                   THEN cast(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) as bigint)
                   ELSE cast(0 as bigint) END) AS share_rev,
               sum(cast(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) as bigint)) AS total_rev
        FROM part p
        JOIN lineitem l  ON p.p_partkey = l.l_partkey
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN nation n1   ON c.c_nationkey = n1.n_nationkey
        JOIN region r    ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s2 ON l.l_suppkey = s2.s_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'AMERICA'
          AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= timestamp '1995-01-01'
          AND o.o_orderdate <  timestamp '1997-01-01'
        GROUP BY year(o.o_orderdate)
      )
      ORDER BY o_year
    """)
  }

  /** TPC-H Q13 (fixture carries no o_comment, so the NOT LIKE clause is
    * dropped — the SHAPE is the point): customer order-count
    * distribution via LEFT join + double grouping; count(o_orderkey)
    * counts only matched rows, so no-order customers land in the
    * c_count = 0 bucket instead of vanishing. Integer-exact end to
    * end. */
  def sqlTpchQ13(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT c_count, count(*) AS custdist
      FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
      )
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC
    """)
  }

  /** TPC-H Q14 — promo revenue share: conditional vs total cents sums
    * in ONE aggregate over the month's lineitem×part join (never two
    * scans), one double divide, floor-rounded to 4 places in the
    * identical operand order as the twin. */
  def sqlTpchQ14(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT floor(1e2 * promo_rev / total_rev * 1e4 + 0.5) / 1e4 AS promo_revenue
      FROM (
        SELECT sum(CASE WHEN p.p_type = 'PROMO'
                   THEN cast(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) as bigint)
                   ELSE cast(0 as bigint) END) AS promo_rev,
               sum(cast(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) as bigint)) AS total_rev
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= timestamp '1997-09-01'
          AND l.l_shipdate <  timestamp '1997-10-01'
      )
    """)
  }

  /** TPC-H Q15 — top supplier by quarter revenue: the revenue CTE is
    * referenced twice (join probe + scalar max), the classic
    * aggregate-then-argmax-by-subquery pattern; revenue keys stay
    * BIGINT cents so the max-equality join is exact, divided to dollars
    * only at presentation. */
  def sqlTpchQ15(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) as bigint)) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= timestamp '1996-01-01'
          AND l_shipdate <  timestamp '1996-04-01'
        GROUP BY l_suppkey
      )
      SELECT s.s_suppkey, s.s_name, r.total_rev / 1e2 AS total_revenue
      FROM supplier s
      JOIN revenue r ON s.s_suppkey = r.supplier_no
      WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
      ORDER BY s.s_suppkey
    """)
  }

  /** TPC-H Q2 (the fixture has no partsupp table, so the part–supplier
    * cost relation derives from lineitem: a supplier's "cost" for a part
    * = the min cents-snapped extendedprice it ever shipped that part at
    * — BIGINT, so the min-equality is exact) — the MIN-COST-SUPPLIER
    * correlation stress, the canonical Q2 shape: the cost CTE is
    * referenced twice (outer probe + correlated min), and the correlated
    * scalar subquery repeats the full supplier→nation→region dim chain
    * inside the correlation. Catalyst must decorrelate the min into ONE
    * aggregate over the region-filtered cost relation keyed on partkey
    * joined back — never a per-part re-scan — and broadcast every dim
    * hop on both sides. Top-100 by snapped balance, total order. */
  def sqlTpchQ2(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      WITH ps AS (
        SELECT l_partkey, l_suppkey,
               min(cast(floor(l_extendedprice * 100 + 0.5) as bigint)) AS cost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
      )
      SELECT floor(s2.s_acctbal * 100 + 0.5) / 1e2 AS s_acctbal,
             s2.s_name, n.n_name, p.p_partkey, p.p_name,
             ps.cost / 1e2 AS supplycost
      FROM part p
      JOIN ps          ON p.p_partkey = ps.l_partkey
      JOIN supplier s2 ON s2.s_suppkey = ps.l_suppkey
      JOIN nation n    ON s2.s_nationkey = n.n_nationkey
      JOIN region r    ON n.n_regionkey = r.r_regionkey
      WHERE p.p_size <= 10 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
        AND ps.cost = (
          SELECT min(ps2.cost)
          FROM ps ps2
          JOIN supplier s3 ON s3.s_suppkey = ps2.l_suppkey
          JOIN nation n2   ON s3.s_nationkey = n2.n_nationkey
          JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100
    """)
  }

  /** TPC-H Q9 (fixture has no ps_supplycost; unit cost = the part's
    * cents-snapped retail price, so profit = revenue cents − retail
    * cents × integral quantity, exact BIGINT per row) — the
    * profit-by-nation-and-year composite: a 5-table join whose part
    * filter is a substring LIKE (un-pushable beyond the part scan), the
    * supplier nation as the grouping dim, year extraction on the order
    * date. The planner must start the join tree from the LIKE-filtered
    * part side or the fact chain — never cross the dims — and the
    * per-(nation, year) sums stay BIGINT to the final divide. */
  def sqlTpchQ9(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT nation, o_year, sum(amount) / 1e2 AS sum_profit
      FROM (
        SELECT n.n_name AS nation,
               cast(year(o.o_orderdate) as bigint) AS o_year,
               cast(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) as bigint)
                 - cast(floor(p.p_retailprice * 100 + 0.5) as bigint)
                   * cast(l.l_quantity as bigint) AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s2 ON s2.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON s2.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%widget%'
      )
      GROUP BY nation, o_year
      ORDER BY nation, o_year DESC
    """)
  }

  /** TPC-H Q11 (no partsupp: a nation's "stock value" per part = the
    * cents-snapped extendedprice its suppliers shipped) — the
    * IMPORTANT-STOCK shape: group per part, HAVING against a scalar
    * subquery over the same scoped relation. TPC-H's fixed 0.0001/SF
    * fraction breaks on a fixed-text query (per-part share shrinks as
    * |parts| grows), so the threshold is SELF-SCALING: a part qualifies
    * when its value exceeds 2× the scoped MEAN part value, expressed as
    * an exact integer cross-multiply — sum·|parts| > 2·total — via TWO
    * uncorrelated scalar subqueries (count distinct + total), which
    * Catalyst folds to one-row broadcasts; no double ever carries an
    * accumulated sum, so the boundary part cannot flip between
    * engines. */
  def sqlTpchQ11(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      WITH scoped AS (
        SELECT l.l_partkey,
               cast(floor(l.l_extendedprice * 100 + 0.5) as bigint) AS cents
        FROM lineitem l
        JOIN supplier s2 ON l.l_suppkey = s2.s_suppkey
        JOIN nation n    ON s2.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_3'
      )
      SELECT l_partkey AS ps_partkey, sum(cents) / 1e2 AS value
      FROM scoped
      GROUP BY l_partkey
      HAVING sum(cents) * (SELECT count(DISTINCT l_partkey) FROM scoped) >
             2 * (SELECT sum(cents) FROM scoped)
      ORDER BY value DESC, ps_partkey
    """)
  }

  /** TPC-H Q12 (fixture has no l_shipmode/commitdate/receiptdate:
    * "late" = shipped over 90 days after the order date, and the
    * return flag stands in as the shipment class) — the
    * conditional-count shape: one orders×lineitem join with the year
    * window pushed into the lineitem scan, CASE-WHEN priority splits
    * summed in ONE aggregate (never two scans), exact integers end to
    * end. */
  def sqlTpchQ12(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT l.l_returnflag AS ship_class,
             sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS high_line_count,
             sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS low_line_count
      FROM orders o
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAYS
        AND l.l_shipdate >= timestamp '1997-01-01'
        AND l.l_shipdate <  timestamp '1998-01-01'
      GROUP BY l.l_returnflag
      ORDER BY ship_class
    """)
  }

  /** TPC-H Q16 (part–supplier pairs derive from lineitem; the
    * "complaints" exclusion list = suppliers with negative balance) —
    * the DISTINCT-COUNT + NOT-IN shape: count distinct suppliers per
    * (brand, type, size) bucket over the join, excluding one brand, one
    * type, a size IN-list, and a NOT IN subquery that must plan as a
    * null-aware anti join (s_suppkey is non-nullable here, so a plain
    * LeftAnti) — never a nested loop. The distinct aggregate forces the
    * two-phase plan: dedup on (brand, type, size, suppkey), then
    * count. */
  def sqlTpchQ16(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT p.p_brand, p.p_type, p.p_size,
             count(DISTINCT l.l_suppkey) AS supplier_cnt
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      WHERE p.p_brand <> 'Brand#5'
        AND p.p_type <> 'PROMO'
        AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      GROUP BY p.p_brand, p.p_type, p.p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """)
  }

  /** TPC-H Q20 (no partsupp availqty: a supplier has "excess stock" of
    * a part when it shipped MORE THAN HALF of that part's total 1997
    * quantity) — the nested-IN + correlated-HAVING shape, the second
    * hardest decorrelation after Q21: the inner IN filters parts by a
    * prefix LIKE, the per-(supplier, part) group's HAVING compares
    * against a scalar subquery CORRELATED on the group key (l_partkey),
    * which Catalyst must decorrelate into one per-part aggregate joined
    * back on partkey — and the outer IN becomes a semi join to the
    * supplier dim. Quantities are integral doubles → BIGINT sums, and
    * the half threshold is the exact integer cross-multiply 2·sum >
    * total. */
  def sqlTpchQ20(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT s2.s_name, n.n_name
      FROM supplier s2
      JOIN nation n ON s2.s_nationkey = n.n_nationkey
      WHERE s2.s_suppkey IN (
        SELECT l1.l_suppkey
        FROM lineitem l1
        WHERE l1.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND l1.l_shipdate >= timestamp '1997-01-01'
          AND l1.l_shipdate <  timestamp '1998-01-01'
        GROUP BY l1.l_suppkey, l1.l_partkey
        HAVING sum(cast(l1.l_quantity as bigint)) * 2 > (
          SELECT sum(cast(l2.l_quantity as bigint))
          FROM lineitem l2
          WHERE l2.l_partkey = l1.l_partkey
            AND l2.l_shipdate >= timestamp '1997-01-01'
            AND l2.l_shipdate <  timestamp '1998-01-01'))
      ORDER BY s_name
    """)
  }

  /** Named-WINDOW-clause surface — the SQL spelling of the §2.5 window
    * family (every win_* key is DataFrame-side; a reference user writes
    * `WINDOW w AS (...)` and expects one definition shared by several
    * functions): rank, lag, and a running sum all over ONE named
    * user-partitioned window (the default ordered-window frame is
    * range-to-current-row, and the (ts, event_id) order is unique, so
    * RANGE ≡ ROWS on both engines), so the planner must stack the
    * window functions on a single (user_id) exchange — the same
    * one-shuffle pin win_lag_lead carries. Cents snapped; total
    * order. */
  def sqlWindowNamed(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT user_id, event_id,
             rank() OVER w AS rnk,
             lag(event_id) OVER w AS prev_event,
             sum(cast(floor(value * 100 + 0.5) as bigint)) OVER w AS run_cents
      FROM events
      WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, rnk
    """)
  }

  /** GROUP BY ALL / ORDER BY ALL — the analyst-SQL sugar both modern
    * engines grew (Spark 4 and DuckDB spell it identically): every
    * non-aggregate select item becomes a grouping key and the full
    * select list becomes the sort, so the daily per-type activity
    * rollup below is ONE clause away from its projection. Resolves to
    * the same plan as the explicit spelling (grouped cent-exact sums,
    * partial-aggregable); sum runs on integer cents (§5.3). */
  def sqlGroupByAll(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT event_type,
             date_trunc('day', ts) AS day,
             count(*) AS n_events,
             sum(cast(floor(value * 100 + 0.5) AS bigint)) AS cents
      FROM events
      GROUP BY ALL
      ORDER BY ALL
    """)
  }

  /** Time-based RANGE window frame — `RANGE BETWEEN INTERVAL 1 HOUR
    * PRECEDING AND CURRENT ROW` over a timestamp ORDER BY: the trailing
    * wall-clock-hour rollup ROWS frames cannot express (a burst of 50
    * events in a minute and a single event after a quiet day both get
    * exactly their last hour). Both engines implement the standard's
    * peer semantics (the frame ends at the LAST peer of the current
    * row's ts), so counts/cent sums are exact-integer comparable.
    * Scale: one (user_id) exchange; the range frame is a sliding
    * pointer over the sorted partition, O(n) per partition. */
  def sqlWindowRangeInterval(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT user_id, event_id,
             count(*) OVER w AS n_last_hour,
             sum(cast(floor(value * 100 + 0.5) AS bigint)) OVER w AS cents_last_hour
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id
    """)
  }

  /** Error-safe arithmetic — the ANSI-mode escape hatches a pipeline
    * needs when raw data divides by zero or carries unparseable
    * strings: try_divide → NULL on a zero divisor (instead of +Inf or
    * an ANSI error), try_cast → NULL on a malformed cast (instead of a
    * job-killing exception). The DuckDB twin spells the same semantics
    * as x / NULLIF(y, 0) and TRY_CAST. All map-side, codegen'd,
    * zero-shuffle except the output sort. */
  def fnTryArith(s: SparkSession, d: String): DataFrame = {
    ensureViews(s, d)
    s.sql("""
      SELECT event_id,
             try_divide(1e2, value - value) AS div_zero,
             floor(try_divide(cast(floor(value * 100 + 0.5) AS bigint), 7)
                   * 1e6) / 1e6 AS div7,
             try_cast(event_type AS DOUBLE) AS bad_double,
             try_cast(substr(event_type, 1, 2) AS INT) AS bad_int
      FROM events
      ORDER BY event_id
    """)
  }

  /** The recursion statement, shared with OracleSql up to the edge-table
    * source name — both engines run the identical loop. */
  def recursiveBfsCore(edges: String): String =
    "WITH RECURSIVE\n" + recursiveBfsBody(edges)

  /** Loop body only — OracleSql prepends its own edge CTEs after the
    * WITH RECURSIVE keyword (DuckDB materializes them once; Spark uses
    * the cached view instead).
    *
    * The recursive arm is DISTINCT per level: without it the loop
    * enumerates WALKS, whose count is combinatorial in graph density —
    * the 16× stress gate blew Spark's 1M-row recursion guard exactly
    * that way (r11). Distinct-per-level bounds every frontier by |V|,
    * and min(d) per node — the BFS distance — is multiplicity-blind, so
    * the result is unchanged in both engines. */
  def recursiveBfsBody(edges: String): String =
    s"""seed AS (SELECT min(src) AS p FROM $edges),
      |r(p, d) AS (
      |  SELECT p, 0 FROM seed
      |  UNION ALL
      |  SELECT DISTINCT e.dst, r.d + 1 FROM r JOIN $edges e ON e.src = r.p WHERE r.d < 3)
      |SELECT p AS part, min(d) AS dist FROM r GROUP BY p ORDER BY part""".stripMargin
}
