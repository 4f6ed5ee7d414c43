package graft.oracle

/** DuckDB oracle SQL, one entry per oracle-gated `SparkEntry.queries` key.
  *
  * Contract (SURVEY.md §5.3 + FIXTURES.md): identical column NAMES (the
  * driver sorts columns by name before hashing), identical values after the
  * rounding contract (2 dp money, 4 dp stats), identical row order (total
  * ORDER BY with unique tiebreakers), UTC.
  *
  * Type discipline: DuckDB defaults differ from Spark in integer widths —
  * every place Spark emits IntegerType the SQL casts ::INT (year, length,
  * levenshtein, rank...), Spark LongType stays BIGINT (floor(epoch())
  * ::BIGINT, ceil ::BIGINT). DuckDB-only spellings used on purpose:
  * round_even ≡ bround, ln ≡ log, sign ≡ signum, (dayofweek+1) ≡ Spark's
  * 1-based dayofweek, list_* ≡ array HOFs, initcap emulated via
  * list_transform over words.
  */
object OracleSql {

  /** ts_holt_winters twin: additive triple smoothing over per-user daily
    * cent sums; the recursive CTE carries the 7 Monday-based seasonal
    * slots as explicit DOUBLE columns s0..s6, and the engine's level
    * expression l2 is spelled INLINE everywhere the fold uses it (the
    * ts_holt_linear recipe — identical dyadic arithmetic in identical
    * order, so the recurrence is bit-identical across engines). Built
    * programmatically: 7 CASE arms per seasonal column are mechanical. */
  private def holtWintersSql: String = {
    val sc = "CASE x.wd " +
      (0 to 6).map(k => s"WHEN $k THEN r.s$k").mkString(" ") + " END"
    val l2 = s"(0.5 * (x.v - $sc) + 0.5 * (r.l + r.b))"
    val sInit = (0 to 6).map(k => s"0.0::DOUBLE AS s$k").mkString(", ")
    val sStep = (0 to 6).map(k =>
      s"CASE WHEN x.wd = $k THEN 0.25 * (x.v - $l2) + 0.75 * r.s$k " +
        s"ELSE r.s$k END AS s$k").mkString(", ")
    val sNext = "CASE (r.wd + 1) % 7 " +
      (0 to 6).map(k => s"WHEN $k THEN r.s$k").mkString(" ") + " END"
    "WITH RECURSIVE x AS (SELECT user_id, day, (isodow(day) - 1)::INT AS wd, " +
      "cents::DOUBLE / 1e2 AS v, " +
      "row_number() OVER (PARTITION BY user_id ORDER BY day) AS i FROM " +
      "(SELECT user_id, CAST(ts AS DATE) AS day, " +
      "sum(floor(value * 100 + 0.5)::BIGINT) AS cents " +
      "FROM events GROUP BY 1, 2)), " +
      "nn AS (SELECT user_id, max(i)::BIGINT AS n_days FROM x GROUP BY user_id), " +
      "r AS (SELECT user_id, i, wd, v AS l, 0.0::DOUBLE AS b, " + sInit +
      " FROM x WHERE i = 1 " +
      "UNION ALL SELECT x.user_id, x.i, x.wd, " +
      s"$l2 AS l, " +
      s"0.25 * ($l2 - r.l) + 0.75 * r.b AS b, " + sStep +
      " FROM r JOIN x ON x.user_id = r.user_id AND x.i = r.i + 1) " +
      "SELECT r.user_id, nn.n_days, " +
      "floor(r.l * 10000 + 0.5) / 10000.0 AS level, " +
      "floor(r.b * 10000 + 0.5) / 10000.0 AS trend, " +
      s"floor(($sNext) * 10000 + 0.5) / 10000.0 AS season_next, " +
      s"floor((r.l + r.b + $sNext) * 10000 + 0.5) / 10000.0 AS forecast_next " +
      "FROM r JOIN nn ON r.user_id = nn.user_id AND r.i = nn.n_days " +
      "ORDER BY r.user_id"
  }

  /** MERGE INTO routing over parquet, shared verbatim by the batch key
    * (sql_merge_upsert) and its stateful twin (stream_merge_upsert,
    * whose batch mode emits the identical rows — the stream_scd2/
    * stream_holt_winters shared-twin precedent). DuckDB 1.0.0 has no
    * MERGE statement (parser error, measured), so the oracle is the
    * identical relational expansion. */
  private val mergeUpsertSql: String =
    ("WITH k AS (SELECT user_id, event_type, event_id, ts, value, " +
      "lpad(epoch_us(ts)::VARCHAR, 20, '0') || lpad(event_id::VARCHAR, 20, '0') AS kk " +
      "FROM events), " +
      "t AS (SELECT user_id, event_type, arg_max(event_id, kk) AS t_id, " +
      "arg_max(ts, kk) AS t_ts, " +
      "floor(arg_max(value, kk) * 100 + 0.5) / 100.0 AS t_v " +
      "FROM k WHERE event_id % 2 = 0 GROUP BY 1, 2), " +
      "s AS (SELECT user_id, event_type, arg_max(event_id, kk) AS s_id, " +
      "arg_max(ts, kk) AS s_ts, " +
      "floor(arg_max(value, kk) * 100 + 0.5) / 100.0 AS s_v " +
      "FROM k WHERE event_id % 2 = 1 GROUP BY 1, 2), " +
      "so AS (SELECT *, CASE WHEN s_id % 5 = 0 THEN 'D' ELSE 'U' END AS op FROM s) " +
      "SELECT coalesce(t.user_id, so.user_id) AS user_id, " +
      "coalesce(t.event_type, so.event_type) AS event_type, " +
      "coalesce(so.s_id, t.t_id) AS event_id, " +
      "coalesce(so.s_ts, t.t_ts) AS ts, " +
      "coalesce(so.s_v, t.t_v) AS value, " +
      "CASE WHEN so.op IS NULL THEN 'keep' " +
      "WHEN t.t_id IS NOT NULL THEN 'update' ELSE 'insert' END AS action " +
      "FROM t FULL OUTER JOIN so " +
      "ON t.user_id = so.user_id AND t.event_type = so.event_type " +
      "WHERE so.op IS NULL OR so.op = 'U' " +
      "ORDER BY 1, 2")

  val sql: Map[String, String] = {
    val base: Map[String, String] = Map(

    // ------------------------------------------------------------ §2.1 scans
    "scan_parquet" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber",

    "scan_pruned" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00' " +
        "ORDER BY l_orderkey, l_linenumber"),

    // The CSV/JSON roundtrip queries aggregate the ROUNDTRIPPED data; the
    // oracle aggregates the original parquet — a hash match certifies the
    // interchange path end-to-end.
    "source_csv" ->
      ("SELECT o_orderpriority, count(*) AS n, " +
        "floor((sum(o_totalprice)) * 100 + 0.5) / 100.0 AS sum_price, " +
        "max(o_orderdate) AS max_date " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),

    "source_json" ->
      ("SELECT event_type, count(*) AS n, " +
        "floor((sum(value)) * 100 + 0.5) / 100.0 AS sum_value, " +
        "sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k, " +
        "max(ts) AS max_ts " +
        "FROM events GROUP BY event_type ORDER BY event_type"),

    "sink_partitioned" ->
      ("SELECT event_type, count(*) AS n, " +
        "floor((sum(value)) * 100 + 0.5) / 100.0 AS sum_value, " +
        "max(event_id) AS max_id " +
        "FROM events WHERE event_type IN ('purchase', 'signup') " +
        "GROUP BY event_type ORDER BY event_type"),

    "source_kinesis_envelope" ->
      ("SELECT event_type, count(*) AS n, " +
        "floor((sum(value)) * 100 + 0.5) / 100.0 AS sum_value, " +
        "sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k, " +
        "max(ts) AS max_ts, count(DISTINCT user_id) AS n_users " +
        "FROM events GROUP BY event_type ORDER BY event_type"),

    // Avro container roundtrip: same convention — oracle aggregates the
    // original parquet, a hash match certifies the binary encode/decode
    "source_avro" ->
      ("SELECT o_orderpriority, count(*) AS n, " +
        "floor((sum(o_totalprice)) * 100 + 0.5) / 100.0 AS sum_price, " +
        "max(o_orderkey) AS max_key, " +
        "max(o_orderdate) AS max_date " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),

    // Footer introspection: both engines read the SAME parquet footer —
    // the oracle is DuckDB's parquet_metadata() over the file itself
    // ({{SF_DIR}} resolves at Verify dump time)
    "source_parquet_footer" ->
      ("SELECT row_group_id::BIGINT AS row_group_id, path_in_schema, " +
        "row_group_num_rows::BIGINT AS row_group_num_rows, " +
        "num_values::BIGINT AS num_values, " +
        "total_compressed_size::BIGINT AS total_compressed_size, " +
        "total_uncompressed_size::BIGINT AS total_uncompressed_size, " +
        "coalesce(stats_null_count, -1)::BIGINT AS null_count " +
        "FROM parquet_metadata('{{SF_DIR}}/lineitem.parquet') " +
        "ORDER BY row_group_id, path_in_schema"),

    "source_orc" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n, " +
        "floor((sum(l_quantity)) * 100 + 0.5) / 100.0 AS sum_qty, " +
        "floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100.0 AS sum_disc_price, " +
        "max(l_shipdate) AS max_ship " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"),

    // binaryFile roundtrip: staged payload bytes == UTF-8 text bytes
    "source_binary_files" ->
      ("SELECT doc_id, strlen(text)::BIGINT AS n_bytes " +
        "FROM documents ORDER BY doc_id"),

    // -------------------------------------------------- §2.2 project/filter
    "project_compute" ->
      ("SELECT l_orderkey, l_linenumber, " +
        "floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100.0 AS revenue, " +
        "floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5) / 100.0 AS charged " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),

    "filter_pred" ->
      ("SELECT o_orderkey, o_custkey, o_orderstatus, " +
        "floor((o_totalprice) * 100 + 0.5) / 100.0 AS o_totalprice, o_orderpriority FROM orders " +
        "WHERE o_orderstatus IN ('F','O') " +
        "AND o_totalprice BETWEEN 1000.0 AND 200000.0 " +
        "AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%') " +
        "AND NOT (o_custkey % 7 = 0) ORDER BY o_orderkey"),

    "filter_regex" ->
      ("SELECT event_id, user_id, event_type, floor((value) * 100 + 0.5) / 100.0 AS value " +
        "FROM events WHERE regexp_matches(event_type, '^(click|view)$') " +
        "AND value > 100.0 ORDER BY event_id"),

    // ------------------------------------------------------------ §2.3 joins
    "join_broadcast" ->
      ("SELECT r_name, n_name, count(*) AS n_cust, " +
        "floor((sum(c_acctbal)) * 100 + 0.5) / 100.0 AS sum_bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name, n_name ORDER BY r_name, n_name"),

    "join_sortmerge" ->
      ("SELECT o_orderstatus, count(*) AS n_items, " +
        "floor((sum(l_extendedprice)) * 100 + 0.5) / 100.0 AS sum_price " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"),

    // parity gate for the SALTED join: the oracle is the PLAIN equi join —
    // salting must be result-invisible; cents-exact BIGINT sum
    "join_salted" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
        "sum((floor(l_extendedprice * 100 + 0.5))::BIGINT)::BIGINT::DOUBLE / 100.0 " +
        "AS sum_price FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY 1"),

    "join_shuffledhash" ->
      ("SELECT o_orderstatus, count(*) AS n_items, " +
        "floor((sum(l_quantity)) * 100 + 0.5) / 100.0 AS sum_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"),

    "join_left" ->
      ("SELECT c_custkey, c_name, count(o_orderkey) AS n_big_orders, " +
        "floor((coalesce(sum(o_totalprice), 0)) * 100 + 0.5) / 100.0 AS sum_big " +
        "FROM (SELECT * FROM customer WHERE c_custkey < 100) c " +
        "LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 150000.0) o " +
        "ON c_custkey = o_custkey GROUP BY c_custkey, c_name ORDER BY c_custkey"),

    "join_full" ->
      ("SELECT coalesce(l.o_custkey, r.o_custkey) AS custkey, " +
        "coalesce(l.n_even, 0) AS n_even, coalesce(r.n_big, 0) AS n_big FROM " +
        "(SELECT o_custkey, count(*) AS n_even FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_custkey) l " +
        "FULL JOIN " +
        "(SELECT o_custkey, count(*) AS n_big FROM orders WHERE o_totalprice > 180000.0 GROUP BY o_custkey) r " +
        "ON l.o_custkey = r.o_custkey ORDER BY custkey"),

    "join_semi" ->
      ("SELECT c_custkey, c_name, c_mktsegment FROM customer " +
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderpriority = '1-URGENT') ORDER BY c_custkey"),

    // identical result through the bloom-prefilter + residual semi join
    "join_bloom_prefilter" ->
      ("SELECT c_custkey, c_name, c_mktsegment FROM customer " +
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderpriority = '1-URGENT') ORDER BY c_custkey"),

    "join_anti" ->
      ("SELECT c_custkey, c_name FROM customer " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderpriority = '1-URGENT') ORDER BY c_custkey"),

    "join_theta_range" ->
      ("SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id, " +
        "a.event_type AS a_type, b.event_type AS b_type " +
        "FROM events a JOIN events b ON a.user_id = b.user_id " +
        "AND date_trunc('microseconds', b.ts) > date_trunc('microseconds', a.ts) " +
        "AND date_trunc('microseconds', b.ts) <= date_trunc('microseconds', a.ts) + INTERVAL 60 SECOND " +
        "AND a.event_id <> b.event_id " +
        "ORDER BY a.user_id, a_id, b_id"),

    // A/B lift: every double input is an exact integer count and the
    // z formula shares operand order with the Spark side, so the math is
    // bit-deterministic through sqrt
    "ab_test_lift" ->
      ("WITH u AS (SELECT DISTINCT user_id FROM events), " +
        "pop AS (SELECT " +
        "sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a, " +
        "sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b " +
        "FROM u), " +
        "c AS (SELECT event_type, " +
        "sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS conv_a, " +
        "sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS conv_b " +
        "FROM (SELECT event_type, user_id FROM events " +
        "GROUP BY event_type, user_id HAVING count(*) >= 15) " +
        "GROUP BY event_type), " +
        "r AS (SELECT event_type, n_a, n_b, conv_a, conv_b, " +
        "conv_a::DOUBLE / n_a::DOUBLE AS ra, " +
        "conv_b::DOUBLE / n_b::DOUBLE AS rb, " +
        "(conv_a + conv_b)::DOUBLE / (n_a + n_b)::DOUBLE AS ph " +
        "FROM c, pop), " +
        "f AS (SELECT *, sqrt(ph * (1.0 - ph) " +
        "* (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE)) AS se FROM r) " +
        "SELECT event_type, n_a, n_b, conv_a, conv_b, " +
        "floor(ra * 1000000 + 0.5) / 1000000.0 AS rate_a, " +
        "floor(rb * 1000000 + 0.5) / 1000000.0 AS rate_b, " +
        "floor((rb - ra) * 1000000 + 0.5) / 1000000.0 AS lift, " +
        "CASE WHEN se = 0.0 THEN 0.0 ELSE " +
        "floor((rb - ra) / se * 1000000 + 0.5) / 1000000.0 END AS z " +
        "FROM f ORDER BY event_type"),

    // -------------------------------------------- SQL front door (SqlApi)
    "sql_tpch_q3" ->
      ("SELECT o.o_orderkey, " +
        "floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100.0 AS revenue, " +
        "c.c_mktsegment " +
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey " +
        "WHERE c.c_mktsegment = 'BUILDING' " +
        "GROUP BY o.o_orderkey, c.c_mktsegment " +
        "ORDER BY revenue DESC, o_orderkey ASC LIMIT 10"),

    // Q5: cents snapped BEFORE the sum (per-nation groups are big enough
    // for double-sum merge order to matter); HUGEINT pinned ::BIGINT
    "sql_tpch_q5" ->
      ("SELECT n_name, " +
        "sum((floor(l_extendedprice * (1 - l_discount) * 100 + 0.5))::BIGINT)" +
        "::BIGINT::DOUBLE / 100.0 AS revenue " +
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey " +
        "JOIN nation n ON s.s_nationkey = n.n_nationkey " +
        "JOIN region r ON n.n_regionkey = r.r_regionkey " +
        "WHERE r.r_name = 'ASIA' " +
        "AND o.o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o.o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY n_name ORDER BY revenue DESC, n_name"),

    // Q1: every money sum over per-row cents snaps; HUGEINT pinned
    // ::BIGINT (pandas renders HUGEINT as object and the hash diverges);
    // the one avg = exact sum ÷ count in a single double divide, same
    // operand order as the Spark text
    "sql_tpch_q1" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "sum(l_quantity::BIGINT)::BIGINT AS sum_qty, " +
        "sum((floor(l_extendedprice * 100 + 0.5))::BIGINT)::BIGINT::DOUBLE / 100.0 AS sum_base_price, " +
        "sum((floor(l_extendedprice * (1 - l_discount) * 100 + 0.5))::BIGINT)::BIGINT::DOUBLE / 100.0 AS sum_disc_price, " +
        "sum((floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5))::BIGINT)::BIGINT::DOUBLE / 100.0 AS sum_charge, " +
        "sum(l_quantity::BIGINT)::BIGINT::DOUBLE / count(*) AS avg_qty, " +
        "count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
        "GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"),

    // Q6: one snapped global sum, no join
    "sql_tpch_q6" ->
      ("SELECT sum((floor(l_extendedprice * l_discount * 100 + 0.5))::BIGINT)" +
        "::BIGINT::DOUBLE / 100.0 AS revenue " +
        "FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"),

    // Q8: conditional + total cents sums, one double divide per year;
    // year() is BIGINT here and cast(...as bigint) on the Spark side
    "sql_tpch_q8" ->
      ("SELECT o_year, floor(1e6 * share_rev / total_rev + 0.5) / 1e6 AS mkt_share FROM (" +
        "SELECT year(o.o_orderdate) AS o_year, " +
        "sum(CASE WHEN n2.n_name = 'NATION_1' " +
        "THEN (floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5))::BIGINT " +
        "ELSE 0::BIGINT END) AS share_rev, " +
        "sum((floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5))::BIGINT) AS total_rev " +
        "FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey " +
        "JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "JOIN nation n1 ON c.c_nationkey = n1.n_nationkey " +
        "JOIN region r ON n1.n_regionkey = r.r_regionkey " +
        "JOIN supplier s2 ON l.l_suppkey = s2.s_suppkey " +
        "JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey " +
        "WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY' " +
        "AND o.o_orderdate >= TIMESTAMP '1995-01-01' " +
        "AND o.o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY year(o.o_orderdate)) ORDER BY o_year"),

    // Q13 (no o_comment in the fixture → filterless shape): pure counts
    "sql_tpch_q13" ->
      ("SELECT c_count, count(*) AS custdist FROM (" +
        "SELECT c.c_custkey, count(o.o_orderkey) AS c_count " +
        "FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey " +
        "GROUP BY c.c_custkey) " +
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"),

    // Q14: promo share, identical operand order in the one divide
    "sql_tpch_q14" ->
      ("SELECT floor(1e2 * promo_rev / total_rev * 1e4 + 0.5) / 1e4 AS promo_revenue FROM (" +
        "SELECT sum(CASE WHEN p.p_type = 'PROMO' " +
        "THEN (floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5))::BIGINT " +
        "ELSE 0::BIGINT END) AS promo_rev, " +
        "sum((floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5))::BIGINT) AS total_rev " +
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey " +
        "WHERE l.l_shipdate >= TIMESTAMP '1997-09-01' " +
        "AND l.l_shipdate < TIMESTAMP '1997-10-01')"),

    // Q15: BIGINT cents keys make the max-equality join exact
    "sql_tpch_q15" ->
      ("WITH revenue AS (" +
        "SELECT l_suppkey AS supplier_no, " +
        "sum((floor(l_extendedprice * (1 - l_discount) * 100 + 0.5))::BIGINT)::BIGINT AS total_rev " +
        "FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01' " +
        "GROUP BY l_suppkey) " +
        "SELECT s.s_suppkey, s.s_name, r.total_rev::BIGINT::DOUBLE / 100.0 AS total_revenue " +
        "FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no " +
        "WHERE r.total_rev = (SELECT max(total_rev) FROM revenue) " +
        "ORDER BY s.s_suppkey"),

    // Q2 (lineitem-derived cost relation): BIGINT min-cost keys make the
    // correlated-min equality exact; balance snapped for the hash
    "sql_tpch_q2" ->
      ("WITH ps AS (SELECT l_partkey, l_suppkey, " +
        "min((floor(l_extendedprice * 100 + 0.5))::BIGINT) AS cost " +
        "FROM lineitem GROUP BY l_partkey, l_suppkey) " +
        "SELECT floor(s2.s_acctbal * 100 + 0.5) / 100.0 AS s_acctbal, " +
        "s2.s_name, n.n_name, p.p_partkey, p.p_name, " +
        "ps.cost::BIGINT::DOUBLE / 100.0 AS supplycost " +
        "FROM part p JOIN ps ON p.p_partkey = ps.l_partkey " +
        "JOIN supplier s2 ON s2.s_suppkey = ps.l_suppkey " +
        "JOIN nation n ON s2.s_nationkey = n.n_nationkey " +
        "JOIN region r ON n.n_regionkey = r.r_regionkey " +
        "WHERE p.p_size <= 10 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE' " +
        "AND ps.cost = (SELECT min(ps2.cost) FROM ps ps2 " +
        "JOIN supplier s3 ON s3.s_suppkey = ps2.l_suppkey " +
        "JOIN nation n2 ON s3.s_nationkey = n2.n_nationkey " +
        "JOIN region r2 ON n2.n_regionkey = r2.r_regionkey " +
        "WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE') " +
        "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"),

    // Q9 (retail-price cost proxy): per-row BIGINT profit, summed exact
    "sql_tpch_q9" ->
      ("SELECT nation, o_year, sum(amount)::BIGINT::DOUBLE / 100.0 AS sum_profit " +
        "FROM (SELECT n.n_name AS nation, year(o.o_orderdate)::BIGINT AS o_year, " +
        "(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5))::BIGINT " +
        "- (floor(p.p_retailprice * 100 + 0.5))::BIGINT * l.l_quantity::BIGINT AS amount " +
        "FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey " +
        "JOIN supplier s2 ON s2.s_suppkey = l.l_suppkey " +
        "JOIN orders o ON o.o_orderkey = l.l_orderkey " +
        "JOIN nation n ON s2.s_nationkey = n.n_nationkey " +
        "WHERE p.p_name LIKE '%widget%') " +
        "GROUP BY nation, o_year ORDER BY nation, o_year DESC"),

    // Q11 (self-scaling threshold): exact integer cross-multiply —
    // sum·|parts| > 2·total — so the boundary part cannot flip engines
    "sql_tpch_q11" ->
      ("WITH scoped AS (SELECT l.l_partkey, " +
        "(floor(l.l_extendedprice * 100 + 0.5))::BIGINT AS cents " +
        "FROM lineitem l JOIN supplier s2 ON l.l_suppkey = s2.s_suppkey " +
        "JOIN nation n ON s2.s_nationkey = n.n_nationkey " +
        "WHERE n.n_name = 'NATION_3') " +
        "SELECT l_partkey AS ps_partkey, sum(cents)::BIGINT::DOUBLE / 100.0 AS value " +
        "FROM scoped GROUP BY l_partkey " +
        "HAVING sum(cents) * (SELECT count(DISTINCT l_partkey) FROM scoped) > " +
        "2 * (SELECT sum(cents) FROM scoped) " +
        "ORDER BY value DESC, ps_partkey"),

    // Q12 (returnflag stands in for shipmode; late = shipped >90 days
    // after order): conditional counts in one aggregate, pure integers
    "sql_tpch_q12" ->
      ("SELECT l.l_returnflag AS ship_class, " +
        "sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') " +
        "THEN 1 ELSE 0 END)::BIGINT AS high_line_count, " +
        "sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') " +
        "THEN 1 ELSE 0 END)::BIGINT AS low_line_count " +
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey " +
        "WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY " +
        "AND l.l_shipdate >= TIMESTAMP '1997-01-01' " +
        "AND l.l_shipdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY l.l_returnflag ORDER BY ship_class"),

    // Q16 (complaint list = negative-balance suppliers): distinct
    // supplier count per bucket, NOT IN anti join; pure integers
    "sql_tpch_q16" ->
      ("SELECT p.p_brand, p.p_type, p.p_size, " +
        "count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt " +
        "FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey " +
        "WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO' " +
        "AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45) " +
        "AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0) " +
        "GROUP BY p.p_brand, p.p_type, p.p_size " +
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"),

    // Q20 (excess stock = shipped over half the part's 1997 total):
    // BIGINT quantity sums, 2·sum > total exact cross-multiply
    "sql_tpch_q20" ->
      ("SELECT s2.s_name, n.n_name " +
        "FROM supplier s2 JOIN nation n ON s2.s_nationkey = n.n_nationkey " +
        "WHERE s2.s_suppkey IN (SELECT l1.l_suppkey FROM lineitem l1 " +
        "WHERE l1.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%') " +
        "AND l1.l_shipdate >= TIMESTAMP '1997-01-01' " +
        "AND l1.l_shipdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY l1.l_suppkey, l1.l_partkey " +
        "HAVING sum(l1.l_quantity::BIGINT) * 2 > " +
        "(SELECT sum(l2.l_quantity::BIGINT) FROM lineitem l2 " +
        "WHERE l2.l_partkey = l1.l_partkey " +
        "AND l2.l_shipdate >= TIMESTAMP '1997-01-01' " +
        "AND l2.l_shipdate < TIMESTAMP '1998-01-01')) " +
        "ORDER BY s_name"),

    // Q18: integral quantities → BIGINT sums exact; totalprice cents snap
    "sql_tpch_q18" ->
      ("SELECT c.c_custkey, o.o_orderkey, o.o_orderdate, " +
        "floor(o.o_totalprice * 100 + 0.5) / 100.0 AS o_totalprice, " +
        "sum(l.l_quantity::BIGINT)::BIGINT AS total_qty " +
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
        "JOIN lineitem l ON o.o_orderkey = l.l_orderkey " +
        "WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem " +
        "GROUP BY l_orderkey HAVING sum(l_quantity::BIGINT) > 250) " +
        "GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice " +
        "ORDER BY total_qty DESC, o_orderkey"),

    // Q10: quarter of returned items, revenue per customer, top-20;
    // cents snapped before the sum (customer groups span many rows)
    "sql_tpch_q10" ->
      ("SELECT c.c_custkey, c.c_name, " +
        "sum((floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5))::BIGINT)" +
        "::BIGINT::DOUBLE / 100.0 AS revenue, " +
        "floor(c.c_acctbal * 100 + 0.5) / 100.0 AS c_acctbal, n.n_name " +
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey " +
        "JOIN nation n ON c.c_nationkey = n.n_nationkey " +
        "WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o.o_orderdate < TIMESTAMP '1996-04-01' " +
        "AND l.l_returnflag = 'R' " +
        "GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name " +
        "ORDER BY revenue DESC, c_custkey LIMIT 20"),

    // Q7: disjunctive cross-alias nation filter; cents snapped per row
    "sql_tpch_q7" ->
      ("SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
        "year(l.l_shipdate)::INT AS l_year, " +
        "sum((floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5))::BIGINT)" +
        "::BIGINT::DOUBLE / 100.0 AS revenue " +
        "FROM lineitem l " +
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey " +
        "JOIN orders o ON o.o_orderkey = l.l_orderkey " +
        "JOIN customer c ON c.c_custkey = o.o_custkey " +
        "JOIN nation n1 ON s.s_nationkey = n1.n_nationkey " +
        "JOIN nation n2 ON c.c_nationkey = n2.n_nationkey " +
        "WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') " +
        "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) " +
        "AND l.l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l.l_shipdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate) " +
        "ORDER BY supp_nation, cust_nation, l_year"),

    // Q17: correlated scalar avg subquery; integral quantities make the
    // inner avg exact, cents snapped before the BIGINT revenue sum
    "sql_tpch_q17" ->
      ("SELECT p.p_brand, " +
        "sum((floor(l.l_extendedprice * 100 + 0.5))::BIGINT)::BIGINT" +
        "::DOUBLE / 7.0 / 100.0 AS avg_yearly " +
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey " +
        "WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') " +
        "AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2 " +
        "WHERE l2.l_partkey = l.l_partkey) " +
        "GROUP BY p.p_brand ORDER BY p_brand"),

    // Q4: correlated EXISTS with an outer-expression residual
    "sql_tpch_q4" ->
      ("SELECT o.o_orderpriority, count(*)::BIGINT AS order_count " +
        "FROM orders o " +
        "WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o.o_orderdate < TIMESTAMP '1996-04-01' " +
        "AND EXISTS (SELECT 1 FROM lineitem l " +
        "WHERE l.l_orderkey = o.o_orderkey " +
        "AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) " +
        "GROUP BY o.o_orderpriority ORDER BY o_orderpriority"),

    // Q19: OR-of-ANDs across both join sides; per-arm brand grouping
    "sql_tpch_q19" ->
      ("SELECT p.p_brand, " +
        "sum((floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5))::BIGINT)" +
        "::BIGINT::DOUBLE / 100.0 AS revenue, count(*)::BIGINT AS n " +
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey " +
        "WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 " +
        "AND l.l_quantity >= 1 AND l.l_quantity <= 11) " +
        "OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 " +
        "AND l.l_quantity >= 10 AND l.l_quantity <= 20) " +
        "OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35 " +
        "AND l.l_quantity >= 20 AND l.l_quantity <= 30) " +
        "GROUP BY p.p_brand ORDER BY p_brand"),

    // Q21: EXISTS + NOT EXISTS double correlation with a shipdate
    // inequality residual; ties on the latest shipdate excluded by >=
    "sql_tpch_q21" ->
      ("SELECT s.s_name, count(*)::BIGINT AS numwait " +
        "FROM supplier s " +
        "JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey " +
        "JOIN orders o ON o.o_orderkey = l1.l_orderkey " +
        "JOIN nation n ON s.s_nationkey = n.n_nationkey " +
        "WHERE o.o_orderstatus = 'F' " +
        "AND n.n_name IN ('NATION_1', 'NATION_2') " +
        "AND EXISTS (SELECT 1 FROM lineitem l2 " +
        "WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) " +
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 " +
        "WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey " +
        "AND l3.l_shipdate >= l1.l_shipdate) " +
        "GROUP BY s.s_name ORDER BY numwait DESC, s_name LIMIT 20"),

    // Q22: the above-average predicate cross-multiplied into exact
    // integer space (cents·count > sum-of-cents) so no engine ever
    // compares against an accumulated double
    "sql_tpch_q22" ->
      ("SELECT c.c_mktsegment, count(*)::BIGINT AS numcust, " +
        "sum((floor(c.c_acctbal * 100 + 0.5))::BIGINT)::BIGINT" +
        "::DOUBLE / 100.0 AS totacctbal " +
        "FROM customer c " +
        "WHERE (floor(c.c_acctbal * 100 + 0.5))::BIGINT " +
        "* (SELECT count(*) FROM customer c2 WHERE c2.c_acctbal > 0.0) " +
        "> (SELECT sum((floor(c3.c_acctbal * 100 + 0.5))::BIGINT) " +
        "FROM customer c3 WHERE c3.c_acctbal > 0.0) " +
        "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_orderdate >= TIMESTAMP '2000-01-01') " +
        "GROUP BY c.c_mktsegment ORDER BY c_mktsegment"),

    // PIVOT == conditional aggregation (no ELSE: an empty bucket is NULL
    // in both engines); cents summed BIGINT, divided for presentation
    "sql_pivot" ->
      ("SELECT event_type, " +
        "sum(CASE WHEN user_id % 4 = 0 THEN (floor(value * 100 + 0.5))::BIGINT END)" +
        "::BIGINT::DOUBLE / 100.0 AS v0, " +
        "sum(CASE WHEN user_id % 4 = 1 THEN (floor(value * 100 + 0.5))::BIGINT END)" +
        "::BIGINT::DOUBLE / 100.0 AS v1, " +
        "sum(CASE WHEN user_id % 4 = 2 THEN (floor(value * 100 + 0.5))::BIGINT END)" +
        "::BIGINT::DOUBLE / 100.0 AS v2, " +
        "sum(CASE WHEN user_id % 4 = 3 THEN (floor(value * 100 + 0.5))::BIGINT END)" +
        "::BIGINT::DOUBLE / 100.0 AS v3 " +
        "FROM events GROUP BY event_type ORDER BY event_type"),

    // UNPIVOT == UNION ALL of the long rows
    "sql_unpivot" ->
      ("WITH wide AS (SELECT event_type, count(*)::DOUBLE AS n, " +
        "sum((floor(value * 100 + 0.5))::BIGINT)::BIGINT::DOUBLE / 100.0 AS sum_v, " +
        "floor(max(value) * 100 + 0.5) / 100.0 AS max_v " +
        "FROM events GROUP BY event_type) " +
        "SELECT event_type, metric, val FROM (" +
        "SELECT event_type, 'n' AS metric, n AS val FROM wide " +
        "UNION ALL SELECT event_type, 'sum_v', sum_v FROM wide " +
        "UNION ALL SELECT event_type, 'max_v', max_v FROM wide) " +
        "ORDER BY event_type, metric"),

    // decimal128 sums: associative, so no merge-order caveat — the cast
    // rounding rule (HALF_UP on the same input doubles) matches Spark's
    "agg_decimal_exact" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_price, " +
        "sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty, " +
        "max(l_extendedprice::DECIMAL(18,2))::DOUBLE AS max_price, " +
        "count(*)::BIGINT AS n " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"),

    // CTAS readback == the SELECT it materialized
    "sql_ctas_readback" ->
      ("SELECT o_orderpriority, count(*)::BIGINT AS n_orders, " +
        "sum((floor(o_totalprice * 100 + 0.5))::BIGINT)::BIGINT::DOUBLE / 100.0 AS sum_price " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),

    // hints must be result-invisible: the oracle is the PLAIN join
    "sql_join_hints" ->
      ("SELECT n.n_name, count(*)::BIGINT AS n_cust, " +
        "sum((floor(c.c_acctbal * 100 + 0.5))::BIGINT)::BIGINT::DOUBLE / 100.0 AS sum_bal " +
        "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey " +
        "GROUP BY n.n_name ORDER BY n.n_name"),

    // caching must be result-invisible: the oracle re-reads the parquet
    "cache_hot_dim" ->
      ("SELECT n.n_name, r.r_name, count(*)::BIGINT AS n_cust " +
        "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey " +
        "JOIN region r ON n.n_regionkey = r.r_regionkey " +
        "GROUP BY n.n_name, r.r_name ORDER BY n.n_name"),

    "sql_subquery_scalar" ->
      ("SELECT o_orderkey, floor(o_totalprice * 100 + 0.5) / 100.0 AS o_totalprice " +
        "FROM orders " +
        "WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders) " +
        "ORDER BY o_orderkey"),

    "sql_subquery_exists" ->
      ("SELECT c_custkey, c_name FROM customer c WHERE EXISTS (" +
        "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 100000.0) " +
        "ORDER BY c_custkey"),

    "sql_subquery_scalar_corr" ->
      ("SELECT n_nationkey, n_name, " +
        "(SELECT count(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) " +
        "AS n_customers FROM nation n ORDER BY n_nationkey"),

    // identical semantics through the bucketized (user, time-bin) join key
    "join_range_bucketed" ->
      ("SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id, " +
        "a.event_type AS a_type, b.event_type AS b_type " +
        "FROM events a JOIN events b ON a.user_id = b.user_id " +
        "AND date_trunc('microseconds', b.ts) > date_trunc('microseconds', a.ts) " +
        "AND date_trunc('microseconds', b.ts) <= date_trunc('microseconds', a.ts) + INTERVAL 60 SECOND " +
        "AND a.event_id <> b.event_id " +
        "ORDER BY a.user_id, a_id, b_id"),

    "join_asof" ->
      ("SELECT purchase_id, user_id, click_id FROM (" +
        "SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id, " +
        "row_number() OVER (PARTITION BY p.event_id " +
        "ORDER BY date_trunc('microseconds', c.ts) DESC, c.event_id DESC) AS rn " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "JOIN (SELECT * FROM events WHERE event_type = 'click') c " +
        "ON p.user_id = c.user_id " +
        "AND date_trunc('microseconds', c.ts) <= date_trunc('microseconds', p.ts)" +
        ") WHERE rn = 1 ORDER BY purchase_id"),

    "join_asof_forward" ->
      ("SELECT purchase_id, user_id, click_id FROM (" +
        "SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id, " +
        "row_number() OVER (PARTITION BY p.event_id " +
        "ORDER BY date_trunc('microseconds', c.ts) ASC, c.event_id ASC) AS rn " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "JOIN (SELECT * FROM events WHERE event_type = 'click') c " +
        "ON p.user_id = c.user_id " +
        "AND date_trunc('microseconds', c.ts) > date_trunc('microseconds', p.ts)" +
        ") WHERE rn = 1 ORDER BY purchase_id"),

    // identical semantics through the native AsOfJoinExec operator
    "join_asof_native" ->
      ("SELECT purchase_id, user_id, click_id FROM (" +
        "SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id, " +
        "row_number() OVER (PARTITION BY p.event_id " +
        "ORDER BY date_trunc('microseconds', c.ts) DESC, c.event_id DESC) AS rn " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "JOIN (SELECT * FROM events WHERE event_type = 'click') c " +
        "ON p.user_id = c.user_id " +
        "AND date_trunc('microseconds', c.ts) <= date_trunc('microseconds', p.ts)" +
        ") WHERE rn = 1 ORDER BY purchase_id"),

    // ------------------------------------------------------------- §2.4 aggs
    "agg_pricing_summary" ->
      ("SELECT l_returnflag, l_linestatus, floor((sum(l_quantity)) * 100 + 0.5) / 100.0 AS sum_qty, " +
        "floor((sum(l_extendedprice)) * 100 + 0.5) / 100.0 AS sum_base_price, " +
        "floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100.0 AS sum_disc_price, " +
        "floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100 + 0.5) / 100.0 AS sum_charge, " +
        "floor((avg(l_quantity)) * 10000 + 0.5) / 10000.0 AS avg_qty, " +
        "floor((avg(l_extendedprice)) * 10000 + 0.5) / 10000.0 AS avg_price, " +
        "floor((avg(l_discount)) * 10000 + 0.5) / 10000.0 AS avg_disc, count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),

    "agg_global" ->
      ("SELECT count(*) AS n_rows, floor((sum(l_extendedprice)) * 100 + 0.5) / 100.0 AS sum_price, " +
        "floor((min(l_quantity)) * 100 + 0.5) / 100.0 AS min_qty, floor((max(l_quantity)) * 100 + 0.5) / 100.0 AS max_qty, " +
        "floor((avg(l_discount)) * 10000 + 0.5) / 10000.0 AS avg_disc FROM lineitem"),

    "agg_distinct" ->
      ("SELECT event_type, count(DISTINCT user_id) AS n_users, " +
        "count(*) AS n_events FROM events GROUP BY event_type ORDER BY event_type"),

    "agg_rollup" ->
      ("SELECT r_name, n_name, count(*) AS n_cust, " +
        "floor((sum(c_acctbal)) * 100 + 0.5) / 100.0 AS sum_bal, " +
        "((CASE WHEN r_name IS NULL THEN 2 ELSE 0 END) + " +
        "(CASE WHEN n_name IS NULL THEN 1 ELSE 0 END))::INT AS gid " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY ROLLUP (r_name, n_name) ORDER BY gid, r_name, n_name"),

    "agg_cube" ->
      ("SELECT c_mktsegment, o_orderstatus, count(*) AS n, " +
        "floor((sum(o_totalprice)) * 100 + 0.5) / 100.0 AS sum_price, " +
        "((CASE WHEN c_mktsegment IS NULL THEN 2 ELSE 0 END) + " +
        "(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END))::INT AS gid " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY CUBE (c_mktsegment, o_orderstatus) " +
        "ORDER BY gid, c_mktsegment, o_orderstatus"),

    "agg_groupingsets" ->
      ("SELECT c_mktsegment, o_orderstatus, count(1) AS n, " +
        "floor((sum(o_totalprice)) * 100 + 0.5) / 100.0 AS sum_price, " +
        "((CASE WHEN c_mktsegment IS NULL THEN 2 ELSE 0 END) + " +
        "(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END))::INT AS gid " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ()) " +
        "ORDER BY gid, c_mktsegment, o_orderstatus"),

    "agg_stats" ->
      ("SELECT l_returnflag, floor((stddev_samp(l_quantity)) * 10000 + 0.5) / 10000.0 AS sd_qty, " +
        "floor((var_samp(l_quantity)) * 10000 + 0.5) / 10000.0 AS var_qty, " +
        "floor((corr(l_quantity, l_extendedprice)) * 10000 + 0.5) / 10000.0 AS corr_qty_price, " +
        "floor((covar_samp(l_quantity, l_extendedprice)) * 10000 + 0.5) / 10000.0 AS cov_qty_price " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),

    // geometric mean: 1e-6-grid ln sums (drift_js recipe), one exp
    "agg_geometric_mean" ->
      ("SELECT event_type, count(*) AS n, " +
        "floor(exp(sum(floor(ln(value) * 1e6 + 0.5)::BIGINT)::DOUBLE / " +
        "count(*)::DOUBLE / 1e6) * 10000 + 0.5) / 10000.0 AS gmean " +
        "FROM events WHERE value > 0 GROUP BY event_type " +
        "ORDER BY event_type"),

    "agg_percentile" ->
      ("SELECT event_type, floor((quantile_cont(value, 0.5)) * 10000 + 0.5) / 10000.0 AS p50, " +
        "floor((quantile_cont(value, 0.9)) * 10000 + 0.5) / 10000.0 AS p90 " +
        "FROM events GROUP BY event_type ORDER BY event_type"),

    // winsorized mean: shared percentile interpolation, identical-double
    // clip, 1e-4 grid snap before the sum, one integer divide
    "agg_winsorized_mean" ->
      ("WITH b AS (SELECT event_type, quantile_cont(value, 0.05) AS lo, " +
        "quantile_cont(value, 0.95) AS hi FROM events GROUP BY 1), " +
        "g AS (SELECT e.event_type, b.lo, b.hi, " +
        "floor(least(greatest(e.value, b.lo), b.hi) * 1e4 + 0.5)::BIGINT " +
        "AS g FROM events e JOIN b USING (event_type)) " +
        "SELECT event_type, count(*) AS n, " +
        "floor(min(lo) * 10000 + 0.5) / 10000.0 AS lo, " +
        "floor(min(hi) * 10000 + 0.5) / 10000.0 AS hi, " +
        "floor((sum(g)::DOUBLE / count(*)::DOUBLE / 1e4) * 10000 + 0.5) " +
        "/ 10000.0 AS wmean " +
        "FROM g GROUP BY 1 ORDER BY 1"),

    "agg_collect" ->
      ("SELECT user_id, array_to_string(list_sort(list(event_type)), ',') AS types " +
        "FROM events GROUP BY user_id ORDER BY user_id"),

    "agg_pivot" ->
      ("SELECT user_id, " +
        "count(*) FILTER (WHERE event_type = 'click') AS click, " +
        "count(*) FILTER (WHERE event_type = 'view') AS view, " +
        "count(*) FILTER (WHERE event_type = 'purchase') AS purchase, " +
        "count(*) FILTER (WHERE event_type = 'signup') AS signup, " +
        "count(*) FILTER (WHERE event_type = 'error') AS error " +
        "FROM events GROUP BY user_id ORDER BY user_id"),

    "agg_unpivot" ->
      ("WITH base AS (SELECT l_returnflag, l_linestatus, " +
        "floor((sum(l_quantity)) * 100 + 0.5) / 100.0 AS sum_qty, " +
        "floor((sum(l_extendedprice)) * 100 + 0.5) / 100.0 AS sum_price, " +
        "floor((avg(l_discount)) * 10000 + 0.5) / 10000.0 AS avg_disc " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus) " +
        "SELECT l_returnflag, l_linestatus, measure, value FROM " +
        "(UNPIVOT base ON sum_qty, sum_price, avg_disc INTO NAME measure VALUE value) " +
        "ORDER BY l_returnflag, l_linestatus, measure"),

    // ------------------------------------------------------ §2.6 sort/limit
    "sort_multi" ->
      ("SELECT p_partkey, p_brand, p_size, floor((p_retailprice) * 100 + 0.5) / 100.0 AS p_retailprice " +
        "FROM part ORDER BY p_brand ASC, p_size DESC, p_partkey ASC"),

    "topk_global" ->
      ("SELECT o_orderkey, o_custkey, floor((o_totalprice) * 100 + 0.5) / 100.0 AS o_totalprice " +
        "FROM orders ORDER BY floor((o_totalprice) * 100 + 0.5) / 100.0 DESC, o_orderkey ASC LIMIT 10"),

    "limit_offset" ->
      ("SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey " +
        "LIMIT 25 OFFSET 100"),

    // -------------------------------------------------------- §2.7 set ops
    // name-matched union of drifted projections, missing columns
    // null-filled then coalesced to sentinels
    "set_union_by_name" ->
      ("SELECT event_id, user_id, coalesce(value, -1.0) AS value, " +
        "coalesce(day, TIMESTAMP '1970-01-01') AS day FROM (" +
        "SELECT event_id, user_id, " +
        "floor(value * 100 + 0.5) / 100.0 AS value FROM events " +
        "WHERE event_type = 'click' " +
        "UNION ALL BY NAME " +
        "SELECT event_id, user_id, " +
        "date_trunc('day', ts)::TIMESTAMP AS day FROM events " +
        "WHERE event_type = 'purchase') ORDER BY event_id"),

    "set_union" ->
      ("SELECT DISTINCT user_id FROM (" +
        "SELECT user_id FROM events WHERE event_type = 'click' " +
        "UNION ALL SELECT user_id FROM events WHERE event_type = 'purchase') " +
        "ORDER BY user_id"),

    "set_intersect" ->
      ("SELECT user_id FROM events WHERE event_type = 'click' " +
        "INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase' " +
        "ORDER BY user_id"),

    "set_except" ->
      ("SELECT user_id FROM events WHERE event_type = 'click' AND value > 300.0 " +
        "EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 300.0 " +
        "ORDER BY user_id"),

    "dedup_exact_rows" ->
      ("SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text " +
        "ORDER BY doc_id"),

    "agg_mode" ->
      ("SELECT user_id, " +
        "arg_min(event_type, lpad((9223372036854775807 - n)::VARCHAR, 19, '0') || event_type) AS mode_event, " +
        "max(n) AS n_mode FROM (" +
        "SELECT user_id, event_type, count(*) AS n FROM events GROUP BY user_id, event_type) " +
        "GROUP BY user_id ORDER BY user_id"),

    // commutative+associative integer folds — exact under any merge order
    "agg_bitwise" ->
      ("SELECT event_type, bit_and(user_id) AS band, bit_or(user_id) AS bor, " +
        "bit_xor(user_id) AS bxor, count(*)::BIGINT AS n " +
        "FROM events GROUP BY event_type ORDER BY event_type"),

    // MERGE INTO routing over parquet (DuckDB 1.0.0 has no MERGE
    // statement — parser error, measured — so the oracle is the
    // identical relational expansion: latest-wins compactions of the
    // even/odd event halves, FULL OUTER JOIN, CASE clause routing)
    "sql_merge_upsert" -> mergeUpsertSql,
    // the stateful twin's batch mode emits the identical rows (no
    // tombstone can fire with nothing pre-published), so it shares the
    // twin verbatim — the stream_scd2/stream_holt_winters precedent
    "stream_merge_upsert" -> mergeUpsertSql,

    "cdc_upsert_latest" ->
      ("SELECT user_id, event_type, " +
        "arg_max(event_id, lpad(epoch_us(ts)::VARCHAR, 20, '0') || lpad(event_id::VARCHAR, 20, '0')) AS event_id, " +
        "floor((arg_max(value, lpad(epoch_us(ts)::VARCHAR, 20, '0') || lpad(event_id::VARCHAR, 20, '0'))) * 100 + 0.5) / 100.0 AS value, " +
        "max(ts) AS ts " +
        "FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type"),

    // ------------------------------------------------------- §2.5 windows
    "win_rank" ->
      ("SELECT user_id, event_id, floor((value) * 100 + 0.5) / 100.0 AS value, " +
        "(row_number() OVER w)::INT AS rn, (rank() OVER w)::INT AS rk, " +
        "(dense_rank() OVER w)::INT AS drk, (ntile(4) OVER w)::INT AS quartile " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id ASC) " +
        "ORDER BY user_id, rn"),

    "win_lag_lead" ->
      ("SELECT user_id, event_id, " +
        "floor(epoch(ts))::BIGINT - (lag(floor(epoch(ts))::BIGINT) OVER w) AS gap_s, " +
        "lead(event_type) OVER w AS next_type " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) " +
        "ORDER BY user_id, event_id"),

    "win_running" ->
      ("SELECT user_id, event_id, floor((sum(value) OVER (" +
        "PARTITION BY user_id ORDER BY ts ASC, event_id ASC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100.0 AS running_sum " +
        "FROM events ORDER BY user_id, event_id"),

    "win_moving_range" ->
      ("SELECT user_id, event_id, floor((avg(value) OVER w) * 10000 + 0.5) / 10000.0 AS avg_1h, " +
        "count(*) OVER w AS n_1h FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY floor(epoch(ts))::BIGINT " +
        "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) " +
        "ORDER BY user_id, event_id"),

    // sliding distinct: in-frame list dedup'd per row; frame bounds on
    // epoch µs integers == Spark's rangeBetween over unix_micros
    "win_rolling_distinct" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(date_trunc('microseconds', ts)) AS eu FROM events) " +
        "SELECT user_id, event_id, " +
        "len(list_distinct(list(event_type) OVER (PARTITION BY user_id " +
        "ORDER BY eu RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)))" +
        "::INT AS n_types_1h " +
        "FROM e ORDER BY user_id, event_id"),

    "win_topk_per_group" ->
      ("SELECT user_id, rn, event_id, value FROM (" +
        "SELECT user_id, event_id, floor((value) * 100 + 0.5) / 100.0 AS value, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC)::INT AS rn " +
        "FROM events) WHERE rn <= 3 ORDER BY user_id, rn"),

    // identical semantics through the native partial top-k operator
    "win_topk_native" ->
      ("SELECT user_id, rn, event_id, value FROM (" +
        "SELECT user_id, event_id, floor((value) * 100 + 0.5) / 100.0 AS value, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC)::INT AS rn " +
        "FROM events) WHERE rn <= 3 ORDER BY user_id, rn"),

    // SQL-standard ntile (larger buckets first) on a unique order
    "win_ntile" ->
      ("SELECT event_id, event_type, ntile(4) OVER (" +
        "PARTITION BY event_type ORDER BY value, event_id)::INT AS quartile " +
        "FROM events ORDER BY event_id"),

    "win_first_last" ->
      ("SELECT DISTINCT user_id, first_value(event_type) OVER w AS first_type, " +
        "last_value(event_type) OVER w AS last_type FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY user_id"),

    "win_dist" ->
      ("SELECT user_id, event_id, " +
        "floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000.0 AS pct_rank, " +
        "floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000.0 AS cume, " +
        "nth_value(event_id, 2) OVER (PARTITION BY user_id " +
        "ORDER BY value ASC, event_id ASC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_event " +
        "FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY value ASC, event_id ASC) " +
        "ORDER BY user_id, event_id"),

    "ts_gapfill" ->
      ("WITH ev AS (SELECT date_trunc('hour', ts) AS h, event_type, value FROM events), " +
        "agg AS (SELECT h, event_type, count(*) AS n, " +
        "floor(sum(value) * 100 + 0.5) / 100.0 AS sum_value FROM ev GROUP BY h, event_type), " +
        "bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM ev), " +
        "hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds), " +
        "grid AS (SELECT h, event_type FROM hours CROSS JOIN (SELECT DISTINCT event_type FROM ev)) " +
        "SELECT g.h, g.event_type, coalesce(a.n, 0) AS n, a.sum_value, " +
        "last_value(a.sum_value IGNORE NULLS) OVER (PARTITION BY g.event_type ORDER BY g.h " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value " +
        "FROM grid g LEFT JOIN agg a ON g.h = a.h AND g.event_type = a.event_type " +
        "ORDER BY g.h, g.event_type"),

    "fn_bitwise" ->
      ("SELECT event_id, event_id & 255 AS band, event_id | 4096 AS bor, " +
        "xor(event_id, user_id) AS bxor, event_id << 3 AS shl, " +
        "event_id >> 2 AS shr, bit_count(event_id)::INT AS popcount " +
        "FROM events ORDER BY event_id"),

    // ---------------------------------------------------- §2.8 fn families
    "fn_string" ->
      ("SELECT p_partkey, lower(p_name) AS lo, upper(p_brand) AS up, " +
        "trim('  ' || p_type || '  ') AS trimmed, " +
        "substring(p_name, 1, 5) AS sub5, " +
        "concat_ws('|', p_brand, p_type) AS joined, " +
        "length(p_name)::INT AS len, " +
        "string_split(p_type, ' ')[1] AS first_word, " +
        "regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num, " +
        "regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled, " +
        "lpad(p_partkey::VARCHAR, 8, '0') AS padded, " +
        "levenshtein(p_brand, p_type)::INT AS lev, " +
        "array_to_string(list_transform(string_split(lower(p_name), ' '), " +
        "w -> upper(w[1]) || w[2:]), ' ') AS title " +
        "FROM part ORDER BY p_partkey"),

    "fn_date" ->
      ("SELECT o_orderkey, year(o_orderdate)::INT AS y, month(o_orderdate)::INT AS m, " +
        "dayofmonth(o_orderdate)::INT AS dom, (dayofweek(o_orderdate) + 1)::INT AS dow, " +
        "date_trunc('month', o_orderdate)::TIMESTAMP AS month_start, " +
        "date_diff('day', o_orderdate::DATE, DATE '2002-01-01')::INT AS days_to_2002, " +
        "(o_orderdate::DATE + 30)::TIMESTAMP AS plus30, " +
        "floor(epoch(o_orderdate))::BIGINT AS epoch, " +
        "o_orderdate::DATE::TIMESTAMP AS as_date, quarter(o_orderdate)::INT AS q, " +
        "last_day(o_orderdate::DATE)::TIMESTAMP AS eom " +
        "FROM orders ORDER BY o_orderkey"),

    "fn_math" ->
      ("SELECT l_orderkey, l_linenumber, floor((l_extendedprice) * 10 + 0.5) / 10.0 AS r1, " +
        "abs(l_quantity - 25.0) AS absdev, " +
        "ceil(l_discount * 100)::BIGINT AS disc_pct_ceil, " +
        "floor(l_tax * 100)::BIGINT AS tax_pct_floor, " +
        "floor((pow(l_quantity, 2)) * 100 + 0.5) / 100.0 AS qty_sq, " +
        "floor((sqrt(l_extendedprice)) * 10000 + 0.5) / 10000.0 AS sqrt_price, " +
        "floor((exp(l_discount)) * 10000 + 0.5) / 10000.0 AS exp_disc, " +
        "floor((ln(l_extendedprice)) * 10000 + 0.5) / 10000.0 AS ln_price, " +
        "floor((log10(l_extendedprice)) * 10000 + 0.5) / 10000.0 AS log10_price, " +
        "sign(l_quantity - 25.0)::DOUBLE AS sign_dev, " +
        "floor((greatest(l_quantity, l_discount * 100)) * 100 + 0.5) / 100.0 AS gr, " +
        "floor((least(l_quantity, l_tax * 100)) * 100 + 0.5) / 100.0 AS le, " +
        "l_orderkey % 7 AS pm " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),

    "fn_cond" ->
      ("SELECT o_orderkey, " +
        "CASE WHEN o_totalprice > 150000.0 THEN 'big' " +
        "WHEN o_totalprice > 50000.0 THEN 'mid' ELSE 'small' END AS bucket, " +
        "coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_or_pending, " +
        "CASE WHEN o_orderpriority LIKE '1%' THEN 1 " +
        "WHEN o_orderpriority LIKE '2%' THEN 2 ELSE 9 END AS prio_class, " +
        "coalesce(nullif(o_orderstatus, 'O'), '-') AS nvl_demo " +
        "FROM orders ORDER BY o_orderkey"),

    "fn_array" ->
      ("SELECT vec_id, length(embedding)::INT AS dims, " +
        "floor((embedding[1]::DOUBLE) * 10000 + 0.5) / 10000.0 AS first, " +
        "floor((list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) * 10000 + 0.5) / 10000.0 AS norm_sq, " +
        "floor((list_sum(list_transform(embedding, x -> abs(x::DOUBLE)))) * 10000 + 0.5) / 10000.0 AS l1, " +
        "length(list_filter(embedding, x -> x > 0))::INT AS n_pos, " +
        "floor((list_sum(list_transform(range(1, 65), " +
        "i -> embedding[i]::DOUBLE * embedding[65 - i]::DOUBLE))) * 10000 + 0.5) / 10000.0 AS dot_rev, " +
        "floor((list_sort(embedding[1:4])[1]::DOUBLE) * 10000 + 0.5) / 10000.0 AS s4_1, " +
        "floor((list_sort(embedding[1:4])[2]::DOUBLE) * 10000 + 0.5) / 10000.0 AS s4_2, " +
        "floor((list_sort(embedding[1:4])[3]::DOUBLE) * 10000 + 0.5) / 10000.0 AS s4_3, " +
        "floor((list_sort(embedding[1:4])[4]::DOUBLE) * 10000 + 0.5) / 10000.0 AS s4_4 " +
        "FROM embeddings ORDER BY vec_id"),

    "fn_map_json" ->
      ("SELECT event_id, json_extract_string(props, '$.k')::INT AS k_struct, " +
        "json_extract_string(props, '$.k')::INT AS k_path, " +
        "'k' AS mkeys, " +
        "json_extract_string(props, '$.k') AS mvals, " +
        "json_extract_string(props, '$.k')::INT AS k_map " +
        "FROM events ORDER BY event_id"),

    "fn_hash" ->
      ("SELECT doc_id, sha256(text) AS sha256, md5(text) AS md5 " +
        "FROM documents ORDER BY doc_id"),

    "udf_scalar" ->
      ("SELECT l_orderkey, l_linenumber, " +
        "floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100.0 AS eff_price " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),

    "udtf_explode" ->
      ("SELECT doc_id, unnest(generate_series(1, len(string_split(text, ' '))))::INT - 1 AS pos, " +
        "unnest(string_split(text, ' ')) AS word " +
        "FROM documents WHERE doc_id < 50 ORDER BY doc_id, pos"),

    // ------------------------------------------------ §2.9 streaming (batch forms)
    "stream_tumbling_1h" ->
      ("SELECT date_trunc('hour', ts)::TIMESTAMP AS hour_start, event_type, " +
        "count(*) AS n, floor((sum(value)) * 100 + 0.5) / 100.0 AS sum_value " +
        "FROM events GROUP BY hour_start, event_type ORDER BY hour_start, event_type"),

    // chained stateful agg: hourly counts → daily peak/active-hours
    "stream_chained_agg" ->
      ("WITH h AS (SELECT date_trunc('hour', ts)::TIMESTAMP AS h, " +
        "event_type, count(*) AS n FROM events GROUP BY 1, 2) " +
        "SELECT date_trunc('day', h)::TIMESTAMP AS day_start, event_type, " +
        "max(n) AS peak_hourly, count(*) AS active_hours " +
        "FROM h GROUP BY day_start, event_type " +
        "ORDER BY day_start, event_type"),

    // per-hour top-3 event types: rank over the maintained hourly counts
    "stream_topk_per_window" ->
      ("WITH h AS (SELECT date_trunc('hour', ts)::TIMESTAMP AS hour_start, " +
        "event_type, count(*) AS n FROM events GROUP BY 1, 2), " +
        "r AS (SELECT hour_start, event_type, n, row_number() OVER " +
        "(PARTITION BY hour_start ORDER BY n DESC, event_type)::INT AS rn FROM h) " +
        "SELECT hour_start, event_type, n, rn FROM r WHERE rn <= 3 " +
        "ORDER BY hour_start, rn"),

    "stream_sliding" ->
      ("SELECT win_start, event_type, count(*) AS n, " +
        "floor((sum(value)) * 100 + 0.5) / 100.0 AS sum_value FROM (" +
        "SELECT (time_bucket(INTERVAL 15 MINUTE, ts) - unnest([0,1,2,3]) * INTERVAL 15 MINUTE)::TIMESTAMP AS win_start, " +
        "event_type, value FROM events) " +
        "GROUP BY win_start, event_type ORDER BY win_start, event_type"),

    "stream_session_30m" ->
      ("SELECT user_id, session_idx, min(ts) AS session_start, max(ts) AS session_end, " +
        "count(*) AS n_events, floor((sum(value)) * 100 + 0.5) / 100.0 AS sum_value FROM (" +
        "SELECT user_id, ts, event_id, value, " +
        "(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_idx FROM (" +
        "SELECT *, CASE WHEN floor(epoch(ts))::BIGINT - " +
        "(lag(floor(epoch(ts))::BIGINT) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800 " +
        "THEN 1 ELSE 0 END AS new_session FROM events)) " +
        "GROUP BY user_id, session_idx ORDER BY user_id, session_idx"),

    "stream_dedup_watermark" ->
      ("SELECT event_id, user_id, event_type FROM events ORDER BY event_id"),

    // Kinesis reshard stand-in: shard 1 splits into 2/3 at the first
    // third of the fixture's time range, 2/3 merge into 4 at the second
    // third; era membership on the floor-epoch grid (Spark
    // unix_timestamp floors; DuckDB epoch() rounds, hence floor())
    "stream_reshard_replay" ->
      ("WITH b AS (SELECT min(floor(epoch(ts))::BIGINT) AS mn, " +
        "max(floor(epoch(ts))::BIGINT) AS mx FROM events), " +
        "e AS (SELECT user_id, value, ts, floor(epoch(ts))::BIGINT AS sec, " +
        "user_id % 2 AS p FROM events), " +
        "a AS (SELECT user_id, value, ts, " +
        "CASE WHEN sec < mn + (mx - mn) // 3 THEN 'parent' " +
        "WHEN sec < mn + (2 * (mx - mn)) // 3 THEN 'split' " +
        "ELSE 'merged' END AS era, " +
        "CASE WHEN sec < mn + (mx - mn) // 3 THEN p " +
        "WHEN sec < mn + (2 * (mx - mn)) // 3 THEN " +
        "(CASE WHEN p = 1 THEN 2 + ((user_id >> 1) % 2) ELSE 0 END) " +
        "ELSE (CASE WHEN p = 1 THEN 4 ELSE 0 END) END AS shard_id " +
        "FROM e, b) " +
        "SELECT shard_id, era, count(*) AS n_events, " +
        "count(DISTINCT user_id) AS n_users, " +
        "floor((sum(value)) * 100 + 0.5) / 100.0 AS sum_value, " +
        "min(ts) AS first_ts, max(ts) AS last_ts " +
        "FROM a GROUP BY shard_id, era ORDER BY shard_id, era"),

    "stream_static_join" ->
      ("SELECT event_id, user_id, event_type, c_mktsegment, " +
        "floor((value) * 100 + 0.5) / 100.0 AS value " +
        "FROM events JOIN customer ON user_id = c_custkey ORDER BY event_id"),

    "stream_stream_join" ->
      ("SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id " +
        "FROM (SELECT * FROM events WHERE event_type = 'click') c " +
        "JOIN (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "ON c.user_id = p.user_id " +
        "AND date_trunc('microseconds', p.ts) >= date_trunc('microseconds', c.ts) " +
        "AND date_trunc('microseconds', p.ts) <= date_trunc('microseconds', c.ts) + INTERVAL 1 HOUR " +
        "ORDER BY c.user_id, click_id, purchase_id"),

    // LEFT OUTER variant: unmatched clicks survive with a −1 sentinel
    // and matched = 0 (the watermark-evicted null emission, batch form)
    "stream_stream_left" ->
      ("SELECT c.user_id, c.event_id AS click_id, " +
        "date_trunc('microseconds', c.ts) AS c_ts, " +
        "coalesce(p.event_id, -1) AS purchase_id, " +
        "(p.event_id IS NOT NULL)::INT AS matched " +
        "FROM (SELECT * FROM events WHERE event_type = 'click') c " +
        "LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "ON c.user_id = p.user_id " +
        "AND date_trunc('microseconds', p.ts) >= date_trunc('microseconds', c.ts) " +
        "AND date_trunc('microseconds', p.ts) <= date_trunc('microseconds', c.ts) + INTERVAL 1 HOUR " +
        "ORDER BY c.user_id, click_id, purchase_id"),

    // FULL OUTER variant: unmatched rows of BOTH sides survive with −1
    // sentinels (watermark-evicted null emission on each side's horizon)
    "stream_stream_full" ->
      ("SELECT coalesce(c.user_id, p.user_id) AS user_id, " +
        "coalesce(c.event_id, -1) AS click_id, " +
        "coalesce(p.event_id, -1) AS purchase_id, " +
        "(c.event_id IS NOT NULL AND p.event_id IS NOT NULL)::INT AS matched " +
        "FROM (SELECT * FROM events WHERE event_type = 'click') c " +
        "FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "ON c.user_id = p.user_id " +
        "AND date_trunc('microseconds', p.ts) >= date_trunc('microseconds', c.ts) " +
        "AND date_trunc('microseconds', p.ts) <= date_trunc('microseconds', c.ts) + INTERVAL 1 HOUR " +
        "ORDER BY 1, 2, 3"),

    // -------------------------------------------------- §2.10 LLM pipeline
    "dedup_exact_sha" ->
      ("SELECT min(doc_id) AS doc_id, digest, count(*) AS n_copies FROM " +
        "(SELECT doc_id, sha256(text) AS digest FROM documents) " +
        "GROUP BY digest ORDER BY doc_id"),

    "text_tokenize_wordcount" ->
      ("SELECT lang, word, count(*) AS n FROM " +
        "(SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents) " +
        "GROUP BY lang, word ORDER BY lang, word"),

    // the composed corpus DATA CARD: every section body verbatim, so the
    // composition itself is hash-gated (pipeline_drift_report's recipe)
    "pipeline_corpus_card" ->
      ("WITH toks AS (SELECT lang, source, text, " +
        "len(string_split(text, ' ')) AS t, " +
        "len(list_distinct(string_split(text, ' '))) AS nd FROM documents) " +
        "SELECT 'lang' AS section, lang AS key, 'n_docs' AS metric, " +
        "count(*)::DOUBLE AS value FROM toks GROUP BY lang " +
        "UNION ALL SELECT 'lang', lang, 'n_tokens', sum(t)::DOUBLE " +
        "FROM toks GROUP BY lang " +
        "UNION ALL SELECT 'source', source, 'n_docs', count(*)::DOUBLE " +
        "FROM toks GROUP BY source " +
        "UNION ALL SELECT 'dup', 'corpus', 'exact_dup_frac', " +
        "floor((count(*) - count(DISTINCT sha256(text)))::DOUBLE / " +
        "count(*)::DOUBLE * 1000000 + 0.5) / 1000000.0 FROM documents " +
        "UNION ALL SELECT 'quality', 'corpus', 'kept_frac', " +
        "floor(sum(CASE WHEN t >= 5 AND nd::DOUBLE / t::DOUBLE >= 0.3 " +
        "THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE * 1000000 + 0.5) " +
        "/ 1000000.0 FROM toks " +
        "UNION ALL SELECT 'len', 'corpus', 'min_tokens', min(t)::DOUBLE FROM toks " +
        "UNION ALL SELECT 'len', 'corpus', 'mean_tokens', " +
        "floor(sum(t)::DOUBLE / count(*)::DOUBLE * 1000000 + 0.5) / 1000000.0 FROM toks " +
        "UNION ALL SELECT 'len', 'corpus', 'max_tokens', max(t)::DOUBLE FROM toks " +
        "ORDER BY section, key, metric"),

    // whole-token blocklist gate: unnest + IN is DuckDB's spelling of the
    // exploded-token broadcast join; ≥ 3 distinct hits flags the doc
    "text_blocklist_filter" ->
      ("SELECT doc_id, count(DISTINCT w) AS n_blocked, min(w) AS first_term " +
        "FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) " +
        "WHERE w IN ('slow', 'fast', 'big', 'small', 'a', 'the') " +
        "GROUP BY doc_id HAVING count(DISTINCT w) >= 3 ORDER BY doc_id"),

    // the release manifest computed from the ORIGINAL table — the Spark
    // side computes it from the written-and-reloaded shard files, so the
    // hash gate certifies the whole publish round trip
    "sink_shard_manifest" ->
      ("SELECT (((doc_id % 2147483648) * 2654435761) % 4294967296 % 16)::INT AS shard, " +
        "count(*) AS n_docs, " +
        "sum(len(string_split(text, ' ')))::BIGINT AS n_tokens, " +
        "(sum(('0x' || substring(md5(text), 1, 12))::BIGINT) % 9007199254740992)::BIGINT AS content_digest " +
        "FROM documents GROUP BY 1 ORDER BY shard"),

    // content-defined chunking: the identical small-integer rolling
    // window + boundary rule + list slicing, replayed in DuckDB's list
    // dialect (list_slice is begin..end inclusive where Spark's slice
    // is start+length — both spell the same chunk)
    "dedup_cdc_chunks" ->
      ("WITH base AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
        "wh AS (SELECT doc_id, ws, " +
        "list_transform(ws, w -> (len(w) * 961 + ascii(w) * 31 " +
        "+ ascii(w[-1]))::BIGINT) AS wh FROM base), " +
        "hs AS (SELECT doc_id, ws, " +
        "list_transform(range(1, len(ws) + 1), i -> wh[i] " +
        "+ CASE WHEN i > 1 THEN wh[i - 1] * 31 ELSE 0 END " +
        "+ CASE WHEN i > 2 THEN wh[i - 2] * 961 ELSE 0 END " +
        "+ CASE WHEN i > 3 THEN wh[i - 3] * 29791 ELSE 0 END) AS h FROM wh), " +
        "bp AS (SELECT doc_id, ws, " +
        "list_filter(range(1, len(ws) + 1), i -> " +
        "((h[i] % 2147483648) * 2654435761) % 4294967296 < 268435456 OR i = len(ws)) AS bpos FROM hs), " +
        "ch AS (SELECT doc_id, md5(unnest(list_transform(range(1, len(bpos) + 1), " +
        "j -> array_to_string(list_slice(ws, " +
        "CASE WHEN j = 1 THEN 1 ELSE bpos[j - 1] + 1 END, bpos[j]), ' ')))) AS digest FROM bp), " +
        "cnts AS (SELECT digest, count(*) AS cnt FROM ch GROUP BY 1) " +
        "SELECT doc_id, count(*) AS n_chunks, " +
        "sum((cnt >= 2)::BIGINT)::BIGINT AS dup_chunks, " +
        "floor(sum((cnt >= 2)::BIGINT)::DOUBLE / count(*)::DOUBLE * 1000000 + 0.5) " +
        "/ 1000000.0 AS dup_frac " +
        "FROM ch JOIN cnts USING (digest) GROUP BY doc_id ORDER BY doc_id"),

    // t-closeness: exact-integer EMD (drift_emd's cross-multiplied
    // cumulative recipe) between each QI class's band distribution and
    // the global one, normalized to [0,1] by the band span
    "privacy_t_closeness" ->
      ("WITH b AS (SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment, " +
        "floor(c_acctbal / 1000)::BIGINT AS band FROM customer), " +
        "cells AS (SELECT nationkey, mktsegment, band, count(*)::BIGINT AS cnt " +
        "FROM b GROUP BY 1, 2, 3), " +
        "g AS (SELECT band, count(*)::BIGINT AS gcnt FROM b GROUP BY 1), " +
        "cl AS (SELECT nationkey, mktsegment, sum(cnt)::BIGINT AS n_c " +
        "FROM cells GROUP BY 1, 2), " +
        "grid AS (SELECT cl.nationkey, cl.mktsegment, cl.n_c, g.band, g.gcnt, " +
        "coalesce(cells.cnt, 0)::BIGINT AS cnt FROM cl CROSS JOIN g " +
        "LEFT JOIN cells ON cells.nationkey = cl.nationkey " +
        "AND cells.mktsegment = cl.mktsegment AND cells.band = g.band), " +
        "sc AS (SELECT nationkey, mktsegment, n_c, band, " +
        "sum(cnt) OVER (PARTITION BY nationkey, mktsegment ORDER BY band) AS cum_c, " +
        "sum(gcnt) OVER (PARTITION BY nationkey, mktsegment ORDER BY band) AS cum_g, " +
        "sum(gcnt) OVER (PARTITION BY nationkey, mktsegment) AS nn, " +
        "coalesce(lead(band) OVER (PARTITION BY nationkey, mktsegment ORDER BY band) - band, 0) AS gap, " +
        "max(band) OVER (PARTITION BY nationkey, mktsegment) - " +
        "min(band) OVER (PARTITION BY nationkey, mktsegment) AS span FROM grid), " +
        "agg AS (SELECT nationkey, mktsegment, n_c, nn, span, " +
        "sum(abs(cum_c * nn - cum_g * n_c) * gap)::BIGINT AS raw FROM sc " +
        "GROUP BY 1, 2, 3, 4, 5) " +
        "SELECT nationkey, mktsegment, n_c AS class_size, " +
        "floor(raw::DOUBLE / (n_c * nn)::DOUBLE * 1000000 + 0.5) / 1000000.0 AS emd_bands, " +
        "floor(raw::DOUBLE / (n_c * nn * span)::DOUBLE * 1000000 + 0.5) / 1000000.0 AS t, " +
        "(CASE WHEN floor(raw::DOUBLE / (n_c * nn * span)::DOUBLE * 1000000 + 0.5) / 1000000.0 <= 0.2 " +
        "THEN 1 ELSE 0 END)::INT AS meets_t02 " +
        "FROM agg ORDER BY nationkey, mktsegment"),

    "text_tfidf_topterms" ->
      ("WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term), " +
        "df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term), " +
        "n AS (SELECT count(*) AS n FROM documents), " +
        "scored AS (SELECT doc_id, term, " +
        "floor((tf * ln((n + 1.0) / (df + 1.0))) * 10000 + 0.5) / 10000.0 AS score " +
        "FROM tf JOIN df USING (term) CROSS JOIN n), " +
        "ranked AS (SELECT doc_id, term, score, " +
        "(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC))::INT AS rn FROM scored) " +
        "SELECT doc_id, rn, term, score FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn"),

    "text_lang_stats" ->
      ("SELECT lang, source, count(*) AS n_docs, " +
        "floor((avg(n_chars)) * 10000 + 0.5) / 10000.0 AS avg_chars, " +
        "min(n_chars) AS min_chars, max(n_chars) AS max_chars, " +
        "count(DISTINCT floor(n_chars / 100)) AS n_len_buckets " +
        "FROM documents GROUP BY lang, source ORDER BY lang, source"),

    "text_quality_score" ->
      ("SELECT doc_id, n_chars, len(string_split(text, ' '))::INT AS n_tokens, " +
        "floor((n_chars::DOUBLE / len(string_split(text, ' '))) * 10000 + 0.5) / 10000.0 AS avg_token_len, " +
        "floor((len(list_distinct(string_split(text, ' ')))::DOUBLE / len(string_split(text, ' '))) * 10000 + 0.5) / 10000.0 AS distinct_ratio, " +
        "floor(((n_chars - length(replace(text, ' ', '')))::DOUBLE / n_chars) * 10000 + 0.5) / 10000.0 AS space_ratio " +
        "FROM documents ORDER BY doc_id"),

    "text_token_count" ->
      ("SELECT doc_id, len(string_split(text, ' '))::INT AS ws_tokens, " +
        "len(list_filter(string_split_regex(text, '[^a-z0-9]+'), x -> len(x) > 0))::INT AS re_tokens, " +
        "len(list_filter(string_split(text, ' '), w -> len(w) >= 5))::INT AS long_tokens " +
        "FROM documents ORDER BY doc_id"),

    "text_langid" ->
      ("SELECT doc_id, lang, " +
        "len(list_filter(string_split(text, ' '), w -> w IN ('the','fast','order')))::INT AS en_hits, " +
        "len(list_filter(string_split(text, ' '), w -> w IN ('key','table','scan')))::INT AS de_hits, " +
        "len(list_filter(string_split(text, ' '), w -> w IN ('sort','merge','row')))::INT AS fr_hits, " +
        "CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ('the','fast','order'))) >= len(list_filter(string_split(text, ' '), w -> w IN ('key','table','scan'))) " +
        "AND len(list_filter(string_split(text, ' '), w -> w IN ('the','fast','order'))) >= len(list_filter(string_split(text, ' '), w -> w IN ('sort','merge','row'))) THEN 'en' " +
        "WHEN len(list_filter(string_split(text, ' '), w -> w IN ('key','table','scan'))) >= len(list_filter(string_split(text, ' '), w -> w IN ('sort','merge','row'))) THEN 'de' " +
        "ELSE 'fr' END AS langid_guess " +
        "FROM documents ORDER BY doc_id"),

    "text_fingerprint" ->
      ("SELECT doc_id, list_reduce(list_prepend(0::BIGINT, " +
        "list_transform(string_split(text, ' '), w -> len(w)::BIGINT)), " +
        "(acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint " +
        "FROM documents ORDER BY doc_id"),

    "knn_cosine" ->
      ("SELECT vec_id, rn, b_id, score FROM (" +
        "SELECT vec_id, b_id, score, " +
        "(row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, b_id ASC))::INT AS rn FROM (" +
        "SELECT a.vec_id AS vec_id, b.vec_id AS b_id, " +
        "floor((list_sum(list_transform(range(1, 65), " +
        "i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))) * 10000 + 0.5) / 10000.0 AS score " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)) " +
        "WHERE rn <= 3 ORDER BY vec_id, rn"),

    // sliding-window chunking: shared start rule sequence(0, n-1, 48),
    // 1-based 64-length slice clamps identically in both engines
    "text_chunk_overlap" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws, " +
        "len(string_split(text, ' '))::BIGINT AS n FROM documents) " +
        "SELECT doc_id, (s // 48)::INT AS chunk_id, s::BIGINT AS start_tok, " +
        "least(64, n - s)::BIGINT AS chunk_len, " +
        "array_to_string(ws[(s + 1)::INT:(s + 64)::INT], ' ') AS chunk_text " +
        "FROM t, unnest(generate_series(0, n - 1, 48)) AS u(s) " +
        "ORDER BY doc_id, chunk_id"),

    // hybrid RRF: dense = knn_cosine's rounded-dot rank capped at 10 on
    // the query panel; lexical = distinct-shared-word count rank; fused
    // score 1/(60+rd) + 1/(60+rl) in that operand order, Det-snapped
    "search_hybrid_rrf" ->
      ("WITH q AS (SELECT vec_id, embedding FROM embeddings " +
        "WHERE vec_id % 25 = 0 AND vec_id < 2500), " +
        "pairs AS (SELECT q.vec_id AS qid, b.vec_id AS cid, " +
        "floor(list_sum(list_transform(range(1, 65), " +
        "i -> q.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) " +
        "* 10000 + 0.5) / 10000.0 AS score " +
        "FROM q JOIN embeddings b ON b.vec_id <> q.vec_id), " +
        "dense AS (SELECT qid, cid, rnk_d FROM (SELECT qid, cid, " +
        "row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid ASC) " +
        "AS rnk_d FROM pairs) WHERE rnk_d <= 10), " +
        // the retrieval corpus IS the vector-indexed one: both lexical
        // arms scope to docs that have an embedding (at sf0.1 only a
        // prefix of documents is embedded)
        "qw AS (SELECT d.doc_id AS qid, " +
        "unnest(list_distinct(string_split(d.text, ' '))) AS w " +
        "FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id " +
        "WHERE d.doc_id % 25 = 0 AND d.doc_id < 2500), " +
        "cw AS (SELECT d.doc_id AS cid, " +
        "unnest(list_distinct(string_split(d.text, ' '))) AS w " +
        "FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id), " +
        "ov AS (SELECT qid, cid, count(*)::BIGINT AS ov FROM qw " +
        "JOIN cw ON qw.w = cw.w AND cw.cid <> qw.qid GROUP BY qid, cid), " +
        "lex AS (SELECT qid, cid, rnk_l FROM (SELECT qid, cid, " +
        "row_number() OVER (PARTITION BY qid ORDER BY ov DESC, cid ASC) " +
        "AS rnk_l FROM ov) WHERE rnk_l <= 10), " +
        "fused AS (SELECT coalesce(d.qid, l.qid) AS qid, " +
        "coalesce(d.cid, l.cid) AS cid, " +
        "floor((coalesce(1.0 / (60 + d.rnk_d), 0.0) " +
        "+ coalesce(1.0 / (60 + l.rnk_l), 0.0)) * 1000000 + 0.5) " +
        "/ 1000000.0 AS rrf " +
        "FROM dense d FULL JOIN lex l ON d.qid = l.qid AND d.cid = l.cid) " +
        "SELECT qid, rn, cid, rrf FROM (SELECT qid, cid, rrf, " +
        "(row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, cid ASC))" +
        "::INT AS rn FROM fused) WHERE rn <= 5 ORDER BY qid, rn"),

    // length-bucketed packing: exact decile bounds, map-side bucket
    // assignment, within-bucket cumulative bins, per-bucket fill ratio
    "pack_length_buckets" ->
      ("WITH t AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens " +
        "FROM documents), " +
        "q AS (SELECT quantile_cont(n_tokens, " +
        "[0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs FROM t), " +
        "b AS (SELECT doc_id, n_tokens, (1 " +
        "+ (CASE WHEN n_tokens > qs[1] THEN 1 ELSE 0 END) " +
        "+ (CASE WHEN n_tokens > qs[2] THEN 1 ELSE 0 END) " +
        "+ (CASE WHEN n_tokens > qs[3] THEN 1 ELSE 0 END) " +
        "+ (CASE WHEN n_tokens > qs[4] THEN 1 ELSE 0 END) " +
        "+ (CASE WHEN n_tokens > qs[5] THEN 1 ELSE 0 END) " +
        "+ (CASE WHEN n_tokens > qs[6] THEN 1 ELSE 0 END) " +
        "+ (CASE WHEN n_tokens > qs[7] THEN 1 ELSE 0 END) " +
        "+ (CASE WHEN n_tokens > qs[8] THEN 1 ELSE 0 END) " +
        "+ (CASE WHEN n_tokens > qs[9] THEN 1 ELSE 0 END))::INT AS bucket " +
        "FROM t, q), " +
        "c AS (SELECT bucket, doc_id, n_tokens, " +
        "sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum FROM b), " +
        "g AS (SELECT bucket, count(*)::BIGINT AS n_docs, " +
        "(max(floor((cum - n_tokens) / 4096))::BIGINT + 1) AS n_bins, " +
        "sum(n_tokens)::BIGINT AS sum_tokens FROM c GROUP BY bucket) " +
        "SELECT bucket, n_docs, n_bins, sum_tokens, " +
        "floor(sum_tokens::DOUBLE / (n_bins * 4096)::DOUBLE * 10000 + 0.5) " +
        "/ 10000.0 AS fill_ratio FROM g ORDER BY bucket"),

    // filtered search: the same brute ranking restricted to the query's
    // label stratum BEFORE the top-3 cut (pre-filter semantics)
    "knn_filtered" ->
      ("SELECT vec_id, label, rn, b_id, score FROM (" +
        "SELECT vec_id, label, b_id, score, " +
        "(row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, b_id ASC))::INT AS rn FROM (" +
        "SELECT a.vec_id AS vec_id, a.label AS label, b.vec_id AS b_id, " +
        "floor((list_sum(list_transform(range(1, 65), " +
        "i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))) * 10000 + 0.5) / 10000.0 AS score " +
        "FROM embeddings a JOIN embeddings b " +
        "ON a.vec_id <> b.vec_id AND a.label = b.label)) " +
        "WHERE rn <= 3 ORDER BY vec_id, rn"),

    // knn_sharded merges shard-local top-3s exactly, so it answers the
    // SAME question as knn_cosine and shares its oracle verbatim.
    "knn_sharded" ->
      ("SELECT vec_id, rn, b_id, score FROM (" +
        "SELECT vec_id, b_id, score, " +
        "(row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, b_id ASC))::INT AS rn FROM (" +
        "SELECT a.vec_id AS vec_id, b.vec_id AS b_id, " +
        "floor((list_sum(list_transform(range(1, 65), " +
        "i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))) * 10000 + 0.5) / 10000.0 AS score " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)) " +
        "WHERE rn <= 3 ORDER BY vec_id, rn"),

    "sim_threshold" ->
      ("SELECT a_id, b_id, score FROM (" +
        "SELECT a.vec_id AS a_id, b.vec_id AS b_id, " +
        "floor((list_sum(list_transform(range(1, 65), " +
        "i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))) * 10000 + 0.5) / 10000.0 AS score " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) " +
        "WHERE score >= 0.3 ORDER BY a_id, b_id"),

    "dedup_embedding_cosine" ->
      ("WITH pairs AS (SELECT b.vec_id AS v, a.vec_id AS b_id, " +
        "floor((list_sum(list_transform(range(1, 65), " +
        "i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))) * 10000 + 0.5) / 10000.0 AS score " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id), " +
        "q AS (SELECT v, min(b_id) AS dup_of, arg_min(score, b_id) AS dup_score " +
        "FROM pairs WHERE score >= 0.3 GROUP BY v) " +
        "SELECT e.vec_id, q.dup_of, q.dup_score " +
        "FROM embeddings e LEFT JOIN q ON e.vec_id = q.v ORDER BY e.vec_id"),

    "dedup_cluster_cc" ->
      ("WITH RECURSIVE pairs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id " +
        "WHERE floor((list_sum(list_transform(range(1, 65), " +
        "i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))) * 10000 + 0.5) / 10000.0 >= 0.3), " +
        "edges AS (SELECT a_id AS src, b_id AS dst FROM pairs " +
        "UNION ALL SELECT b_id, a_id FROM pairs), " +
        "reach(v, l) AS (SELECT vec_id, vec_id FROM embeddings " +
        "UNION SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.v) " +
        "SELECT v AS vec_id, min(l) AS cluster_id FROM reach GROUP BY v ORDER BY v"),

    "dedup_ngram_jaccard" ->
      ("WITH docs AS (SELECT doc_id, list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3 " +
        "THEN list_transform(range(0, len(string_split(text, ' ')) - 2), " +
        "i -> array_to_string(string_split(text, ' ')[i+1:i+3], ' ')) " +
        "ELSE [] END) AS sh FROM documents WHERE doc_id < 100) " +
        "SELECT a_id, b_id, jaccard FROM (" +
        "SELECT a.doc_id AS a_id, b.doc_id AS b_id, " +
        "floor((len(list_filter(a.sh, x -> list_contains(b.sh, x)))::DOUBLE / " +
        "len(list_distinct(list_concat(a.sh, b.sh)))) * 10000 + 0.5) / 10000.0 AS jaccard " +
        "FROM docs a JOIN docs b ON a.doc_id < b.doc_id) " +
        "WHERE jaccard >= 0.02 ORDER BY a_id, b_id"),

    // directional containment over 5-gram shingles: candidates share a
    // non-boilerplate shingle (2 <= df <= 64), >= 5 shared distinct
    // shingles, either direction's containment >= 0.5 on rounded values
    "dedup_containment" ->
      ("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
        "s AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
        "range(0, len(ws) - 4), i -> array_to_string(ws[i+1:i+5], ' ')))) AS sh " +
        "FROM w WHERE len(ws) >= 5), " +
        "sz AS (SELECT doc_id, count(*) AS n_sh FROM s GROUP BY 1), " +
        "df AS (SELECT sh, count(*) AS dfc FROM s GROUP BY 1 " +
        "HAVING count(*) BETWEEN 2 AND 64), " +
        "p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared " +
        "FROM s a JOIN df ON df.sh = a.sh JOIN s b " +
        "ON a.sh = b.sh AND a.doc_id < b.doc_id " +
        "GROUP BY 1, 2 HAVING count(*) >= 5) " +
        "SELECT a_id, b_id, n_shared, " +
        "floor(n_shared::DOUBLE / na.n_sh::DOUBLE * 10000 + 0.5) / 10000.0 AS c_a, " +
        "floor(n_shared::DOUBLE / nb.n_sh::DOUBLE * 10000 + 0.5) / 10000.0 AS c_b " +
        "FROM p JOIN sz na ON na.doc_id = a_id JOIN sz nb ON nb.doc_id = b_id " +
        "WHERE greatest(floor(n_shared::DOUBLE / na.n_sh::DOUBLE * 10000 + 0.5) / 10000.0, " +
        "floor(n_shared::DOUBLE / nb.n_sh::DOUBLE * 10000 + 0.5) / 10000.0) >= 0.5 " +
        "ORDER BY a_id, b_id"),

    // incremental containment: odd docs (the arriving batch) scored only
    // against the even-doc corpus shingle index; hub shingles (> 64
    // corpus docs) excluded as in dedup_containment's band cap
    "dedup_containment_incremental" ->
      ("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
        "s AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
        "range(0, len(ws) - 4), i -> array_to_string(ws[i+1:i+5], ' ')))) AS sh " +
        "FROM w WHERE len(ws) >= 5), " +
        "snew AS (SELECT * FROM s WHERE doc_id % 2 = 1), " +
        "scorp AS (SELECT * FROM s WHERE doc_id % 2 = 0), " +
        "sz AS (SELECT doc_id, count(*) AS n_sh FROM snew GROUP BY 1), " +
        "keep AS (SELECT sh FROM scorp GROUP BY 1 HAVING count(*) <= 64), " +
        "p AS (SELECT a.doc_id, b.doc_id AS corpus_id, count(*) AS n_shared " +
        "FROM snew a JOIN keep k ON k.sh = a.sh JOIN scorp b ON b.sh = a.sh " +
        "GROUP BY 1, 2 HAVING count(*) >= 5), " +
        "q AS (SELECT p.doc_id, corpus_id, n_shared, " +
        "floor(n_shared::DOUBLE / sz.n_sh::DOUBLE * 10000 + 0.5) / 10000.0 AS c_new " +
        "FROM p JOIN sz ON sz.doc_id = p.doc_id) " +
        "SELECT doc_id, min(corpus_id) AS dup_of, " +
        "arg_min(n_shared, corpus_id) AS n_shared, " +
        "arg_min(c_new, corpus_id) AS c_new " +
        "FROM q WHERE c_new >= 0.5 GROUP BY 1 ORDER BY 1"),

    // staged dedup cascade: exact sha survivors, then containment >= 0.9
    // among survivors (contained doc drops; mutual containment keeps the
    // smaller id); one verdict row per document
    "pipeline_dedup_cascade" ->
      ("WITH dg AS (SELECT doc_id, text, sha256(text) AS digest FROM documents), " +
        "sv AS (SELECT digest, min(doc_id) AS surv FROM dg GROUP BY 1), " +
        "tg AS (SELECT d.doc_id, d.text, s.surv FROM dg d JOIN sv s USING (digest)), " +
        "ex AS (SELECT doc_id, 'exact' AS stage, surv AS dup_of FROM tg " +
        "WHERE doc_id <> surv), " +
        "su AS (SELECT doc_id, text FROM tg WHERE doc_id = surv), " +
        "w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM su), " +
        "s5 AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
        "range(0, len(ws) - 4), i -> array_to_string(ws[i+1:i+5], ' ')))) AS sh " +
        "FROM w WHERE len(ws) >= 5), " +
        "sz AS (SELECT doc_id, count(*) AS n_sh FROM s5 GROUP BY 1), " +
        "df AS (SELECT sh FROM s5 GROUP BY sh HAVING count(*) BETWEEN 2 AND 64), " +
        "p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared " +
        "FROM s5 a JOIN df USING (sh) JOIN s5 b " +
        "ON a.sh = b.sh AND a.doc_id < b.doc_id " +
        "GROUP BY 1, 2 HAVING count(*) >= 5), " +
        "sc AS (SELECT a_id, b_id, " +
        "floor(n_shared::DOUBLE / na.n_sh::DOUBLE * 10000 + 0.5) / 10000.0 AS c_a, " +
        "floor(n_shared::DOUBLE / nb.n_sh::DOUBLE * 10000 + 0.5) / 10000.0 AS c_b " +
        "FROM p JOIN sz na ON na.doc_id = a_id JOIN sz nb ON nb.doc_id = b_id), " +
        "dr AS (SELECT a_id AS doc_id, b_id AS dup_of FROM sc " +
        "WHERE c_a >= 0.9 AND c_b < 0.9 " +
        "UNION ALL SELECT b_id, a_id FROM sc WHERE c_b >= 0.9), " +
        "cd AS (SELECT doc_id, 'contained' AS stage, min(dup_of) AS dup_of " +
        "FROM dr GROUP BY 1), " +
        "al AS (SELECT * FROM ex UNION ALL SELECT * FROM cd) " +
        "SELECT d.doc_id, coalesce(al.stage, 'kept') AS stage, " +
        "coalesce(al.dup_of, -1) AS dup_of " +
        "FROM documents d LEFT JOIN al ON al.doc_id = d.doc_id " +
        "ORDER BY d.doc_id"),

    "text_edit_distance" ->
      ("SELECT doc_id, lang, levenshtein(left(text, 200), " +
        "lag(left(text, 200)) OVER (PARTITION BY lang ORDER BY doc_id))::INT AS dist " +
        "FROM documents ORDER BY doc_id"),

    "sample_stratified" ->
      ("SELECT doc_id, lang, rn FROM (" +
        "SELECT doc_id, lang, " +
        "(row_number() OVER (PARTITION BY lang ORDER BY doc_id))::INT AS rn " +
        "FROM documents) WHERE (rn - 1) % 10 = 0 ORDER BY doc_id"),

    "pipeline_corpus_curate" ->
      ("WITH filtered AS (SELECT doc_id, lang, text, " +
        "len(string_split(text, ' '))::INT AS n_tokens, " +
        "len(list_distinct(string_split(text, ' ')))::DOUBLE / len(string_split(text, ' ')) AS distinct_ratio " +
        "FROM documents), " +
        "gated AS (SELECT * FROM filtered WHERE n_tokens >= 5 AND distinct_ratio >= 0.3), " +
        "deduped AS (SELECT min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang, " +
        "arg_min(n_tokens, doc_id) AS n_tokens FROM gated GROUP BY sha256(text)) " +
        "SELECT doc_id, lang, n_tokens, rn FROM (" +
        "SELECT doc_id, lang, n_tokens, " +
        "(row_number() OVER (PARTITION BY lang ORDER BY doc_id))::INT AS rn FROM deduped) " +
        "WHERE (rn - 1) % 5 = 0 ORDER BY doc_id"),

    "pipeline_feature_snapshot" ->
      ("WITH base AS (SELECT user_id, count(*) AS n_events, " +
        "floor(sum(value) * 100 + 0.5) / 100.0 AS total_value, max(ts) AS last_ts " +
        "FROM events GROUP BY user_id), " +
        "counts AS (SELECT user_id, event_type, count(*) AS n FROM events " +
        "GROUP BY user_id, event_type), " +
        "modes AS (SELECT user_id, " +
        "arg_min(event_type, lpad((9223372036854775807 - n)::VARCHAR, 19, '0') || event_type) AS mode_event, " +
        "max(n) AS n_mode FROM counts GROUP BY user_id), " +
        "gaps AS (SELECT user_id, CASE WHEN floor(epoch(ts))::BIGINT - " +
        "(lag(floor(epoch(ts))::BIGINT) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800 " +
        "THEN 1 ELSE 0 END AS brk FROM events), " +
        "sess AS (SELECT user_id, (1 + sum(brk))::BIGINT AS n_sessions FROM gaps GROUP BY user_id) " +
        "SELECT b.user_id, b.n_events, b.total_value, b.last_ts, " +
        "m.mode_event, m.n_mode, s.n_sessions " +
        "FROM base b JOIN modes m USING (user_id) JOIN sess s USING (user_id) " +
        "ORDER BY b.user_id"),

    "corpus_shuffle" ->
      ("SELECT doc_id, md5(doc_id::VARCHAR) AS shuffle_key FROM documents " +
        "ORDER BY shuffle_key, doc_id"),

    "pack_sequences" ->
      ("SELECT doc_id, lang, n_tokens, " +
        "floor((cum - n_tokens) / 4096)::BIGINT AS bin, " +
        "((cum - n_tokens) % 4096)::BIGINT AS bin_offset FROM (" +
        "SELECT doc_id, lang, len(string_split(text, ' '))::BIGINT AS n_tokens, " +
        "sum(len(string_split(text, ' '))::BIGINT) OVER (" +
        "PARTITION BY lang ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum " +
        "FROM documents) ORDER BY doc_id"),

    "multimodal_struct" ->
      ("SELECT doc_id, text, lang, source, len(embedding)::INT AS dims, " +
        "floor((embedding[1]::DOUBLE) * 10000 + 0.5) / 10000.0 AS v0 " +
        "FROM documents JOIN embeddings ON doc_id = vec_id ORDER BY doc_id"),

    "layout_zorder" ->
      ("SELECT l_orderkey, l_linenumber, l_partkey, " +
        "list_sum(list_transform(range(0, 16), i -> " +
        "((((l_orderkey % 65536) >> i) & 1) << (2*i)) + " +
        "((((l_partkey % 65536) >> i) & 1) << (2*i+1))))::BIGINT AS zkey " +
        "FROM lineitem ORDER BY zkey, l_orderkey, l_linenumber"),

    // the identical 16-step quadrant fold as a recursive CTE: per scale
    // s, d += s²·((3rx) xor ry), then reflect/transpose the sub-square
    // coords masked to < s — mirrors HilbertCode.encode op-for-op
    "layout_hilbert" ->
      ("WITH RECURSIVE hc AS (" +
        "SELECT l_orderkey, l_linenumber, l_partkey, " +
        "(l_orderkey % 65536)::BIGINT AS x, " +
        "(l_partkey % 65536)::BIGINT AS y, " +
        "32768::BIGINT AS s, 0::BIGINT AS d FROM lineitem " +
        "UNION ALL " +
        "SELECT l_orderkey, l_linenumber, l_partkey, " +
        "CASE WHEN (y & s) = 0 THEN " +
        "(CASE WHEN (x & s) <> 0 THEN (s - 1) - (y & (s - 1)) " +
        "ELSE y & (s - 1) END) ELSE x & (s - 1) END AS x, " +
        "CASE WHEN (y & s) = 0 THEN " +
        "(CASE WHEN (x & s) <> 0 THEN (s - 1) - (x & (s - 1)) " +
        "ELSE x & (s - 1) END) ELSE y & (s - 1) END AS y, " +
        "s // 2 AS s, " +
        "d + s * s * xor(3 * (CASE WHEN (x & s) <> 0 THEN 1 ELSE 0 END), " +
        "(CASE WHEN (y & s) <> 0 THEN 1 ELSE 0 END)) AS d " +
        "FROM hc WHERE s > 0) " +
        "SELECT l_orderkey, l_linenumber, l_partkey, d::BIGINT AS hkey " +
        "FROM hc WHERE s = 0 ORDER BY hkey, l_orderkey, l_linenumber"),

    "fn_vector_native" ->
      ("SELECT vec_id, " +
        "floor((list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) * 10000 + 0.5) / 10000.0 AS norm_sq, " +
        "floor((list_sum(list_transform(range(1, 65), " +
        "i -> embedding[i]::DOUBLE * embedding[65 - i]::DOUBLE))) * 10000 + 0.5) / 10000.0 AS dot_rev " +
        "FROM embeddings ORDER BY vec_id"),

    "join_skew_salted" ->
      ("SELECT e.event_id, e.event_type, " +
        "floor((t.avg_value) * 10000 + 0.5) / 10000.0 AS type_avg " +
        "FROM events e JOIN (SELECT event_type, avg(value) AS avg_value " +
        "FROM events GROUP BY event_type) t ON e.event_type = t.event_type " +
        "ORDER BY e.event_id"),

    "multimodal_framesample" ->
      ("SELECT doc_id, i AS frame_idx, " +
        "length(substring(text, (i * 128 + 1)::INT, 64))::INT AS n_bytes, " +
        "md5(substring(text, (i * 128 + 1)::INT, 64)) AS digest " +
        "FROM (SELECT doc_id, text, " +
        "unnest(range(0, (floor((length(text) - 64)::DOUBLE / 128))::BIGINT + 1)) AS i " +
        "FROM documents WHERE length(text) >= 64) " +
        "ORDER BY doc_id, frame_idx"),

    // coalesce/CASE guard the empty-document edge: Spark emits 0 for
    // byte_sum/first_byte of an empty blob; DuckDB list_sum([]) is NULL
    // and unicode('') is -1 — without the guards one empty doc would
    // break the hash even though both engines agree on real content.
    "multimodal_binary" ->
      ("SELECT doc_id, length(text)::INT AS n_bytes, " +
        "coalesce(list_sum(list_transform(range(1, length(text) + 1), i -> unicode(text[i]))), 0)::BIGINT AS byte_sum, " +
        "(CASE WHEN length(text) = 0 THEN 0 ELSE unicode(text[1]) END)::INT AS first_byte, lang, n_chars " +
        "FROM documents ORDER BY doc_id"),

    // ------------------------------------------- §2.14 round-4 analytics
    // Ordered funnel: each stage anchored at the min ts AFTER the previous
    // stage's anchor (the sequencing a pivot-style funnel gets wrong).
    // set-completion funnel: three conditional-min firsts, exact
    // epoch-second span for completers
    "funnel_any_order" ->
      ("SELECT user_id, " +
        "min(CASE WHEN event_type = 'click' THEN ts END) AS t_click, " +
        "min(CASE WHEN event_type = 'view' THEN ts END) AS t_view, " +
        "min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase, " +
        "(min(CASE WHEN event_type = 'click' THEN ts END) IS NOT NULL AND " +
        "min(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL AND " +
        "min(CASE WHEN event_type = 'purchase' THEN ts END) IS NOT NULL)::INT " +
        "AS completed, " +
        "CASE WHEN min(CASE WHEN event_type = 'click' THEN ts END) IS NOT NULL " +
        "AND min(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL " +
        "AND min(CASE WHEN event_type = 'purchase' THEN ts END) IS NOT NULL " +
        "THEN floor(epoch(greatest(min(CASE WHEN event_type = 'click' THEN ts END), " +
        "min(CASE WHEN event_type = 'view' THEN ts END), " +
        "min(CASE WHEN event_type = 'purchase' THEN ts END))))::BIGINT - " +
        "floor(epoch(least(min(CASE WHEN event_type = 'click' THEN ts END), " +
        "min(CASE WHEN event_type = 'view' THEN ts END), " +
        "min(CASE WHEN event_type = 'purchase' THEN ts END))))::BIGINT END " +
        "AS span_s " +
        "FROM events GROUP BY user_id " +
        "HAVING t_click IS NOT NULL OR t_view IS NOT NULL " +
        "OR t_purchase IS NOT NULL " +
        "ORDER BY user_id"),

    "funnel_ordered" ->
      ("WITH c AS (SELECT user_id, min(ts) AS t1 FROM events " +
        "WHERE event_type = 'click' GROUP BY user_id), " +
        "v AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e " +
        "JOIN c ON e.user_id = c.user_id " +
        "WHERE e.event_type = 'view' AND date_trunc('microseconds', e.ts) > " +
        "date_trunc('microseconds', c.t1) GROUP BY e.user_id), " +
        "p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e " +
        "JOIN v ON e.user_id = v.user_id " +
        "WHERE e.event_type = 'purchase' AND date_trunc('microseconds', e.ts) > " +
        "date_trunc('microseconds', v.t2) GROUP BY e.user_id) " +
        "SELECT (SELECT count(*) FROM c) AS n_click, " +
        "(SELECT count(*) FROM v) AS n_click_view, " +
        "(SELECT count(*) FROM p) AS n_full_funnel"),

    // Week offsets in exact integer µs (date_trunc('week') is Monday
    // 00:00 UTC in both engines; // is DuckDB integer division).
    "cohort_retention" ->
      ("WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk " +
        "FROM events), " +
        "c AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY user_id) " +
        "SELECT c.cohort_wk::TIMESTAMP AS cohort_wk, " +
        "((epoch_us(uw.wk) - epoch_us(c.cohort_wk)) // 604800000000) AS week_offset, " +
        "count(*) AS n_users " +
        "FROM uw JOIN c ON uw.user_id = c.user_id " +
        "GROUP BY 1, 2 ORDER BY cohort_wk, week_offset"),

    "attribution_last_touch" ->
      ("SELECT event_id AS purchase_id, user_id, touch_id, touch_type " +
        "FROM (SELECT event_id, user_id, event_type, " +
        "last_value(CASE WHEN event_type <> 'purchase' THEN event_id END IGNORE NULLS) OVER w AS touch_id, " +
        "last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS) OVER w AS touch_type " +
        "FROM events WINDOW w AS (PARTITION BY user_id " +
        "ORDER BY ts ASC, event_id ASC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) " +
        "WHERE event_type = 'purchase' AND touch_id IS NOT NULL " +
        "ORDER BY purchase_id"),

    // is_current as INT: the comparator hashes scalars; boolean reprs
    // differ between engines.
    "cdc_scd2" ->
      ("SELECT user_id, event_id, event_type, ts AS valid_from, " +
        "lead(ts) OVER w AS valid_to, " +
        "(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END)::INT AS is_current " +
        "FROM events WINDOW w AS (PARTITION BY user_id " +
        "ORDER BY ts ASC, event_id ASC) " +
        "ORDER BY user_id, valid_from, event_id"),

    // DPP join == date filter (the generated calendar covers every fact
    // date, so the dim join is result-equivalent to the predicate)
    "join_dpp_pruned" ->
      ("SELECT date_trunc('day', ts) AS event_date, count(*)::BIGINT AS n, " +
        "sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT::DOUBLE / 100.0 AS sum_value " +
        "FROM events WHERE date_part('day', ts) <= 5 " +
        "GROUP BY date_trunc('day', ts) ORDER BY event_date"),

    // the observe() accumulators must equal a plain global aggregate
    "dq_observe_metrics" ->
      ("SELECT count(*)::BIGINT AS n_rows, " +
        "sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT::DOUBLE / 100.0 AS sum_value, " +
        "min(event_id) AS min_event_id, max(event_id) AS max_event_id, " +
        "sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_props " +
        "FROM events"),

    // session rollup over the shared gaps-and-islands kernel; first/last
    // via the same sortable (ts,event_id) varchar key as cdc_upsert_latest
    "win_session_features" ->
      ("WITH se AS (SELECT user_id, ts, event_id, event_type, value, " +
        "(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_idx FROM (" +
        "SELECT *, CASE WHEN floor(epoch(ts))::BIGINT - " +
        "(lag(floor(epoch(ts))::BIGINT) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800 " +
        "THEN 1 ELSE 0 END AS new_session FROM events)) " +
        "SELECT user_id, session_idx, count(*)::BIGINT AS n_events, " +
        "(floor(epoch(max(ts)))::BIGINT - floor(epoch(min(ts)))::BIGINT) AS duration_s, " +
        "sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT::DOUBLE / 100.0 AS sum_value, " +
        "count(DISTINCT event_type)::BIGINT AS n_types, " +
        "arg_min(event_type, lpad(epoch_us(ts)::VARCHAR, 20, '0') || lpad(event_id::VARCHAR, 20, '0')) AS first_type, " +
        "arg_max(event_type, lpad(epoch_us(ts)::VARCHAR, 20, '0') || lpad(event_id::VARCHAR, 20, '0')) AS last_type " +
        "FROM se GROUP BY user_id, session_idx ORDER BY user_id, session_idx"),

    // discrete percentiles by explicit rank selection — one shared
    // definition on both engines (value at rank ceil(p*n), ties by
    // (value, event_id))
    "agg_percentile_disc" ->
      ("WITH r AS (SELECT event_type, value, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY value, event_id)::BIGINT AS rnk, " +
        "count(*) OVER (PARTITION BY event_type)::BIGINT AS n FROM events) " +
        "SELECT event_type, max(n)::BIGINT AS n, " +
        "floor(max(CASE WHEN rnk = ceil(0.25 * n)::BIGINT THEN value END) * 100 + 0.5) / 100.0 AS p25, " +
        "floor(max(CASE WHEN rnk = ceil(0.5 * n)::BIGINT THEN value END) * 100 + 0.5) / 100.0 AS p50, " +
        "floor(max(CASE WHEN rnk = ceil(0.75 * n)::BIGINT THEN value END) * 100 + 0.5) / 100.0 AS p75 " +
        "FROM r GROUP BY event_type ORDER BY event_type"),

    // base case of the incremental MERGE == the monolithic recompute
    "cdc_scd2_incremental" ->
      ("SELECT user_id, event_id, event_type, ts AS valid_from, " +
        "lead(ts) OVER w AS valid_to, " +
        "(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END)::INT AS is_current " +
        "FROM events WINDOW w AS (PARTITION BY user_id " +
        "ORDER BY ts ASC, event_id ASC) " +
        "ORDER BY user_id, valid_from, event_id"),

    // PIT state at per-user day boundaries via the merge-sorted as-of:
    // probes (tag 1) union state events (tag 0, sorting first on ties =
    // `<=` as-of), one last_value IGNORE NULLS pass per user
    "join_scd2_pit" ->
      ("WITH ev AS (SELECT user_id, ts, event_id, event_type FROM events), " +
        "b AS (SELECT user_id, date_trunc('day', min(ts)) AS d0, " +
        "date_trunc('day', max(ts)) AS d1 FROM ev GROUP BY 1), " +
        "grid AS (SELECT user_id, unnest(range(d0 + INTERVAL 1 DAY, " +
        "d1 + INTERVAL 1 DAY, INTERVAL 1 DAY)) AS pt FROM b WHERE d1 > d0), " +
        "u AS (SELECT user_id, ts, 0 AS tag, event_id, event_type FROM ev " +
        "UNION ALL SELECT user_id, pt AS ts, 1 AS tag, NULL::BIGINT, " +
        "NULL::VARCHAR FROM grid), " +
        "w AS (SELECT user_id, ts, tag, " +
        "last_value(event_id IGNORE NULLS) OVER pw AS state_event, " +
        "last_value(event_type IGNORE NULLS) OVER pw AS state_type FROM u " +
        "WINDOW pw AS (PARTITION BY user_id ORDER BY ts, tag, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
        "SELECT user_id, ts AS snap_ts, state_event, state_type FROM w " +
        "WHERE tag = 1 ORDER BY user_id, snap_ts"),

    // open/close via the fixed-width (ts ‖ id) composite key — same
    // encoding as cdc_upsert_latest (arg-min/max refuse struct keys).
    "ts_resample_ohlc" ->
      ("SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type, " +
        "arg_min(value, lpad(epoch_us(ts)::VARCHAR, 20, '0') || lpad(event_id::VARCHAR, 20, '0')) AS open, " +
        "max(value) AS high, min(value) AS low, " +
        "arg_max(value, lpad(epoch_us(ts)::VARCHAR, 20, '0') || lpad(event_id::VARCHAR, 20, '0')) AS close, " +
        "count(*) AS n, " +
        "floor((sum(value)) * 100 + 0.5) / 100.0 AS volume " +
        "FROM events GROUP BY 1, 2 ORDER BY day, event_type"),

    "agg_histogram" ->
      ("SELECT floor(value / 50)::BIGINT AS bin, " +
        "(floor(value / 50)::BIGINT * 50)::DOUBLE AS lo, count(*) AS n, " +
        "floor((sum(value)) * 100 + 0.5) / 100.0 AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY bin"),

    // DISTINCT (orderkey, partkey) on BOTH sides before the self-join:
    // n_orders counts distinct orders containing the pair, never the
    // duplicate-lineitem row pairs (mirrors the Spark side's
    // dropDuplicates; ADVICE round-5).
    "assoc_pairs" ->
      ("SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_orders " +
        "FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a " +
        "JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b " +
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2 " +
        "ORDER BY n_orders DESC, p1, p2"),

    // Adamic–Adar: per-wedge 1/ln(deg) snapped to a 1e-6 grid before the
    // sum (exact integer accumulation); NOT EXISTS = the left anti join
    "graph_adamic_adar" ->
      ("WITH e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2 " +
        "FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a " +
        "JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b " +
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "nb AS (SELECT p1 AS u, p2 AS v FROM e " +
        "UNION ALL SELECT p2 AS u, p1 AS v FROM e), " +
        "deg AS (SELECT u AS w, count(*) AS deg FROM nb GROUP BY 1), " +
        "wg AS (SELECT n1.v AS a, n1.u AS w, n2.v AS b " +
        "FROM nb n1 JOIN nb n2 ON n1.u = n2.u AND n1.v < n2.v), " +
        "cand AS (SELECT wg.a, wg.b, wg.w FROM wg " +
        "WHERE NOT EXISTS (SELECT 1 FROM e " +
        "WHERE e.p1 = wg.a AND e.p2 = wg.b)), " +
        "scored AS (SELECT c.a, c.b, count(*)::BIGINT AS n_common, " +
        "sum((floor(1000000.0 / ln(d.deg::DOUBLE) + 0.5))::BIGINT)" +
        "::BIGINT::DOUBLE / 1000000.0 AS aa_score " +
        "FROM cand c JOIN deg d ON d.w = c.w GROUP BY 1, 2) " +
        "SELECT a, b, n_common, aa_score FROM scored " +
        "ORDER BY aa_score DESC, a, b LIMIT 50"),

    // Knuth multiplicative hash in pure BIGINT arithmetic — engine-
    // portable by construction (no murmur/xxhash dependency).
    "split_train_test" ->
      ("SELECT CASE WHEN (doc_id * 2654435761) % 4294967296 % 10 < 8 THEN 'train' " +
        "WHEN (doc_id * 2654435761) % 4294967296 % 10 = 8 THEN 'val' " +
        "ELSE 'test' END AS split, " +
        "count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars, " +
        "min(doc_id) AS min_id, max(doc_id) AS max_id " +
        "FROM documents GROUP BY 1 ORDER BY split"),

    // sqrt scaled to exact BIGINT before the global sum: FP addition is
    // order-dependent, integer addition is not (see Analytics.scala).
    "pipeline_mixture_weights" ->
      ("WITH per AS (SELECT source, count(*) AS n_docs, " +
        "sum(len(string_split(text, ' ')))::BIGINT AS n_tokens " +
        "FROM documents GROUP BY source), " +
        "scaled AS (SELECT *, floor(sqrt(n_tokens::DOUBLE) * 1000000)::BIGINT AS w_scaled FROM per), " +
        "t AS (SELECT sum(w_scaled)::BIGINT AS w_tot FROM scaled) " +
        "SELECT source, n_docs, n_tokens, " +
        "floor((w_scaled::DOUBLE / w_tot::DOUBLE) * 1000000 + 0.5) / 1000000.0 AS weight " +
        "FROM scaled, t ORDER BY source"),

    // expected post-evolution state from the original parquet: the
    // o_totalprice column only "exists" for the v2 (odd-key) generation
    "source_schema_evolution" ->
      ("SELECT year(o_orderdate)::INT AS y, count(*) AS n, " +
        "count(CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice END) AS n_priced, " +
        "floor((sum(CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice ELSE 0 END)) * 100 + 0.5) / 100.0 AS sum_price " +
        "FROM orders GROUP BY 1 ORDER BY y"),

    // all-integer sampling: scaled-sqrt weights, // quotas, Knuth-hash
    // rank order — the sample set is engine-portable by construction
    "corpus_mixture_sample" ->
      ("WITH per AS (SELECT source, " +
        "sum(len(string_split(text, ' ')))::BIGINT AS n_tokens " +
        "FROM documents GROUP BY source), " +
        "scaled AS (SELECT source, " +
        "floor(sqrt(n_tokens::DOUBLE) * 1000000)::BIGINT AS w_scaled FROM per), " +
        "t AS (SELECT sum(w_scaled)::BIGINT AS w_tot FROM scaled), " +
        "q AS (SELECT source, (w_scaled * 1000) // w_tot AS quota FROM scaled, t), " +
        "ranked AS (SELECT source, doc_id, " +
        "(row_number() OVER (PARTITION BY source " +
        "ORDER BY (doc_id * 2654435761) % 4294967296 ASC, doc_id ASC))::INT AS rank " +
        "FROM documents) " +
        "SELECT r.source, r.doc_id, r.rank FROM ranked r " +
        "JOIN q ON r.source = q.source WHERE r.rank <= q.quota " +
        "ORDER BY r.source, r.rank"),

    // nearest-in-time as-of: ties at equal |dt| break toward the smaller
    // click_id via the fixed-width composite key on both sides
    "join_asof_nearest" ->
      ("SELECT p.event_id AS purchase_id, p.user_id AS user_id, " +
        "arg_min(c.event_id, lpad((abs(epoch_us(c.ts) - epoch_us(p.ts)))::VARCHAR, 20, '0') || lpad(c.event_id::VARCHAR, 20, '0')) AS click_id, " +
        "min(abs(epoch_us(c.ts) - epoch_us(p.ts)))::BIGINT AS dt_us " +
        "FROM events p JOIN events c ON p.user_id = c.user_id " +
        "AND p.event_type = 'purchase' AND c.event_type = 'click' " +
        "AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 120000000 " +
        "GROUP BY p.event_id, p.user_id ORDER BY purchase_id"),

    // incremental-ingest dedup: the new batch (odd ids) anti-joined
    // against the existing corpus's digest set (even ids)
    "dedup_incremental" ->
      ("WITH docs AS (SELECT doc_id, lang, sha256(text) AS digest FROM documents) " +
        "SELECT b.doc_id, b.lang, b.digest FROM docs b " +
        "WHERE b.doc_id % 2 = 1 AND NOT EXISTS " +
        "(SELECT 1 FROM docs c WHERE c.doc_id % 2 = 0 AND c.digest = b.digest) " +
        "ORDER BY b.doc_id"),

    // url-canonicalization dedup: raw URLs derived deterministically from
    // (source, doc_id) with doc_id-mod noise; canonical = lower + strip
    // fragment/utm-query/trailing slash; survivor = min doc_id per key
    "dedup_url_canonical" ->
      ("WITH u AS (SELECT doc_id, 'https://' || " +
        "CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END || " +
        "'.Example.COM/p/' || (doc_id % 50)::VARCHAR || " +
        "CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END || " +
        "CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&utm_medium=x' ELSE '' END || " +
        "CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END AS url FROM documents), " +
        "c AS (SELECT doc_id, lower(regexp_replace(regexp_replace(" +
        "regexp_replace(url, '#.*$', ''), '\\?utm[^#]*$', ''), '/+$', '')) " +
        "AS canonical FROM u) " +
        "SELECT min(doc_id) AS doc_id, canonical, count(*) AS n_copies " +
        "FROM c GROUP BY canonical ORDER BY 1"),

    // C4-style paragraph (8-word positional segment) global dedup:
    // survivor = first (doc_id, pos) occurrence per segment; docs
    // reassembled from kept segments in position order
    "dedup_paragraph" ->
      ("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents " +
        "WHERE len(string_split(text, ' ')) > 0), " +
        "e AS (SELECT doc_id, ws, " +
        "unnest(range(0, cast(ceil(len(ws) / 8.0) AS INT))) AS i FROM w), " +
        "s AS (SELECT doc_id, i AS pos, " +
        "array_to_string(ws[i * 8 + 1 : i * 8 + 8], ' ') AS seg FROM e), " +
        "k AS (SELECT doc_id, pos, seg, " +
        "row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) = 1 AS keep " +
        "FROM s) " +
        "SELECT doc_id, count(*) AS n_seg, " +
        "sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept, " +
        "coalesce(string_agg(CASE WHEN keep THEN seg END, ' ' ORDER BY pos), '') " +
        "AS cleaned_text FROM k GROUP BY 1 ORDER BY 1"),

    // Gopher-style corpus-relative quality filter: word-count inside the
    // exact 5th..95th corpus percentiles + absolute mean-word-length /
    // distinct-ratio / alpha-ratio rules; keep = all four
    "corpus_quality_filter" ->
      ("WITH b AS (SELECT doc_id, len(string_split(text, ' '))::INT AS n_words, " +
        "len(replace(text, ' ', '')) AS n_letters, " +
        "len(list_distinct(string_split(text, ' '))) AS n_distinct, " +
        "len(list_filter(string_split(text, ' '), " +
        "w -> regexp_matches(w, '^[a-z]+$'))) AS n_alpha FROM documents), " +
        "q AS (SELECT quantile_cont(n_words, 0.05) AS lo, " +
        "quantile_cont(n_words, 0.95) AS hi FROM b), " +
        "r AS (SELECT doc_id, n_words, " +
        "floor(n_letters::DOUBLE / n_words * 10000 + 0.5) / 10000.0 AS mean_wlen, " +
        "floor(n_distinct::DOUBLE / n_words * 10000 + 0.5) / 10000.0 AS distinct_ratio, " +
        "floor(n_alpha::DOUBLE / n_words * 10000 + 0.5) / 10000.0 AS alpha_ratio, " +
        "(n_words >= q.lo AND n_words <= q.hi) AS ok_words FROM b, q) " +
        "SELECT doc_id, n_words, mean_wlen, distinct_ratio, alpha_ratio, " +
        "ok_words, " +
        "(mean_wlen >= 3.0 AND mean_wlen <= 10.0) AS ok_wlen, " +
        "(distinct_ratio >= 0.2) AS ok_distinct, " +
        "(alpha_ratio >= 0.8) AS ok_alpha, " +
        "(ok_words AND mean_wlen >= 3.0 AND mean_wlen <= 10.0 " +
        "AND distinct_ratio >= 0.2 AND alpha_ratio >= 0.8) AS keep " +
        "FROM r ORDER BY 1"),

    // Gopher rep-2gram: share of a doc's bigrams held by its most
    // frequent bigram
    "text_repetition_ratio" ->
      ("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents " +
        "WHERE len(string_split(text, ' ')) >= 2), " +
        "b AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)), " +
        "i -> ws[i] || ' ' || ws[i + 1])) AS bg FROM w), " +
        "g AS (SELECT doc_id, bg, count(*) AS n FROM b GROUP BY 1, 2) " +
        "SELECT doc_id, sum(n)::BIGINT AS n_bigrams, max(n) AS top_n, " +
        "floor(max(n)::DOUBLE / sum(n)::DOUBLE * 10000 + 0.5) / 10000.0 " +
        "AS top_share FROM g GROUP BY 1 ORDER BY 1"),

    // DSIR importance weights: exact BIGINT bigram counts on both
    // engines; each bigram's smoothed log-ratio snaps to the 1e-6 grid
    // BEFORE the per-doc sum, so the one ln per engine is absorbed and
    // accumulation is merge-order-exact
    "corpus_dsir_weights" ->
      ("WITH bg AS (SELECT doc_id, lang, " +
        "unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS g " +
        "FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents " +
        "WHERE len(string_split(text, ' ')) >= 2)), " +
        "counts AS (SELECT g, count(*) FILTER (WHERE lang = 'en')::BIGINT AS ct, " +
        "count(*)::BIGINT AS cs FROM bg GROUP BY g), " +
        "tot AS (SELECT sum(ct)::BIGINT AS nt, sum(cs)::BIGINT AS ns, " +
        "count(*)::BIGINT AS v FROM counts), " +
        "contrib AS (SELECT g, (floor((ln((ct + 1)::DOUBLE / (nt + v)::DOUBLE) " +
        "- ln((cs + 1)::DOUBLE / (ns + v)::DOUBLE)) * 1e6 + 0.5))::BIGINT AS wg " +
        "FROM counts, tot) " +
        "SELECT doc_id, count(*)::BIGINT AS n_bigrams, " +
        "sum(wg)::BIGINT::DOUBLE / 1e6 AS dsir_logratio " +
        "FROM bg JOIN contrib USING (g) " +
        "GROUP BY doc_id ORDER BY doc_id"),

    // named WINDOW clause: identical text shape; rank INT-cast, lag
    // nullable BIGINT, running cents exact
    "sql_window_named" ->
      ("SELECT user_id, event_id, (rank() OVER w)::INT AS rnk, " +
        "lag(event_id) OVER w AS prev_event, " +
        "(sum((floor(value * 100 + 0.5))::BIGINT) OVER w)::BIGINT AS run_cents " +
        "FROM events WHERE event_type = 'purchase' " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) " +
        "ORDER BY user_id, rnk"),

    // dHash near-dup: identical codepoint sampling; the oracle runs the
    // BRUTE pair sweep — equal to the banded form by pigeonhole (7 bands
    // of 9 bits cover Hamming ≤ 6)
    "multimodal_phash_dedup" ->
      ("WITH ph AS (SELECT doc_id, " +
        "(SELECT sum(CASE WHEN ascii(substr(t.text, 1 + ((i * length(t.text)) // 64), 1)) > " +
        "ascii(substr(t.text, 1 + (((i + 1) * length(t.text)) // 64), 1)) " +
        "THEN (1::BIGINT << i) ELSE 0::BIGINT END) " +
        "FROM range(0, 63) r(i))::BIGINT AS phash " +
        "FROM documents t WHERE length(t.text) >= 1), " +
        "near AS (SELECT a.doc_id AS a_id, count(*)::BIGINT AS n_near " +
        "FROM ph a JOIN ph b ON a.doc_id <> b.doc_id " +
        "AND bit_count(xor(a.phash, b.phash)) <= 6 GROUP BY a.doc_id) " +
        "SELECT p.doc_id, p.phash, coalesce(n.n_near, 0)::BIGINT AS n_near " +
        "FROM ph p LEFT JOIN near n ON p.doc_id = n.a_id ORDER BY p.doc_id"),

    // arrival-shaped phash: brute-force over the same even/odd split —
    // equal to the banded probe by the 7x9 pigeonhole
    "dedup_phash_incremental" ->
      ("WITH ph AS (SELECT doc_id, " +
        "(SELECT sum(CASE WHEN ascii(substr(t.text, 1 + ((i * length(t.text)) // 64), 1)) > " +
        "ascii(substr(t.text, 1 + (((i + 1) * length(t.text)) // 64), 1)) " +
        "THEN (1::BIGINT << i) ELSE 0::BIGINT END) " +
        "FROM range(0, 63) r(i))::BIGINT AS phash " +
        "FROM documents t WHERE length(t.text) >= 1), " +
        "hits AS (SELECT a.doc_id AS a_id, min(c.doc_id)::BIGINT AS dup_of, " +
        "min(bit_count(xor(a.phash, c.phash)))::INT AS best_ham " +
        "FROM ph a JOIN ph c ON a.doc_id % 2 = 1 AND c.doc_id % 2 = 0 " +
        "AND bit_count(xor(a.phash, c.phash)) <= 6 GROUP BY a.doc_id) " +
        "SELECT p.doc_id, p.phash, h.dup_of, h.best_ham " +
        "FROM ph p LEFT JOIN hits h ON p.doc_id = h.a_id " +
        "WHERE p.doc_id % 2 = 1 ORDER BY p.doc_id"),

    // Zipf fit: ranks from an ordered LIMIT subquery; grid-snapped lns
    // aggregated in HUGEINT (≡ Spark DECIMAL(38,0)); one double divide
    "text_zipf_slope" ->
      ("WITH freq AS (SELECT w, count(*)::BIGINT AS n FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS w FROM documents) " +
        "WHERE w <> '' GROUP BY w ORDER BY n DESC, w LIMIT 1000), " +
        "ranked AS (SELECT row_number() OVER (ORDER BY n DESC, w) AS rank, n FROM freq), " +
        "m AS (SELECT (floor(ln(rank::DOUBLE) * 1e6 + 0.5))::BIGINT::HUGEINT AS x, " +
        "(floor(ln(n::DOUBLE) * 1e6 + 0.5))::BIGINT::HUGEINT AS y FROM ranked) " +
        "SELECT count(*)::BIGINT AS n_terms, " +
        "floor((count(*)::HUGEINT * sum(x * y) - sum(x) * sum(y))::DOUBLE / " +
        "(count(*)::HUGEINT * sum(x * x) - sum(x) * sum(x))::DOUBLE * 1e6 + 0.5) / 1e6 " +
        "AS zipf_slope FROM m"),

    // hash-rank bottom-k per group ≡ distributed reservoir; the
    // multiplicative hash is exact BIGINT in both engines
    "sample_reservoir_pergroup" ->
      ("SELECT event_type, rn::INT AS rn, event_id, user_id FROM (" +
        "SELECT event_type, event_id, user_id, " +
        "row_number() OVER (PARTITION BY event_type " +
        "ORDER BY (event_id * 2654435761 + 40503) % 4294967296, event_id) AS rn " +
        "FROM events) t WHERE rn <= 5 ORDER BY event_type, rn"),

    // DSIR Gumbel-top-k selection: the weights pipeline verbatim, then a
    // hash-derived Gumbel perturbation snapped to the 1e-6 grid before
    // the top-50 (ties to doc_id)
    "corpus_dsir_resample" ->
      ("WITH bg AS (SELECT doc_id, lang, " +
        "unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS g " +
        "FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents " +
        "WHERE len(string_split(text, ' ')) >= 2)), " +
        "counts AS (SELECT g, count(*) FILTER (WHERE lang = 'en')::BIGINT AS ct, " +
        "count(*)::BIGINT AS cs FROM bg GROUP BY g), " +
        "tot AS (SELECT sum(ct)::BIGINT AS nt, sum(cs)::BIGINT AS ns, " +
        "count(*)::BIGINT AS v FROM counts), " +
        "contrib AS (SELECT g, (floor((ln((ct + 1)::DOUBLE / (nt + v)::DOUBLE) " +
        "- ln((cs + 1)::DOUBLE / (ns + v)::DOUBLE)) * 1e6 + 0.5))::BIGINT AS wg " +
        "FROM counts, tot), " +
        "wts AS (SELECT doc_id, sum(wg)::BIGINT::DOUBLE / 1e6 AS dsir_logratio " +
        "FROM bg JOIN contrib USING (g) GROUP BY doc_id) " +
        "SELECT doc_id, dsir_logratio, skey::BIGINT::DOUBLE / 1e6 AS sample_key " +
        "FROM (SELECT doc_id, dsir_logratio, " +
        "(floor((dsir_logratio / 4.0 - ln(-ln(" +
        "(((doc_id * 2654435761 + 40503) % 4294967296)::DOUBLE + 0.5) / 4294967296.0" +
        "))) * 1e6 + 0.5))::BIGINT AS skey FROM wts) " +
        "ORDER BY skey DESC, doc_id LIMIT 50"),

    "text_ngram_freq" ->
      ("WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents " +
        "WHERE len(string_split(text, ' ')) >= 2), " +
        "b AS (SELECT unnest(list_transform(range(1, len(ws)), " +
        "i -> ws[i] || ' ' || ws[i + 1])) AS bigram FROM w) " +
        "SELECT bigram, count(*) AS n FROM b GROUP BY bigram " +
        "ORDER BY n DESC, bigram LIMIT 50"),

    // exact-substring duplication profile: position-aware word 5-gram
    // windows (duplicates kept), a window is duplicated when its gram
    // occurs >= 2 times corpus-wide; plain-string grams keep the twin
    // byte-identical to the engine's transform/slice spelling
    "dedup_substring_kgram" ->
      ("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws " +
        "FROM documents WHERE len(string_split(text, ' ')) >= 5), " +
        "g AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3), " +
        "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || " +
        "ws[i+3] || ' ' || ws[i+4])) AS gram FROM w), " +
        "c AS (SELECT gram, count(*) AS n FROM g GROUP BY gram) " +
        "SELECT doc_id, count(*) AS n_windows, " +
        "count(*) FILTER (WHERE n >= 2) AS dup_windows, " +
        "floor((count(*) FILTER (WHERE n >= 2))::DOUBLE / " +
        "count(*)::DOUBLE * 1000000 + 0.5) / 1000000.0 AS dup_ratio " +
        "FROM g JOIN c USING (gram) GROUP BY doc_id ORDER BY doc_id"),

    // scores bucket against exact medians (quantile_cont ≡ Spark
    // percentile — the pairing agg_percentile already pins); never a
    // global ntile window
    // distinct-user segment overlap per event-type pair; Szymkiewicz–
    // Simpson coefficient on exact counts
    "analytics_audience_overlap" ->
      ("WITH ut AS (SELECT DISTINCT user_id, event_type FROM events), " +
        "sz AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1), " +
        "p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, " +
        "count(*) AS n_both FROM ut a JOIN ut b " +
        "ON a.user_id = b.user_id AND a.event_type < b.event_type " +
        "GROUP BY 1, 2) " +
        "SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_both, " +
        "floor(n_both::DOUBLE / least(sa.n, sb.n)::DOUBLE * 1000000 + 0.5) " +
        "/ 1000000.0 AS overlap " +
        "FROM p JOIN sz sa ON sa.event_type = type_a " +
        "JOIN sz sb ON sb.event_type = type_b ORDER BY type_a, type_b"),

    "analytics_rfm" ->
      ("WITH ref AS (SELECT max(o_orderdate) AS refd FROM orders), " +
        "cust AS (SELECT o_custkey, " +
        "min(date_diff('day', o_orderdate, refd)) AS recency_days, " +
        "count(*) AS frequency, " +
        "floor((sum(o_totalprice)) * 100 + 0.5) / 100.0 AS monetary " +
        "FROM orders, ref GROUP BY o_custkey), " +
        "med AS (SELECT quantile_cont(recency_days, 0.5) AS r_med, " +
        "quantile_cont(frequency, 0.5) AS f_med, " +
        "quantile_cont(monetary, 0.5) AS m_med FROM cust) " +
        "SELECT (CASE WHEN recency_days <= r_med THEN 'R' ELSE 'r' END || " +
        "CASE WHEN frequency > f_med THEN 'F' ELSE 'f' END || " +
        "CASE WHEN monetary > m_med THEN 'M' ELSE 'm' END) AS segment, " +
        "count(*) AS n_cust, " +
        "floor((sum(monetary)) * 100 + 0.5) / 100.0 AS sum_monetary " +
        "FROM cust, med GROUP BY 1 ORDER BY segment"),

    // the mapPartitions inference path (binary encode → per-partition
    // model init → batched scoring → rollup) gated end-to-end; integer
    // byte sums until one final division keep it order-independent.
    // graph_pagerank has NO entry on purpose: iterative FP has no SQL
    // twin — LlmOpsSpec pins it against a reference implementation.
    "multimodal_batch_infer" ->
      ("WITH per AS (SELECT doc_id, source, length(text)::BIGINT AS n_bytes, " +
        "coalesce(list_sum(list_transform(range(1, length(text) + 1), i -> unicode(text[i]))), 0)::BIGINT AS byte_sum, " +
        "coalesce(list_max(list_transform(range(1, length(text) + 1), i -> unicode(text[i]))), 0)::BIGINT AS max_byte " +
        "FROM documents) " +
        "SELECT source, count(*) AS n_docs, sum(n_bytes)::BIGINT AS total_bytes, " +
        "(sum(byte_sum)::BIGINT::DOUBLE / sum(n_bytes)::BIGINT::DOUBLE) AS mean_byte, " +
        "max(max_byte)::BIGINT AS max_byte " +
        "FROM per GROUP BY source ORDER BY source"),

    // the compaction is a pure rewrite: gating its output against the
    // ORIGINAL parquet certifies losslessness (file counts in ScalaTest)
    "layout_compaction" ->
      ("SELECT event_type, count(*) AS n, " +
        "floor((sum(value)) * 100 + 0.5) / 100.0 AS sum_value, " +
        "min(event_id) AS min_id, max(event_id) AS max_id " +
        "FROM events GROUP BY event_type ORDER BY event_type"),

    // expected post-restatement state: purchases doubled, all other
    // partitions untouched
    "sink_partition_overwrite_dynamic" ->
      ("SELECT event_type, count(*) AS n, " +
        "floor((sum(CASE WHEN event_type = 'purchase' THEN value * 2 ELSE value END)) * 100 + 0.5) / 100.0 AS sum_value, " +
        "max(event_id) AS max_id " +
        "FROM events GROUP BY event_type ORDER BY event_type"),

    // integer-cents accumulation: each floor(v*100+0.5) is an exact
    // integer in a double, so the sum is order-independent — the gate
    // proves incremental folding == full recompute
    "mv_incremental_refresh" ->
      ("SELECT event_type, count(*) AS n, " +
        "(sum(floor(value * 100 + 0.5))::BIGINT / 100.0) AS sum_value " +
        "FROM events GROUP BY event_type ORDER BY event_type"),

    // the oracle certifies the bucketed write→read→join path end-to-end
    // against the plain parquet join
    "join_bucketed_colocated" ->
      ("SELECT c_mktsegment, count(*) AS n_orders, " +
        "floor((sum(o_totalprice)) * 100 + 0.5) / 100.0 AS sum_price " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),

    // per-user Shannon entropy over event types; same term formula as the
    // Spark side (−Σ p·log₂p over exact integer counts) — only summation
    // order can differ, and 4-dp floor-rounding absorbs the ulp
    "agg_entropy" ->
      ("SELECT user_id, floor((-sum((n / tot) * log2(n / tot))) * 10000 + 0.5) / 10000.0 AS h, " +
        "sum(n)::BIGINT AS n_events FROM (" +
        "SELECT user_id, event_type, count(*)::DOUBLE AS n, " +
        "sum(count(*)::DOUBLE) OVER (PARTITION BY user_id) AS tot " +
        "FROM events GROUP BY user_id, event_type) " +
        "GROUP BY user_id ORDER BY user_id"),

    // overlap predicate spelled directly (s_start < h+1h AND h <= s_end);
    // the Spark side proves the banded equi-join computes the same set
    "join_interval_overlap" ->
      ("WITH sess AS (" +
        "SELECT user_id, session_idx, min(ts) AS s_start, max(ts) AS s_end FROM (" +
        "SELECT user_id, ts, event_id, " +
        "(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_idx FROM (" +
        "SELECT *, CASE WHEN floor(epoch(ts))::BIGINT - " +
        "(lag(floor(epoch(ts))::BIGINT) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800 " +
        "THEN 1 ELSE 0 END AS new_session FROM events)) GROUP BY 1, 2), " +
        "hh AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n_errors " +
        "FROM events WHERE event_type = 'error' GROUP BY 1), " +
        "inc AS (SELECT h, n_errors FROM hh " +
        "WHERE n_errors::DOUBLE >= 1.5 * (SELECT avg(n_errors) FROM hh)) " +
        "SELECT s.user_id, s.session_idx, i.h AS incident_hour, i.n_errors " +
        "FROM sess s JOIN inc i ON s.s_start < i.h + INTERVAL 1 HOUR AND i.h <= s.s_end " +
        "ORDER BY s.user_id, s.session_idx, incident_hour"),

    // the oracle joins raw shingle STRINGS where Spark joins 64-bit hashes of
    // them — identical results absent a 64-bit train↔eval hash collision
    "decontaminate_ngram" ->
      ("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), " +
        "idx AS (SELECT doc_id, t, unnest(range(1, greatest(1, len(t) - 10))) AS i FROM toks), " +
        "sh AS (SELECT doc_id, array_to_string(t[i:i+11], ' ') AS g FROM idx), " +
        "ev AS (SELECT DISTINCT g FROM sh WHERE doc_id < 100), " +
        "cont AS (SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (g) WHERE s.doc_id >= 100) " +
        "SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d " +
        "WHERE d.doc_id >= 100 AND d.doc_id NOT IN (SELECT doc_id FROM cont) " +
        "ORDER BY d.doc_id"),

    // bigram-LM mean log-prob: exact integer counts feed ln(); only the
    // per-doc summation order differs between engines, absorbed by 4-dp
    "text_lm_score" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
        "tb AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM t WHERE len(ws) >= 2), " +
        "db AS (SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i+1] AS bg FROM tb), " +
        "ub AS (SELECT w1, count(*) AS cu FROM db GROUP BY 1), " +
        "bb AS (SELECT bg, count(*) AS cb FROM db GROUP BY 1) " +
        "SELECT d.doc_id, count(*)::BIGINT AS n_bigrams, " +
        "floor((sum(ln(cb::DOUBLE / cu::DOUBLE)) / count(*)) * 10000 + 0.5) / 10000.0 AS score " +
        "FROM db d JOIN bb USING (bg) JOIN ub USING (w1) " +
        "GROUP BY d.doc_id ORDER BY d.doc_id"),

    // BM25 (k1=1.2, b=0.75): formula spelled identically to the Spark
    // column expression — exact-integer tf/df/dl, one double avgdl — so
    // only ln()'s last ulp can differ, absorbed by the 4-dp floor
    "text_bm25_topterms" ->
      ("SELECT doc_id, rn, term, score FROM (" +
        "SELECT doc_id, term, score, " +
        "(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term))::INT AS rn FROM (" +
        "SELECT doc_id, term, " +
        "floor((ln((n_corpus - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) / " +
        "(tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) * 10000 + 0.5) / 10000.0 AS score " +
        "FROM (" +
        "SELECT doc_id, term, tf, " +
        "count(*) OVER (PARTITION BY term) AS df, " +
        "sum(tf) OVER (PARTITION BY doc_id) AS dl " +
        "FROM (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM (" +
        "SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) " +
        "GROUP BY doc_id, term)), " +
        "(SELECT count(*)::DOUBLE AS n_corpus, " +
        "avg(len(string_split(text, ' ')))::DOUBLE AS avgdl FROM documents))) " +
        "WHERE rn <= 3 ORDER BY doc_id, rn"),

    // int arithmetic end-to-end after the one round(x·scale): both engines
    // round ties away from zero, and scale = 127/float-amax is a single
    // correctly-rounded double op — bit-identical inputs to round()
    "embedding_quantize" ->
      ("WITH b AS (SELECT vec_id, embedding, " +
        "list_aggregate(list_transform(embedding, x -> abs(x)), 'max') AS amax FROM embeddings) " +
        "SELECT vec_id, amax, " +
        "array_to_string(list_transform(embedding, x -> round(x::DOUBLE * (127.0 / amax::DOUBLE))::INT::VARCHAR), ',') AS q_csv, " +
        "list_aggregate(list_transform(embedding, x -> round(x::DOUBLE * (127.0 / amax::DOUBLE))::INT), 'max')::INT AS q_max, " +
        "list_aggregate(list_transform(embedding, x -> round(x::DOUBLE * (127.0 / amax::DOUBLE))::INT), 'min')::INT AS q_min " +
        "FROM b WHERE amax > 0 ORDER BY vec_id"),

    // z threshold compares the SAME Det-rounded value the output carries —
    // the gate is engine-portable because both engines filter on floor().
    "anomaly_zscore" ->
      ("WITH s AS (SELECT event_id, user_id, value, " +
        "avg(value) OVER (PARTITION BY user_id) AS mu, " +
        "stddev_samp(value) OVER (PARTITION BY user_id) AS sd, " +
        "count(*) OVER (PARTITION BY user_id) AS n FROM events) " +
        "SELECT event_id, user_id, " +
        "floor((value - mu) / sd * 10000 + 0.5) / 10000.0 AS z " +
        "FROM s WHERE n >= 12 AND sd > 0 " +
        "AND abs(floor((value - mu) / sd * 10000 + 0.5) / 10000.0) >= 2.5 " +
        "ORDER BY user_id, event_id"),

    // every weight is an exact power of two and + is left-associative in
    // both engines — the whole chain is bit-identical IEEE arithmetic
    // (Analytics.tsEwma spells the same order)
    "ts_ewma" ->
      ("WITH s AS (SELECT event_id, user_id, " +
        "row_number() OVER w AS rn, " +
        "(lag(value, 0) OVER w * 1.0 + lag(value, 1) OVER w * 0.5 + " +
        "lag(value, 2) OVER w * 0.25 + lag(value, 3) OVER w * 0.125 + " +
        "lag(value, 4) OVER w * 0.0625 + lag(value, 5) OVER w * 0.03125 + " +
        "lag(value, 6) OVER w * 0.015625 + " +
        "lag(value, 7) OVER w * 0.0078125) / 1.9921875 AS e " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
        "SELECT event_id, user_id, " +
        "floor(e * 1000000 + 0.5) / 1000000.0 AS ewma " +
        "FROM s WHERE rn >= 8 ORDER BY user_id, event_id"),

    // p1 < p2 orientation counts each triangle exactly once as a closed
    // wedge; edge set == assoc_pairs' deduped co-order graph
    "graph_triangle_count" ->
      ("WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2 FROM d a " +
        "JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2) " +
        "SELECT (SELECT count(DISTINCT p) FROM " +
        "(SELECT p1 AS p FROM e UNION ALL SELECT p2 FROM e)) AS n_nodes, " +
        "(SELECT count(*) FROM e) AS n_edges, " +
        "(SELECT count(*) FROM e e1 JOIN e e2 ON e1.p2 = e2.p1 " +
        "JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2) AS n_triangles"),

    // per-node clustering coefficient: ordered a<b<c enumeration credits
    // each triangle to all three corners (same per-node counts as the
    // engine's degree-ordered orientation); divide spelled in the
    // engine's operand order, count pinned ::BIGINT
    "graph_clustering_coeff" ->
      ("WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2 FROM d a " +
        "JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "deg AS (SELECT p, count(*)::BIGINT AS deg FROM " +
        "(SELECT p1 AS p FROM e UNION ALL SELECT p2 FROM e) GROUP BY p), " +
        "tri AS (SELECT p, count(*)::BIGINT AS tri_cnt FROM " +
        "(SELECT unnest([e1.p1, e1.p2, e2.p2]) AS p " +
        "FROM e e1 JOIN e e2 ON e1.p2 = e2.p1 " +
        "JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2) GROUP BY p) " +
        "SELECT d.p, d.deg, coalesce(t.tri_cnt, 0)::BIGINT AS tri_cnt, " +
        "floor(2.0 * coalesce(t.tri_cnt, 0) / (d.deg * (d.deg - 1.0)) " +
        "* 10000 + 0.5) / 10000.0 AS coeff " +
        "FROM deg d LEFT JOIN tri t ON d.p = t.p WHERE d.deg >= 2 " +
        "ORDER BY d.p"),

    // Holt level+trend: the recursive CTE replays the engine's sequential
    // fold step-for-step — identical double arithmetic in identical order
    // irregular-gap EWMA: the identical recurrence in a recursive CTE;
    // the decay factor floor-snaps to 1e-6 BEFORE the update so a 1-ulp
    // exp() disagreement between engines cannot enter the state
    "ts_ewma_timedecay" ->
      ("WITH RECURSIVE x AS (SELECT user_id, value, epoch_us(ts) AS tu, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i " +
        "FROM events), " +
        "nn AS (SELECT user_id, max(i)::BIGINT AS n_obs FROM x GROUP BY user_id), " +
        "r AS (SELECT user_id, i, tu, value AS s FROM x WHERE i = 1 " +
        "UNION ALL SELECT x.user_id, x.i, x.tu, " +
        "(floor(exp(-((x.tu - r.tu)::DOUBLE / 3.6e9)) * 1000000) / 1000000.0) * r.s " +
        "+ (1.0 - floor(exp(-((x.tu - r.tu)::DOUBLE / 3.6e9)) * 1000000) / 1000000.0) * x.value " +
        "FROM r JOIN x ON x.user_id = r.user_id AND x.i = r.i + 1) " +
        "SELECT r.user_id, nn.n_obs, " +
        "floor(r.s * 10000 + 0.5) / 10000.0 AS ewma_last " +
        "FROM r JOIN nn ON r.user_id = nn.user_id AND r.i = nn.n_obs " +
        "ORDER BY r.user_id"),

    "ts_holt_linear" ->
      ("WITH RECURSIVE x AS (SELECT user_id, value, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i " +
        "FROM events), " +
        "nn AS (SELECT user_id, max(i)::BIGINT AS n_obs FROM x GROUP BY user_id), " +
        "r AS (SELECT user_id, i, value AS l, 0.0::DOUBLE AS b FROM x WHERE i = 1 " +
        "UNION ALL SELECT x.user_id, x.i, " +
        "0.5 * x.value + 0.5 * (r.l + r.b) AS l, " +
        "0.25 * ((0.5 * x.value + 0.5 * (r.l + r.b)) - r.l) + 0.75 * r.b AS b " +
        "FROM r JOIN x ON x.user_id = r.user_id AND x.i = r.i + 1) " +
        "SELECT r.user_id, nn.n_obs, " +
        "floor(r.l * 10000 + 0.5) / 10000.0 AS level, " +
        "floor(r.b * 10000 + 0.5) / 10000.0 AS trend, " +
        "floor((r.l + r.b) * 10000 + 0.5) / 10000.0 AS forecast_next " +
        "FROM r JOIN nn ON r.user_id = nn.user_id AND r.i = nn.n_obs " +
        "ORDER BY r.user_id"),

    // standard peer semantics on both engines: the RANGE frame ends at
    // the last peer of the current row's ts; exact-integer outputs
    "sql_window_range_interval" ->
      ("SELECT user_id, event_id, " +
        "count(*) OVER w AS n_last_hour, " +
        "(sum(cast(floor(value * 100 + 0.5) AS BIGINT)) OVER w)::BIGINT AS cents_last_hour " +
        "FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts " +
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) " +
        "ORDER BY user_id, event_id"),

    // Spark's try_divide/try_cast == DuckDB's NULLIF-divide/TRY_CAST
    "fn_try_arith" ->
      ("SELECT event_id, " +
        "1e2 / NULLIF(value - value, 0) AS div_zero, " +
        "floor((cast(floor(value * 100 + 0.5) AS BIGINT) / 7) * 1e6) / 1e6 AS div7, " +
        "TRY_CAST(event_type AS DOUBLE) AS bad_double, " +
        "TRY_CAST(substr(event_type, 1, 2) AS INT) AS bad_int " +
        "FROM events ORDER BY event_id"),

    // local-level Kalman: Q=0.25/R=1.0 are dyadic, the recurrence is
    // pure +/*/÷ — IEEE-identical across engines with no snap until
    // the final 1e-4 rounding (ts_holt_linear's recursive-CTE recipe)
    "ts_kalman_1d" ->
      ("WITH RECURSIVE x AS (SELECT user_id, value, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i " +
        "FROM events), " +
        "nn AS (SELECT user_id, max(i)::BIGINT AS n_obs FROM x GROUP BY user_id), " +
        "r AS (SELECT user_id, i, value AS xs, 1.0::DOUBLE AS p FROM x WHERE i = 1 " +
        "UNION ALL SELECT x.user_id, x.i, " +
        "r.xs + ((r.p + 0.25) / ((r.p + 0.25) + 1.0)) * (x.value - r.xs) AS xs, " +
        "(1.0 - ((r.p + 0.25) / ((r.p + 0.25) + 1.0))) * (r.p + 0.25) AS p " +
        "FROM r JOIN x ON x.user_id = r.user_id AND x.i = r.i + 1) " +
        "SELECT r.user_id, nn.n_obs, " +
        "floor(r.xs * 10000 + 0.5) / 10000.0 AS estimate, " +
        "floor(r.p * 10000 + 0.5) / 10000.0 AS err_var " +
        "FROM r JOIN nn ON r.user_id = nn.user_id AND r.i = nn.n_obs " +
        "ORDER BY r.user_id"),

    // Holt-Winters: the recursive CTE replays the engine's fold with the
    // 7-slot seasonal state as explicit columns — see holtWintersSql
    "ts_holt_winters" -> holtWintersSql,

    // the stateful twin's batch mode is bit-identical to the
    // declarative fold (provisional open-day readout on locals), so it
    // shares the recursive-CTE twin verbatim — the strongest pin a
    // stateful operator can carry
    "stream_holt_winters" -> holtWintersSql,

    // the stateful SCD2 twin emits each event_id exactly once in batch
    // mode (one chunk = all history), bit-identical to the lead() window
    // form — shares cdc_scd2's twin verbatim
    "stream_scd2" ->
      ("SELECT user_id, event_id, event_type, ts AS valid_from, " +
        "lead(ts) OVER w AS valid_to, " +
        "(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END)::INT AS is_current " +
        "FROM events WINDOW w AS (PARTITION BY user_id " +
        "ORDER BY ts ASC, event_id ASC) " +
        "ORDER BY user_id, valid_from, event_id"),

    // item-item cosine over binary baskets: exact BIGINT cooc/n counts,
    // one correctly-rounded sqrt + divide, ranked AFTER the 4-dp snap
    // with neighbor-id tiebreak (the knn_cosine recipe)
    "recommend_item_knn" ->
      ("WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "n AS (SELECT l_partkey, count(*) AS n FROM d GROUP BY 1), " +
        "c AS (SELECT a.l_partkey AS part, b.l_partkey AS neighbor, " +
        "count(*) AS cooc FROM d a JOIN d b " +
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey " +
        "GROUP BY 1, 2), " +
        "s AS (SELECT c.part, c.neighbor, c.cooc, " +
        "floor((c.cooc::DOUBLE / sqrt((na.n * nb.n)::DOUBLE)) * 10000 + 0.5) " +
        "/ 10000.0 AS sim " +
        "FROM c JOIN n na ON na.l_partkey = c.part " +
        "JOIN n nb ON nb.l_partkey = c.neighbor) " +
        "SELECT part, rn, neighbor, sim, cooc FROM (" +
        "SELECT part, neighbor, cooc, sim, (row_number() OVER (" +
        "PARTITION BY part ORDER BY sim DESC, neighbor ASC))::INT AS rn " +
        "FROM s) WHERE rn <= 5 ORDER BY part, rn"),

    // degree assortativity: exact BIGINT moments over the directed edge
    // list, closed form in double with the engine's operand order
    "graph_assortativity" ->
      ("WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2 FROM d a " +
        "JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "deg AS (SELECT p, count(*)::BIGINT AS deg FROM " +
        "(SELECT p1 AS p FROM e UNION ALL SELECT p2 FROM e) GROUP BY p), " +
        "s AS (SELECT count(*)::BIGINT AS m_edges, " +
        "sum(da.deg * db.deg)::BIGINT AS sxy1, " +
        "sum(da.deg + db.deg)::BIGINT AS sx, " +
        "sum(da.deg * da.deg + db.deg * db.deg)::BIGINT AS sxx " +
        "FROM e JOIN deg da ON e.p1 = da.p JOIN deg db ON e.p2 = db.p) " +
        "SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes, " +
        "m_edges AS n_edges, " +
        "floor(((2.0 * m_edges::DOUBLE) * (2.0 * sxy1::DOUBLE) " +
        "- sx::DOUBLE * sx::DOUBLE) / " +
        "((2.0 * m_edges::DOUBLE) * sxx::DOUBLE " +
        "- sx::DOUBLE * sx::DOUBLE) * 1000000 + 0.5) / 1000000.0 " +
        "AS assortativity FROM s"),

    // bigram-LM sequence scoring: per-transition -ln p snapped to a 1e-6
    // integer grid BEFORE the per-user sum (exact integer accumulation)
    "seq_markov_perplexity" ->
      ("WITH seq AS (SELECT user_id, event_type AS a, " +
        "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b " +
        "FROM events), " +
        "pr AS (SELECT a, b, count(*)::BIGINT AS n_ab FROM seq " +
        "WHERE b IS NOT NULL GROUP BY a, b), " +
        "tot AS (SELECT a, sum(n_ab)::BIGINT AS n_a FROM pr GROUP BY a), " +
        "p AS (SELECT pr.a, pr.b, " +
        "floor(-ln(pr.n_ab::DOUBLE / t.n_a::DOUBLE) * 1000000 + 0.5)::BIGINT " +
        "AS nll_u FROM pr JOIN tot t ON pr.a = t.a), " +
        "u AS (SELECT s.user_id, count(*)::BIGINT AS n_transitions, " +
        "sum(p.nll_u)::BIGINT AS snll FROM seq s " +
        "JOIN p ON s.a = p.a AND s.b = p.b GROUP BY s.user_id) " +
        "SELECT user_id, n_transitions, " +
        "floor(snll::DOUBLE / 1000000.0 / n_transitions::DOUBLE " +
        "* 10000 + 0.5) / 10000.0 AS avg_nll " +
        "FROM u ORDER BY user_id"),

    // moments from EXACT BIGINT power sums (DuckDB's int sums widen to
    // HUGEINT — ::BIGINT pins the lattice Spark's long sums live on); the
    // double algebra is then spelled in Analytics.aggSkewKurt's exact
    // order, so both engines produce the same bits before the round
    "agg_skew_kurt" ->
      ("WITH g AS (SELECT lang, count(*) AS n, " +
        "sum(n_chars)::BIGINT AS s1, sum(n_chars * n_chars)::BIGINT AS s2, " +
        "sum(n_chars * n_chars * n_chars)::BIGINT AS s3, " +
        "sum(n_chars * n_chars * n_chars * n_chars)::BIGINT AS s4 " +
        "FROM documents GROUP BY lang), " +
        "m AS (SELECT lang, n, s1::DOUBLE / n::DOUBLE AS mu, " +
        "s2::DOUBLE / n::DOUBLE AS e2, s3::DOUBLE / n::DOUBLE AS e3, " +
        "s4::DOUBLE / n::DOUBLE AS e4 FROM g), " +
        "c AS (SELECT lang, n, e2 - mu * mu AS m2, " +
        "e3 - 3.0 * mu * e2 + 2.0 * mu * mu * mu AS m3, " +
        "e4 - 4.0 * mu * e3 + 6.0 * mu * mu * e2 - 3.0 * mu * mu * mu * mu AS m4 " +
        "FROM m) " +
        "SELECT lang, n, " +
        "floor(m3 / sqrt(m2 * m2 * m2) * 10000 + 0.5) / 10000.0 AS skew, " +
        "floor((m4 / (m2 * m2) - 3.0) * 10000 + 0.5) / 10000.0 AS kurt " +
        "FROM c ORDER BY lang"),

    // email first, phone second — same pass order as textPiiRedact; the
    // patterns sit in the Java-regex ∩ RE2 common dialect ('g' because
    // DuckDB replaces only the first match by default, Spark replaces all)
    "text_pii_redact" ->
      ("WITH p AS (SELECT doc_id, text || ' contact user' || doc_id::VARCHAR || " +
        "'@mail.example or +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS t " +
        "FROM documents) " +
        "SELECT doc_id, regexp_replace(regexp_replace(t, " +
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), " +
        "'\\+1-555-[0-9]{4}', '<PHONE>', 'g') AS red_text " +
        "FROM p ORDER BY doc_id"),

    // schedule position = rank/weight, one IEEE divide of small integers;
    // (pos, source, doc_id) is a total order so LIMIT 200 is portable
    "corpus_interleave" ->
      ("WITH r AS (SELECT source, doc_id, " +
        "(row_number() OVER (PARTITION BY source ORDER BY doc_id))::INT AS rn, " +
        "(substr(source, 4)::INT % 3 + 1)::INT AS wgt FROM documents) " +
        "SELECT source, doc_id, rn, wgt FROM r " +
        "ORDER BY rn::DOUBLE / wgt::DOUBLE, source, doc_id LIMIT 200"),

    // rn-difference gaps-and-islands; pure integer window arithmetic
    "win_streak" ->
      ("WITH s AS (SELECT user_id, event_type, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - " +
        "row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS grp " +
        "FROM events), " +
        "runs AS (SELECT user_id, event_type, grp, count(*) AS len " +
        "FROM s GROUP BY 1, 2, 3) " +
        "SELECT user_id, event_type, max(len) AS max_streak, " +
        "count(*) AS n_streaks FROM runs GROUP BY 1, 2 " +
        "ORDER BY user_id, event_type"),

    // exact integer sums (BIGINT widens to HUGEINT on the squares), one
    // exact→double cast per sum, then the textbook formula in the same
    // spelling as Analytics.aggCorrExact — engine-native corr() is unsafe
    "agg_corr_exact" ->
      ("WITH b AS (SELECT l_returnflag, l_quantity::BIGINT AS x, " +
        "floor(l_extendedprice * 100 + 0.5)::BIGINT AS y FROM lineitem), " +
        "g AS (SELECT l_returnflag, count(*) AS n, " +
        "sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sx2, " +
        "sum(y * y) AS sy2, sum(x * y) AS sxy FROM b GROUP BY 1), " +
        "c AS (SELECT l_returnflag, n, n::DOUBLE AS nd, sx::DOUBLE AS sxd, " +
        "sy::DOUBLE AS syd, sx2::DOUBLE AS sx2d, sy2::DOUBLE AS sy2d, " +
        "sxy::DOUBLE AS sxyd FROM g) " +
        "SELECT l_returnflag, n, " +
        "floor((nd * sxyd - sxd * syd) / " +
        "sqrt((nd * sx2d - sxd * sxd) * (nd * sy2d - syd * syd)) " +
        "* 1000000 + 0.5) / 1000000.0 AS corr_qp, " +
        "floor((nd * sxyd - sxd * syd) / (nd * (nd - 1.0)) " +
        "* 10000 + 0.5) / 10000.0 AS covar_qp " +
        "FROM c ORDER BY l_returnflag"),

    // integer counts, one small-int divide — rounds identically anywhere
    "text_ttr" ->
      ("SELECT doc_id, len(string_split(text, ' '))::INT AS n_tok, " +
        "len(list_distinct(string_split(text, ' ')))::INT AS n_uniq, " +
        "floor(len(list_distinct(string_split(text, ' ')))::DOUBLE / " +
        "len(string_split(text, ' '))::DOUBLE * 10000 + 0.5) / 10000.0 AS ttr " +
        "FROM documents ORDER BY doc_id"),

    // 1e-6-grid snap → exact BIGINT sums → one double divide; DuckDB's
    // unnest zips with generate_subscripts (1-based, matching pos+1)
    "embedding_centroid" ->
      ("WITH x AS (SELECT label, generate_subscripts(embedding, 1)::INT AS pos, " +
        "unnest(embedding) AS v FROM embeddings), " +
        "g AS (SELECT label, pos, count(*) AS n, " +
        "sum(floor(v::DOUBLE * 1000000 + 0.5)::BIGINT)::BIGINT AS sq " +
        "FROM x GROUP BY 1, 2) " +
        "SELECT label, pos, n, " +
        "floor(sq::DOUBLE / n::DOUBLE / 1000000 * 1000000 + 0.5) / 1000000.0 AS centroid " +
        "FROM g ORDER BY label, pos"),

    // min/max have no accumulation order — bit-portable end to end
    "feature_minmax_norm" ->
      ("WITH s AS (SELECT event_id, user_id, value, " +
        "min(value) OVER (PARTITION BY user_id) AS vmin, " +
        "max(value) OVER (PARTITION BY user_id) AS vmax FROM events) " +
        "SELECT event_id, user_id, " +
        "floor((value - vmin) / (vmax - vmin) * 10000 + 0.5) / 10000.0 AS v_norm " +
        "FROM s WHERE vmax > vmin ORDER BY user_id, event_id"),

    // µs-truncate the ns fixture timestamps (join_asof convention);
    // gap in whole seconds via epoch_us integer division == Spark's
    // unix_timestamp difference
    "join_asof_tolerance" ->
      ("SELECT purchase_id, user_id, click_id, gap_s FROM (" +
        "SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id, " +
        "epoch_us(date_trunc('microseconds', p.ts)) // 1000000 - " +
        "epoch_us(date_trunc('microseconds', c.ts)) // 1000000 AS gap_s, " +
        "row_number() OVER (PARTITION BY p.event_id " +
        "ORDER BY date_trunc('microseconds', c.ts) DESC, c.event_id DESC) AS rn " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "JOIN (SELECT * FROM events WHERE event_type = 'click') c " +
        "ON p.user_id = c.user_id " +
        "AND date_trunc('microseconds', c.ts) <= date_trunc('microseconds', p.ts) " +
        "AND date_trunc('microseconds', c.ts) >= " +
        "date_trunc('microseconds', p.ts) - INTERVAL 30 MINUTE" +
        ") WHERE rn = 1 ORDER BY purchase_id"),

    // the bitmap aggregate is EXACT — a custom TypedImperativeAggregate
    // under the same hash gate as the built-ins
    "agg_bitmap_distinct" ->
      ("SELECT event_type, count(DISTINCT user_id) AS n_users " +
        "FROM events GROUP BY 1 ORDER BY event_type"),

    // the recursion loop is SHARED VERBATIM with the Spark side
    // (SqlApi.recursiveBfsBody); only the edge-table idiom differs —
    // DuckDB materializes the multi-referenced CTE once, Spark recurses
    // over a cached view (UnionLoop would re-run a CTE per iteration)
    "sql_recursive_cte" ->
      ("WITH RECURSIVE e0 AS (" +
        "SELECT a.l_partkey AS p1, b.l_partkey AS p2 " +
        "FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a " +
        "JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b " +
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "edges AS (SELECT p1 AS src, p2 AS dst FROM e0 " +
        "UNION ALL SELECT p2, p1 FROM e0), " +
        graft.ops.SqlApi.recursiveBfsBody("edges")),

    // fixture data is clean, so the counters gate at their true zeros
    // (1-row result, n_rows nonzero — not a vacuous 0-row pass); dirty-
    // row DETECTION is proven by DqSpec's injection test
    "dq_profile" ->
      ("WITH c AS (SELECT count(*) AS n_rows, " +
        "sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_value, " +
        "sum(CASE WHEN event_type IS NULL OR event_type = '' THEN 1 ELSE 0 END)::BIGINT AS blank_type, " +
        "sum(CASE WHEN value < 0 THEN 1 ELSE 0 END)::BIGINT AS neg_value, " +
        "(count(*) - count(DISTINCT event_id)) AS dup_event_ids FROM events), " +
        "o AS (SELECT count(*) AS fk_orphans FROM lineitem l " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_orderkey = l.l_orderkey)) " +
        "SELECT * FROM c, o"),

    // quality is the 4-dp-rounded TTR — ordering on the ROUNDED value +
    // doc_id tiebreak is engine-portable where a raw-double order is not;
    // integer token counts make the budget cut exact
    "corpus_budget_select" ->
      ("WITH b AS (SELECT doc_id, lang, len(string_split(text, ' '))::INT AS n_tok, " +
        "floor(len(list_distinct(string_split(text, ' ')))::DOUBLE / " +
        "len(string_split(text, ' '))::DOUBLE * 10000 + 0.5) / 10000.0 AS q " +
        "FROM documents), " +
        "c AS (SELECT doc_id, lang, n_tok, " +
        "sum(n_tok) OVER (PARTITION BY lang ORDER BY q DESC, doc_id ASC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tok FROM b) " +
        "SELECT doc_id, lang, n_tok, cum_tok FROM c WHERE cum_tok <= 10000 " +
        "ORDER BY lang, cum_tok"),

    // exact-integer supports; the two divides + round spelled as in
    // Analytics.assocRules
    "assoc_rules" ->
      ("WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "pn AS (SELECT l_partkey AS p, count(*) AS n FROM d GROUP BY 1), " +
        "tot AS (SELECT count(DISTINCT l_orderkey) AS n_total FROM d), " +
        "pairs AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_ab " +
        "FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2) " +
        "SELECT p1, p2, n_ab, " +
        "floor(n_ab::DOUBLE / na.n::DOUBLE * 1000000 + 0.5) / 1000000.0 AS conf, " +
        "floor(n_total::DOUBLE * n_ab::DOUBLE / (na.n::DOUBLE * nb.n::DOUBLE) " +
        "* 1000000 + 0.5) / 1000000.0 AS lift " +
        "FROM pairs JOIN pn na ON na.p = p1 JOIN pn nb ON nb.p = p2, tot " +
        "ORDER BY n_ab DESC, p1, p2"),

    // add-1 log-odds vs rest-of-corpus; ln's last ulp absorbed by the
    // 4-dp floor (BM25 argument); rank on the ROUNDED score + term
    "text_keyword_logodds" ->
      ("WITH c AS (SELECT lang, unnest(string_split(text, ' ')) AS term " +
        "FROM documents), " +
        "k AS (SELECT lang, term, count(*) AS c_lt FROM c GROUP BY 1, 2), " +
        "w AS (SELECT lang, term, c_lt, " +
        "sum(c_lt) OVER (PARTITION BY lang) AS t_l, " +
        "sum(c_lt) OVER (PARTITION BY term) AS c_t, " +
        "(SELECT sum(c_lt) FROM k) AS t_all FROM k), " +
        "sc AS (SELECT lang, term, c_lt, " +
        "floor((ln((c_lt::DOUBLE + 1.0) / ((t_l - c_lt)::DOUBLE + 1.0)) - " +
        "ln(((c_t - c_lt)::DOUBLE + 1.0) / ((t_all - t_l - c_t + c_lt)::DOUBLE + 1.0))) " +
        "* 10000 + 0.5) / 10000.0 AS score FROM w), " +
        "r AS (SELECT lang, term, c_lt, score, row_number() OVER " +
        "(PARTITION BY lang ORDER BY score DESC, term ASC) AS rn FROM sc) " +
        "SELECT lang, rn::INT AS rn, term, c_lt, score FROM r WHERE rn <= 5 " +
        "ORDER BY lang, rn"),

    // adjacent-pair transition counts on the shared µs total order
    "seq_transition_matrix" ->
      ("WITH p AS (SELECT event_type AS cur, " +
        "lead(event_type, 1) OVER (PARTITION BY user_id " +
        "ORDER BY date_trunc('microseconds', ts), event_id) AS nxt " +
        "FROM events), " +
        "k AS (SELECT cur, nxt, count(*) AS n_ab FROM p " +
        "WHERE nxt IS NOT NULL GROUP BY 1, 2) " +
        "SELECT cur, nxt, n_ab, " +
        "floor(n_ab::DOUBLE / (sum(n_ab) OVER (PARTITION BY cur))::DOUBLE " +
        "* 1000000 + 0.5) / 1000000.0 AS prob " +
        "FROM k ORDER BY cur, nxt"),

    // first-5-types path per 30-min session (same session derivation as
    // join_interval_overlap); concat_ws skips the NULL tail identically
    "seq_session_paths" ->
      ("WITH sx AS (SELECT user_id, ts, event_id, event_type, " +
        "(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_idx FROM (" +
        "SELECT *, CASE WHEN floor(epoch(ts))::BIGINT - " +
        "(lag(floor(epoch(ts))::BIGINT) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800 " +
        "THEN 1 ELSE 0 END AS new_session FROM events)), " +
        "rk AS (SELECT user_id, session_idx, event_type, " +
        "row_number() OVER (PARTITION BY user_id, session_idx " +
        "ORDER BY date_trunc('microseconds', ts), event_id) AS rn FROM sx), " +
        "pp AS (SELECT user_id, session_idx, concat_ws('>', " +
        "max(CASE WHEN rn = 1 THEN event_type END), " +
        "max(CASE WHEN rn = 2 THEN event_type END), " +
        "max(CASE WHEN rn = 3 THEN event_type END), " +
        "max(CASE WHEN rn = 4 THEN event_type END), " +
        "max(CASE WHEN rn = 5 THEN event_type END)) AS path " +
        "FROM rk WHERE rn <= 5 GROUP BY 1, 2) " +
        "SELECT path, count(*) AS n_sessions FROM pp GROUP BY 1 " +
        "ORDER BY n_sessions DESC, path LIMIT 20"),

    // per-lang Gini of doc lengths; rank product sums ride HUGEINT
    // (Spark: DECIMAL(38,0)), one double divide on identical integers
    "agg_gini" ->
      ("WITH r AS (SELECT lang, n_chars, row_number() OVER " +
        "(PARTITION BY lang ORDER BY n_chars, doc_id) AS i FROM documents), " +
        "g AS (SELECT lang, count(*) AS n, sum(n_chars) AS sx, " +
        "sum(i * n_chars) AS six FROM r GROUP BY 1) " +
        "SELECT lang, n, " +
        "floor((2 * six - (n + 1) * sx)::DOUBLE / (n * sx)::DOUBLE " +
        "* 1000000 + 0.5) / 1000000.0 AS gini FROM g ORDER BY lang"),

    // per-user z-score from exact cent sums (Σx, Σx² integers; HUGEINT
    // headroom); zero-variance test on the exact integer numerator
    "feature_zscore_norm" ->
      ("WITH e AS (SELECT event_id, user_id, " +
        "floor(value * 100 + 0.5)::BIGINT AS xc FROM events), " +
        "w AS (SELECT event_id, user_id, xc, " +
        "count(*) OVER (PARTITION BY user_id) AS n, " +
        "sum(xc) OVER (PARTITION BY user_id) AS s1, " +
        "sum(xc * xc) OVER (PARTITION BY user_id) AS s2 FROM e) " +
        "SELECT event_id, user_id, " +
        "floor((xc::DOUBLE - s1::DOUBLE / n::DOUBLE) / " +
        "sqrt((n * s2 - s1 * s1)::DOUBLE / (n * (n - 1))::DOUBLE) " +
        "* 10000 + 0.5) / 10000.0 AS z_norm " +
        "FROM w WHERE n >= 2 AND (n * s2 - s1 * s1) > 0 " +
        "ORDER BY user_id, event_id"),

    // per-user pct change vs previous event on cents ints; µs-truncated
    // order (events.ts is ns in DuckDB's read)
    "win_pct_change" ->
      ("WITH e AS (SELECT event_id, user_id, ts, " +
        "floor(value * 100 + 0.5)::BIGINT AS xc FROM events), " +
        "l AS (SELECT event_id, user_id, xc, lag(xc, 1) OVER " +
        "(PARTITION BY user_id " +
        "ORDER BY date_trunc('microseconds', ts), event_id) AS prev FROM e) " +
        "SELECT event_id, user_id, " +
        "floor((xc - prev)::DOUBLE / prev::DOUBLE * 1000000 + 0.5) " +
        "/ 1000000.0 AS pct_change " +
        "FROM l WHERE prev IS NOT NULL AND prev <> 0 " +
        "ORDER BY user_id, event_id"),

    // modified z-score (median/MAD) outliers; both medians exact on the
    // cent grid, threshold compared on the Det-rounded score both sides
    "ts_anomaly_mad" ->
      ("WITH e AS (SELECT event_id, user_id, " +
        "floor(value * 100 + 0.5)::BIGINT AS xc FROM events), " +
        "m AS (SELECT event_id, user_id, xc, " +
        "count(*) OVER pw AS n, " +
        "quantile_cont(xc, 0.5) OVER pw AS med FROM e " +
        "WINDOW pw AS (PARTITION BY user_id)), " +
        "d2 AS (SELECT event_id, user_id, n, " +
        "abs(xc::DOUBLE - med::DOUBLE) AS dev FROM m), " +
        "d3 AS (SELECT event_id, user_id, n, dev, " +
        "quantile_cont(dev, 0.5) OVER (PARTITION BY user_id) AS mad FROM d2), " +
        "z AS (SELECT event_id, user_id, " +
        "floor(dev / (1.4826 * mad) * 10000 + 0.5) / 10000.0 AS z_mad " +
        "FROM d3 WHERE n >= 12 AND mad > 0) " +
        "SELECT event_id, user_id, z_mad FROM z WHERE z_mad >= 3.5 " +
        "ORDER BY user_id, event_id"),

    // adjacent-bigram PMI from exact counts; ln's ulp absorbed by the
    // 4-dp floor, rank on the rounded score
    "seq_pmi_bigrams" ->
      ("WITH p AS (SELECT event_type AS cur, " +
        "lead(event_type, 1) OVER (PARTITION BY user_id " +
        "ORDER BY date_trunc('microseconds', ts), event_id) AS nxt " +
        "FROM events), " +
        "k AS (SELECT cur, nxt, count(*) AS n_ab FROM p " +
        "WHERE nxt IS NOT NULL GROUP BY 1, 2), " +
        "w AS (SELECT cur, nxt, n_ab, " +
        "sum(n_ab) OVER (PARTITION BY cur) AS n_a, " +
        "sum(n_ab) OVER (PARTITION BY nxt) AS n_b, " +
        "(SELECT sum(n_ab) FROM k) AS n_tot FROM k) " +
        "SELECT cur, nxt, n_ab, " +
        "floor(ln((n_tot * n_ab)::DOUBLE / (n_a * n_b)::DOUBLE) " +
        "* 10000 + 0.5) / 10000.0 AS pmi " +
        "FROM w WHERE n_ab >= 5 ORDER BY pmi DESC, cur, nxt"),

    // degree histogram of the co-order part graph (assoc_pairs edges)
    "graph_degree_stats" ->
      ("WITH dl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2 " +
        "FROM dl a JOIN dl b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "d AS (SELECT p, count(*) AS degree FROM " +
        "(SELECT p1 AS p FROM e UNION ALL SELECT p2 AS p FROM e) " +
        "GROUP BY 1) " +
        "SELECT degree, count(*) AS n_parts FROM d GROUP BY 1 " +
        "ORDER BY degree"),

    // latest-wins CDC with delete tombstones (event_id % 10 = 0 → 'D');
    // same key + µs-truncated recency order as cdc_upsert_latest
    "cdc_deletes" ->
      ("WITH r AS (SELECT user_id, event_type, event_id, value, ts, " +
        "CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op, " +
        "row_number() OVER (PARTITION BY user_id, event_type " +
        "ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn " +
        "FROM events) " +
        "SELECT user_id, event_type, event_id, " +
        "floor(value * 100 + 0.5) / 100.0 AS value, ts " +
        "FROM r WHERE rn = 1 AND op = 'U' ORDER BY user_id, event_type"),

    // hourly-grid linear interpolation between bracketing observed
    // buckets; cent-integer sums, exact µs-delta frac, no extrapolation
    "ts_interpolate_linear" ->
      ("WITH ev AS (SELECT date_trunc('hour', ts) AS h, event_type, " +
        "floor(value * 100 + 0.5)::BIGINT AS xc FROM events), " +
        "agg AS (SELECT h, event_type, sum(xc) AS cents FROM ev GROUP BY 1, 2), " +
        "bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM ev), " +
        "hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds), " +
        "grid AS (SELECT h, event_type FROM hours CROSS JOIN " +
        "(SELECT DISTINCT event_type FROM ev)), " +
        "j AS (SELECT g.h, g.event_type, a.cents, " +
        "CASE WHEN a.cents IS NOT NULL THEN g.h END AS kh " +
        "FROM grid g LEFT JOIN agg a ON g.h = a.h AND g.event_type = a.event_type), " +
        "w AS (SELECT h, event_type, cents, " +
        "last_value(kh IGNORE NULLS) OVER pb AS ph, " +
        "last_value(cents IGNORE NULLS) OVER pb AS pv, " +
        "first_value(kh IGNORE NULLS) OVER pf AS nh, " +
        "first_value(cents IGNORE NULLS) OVER pf AS nv FROM j " +
        "WINDOW pb AS (PARTITION BY event_type ORDER BY h " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "pf AS (PARTITION BY event_type ORDER BY h " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
        "SELECT h, event_type, " +
        "(cents IS NULL)::INT AS interpolated, " +
        "floor((CASE WHEN cents IS NOT NULL THEN cents::DOUBLE " +
        "ELSE pv::DOUBLE + (nv - pv)::DOUBLE * " +
        "((epoch_us(h) - epoch_us(ph))::DOUBLE / " +
        "(epoch_us(nh) - epoch_us(ph))::DOUBLE) END) / 1e2 " +
        "* 10000 + 0.5) / 10000.0 AS value " +
        "FROM w WHERE ph IS NOT NULL AND nh IS NOT NULL " +
        "ORDER BY h, event_type"),

    // Flesch readability from exact regex counts; one affine double
    // chain spelled identically, Det-rounded 4 dp
    "text_readability" ->
      ("WITH c AS (SELECT doc_id, lang, " +
        "len(string_split(text, ' '))::BIGINT AS n_words, " +
        "greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT AS n_sents, " +
        "len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS n_syll " +
        "FROM documents) " +
        "SELECT doc_id, lang, n_words, n_sents, n_syll, " +
        "floor((206.835 - 1.015 * (n_words::DOUBLE / n_sents::DOUBLE) " +
        "- 84.6 * (n_syll::DOUBLE / n_words::DOUBLE)) " +
        "* 10000 + 0.5) / 10000.0 AS flesch " +
        "FROM c ORDER BY doc_id"),

    // per-lang TTR quartile phases; rank on the ROUNDED score, phase
    // from an exact small-int double division
    "corpus_curriculum" ->
      ("WITH t AS (SELECT doc_id, lang, " +
        "floor(len(list_distinct(string_split(text, ' ')))::DOUBLE / " +
        "len(string_split(text, ' '))::DOUBLE * 10000 + 0.5) / 10000.0 AS ttr " +
        "FROM documents), " +
        "r AS (SELECT doc_id, lang, ttr, " +
        "row_number() OVER (PARTITION BY lang ORDER BY ttr, doc_id) AS rn, " +
        "count(*) OVER (PARTITION BY lang) AS n FROM t) " +
        "SELECT lang, doc_id, ttr, " +
        "(floor((rn - 1)::DOUBLE * 4.0 / n::DOUBLE)::INT + 1) AS phase " +
        "FROM r ORDER BY lang, ttr, doc_id"),

    // per-dimension stats on the 1e-6 grid; exact sums, orderless min/max
    "embedding_dim_stats" ->
      ("WITH u AS (SELECT generate_subscripts(embedding, 1)::INT AS pos, " +
        "unnest(embedding) AS v FROM embeddings), " +
        "x AS (SELECT pos, floor(v::DOUBLE * 1000000 + 0.5)::BIGINT AS vi FROM u), " +
        "g AS (SELECT pos, count(*) AS n, sum(vi)::BIGINT AS sv, " +
        "min(vi) AS mn, max(vi) AS mx FROM x GROUP BY 1) " +
        "SELECT pos, n, " +
        "floor(sv::DOUBLE / n::DOUBLE / 1000000 * 1000000 + 0.5) / 1000000.0 AS mean_v, " +
        "floor(mn::DOUBLE / 1000000 * 1000000 + 0.5) / 1000000.0 AS min_v, " +
        "floor(mx::DOUBLE / 1000000 * 1000000 + 0.5) / 1000000.0 AS max_v " +
        "FROM g ORDER BY pos"),

    // lag-1 autocorrelation from exact cent sums (agg_corr_exact recipe
    // over a lagged self-pairing); exact-integer variance gates
    "ts_autocorr_lag1" ->
      ("WITH e AS (SELECT user_id, ts, event_id, " +
        "floor(value * 100 + 0.5)::BIGINT AS y FROM events), " +
        "p AS (SELECT user_id, y, lag(y, 1) OVER (PARTITION BY user_id " +
        "ORDER BY date_trunc('microseconds', ts), event_id) AS x FROM e), " +
        "g AS (SELECT user_id, count(*) AS n, sum(x) AS sx, sum(y) AS sy, " +
        "sum(x * x) AS sx2, sum(y * y) AS sy2, sum(x * y) AS sxy " +
        "FROM p WHERE x IS NOT NULL GROUP BY 1), " +
        "c AS (SELECT user_id, n, n::DOUBLE AS nd, sx::DOUBLE AS sxd, " +
        "sy::DOUBLE AS syd, sx2::DOUBLE AS sx2d, sy2::DOUBLE AS sy2d, " +
        "sxy::DOUBLE AS sxyd FROM g " +
        "WHERE n >= 12 AND (n * sx2 - sx * sx) > 0 " +
        "AND (n * sy2 - sy * sy) > 0) " +
        "SELECT user_id, n, " +
        "floor((nd * sxyd - sxd * syd) / " +
        "sqrt((nd * sx2d - sxd * sxd) * (nd * sy2d - syd * syd)) " +
        "* 1000000 + 0.5) / 1000000.0 AS acf1 " +
        "FROM c ORDER BY user_id"),

    // five-point exact quantile bands per type (agg_percentile parity)
    "agg_quantile_bands" ->
      ("SELECT event_type, count(*) AS n, " +
        "floor(quantile_cont(value, 0.10) * 10000 + 0.5) / 10000.0 AS p10, " +
        "floor(quantile_cont(value, 0.25) * 10000 + 0.5) / 10000.0 AS p25, " +
        "floor(quantile_cont(value, 0.50) * 10000 + 0.5) / 10000.0 AS p50, " +
        "floor(quantile_cont(value, 0.75) * 10000 + 0.5) / 10000.0 AS p75, " +
        "floor(quantile_cont(value, 0.90) * 10000 + 0.5) / 10000.0 AS p90 " +
        "FROM events GROUP BY event_type ORDER BY event_type"),

    // robust scaler: exact median/quartiles on the cent grid (dyadic
    // interpolation fractions), exact IQR > 0 gate
    "feature_robust_scale" ->
      ("WITH e AS (SELECT event_id, user_id, " +
        "floor(value * 100 + 0.5)::BIGINT AS xc FROM events), " +
        "w AS (SELECT event_id, user_id, xc, " +
        "count(*) OVER pw AS n, " +
        "quantile_cont(xc, 0.5) OVER pw AS med, " +
        "quantile_cont(xc, 0.25) OVER pw AS q1, " +
        "quantile_cont(xc, 0.75) OVER pw AS q3 FROM e " +
        "WINDOW pw AS (PARTITION BY user_id)) " +
        "SELECT event_id, user_id, " +
        "floor((xc::DOUBLE - med) / (q3 - q1) * 10000 + 0.5) / 10000.0 " +
        "AS v_robust FROM w WHERE n >= 2 AND q3 > q1 " +
        "ORDER BY user_id, event_id"),

    // DAU / trailing-7-day / MAU / stickiness from exact distincts over
    // the bounded (day, user) pair table
    "analytics_dau" ->
      ("WITH p AS (SELECT DISTINCT date_trunc('day', ts) AS day, " +
        "date_trunc('month', ts) AS month, user_id FROM events), " +
        "dau AS (SELECT day, month, count(DISTINCT user_id) AS dau " +
        "FROM p GROUP BY 1, 2), " +
        "mau AS (SELECT month, count(DISTINCT user_id) AS mau " +
        "FROM p GROUP BY 1), " +
        "wau AS (SELECT d.day AS d0, count(DISTINCT p.user_id) AS wau7 " +
        "FROM dau d JOIN p ON p.day <= d.day " +
        "AND p.day >= d.day - INTERVAL 6 DAY GROUP BY 1) " +
        "SELECT dau.day, dau.dau, wau.wau7, mau.mau, " +
        "floor(dau.dau::DOUBLE / mau.mau::DOUBLE * 10000 + 0.5) / 10000.0 " +
        "AS stickiness FROM dau JOIN mau USING (month) " +
        "JOIN wau ON wau.d0 = dau.day ORDER BY dau.day"),

    // neighborhood Jaccard per co-order pair: n_ab/(n_a + n_b − n_ab)
    // from exact counts; rank on the rounded score
    "graph_edge_jaccard" ->
      ("WITH dl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "pp AS (SELECT l_partkey AS p, count(*) AS n_p FROM dl GROUP BY 1), " +
        "pairs AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, " +
        "count(*) AS n_ab FROM dl a JOIN dl b " +
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2) " +
        "SELECT p1, p2, n_ab, " +
        "floor(n_ab::DOUBLE / (na.n_p + nb.n_p - n_ab)::DOUBLE " +
        "* 1000000 + 0.5) / 1000000.0 AS jaccard " +
        "FROM pairs JOIN pp na ON na.p = p1 JOIN pp nb ON nb.p = p2 " +
        "ORDER BY jaccard DESC, p1, p2"),

    // conditional counts + universal/existential aggregates per type;
    // booleans emit as ints for the scalar comparator
    "fn_agg_bool" ->
      ("SELECT event_type, " +
        "count(*) FILTER (WHERE value > 100) AS n_over_100, " +
        "count(*) FILTER (WHERE value > 400) AS n_over_400, " +
        "bool_and(value > 0)::INT AS all_positive, " +
        "bool_or(value > 480)::INT AS any_near_max " +
        "FROM events GROUP BY event_type ORDER BY event_type"),

    // Monday-based weekday profile; mean divides exact cent sums once
    "ts_weekday_profile" ->
      ("SELECT event_type, (isodow(ts) - 1)::INT AS wd, count(*) AS n, " +
        "floor(sum(floor(value * 100 + 0.5)::BIGINT)::DOUBLE / count(*)::DOUBLE " +
        "/ 1e2 * 10000 + 0.5) / 10000.0 AS mean_value " +
        "FROM events GROUP BY 1, 2 ORDER BY event_type, wd"),

    // LATERAL top-2 orders per BUILDING customer; order on the rounded
    // price with unique tiebreakers
    "sql_lateral_topn" ->
      ("SELECT c.c_custkey, t.o_orderkey, " +
        "floor(t.o_totalprice * 100 + 0.5) / 100.0 AS o_totalprice " +
        "FROM customer c, " +
        "LATERAL (SELECT o_orderkey, o_totalprice FROM orders o " +
        "WHERE o.o_custkey = c.c_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t " +
        "WHERE c.c_mktsegment = 'BUILDING' " +
        "ORDER BY c.c_custkey, o_totalprice DESC, t.o_orderkey"),

    // URL decomposition over deterministically derived URLs (regexes
    // fire on every row; Java-regex ∩ RE2 dialect)
    "fn_url_parse" ->
      ("WITH u AS (SELECT doc_id, 'https://' || source || " +
        "'.example.com/docs/' || doc_id::VARCHAR || '?lang=' || lang AS url " +
        "FROM documents) " +
        "SELECT doc_id, url, " +
        "regexp_extract(url, '^([a-z]+)://', 1) AS scheme, " +
        "regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host, " +
        "regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path, " +
        "regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param " +
        "FROM u ORDER BY doc_id"),

    // CUSUM drift: exact running cents sum and row index on the µs total
    // order; one multiply-subtract double chain
    "ts_cusum" ->
      ("WITH e AS (SELECT event_id, user_id, ts, " +
        "floor(value * 100 + 0.5)::BIGINT AS xc FROM events), " +
        "w AS (SELECT event_id, user_id, " +
        "sum(xc) OVER (PARTITION BY user_id " +
        "ORDER BY date_trunc('microseconds', ts), event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS si, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY date_trunc('microseconds', ts), event_id) AS i, " +
        "count(*) OVER (PARTITION BY user_id) AS n, " +
        "sum(xc) OVER (PARTITION BY user_id) AS st FROM e) " +
        "SELECT event_id, user_id, " +
        "floor((si::DOUBLE - i::DOUBLE * (st::DOUBLE / n::DOUBLE)) / 1e2 " +
        "* 10000 + 0.5) / 10000.0 AS cusum " +
        "FROM w ORDER BY user_id, event_id"),

    // Lorenz deciles of user spend: exact cents, curriculum floor
    // formula for the decile split, cumulative share over 10 rows
    "analytics_pareto" ->
      ("WITH u AS (SELECT user_id, " +
        "sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents " +
        "FROM events GROUP BY 1), " +
        "b AS (SELECT quantile_cont(cents, " +
        "[0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1]) AS qs FROM u), " +
        "d AS (SELECT (1 + len(list_filter(b.qs, q -> u.cents < q)))::INT " +
        "AS decile, cents FROM u, b), " +
        "g AS (SELECT decile, count(*) AS n_users, " +
        "sum(cents)::BIGINT AS dc FROM d GROUP BY 1) " +
        "SELECT decile, n_users, " +
        "floor(dc::DOUBLE / (sum(dc) OVER ())::DOUBLE * 1000000 + 0.5) " +
        "/ 1000000.0 AS share, " +
        "floor((sum(dc) OVER (ORDER BY decile " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE / " +
        "(sum(dc) OVER ())::DOUBLE * 1000000 + 0.5) / 1000000.0 AS cum_share " +
        "FROM g ORDER BY decile"),

    // ROLLUP + GROUPING_ID (first column = MSB in both engines); NULL
    // keys coalesce to a sentinel
    // hour/day/month rollup via one GROUPING SETS pass; grain label from
    // the surviving key, buckets emitted as TIMESTAMP both sides
    "agg_time_rollup" ->
      ("WITH e AS (SELECT date_trunc('hour', ts)::TIMESTAMP AS h, " +
        "date_trunc('day', ts)::TIMESTAMP AS dy, " +
        "date_trunc('month', ts)::TIMESTAMP AS mo, " +
        "floor(value * 100 + 0.5)::BIGINT AS c FROM events) " +
        "SELECT CASE WHEN h IS NOT NULL THEN 'hour' " +
        "WHEN dy IS NOT NULL THEN 'day' ELSE 'month' END AS grain, " +
        "coalesce(h, dy, mo) AS bucket, count(*) AS n, " +
        "sum(c)::BIGINT AS cents FROM e " +
        "GROUP BY GROUPING SETS ((h), (dy), (mo)) ORDER BY grain, bucket"),

    "agg_grouping_id" ->
      ("SELECT coalesce(l_returnflag, 'ALL') AS flag, " +
        "coalesce(l_linestatus, 'ALL') AS status, " +
        "GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid, " +
        "count(*) AS n, " +
        "sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)::BIGINT AS cents " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY gid, flag, status"),

    // per-doc boilerplate shingle ratio (3-gram shingles in >= 5 docs);
    // exact counts, one divide
    "text_boilerplate_ratio" ->
      ("WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
        "s AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
        "range(0, len(ws) - 2), i -> array_to_string(ws[i+1:i+3], ' ')))) AS sh " +
        "FROM d WHERE len(ws) >= 3), " +
        "df AS (SELECT sh, count(DISTINCT doc_id) AS nd FROM s GROUP BY 1) " +
        "SELECT doc_id, count(*) AS n_shingles, " +
        "count(*) FILTER (WHERE nd >= 5) AS n_boiler, " +
        "floor((count(*) FILTER (WHERE nd >= 5))::DOUBLE / count(*)::DOUBLE " +
        "* 1000000 + 0.5) / 1000000.0 AS boiler_ratio " +
        "FROM s JOIN df USING (sh) GROUP BY doc_id ORDER BY doc_id"),

    // KL(lang mix || uniform): inexact terms accumulate via a RUNNING
    // window in lang order (deterministic both engines), last row wins
    "corpus_kl_balance" ->
      ("WITH c AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1), " +
        "t AS (SELECT lang, n_l, (SELECT count(*) FROM documents) AS n, " +
        "(SELECT count(DISTINCT lang) FROM documents) AS k FROM c), " +
        "x AS (SELECT lang, k, (n_l::DOUBLE / n::DOUBLE) * " +
        "ln(k::DOUBLE * (n_l::DOUBLE / n::DOUBLE)) AS term FROM t), " +
        "w AS (SELECT k, sum(term) OVER (ORDER BY lang " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS kl_run, " +
        "row_number() OVER (ORDER BY lang) AS rn FROM x) " +
        "SELECT k AS n_langs, " +
        "floor(kl_run * 1000000 + 0.5) / 1000000.0 AS kl_uniform " +
        "FROM w WHERE rn = k"),

    // temperature sampling: Z = sum(p^0.3) folds left-to-right in lang
    // order (running window == the engine's sorted-array aggregate)
    "corpus_temperature_sample" ->
      ("WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1), " +
        "t AS (SELECT lang, n_docs, (SELECT count(*) FROM documents) AS n FROM c), " +
        "x AS (SELECT lang, n_docs, n_docs::DOUBLE / n::DOUBLE AS p, " +
        "pow(n_docs::DOUBLE / n::DOUBLE, 0.3) AS pa FROM t), " +
        "w AS (SELECT *, sum(pa) OVER (ORDER BY lang " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS z_run, " +
        "count(*) OVER () AS k, row_number() OVER (ORDER BY lang) AS rn FROM x), " +
        "z AS (SELECT z_run AS z FROM w WHERE rn = k) " +
        "SELECT lang, n_docs, " +
        "floor(p * 1000000 + 0.5) / 1000000.0 AS p, " +
        "floor(pa / z * 1000000 + 0.5) / 1000000.0 AS q, " +
        "floor((floor(pa / z * 1000000 + 0.5) / 1000000.0) * 10000)::BIGINT AS per_10k, " +
        "floor(pa / z / p * 10000 + 0.5) / 10000.0 AS boost " +
        "FROM x, z ORDER BY lang"),

    // two-way seasonal residual: exact cent sums per weekday/hour/global,
    // one affine double chain spelled identically
    "ts_seasonal_residual" ->
      ("WITH e AS (SELECT event_id, (isodow(ts) - 1)::INT AS wd, " +
        "hour(ts)::INT AS hod, floor(value * 100 + 0.5)::BIGINT AS xc " +
        "FROM events), " +
        "w AS (SELECT wd, count(*) AS wn, sum(xc)::BIGINT AS wc FROM e GROUP BY 1), " +
        "h AS (SELECT hod, count(*) AS hn, sum(xc)::BIGINT AS hc FROM e GROUP BY 1), " +
        "g AS (SELECT count(*) AS gn, sum(xc)::BIGINT AS gc FROM e) " +
        "SELECT event_id, " +
        "floor((xc::DOUBLE / 1e2 - " +
        "(wc::DOUBLE / wn::DOUBLE / 1e2 + hc::DOUBLE / hn::DOUBLE / 1e2 " +
        "- gc::DOUBLE / gn::DOUBLE / 1e2)) * 10000 + 0.5) / 10000.0 " +
        "AS residual " +
        "FROM e JOIN w USING (wd) JOIN h USING (hod), g " +
        "ORDER BY event_id"),

    // STL-lite: 7-row centered moving SUM over exact BIGINT daily cents
    // (window-tree order irrelevant), one division to double; per-weekday
    // seasonal mean over 1e-6-grid-snapped detrended values (exact
    // integer sums); full-window rows only; day as midnight TIMESTAMP
    "ts_stl_decompose" ->
      ("WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, " +
        "sum(floor(value * 100 + 0.5)::BIGINT) AS cents " +
        "FROM events GROUP BY 1, 2), " +
        "t0 AS (SELECT event_type, day, cents, " +
        "count(*) OVER w AS n7, sum(cents) OVER w AS s7 FROM daily " +
        "WINDOW w AS (PARTITION BY event_type ORDER BY day " +
        "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), " +
        "t AS (SELECT event_type, day, (isodow(day) - 1)::INT AS wd, " +
        "cents::DOUBLE / 1e2 AS v, s7::DOUBLE / 7e2 AS trend, " +
        "cents::DOUBLE / 1e2 - s7::DOUBLE / 7e2 AS det, " +
        "floor((cents::DOUBLE / 1e2 - s7::DOUBLE / 7e2) * 1e6 + 0.5)::BIGINT AS g " +
        "FROM t0 WHERE n7 = 7), " +
        "seas AS (SELECT event_type, wd, " +
        "sum(g)::BIGINT AS sg, count(*) AS sn FROM t GROUP BY 1, 2) " +
        "SELECT t.event_type, t.day::TIMESTAMP AS day, " +
        "floor(t.v * 10000 + 0.5) / 10000.0 AS value, " +
        "floor(t.trend * 10000 + 0.5) / 10000.0 AS trend, " +
        "floor((seas.sg::DOUBLE / seas.sn::DOUBLE / 1e6) * 10000 + 0.5) " +
        "/ 10000.0 AS seasonal, " +
        "floor((t.det - seas.sg::DOUBLE / seas.sn::DOUBLE / 1e6) " +
        "* 10000 + 0.5) / 10000.0 AS residual " +
        "FROM t JOIN seas ON seas.event_type = t.event_type " +
        "AND seas.wd = t.wd ORDER BY t.event_type, t.day"),

    // correlogram: calendar-lag self-join on the daily grid, centered
    // products and squared deviations snapped to the 1e-6 grid before
    // their sums, one integer divide per (type, lag)
    "ts_acf_correlogram" ->
      ("WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, " +
        "sum(floor(value * 100 + 0.5)::BIGINT) AS cents " +
        "FROM events GROUP BY 1, 2), " +
        "m AS (SELECT event_type, " +
        "sum(cents)::DOUBLE / count(*)::DOUBLE / 1e2 AS mean " +
        "FROM daily GROUP BY 1), " +
        "dv AS (SELECT d.event_type, d.day, cents::DOUBLE / 1e2 AS v, " +
        "m.mean FROM daily d JOIN m USING (event_type)), " +
        "den AS (SELECT event_type, " +
        "sum(floor((v - mean) * (v - mean) * 1e6 + 0.5)::BIGINT) AS dg " +
        "FROM dv GROUP BY 1), " +
        "num AS (SELECT a.event_type, l.lag, count(*) AS n_pairs, " +
        "sum(floor((a.v - a.mean) * (b.v - a.mean) * 1e6 + 0.5)::BIGINT) " +
        "AS ng FROM dv a CROSS JOIN " +
        "(SELECT unnest(range(1, 8))::INT AS lag) l " +
        "JOIN dv b ON b.event_type = a.event_type " +
        "AND b.day = a.day + l.lag GROUP BY 1, 2) " +
        "SELECT num.event_type, num.lag, num.n_pairs, " +
        "floor((ng::DOUBLE / dg::DOUBLE) * 10000 + 0.5) / 10000.0 AS acf " +
        "FROM num JOIN den USING (event_type) " +
        "ORDER BY num.event_type, num.lag"),

    // LOO target encoding: exact BIGINT cent sums, three
    // correctly-rounded double ops in the engine's operand order
    "feature_target_encode" ->
      ("WITH e AS (SELECT event_id, event_type, " +
        "floor(value * 100 + 0.5)::BIGINT AS c FROM events), " +
        "t AS (SELECT event_type, count(*) AS nt, sum(c)::BIGINT AS st " +
        "FROM e GROUP BY 1), " +
        "g AS (SELECT count(*) AS ng, sum(c)::BIGINT AS sg FROM e) " +
        "SELECT e.event_id, e.event_type, " +
        "floor((((t.st - e.c)::DOUBLE + " +
        "16.0 * (g.sg::DOUBLE / g.ng::DOUBLE)) / " +
        "(t.nt - 1 + 16)::DOUBLE / 1e2) * 1000000 + 0.5) / 1000000.0 " +
        "AS target_enc " +
        "FROM e JOIN t USING (event_type), g ORDER BY e.event_id"),

    // SAX: per-user mean/sigma from exact BIGINT cent moments, PAA
    // numerator an exact 7-day cent sum, breakpoint CASE on identical
    // doubles; full windows only, sigma > 0
    "ts_sax_symbolize" ->
      ("WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, " +
        "sum(floor(value * 100 + 0.5)::BIGINT) AS cents " +
        "FROM events GROUP BY 1, 2), " +
        "mo AS (SELECT user_id AS u, " +
        "sum(cents)::DOUBLE / count(*)::DOUBLE / 1e2 AS mean, " +
        "sqrt((count(*) * sum(cents * cents) - sum(cents) * sum(cents))::DOUBLE / " +
        "(count(*) * count(*))::DOUBLE / 1e4) AS sigma " +
        "FROM daily GROUP BY 1), " +
        "w AS (SELECT user_id, " +
        "((row_number() OVER (PARTITION BY user_id ORDER BY day) - 1) // 7)::INT " +
        "AS win_idx, day, cents FROM daily), " +
        "g AS (SELECT user_id, win_idx, count(*) AS nw, " +
        "sum(cents)::BIGINT AS wc, min(day) AS start_day " +
        "FROM w GROUP BY 1, 2) " +
        "SELECT g.user_id, g.win_idx, g.start_day::TIMESTAMP AS start_day, " +
        "floor(((wc::DOUBLE / 7e2 - mo.mean) / mo.sigma) * 10000 + 0.5) " +
        "/ 10000.0 AS z_paa, " +
        "CASE WHEN (wc::DOUBLE / 7e2 - mo.mean) / mo.sigma < -0.6745 THEN 'a' " +
        "WHEN (wc::DOUBLE / 7e2 - mo.mean) / mo.sigma < 0 THEN 'b' " +
        "WHEN (wc::DOUBLE / 7e2 - mo.mean) / mo.sigma < 0.6745 THEN 'c' " +
        "ELSE 'd' END AS symbol " +
        "FROM g JOIN mo ON mo.u = g.user_id AND mo.sigma > 0 " +
        "WHERE g.nw = 7 ORDER BY g.user_id, g.win_idx"),

    // STL residual z-score: sigma from exact BIGINT moments of the
    // cent-grid residual (n*ss - s*s exact), one divide + sqrt descaled
    // by the grid^2; z compares identical doubles on both engines
    "ts_anomaly_stl" ->
      ("WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, " +
        "sum(floor(value * 100 + 0.5)::BIGINT) AS cents " +
        "FROM events GROUP BY 1, 2), " +
        "t0 AS (SELECT event_type, day, cents, " +
        "count(*) OVER w AS n7, sum(cents) OVER w AS s7 FROM daily " +
        "WINDOW w AS (PARTITION BY event_type ORDER BY day " +
        "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), " +
        "t AS (SELECT event_type, day, (isodow(day) - 1)::INT AS wd, " +
        "cents::DOUBLE / 1e2 AS v, s7::DOUBLE / 7e2 AS trend, " +
        "cents::DOUBLE / 1e2 - s7::DOUBLE / 7e2 AS det, " +
        "floor((cents::DOUBLE / 1e2 - s7::DOUBLE / 7e2) * 1e6 + 0.5)::BIGINT AS g " +
        "FROM t0 WHERE n7 = 7), " +
        "seas AS (SELECT event_type, wd, " +
        "sum(g)::BIGINT AS sg, count(*) AS sn FROM t GROUP BY 1, 2), " +
        "r AS (SELECT t.event_type, t.day, " +
        "t.det - seas.sg::DOUBLE / seas.sn::DOUBLE / 1e6 AS res " +
        "FROM t JOIN seas ON seas.event_type = t.event_type " +
        "AND seas.wd = t.wd), " +
        "r2 AS (SELECT event_type, day, res, " +
        "floor(res * 1e2 + 0.5)::BIGINT AS g2 FROM r), " +
        "mo AS (SELECT event_type AS et, " +
        "sqrt((count(*) * sum(g2 * g2) - sum(g2) * sum(g2))::DOUBLE / " +
        "(count(*) * count(*))::DOUBLE / 1e4) AS sigma " +
        "FROM r2 GROUP BY 1) " +
        "SELECT r2.event_type, r2.day::TIMESTAMP AS day, " +
        "floor(r2.res * 10000 + 0.5) / 10000.0 AS residual, " +
        "floor(mo.sigma * 10000 + 0.5) / 10000.0 AS sigma, " +
        "floor((r2.res / mo.sigma) * 10000 + 0.5) / 10000.0 AS z, " +
        "(CASE WHEN abs(r2.res / mo.sigma) > 3 THEN 1 ELSE 0 END)::INT " +
        "AS is_anomaly " +
        "FROM r2 JOIN mo ON mo.et = r2.event_type WHERE mo.sigma > 0 " +
        "ORDER BY r2.event_type, r2.day"),

    // Spark VARIANT path extraction == DuckDB JSON operators; payload
    // values are small ints, every cast exact
    "fn_variant_json" ->
      ("SELECT event_id, " +
        "json_extract(props, '$.k')::INT AS k_int, " +
        "json_extract_string(props, '$.k') AS k_str, " +
        "(json_extract(props, '$.k')::INT * 2) AS k_doubled " +
        "FROM events ORDER BY event_id"),

    // rolling 20-event z-score: exact integer sums over a fixed frame,
    // same moment algebra as feature_zscore_norm
    "ts_rolling_zscore" ->
      ("WITH e AS (SELECT event_id, user_id, ts, " +
        "floor(value * 100 + 0.5)::BIGINT AS xc FROM events), " +
        "w AS (SELECT event_id, user_id, xc, " +
        "row_number() OVER wo AS rn, " +
        "sum(xc) OVER wr AS s1, " +
        "sum(xc * xc) OVER wr AS s2 FROM e " +
        "WINDOW wo AS (PARTITION BY user_id " +
        "ORDER BY date_trunc('microseconds', ts), event_id), " +
        "wr AS (PARTITION BY user_id " +
        "ORDER BY date_trunc('microseconds', ts), event_id " +
        "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) " +
        "SELECT event_id, user_id, " +
        "floor((xc::DOUBLE - s1::DOUBLE / 2e1) / " +
        "sqrt((20 * s2 - s1 * s1)::DOUBLE / 3.8e2) " +
        "* 10000 + 0.5) / 10000.0 AS z_roll " +
        "FROM w WHERE rn >= 20 AND (20 * s2 - s1 * s1) > 0 " +
        "ORDER BY user_id, event_id"),

    // component-size histogram over the same recursive-CTE closure the
    // dedup_cluster_cc twin uses
    // multi-source BFS hop distances, 12-hop cap carried by the
    // recursion guard (dist < 12) — same bound as the frontier loop;
    // UNION dedups (p, dist) pairs so the capped recursion terminates
    "graph_bfs_frontier" ->
      ("WITH RECURSIVE dl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2 " +
        "FROM dl a JOIN dl b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "ed AS (SELECT p1 AS src, p2 AS dst FROM e " +
        "UNION ALL SELECT p2, p1 FROM e), " +
        "bfs(p, dist) AS (SELECT DISTINCT src, 0 FROM ed WHERE src % 50 = 0 " +
        "UNION SELECT ed.dst, b.dist + 1 FROM bfs b " +
        "JOIN ed ON ed.src = b.p WHERE b.dist < 12) " +
        "SELECT p, min(dist)::INT AS dist FROM bfs GROUP BY p ORDER BY p"),

    "graph_cc_sizes" ->
      ("WITH RECURSIVE pairs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id " +
        "WHERE floor((list_sum(list_transform(range(1, 65), " +
        "i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))) * 10000 + 0.5) / 10000.0 >= 0.3), " +
        "edges AS (SELECT a_id AS src, b_id AS dst FROM pairs " +
        "UNION ALL SELECT b_id, a_id FROM pairs), " +
        "reach(v, l) AS (SELECT vec_id, vec_id FROM embeddings " +
        "UNION SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.v), " +
        "cl AS (SELECT v, min(l) AS cluster_id FROM reach GROUP BY v), " +
        "cs AS (SELECT cluster_id, count(*) AS csize FROM cl GROUP BY 1) " +
        "SELECT csize, count(*) AS n_clusters FROM cs GROUP BY 1 " +
        "ORDER BY csize"),

    // per-doc novelty: shingles first seen here / all shingles
    "text_ngram_novelty" ->
      ("WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
        "s AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
        "range(0, len(ws) - 2), i -> array_to_string(ws[i+1:i+3], ' ')))) AS sh " +
        "FROM d WHERE len(ws) >= 3), " +
        "o AS (SELECT sh, min(doc_id) AS first_doc FROM s GROUP BY 1) " +
        "SELECT doc_id, count(*) AS n_shingles, " +
        "count(*) FILTER (WHERE first_doc = doc_id) AS n_novel, " +
        "floor((count(*) FILTER (WHERE first_doc = doc_id))::DOUBLE / " +
        "count(*)::DOUBLE * 1000000 + 0.5) / 1000000.0 AS novelty " +
        "FROM s JOIN o USING (sh) GROUP BY doc_id ORDER BY doc_id"),

    // quantity-weighted mean price from exact integer product sums
    "agg_weighted_mean" ->
      ("WITH b AS (SELECT l_returnflag, l_quantity::BIGINT AS q, " +
        "floor(l_extendedprice * 100 + 0.5)::BIGINT AS pc FROM lineitem), " +
        "g AS (SELECT l_returnflag, sum(q) AS sq, sum(q * pc) AS sqp " +
        "FROM b GROUP BY 1) " +
        "SELECT l_returnflag, " +
        "floor(sqp::DOUBLE / sq::DOUBLE / 1e2 * 10000 + 0.5) / 10000.0 " +
        "AS wavg_price FROM g ORDER BY l_returnflag"),

    // inter-arrival gaps in whole seconds (floor-second epochs, the
    // sessionization convention); exact integer mean
    "ts_interarrival_stats" ->
      ("WITH e AS (SELECT user_id, " +
        "floor(epoch(ts))::BIGINT AS es, ts, event_id FROM events), " +
        "g AS (SELECT user_id, es - lag(es, 1) OVER " +
        "(PARTITION BY user_id " +
        "ORDER BY date_trunc('microseconds', ts), event_id) AS gap_s FROM e) " +
        "SELECT user_id, count(*) AS n_gaps, " +
        "floor(sum(gap_s)::DOUBLE / count(*)::DOUBLE * 10000 + 0.5) " +
        "/ 10000.0 AS mean_gap_s, max(gap_s) AS max_gap_s " +
        "FROM g WHERE gap_s IS NOT NULL GROUP BY user_id ORDER BY user_id"),

    // bag-semantics set ops (frequency-preserving)
    "set_intersect_all" ->
      ("SELECT user_id FROM events WHERE event_type = 'click' " +
        "INTERSECT ALL " +
        "SELECT user_id FROM events WHERE event_type = 'purchase' " +
        "ORDER BY user_id"),

    "set_except_all" ->
      ("SELECT user_id FROM events WHERE event_type = 'click' " +
        "EXCEPT ALL " +
        "SELECT user_id FROM events WHERE event_type = 'purchase' " +
        "ORDER BY user_id"),

    // cumulative quality-gate funnel: conditional counters over one scan
    "pipeline_quality_funnel" ->
      ("WITH w AS (SELECT string_split(text, ' ') AS ws, text " +
        "FROM documents), " +
        "g AS (SELECT count(*) AS n0, " +
        "count(*) FILTER (WHERE len(ws) >= 20) AS n1, " +
        "count(*) FILTER (WHERE len(ws) >= 20 AND " +
        "len(list_distinct(ws))::DOUBLE / len(ws)::DOUBLE >= 0.5) AS n2, " +
        "count(*) FILTER (WHERE len(ws) >= 20 AND " +
        "len(list_distinct(ws))::DOUBLE / len(ws)::DOUBLE >= 0.5 AND " +
        "regexp_matches(text, '[.!?]')) AS n3 FROM w), " +
        "v AS (SELECT * FROM (VALUES (0, 'ingest'), (1, 'min_length_20'), " +
        "(2, 'ttr_0.5'), (3, 'has_sentence_punct')) AS t(stage, gate)), " +
        "f AS (SELECT v.stage, v.gate, CASE v.stage WHEN 0 THEN g.n0 " +
        "WHEN 1 THEN g.n1 WHEN 2 THEN g.n2 ELSE g.n3 END AS n_docs " +
        "FROM v, g) " +
        "SELECT stage, gate, n_docs, " +
        "coalesce(lag(n_docs) OVER (ORDER BY stage) - n_docs, 0)::BIGINT " +
        "AS n_dropped FROM f ORDER BY stage"),

    // several COUNT(DISTINCT ...) keys in one aggregate; tuple distinct
    // via a collision-free concat (int64 user_id, '#' separator)
    "agg_distinct_multi" ->
      ("SELECT event_type, count(DISTINCT user_id) AS d_users, " +
        "count(DISTINCT date_trunc('day', ts)) AS d_days, " +
        "count(DISTINCT user_id::VARCHAR || '#' || " +
        "date_trunc('day', ts)::DATE::VARCHAR) AS d_user_days, " +
        "count(*) AS n FROM events GROUP BY event_type " +
        "ORDER BY event_type"),

    // NOT IN over a nullable inner column — null-aware anti semantics
    "sql_subquery_not_in" ->
      ("SELECT c_custkey, c_name FROM customer c WHERE c_custkey NOT IN (" +
        "SELECT nullif(o.o_custkey, -1) FROM orders o " +
        "WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 100000.0) " +
        "ORDER BY c_custkey"),

    // click→view→purchase completion latency in exact integer µs;
    // min() commutes with µs-truncation (monotonic), so truncating the
    // ns anchors matches Spark's truncate-then-min exactly
    "funnel_time_to_convert" ->
      ("WITH c AS (SELECT user_id, min(ts) AS t1 FROM events " +
        "WHERE event_type = 'click' GROUP BY user_id), " +
        "v AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e " +
        "JOIN c ON e.user_id = c.user_id " +
        "WHERE e.event_type = 'view' AND date_trunc('microseconds', e.ts) > " +
        "date_trunc('microseconds', c.t1) GROUP BY e.user_id), " +
        "p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e " +
        "JOIN v ON e.user_id = v.user_id " +
        "WHERE e.event_type = 'purchase' AND date_trunc('microseconds', e.ts) > " +
        "date_trunc('microseconds', v.t2) GROUP BY e.user_id) " +
        "SELECT p.user_id, date_diff('microseconds', " +
        "date_trunc('microseconds', c.t1), " +
        "date_trunc('microseconds', p.t3))::BIGINT AS us_to_convert " +
        "FROM p JOIN c ON p.user_id = c.user_id ORDER BY p.user_id"),

    // null-safe equality join: NULL key groups pair up (IS NOT DISTINCT
    // FROM); sentinel substitution happens only in the output
    "join_null_safe" ->
      ("WITH base AS (SELECT CASE WHEN event_type = 'click' THEN NULL " +
        "ELSE event_type END AS etype, " +
        "date_trunc('day', ts)::TIMESTAMP AS day, " +
        "value FROM events), " +
        "a AS (SELECT day, etype, count(*) AS n_all FROM base " +
        "GROUP BY 1, 2), " +
        "b AS (SELECT day, etype, count(*) AS n_big FROM base " +
        "WHERE value > 100.0 GROUP BY 1, 2) " +
        "SELECT a.day, coalesce(a.etype, '(null)') AS etype, a.n_all, " +
        "coalesce(b.n_big, 0) AS n_big FROM a LEFT JOIN b " +
        "ON a.day = b.day AND a.etype IS NOT DISTINCT FROM b.etype " +
        "ORDER BY 1, 2"),

    // EXISTS as a projected flag (existence join)
    "join_existence" ->
      ("SELECT c_custkey, " +
        "(EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_orderpriority = '1-URGENT' " +
        "AND o.o_totalprice > 100000.0))::INT AS has_urgent " +
        "FROM customer c ORDER BY c_custkey"),

    // -------------------------------------------- §2.21 drift monitors
    // All six share the calendar-half snapshot split (ts < 2024-01-16;
    // the ns-vs-µs read difference only matters within 1 µs of the
    // split, where truncation cannot flip the strict <). Cents snapping
    // + exact-integer accumulation; the floating chain mirrors the
    // Spark expressions op-for-op (§5.3).

    // PSI over reference-decile bins, edges derived arithmetically from
    // the histogram running count: bin = 1 + min(9, 10·|{ref<v}| // n)
    "drift_psi" ->
      ("WITH e AS (SELECT floor(value * 100 + 0.5)::BIGINT AS c, " +
        "(ts < TIMESTAMP '2024-01-16 00:00:00')::INT AS isr FROM events), " +
        "h AS (SELECT c, sum(isr)::BIGINT AS ca, sum(1 - isr)::BIGINT AS cb " +
        "FROM e GROUP BY 1), " +
        "w AS (SELECT c, ca, cb, sum(ca) OVER () AS na, " +
        "sum(cb) OVER () AS nb, " +
        "sum(ca) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW) - ca AS lt FROM h), " +
        "b AS (SELECT (1 + least(9, (10 * lt) // na))::BIGINT AS bin, " +
        "sum(ca)::BIGINT AS n_ref, sum(cb)::BIGINT AS n_cur, " +
        "max(na)::BIGINT AS na, max(nb)::BIGINT AS nb FROM w GROUP BY 1) " +
        "SELECT bin, n_ref, n_cur, " +
        "floor((n_ref::DOUBLE / na::DOUBLE - n_cur::DOUBLE / nb::DOUBLE) * " +
        "ln((n_ref * nb)::DOUBLE / (n_cur * na)::DOUBLE) " +
        "* 1000000 + 0.5) / 1000000.0 AS psi_term " +
        "FROM b WHERE n_ref > 0 AND n_cur > 0 ORDER BY bin"),

    // two-sample KS: integer cross-multiplied sup, one divide at the end
    "drift_ks" ->
      ("WITH e AS (SELECT event_type, floor(value * 100 + 0.5)::BIGINT AS c, " +
        "(ts < TIMESTAMP '2024-01-16 00:00:00')::INT AS isr FROM events), " +
        "h AS (SELECT event_type, c, sum(isr)::BIGINT AS ca, " +
        "sum(1 - isr)::BIGINT AS cb FROM e GROUP BY 1, 2), " +
        "w AS (SELECT event_type, c, ca, cb, " +
        "sum(ca) OVER (PARTITION BY event_type ORDER BY c ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma, " +
        "sum(cb) OVER (PARTITION BY event_type ORDER BY c ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb, " +
        "sum(ca) OVER (PARTITION BY event_type) AS na, " +
        "sum(cb) OVER (PARTITION BY event_type) AS nb FROM h), " +
        "m AS (SELECT event_type, c, na, nb, " +
        "abs(cuma * nb - cumb * na) AS dnum, " +
        "max(abs(cuma * nb - cumb * na)) OVER (PARTITION BY event_type) " +
        "AS mx FROM w) " +
        "SELECT event_type, max(na)::BIGINT AS n_ref, " +
        "max(nb)::BIGINT AS n_cur, " +
        "floor(max(dnum)::DOUBLE / max(na * nb)::DOUBLE " +
        "* 1000000 + 0.5) / 1000000.0 AS d, " +
        "min(CASE WHEN dnum = mx THEN c END)::BIGINT AS d_at_cents " +
        "FROM m GROUP BY 1 ORDER BY 1"),

    // blocked fuzzy self-match on the DISTINCT-name table (vocabulary²,
    // not rows²); levenshtein is exact in both engines, ::INT pins
    // Spark's IntegerType
    "join_fuzzy_name" ->
      ("WITH n AS (SELECT p_name, count(*)::BIGINT AS n, " +
        "split_part(p_name, ' ', -1) AS blk FROM part GROUP BY 1) " +
        "SELECT a.p_name AS name_a, b.p_name AS name_b, " +
        "levenshtein(a.p_name, b.p_name)::INT AS dist, " +
        "a.n AS n_a, b.n AS n_b " +
        "FROM n a JOIN n b ON a.blk = b.blk AND a.p_name < b.p_name " +
        "AND levenshtein(a.p_name, b.p_name) <= 4 " +
        "ORDER BY name_a, name_b"),

    // interpolated Kneser–Ney bigram NLL: the four KN statistics stack
    // as windows on the bigram TYPE table; per-bigram NLL snaps to the
    // 1e-6 grid before the per-doc sum (order-independent)
    "text_lm_kneser_ney" ->
      ("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws " +
        "FROM documents WHERE len(string_split(text, ' ')) >= 2), " +
        "p AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)), " +
        "i -> ws[i] || ' ' || ws[i + 1])) AS bg FROM w), " +
        "s AS (SELECT doc_id, split_part(bg, ' ', 1) AS a, " +
        "split_part(bg, ' ', 2) AS b FROM p), " +
        "t AS (SELECT a, b, count(*)::BIGINT AS n_ab FROM s GROUP BY 1, 2), " +
        "m AS (SELECT a, b, n_ab, sum(n_ab) OVER (PARTITION BY a) AS n_a, " +
        "count(*) OVER (PARTITION BY a) AS n1f_a, " +
        "count(*) OVER (PARTITION BY b) AS n1p_b, " +
        "count(*) OVER () AS tt FROM t), " +
        "q AS (SELECT a, b, floor(-ln((n_ab::DOUBLE - 0.75) / n_a::DOUBLE " +
        "+ 0.75 * n1f_a::DOUBLE / n_a::DOUBLE * " +
        "(n1p_b::DOUBLE / tt::DOUBLE)) * 1000000 + 0.5)::BIGINT AS nll_u " +
        "FROM m), " +
        "u AS (SELECT s.doc_id, count(*)::BIGINT AS n_bigrams, " +
        "sum(q.nll_u)::BIGINT AS snll FROM s " +
        "JOIN q ON s.a = q.a AND s.b = q.b GROUP BY 1) " +
        "SELECT doc_id, n_bigrams, " +
        "floor(snll::DOUBLE / 1000000.0 / n_bigrams::DOUBLE " +
        "* 10000 + 0.5) / 10000.0 AS kn_nll FROM u ORDER BY doc_id"),

    // single change point per type: integer argmax of |n·S_t − t·S_n|
    // over the observed hourly sums, smallest t on ties
    "ts_changepoint" ->
      ("WITH e AS (SELECT event_type, " +
        "floor(epoch(ts))::BIGINT // 3600 AS h, " +
        "floor(value * 100 + 0.5)::BIGINT AS c FROM events), " +
        "hh AS (SELECT event_type, h, sum(c)::BIGINT AS sx FROM e " +
        "GROUP BY 1, 2), " +
        "w AS (SELECT event_type, h, sx, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY h)::BIGINT " +
        "AS i, " +
        "sum(sx) OVER (PARTITION BY event_type ORDER BY h ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum, " +
        "count(*) OVER (PARTITION BY event_type) AS n, " +
        "sum(sx) OVER (PARTITION BY event_type)::BIGINT AS sn FROM hh), " +
        "g AS (SELECT *, CASE WHEN i < n THEN abs(n * cum - i * sn) END " +
        "AS g FROM w WHERE n >= 2), " +
        "m AS (SELECT *, max(g) OVER (PARTITION BY event_type) AS mx " +
        "FROM g), " +
        "t AS (SELECT *, min(CASE WHEN g = mx THEN i END) OVER " +
        "(PARTITION BY event_type) AS ti FROM m) " +
        "SELECT event_type, n::BIGINT AS n_hours, i AS split_t, " +
        "h AS split_hour_epoch, " +
        "floor(cum::DOUBLE / i::DOUBLE / 100.0 * 10000 + 0.5) / 10000.0 " +
        "AS mean_before, " +
        "floor((sn - cum)::DOUBLE / (n - i)::DOUBLE / 100.0 " +
        "* 10000 + 0.5) / 10000.0 AS mean_after " +
        "FROM t WHERE i = ti ORDER BY event_type"),

    // DFT power at harmonics 1..8 of the 720-hour span: per-term 1e-4
    // grid snap before summing (order-independent integer accumulation;
    // the seq_markov_perplexity trick applied to trig terms). The trig
    // argument is built with the same op order both sides (2·pi/720,
    // then ·k, then ·t) so cos/sin see identical doubles.
    "ts_periodogram" ->
      ("WITH hr AS (SELECT floor(epoch(ts))::BIGINT // 3600 - 473352 AS t, " +
        "count(*)::BIGINT AS x FROM events GROUP BY 1), " +
        "h AS (SELECT k, t, x FROM hr CROSS JOIN " +
        "(SELECT unnest(range(1, 9)) AS k)), " +
        "q AS (SELECT k, " +
        "floor(x * cos((2 * pi() / 720) * k * t) * 1e4 + 0.5)::BIGINT AS cq, " +
        "floor(x * sin((2 * pi() / 720) * k * t) * 1e4 + 0.5)::BIGINT AS sq " +
        "FROM h), " +
        "g AS (SELECT k, sum(cq)::BIGINT AS sc, sum(sq)::BIGINT AS ss " +
        "FROM q GROUP BY 1) " +
        "SELECT k::INT AS k, " +
        "floor(((sc::DOUBLE / 1e4) * (sc::DOUBLE / 1e4) + " +
        "(ss::DOUBLE / 1e4) * (ss::DOUBLE / 1e4)) / (720.0 * 720) " +
        "* 1000000 + 0.5) / 1000000.0 AS power " +
        "FROM g ORDER BY k"),

    // Wasserstein-1: exact integer grid sum Σ|cumA·nb − cumB·na|·gap
    // (telescopes inside 2^53), one divide to dollar units
    "drift_emd" ->
      ("WITH e AS (SELECT event_type, floor(value * 100 + 0.5)::BIGINT AS c, " +
        "(ts < TIMESTAMP '2024-01-16 00:00:00')::INT AS isr FROM events), " +
        "h AS (SELECT event_type, c, sum(isr)::BIGINT AS ca, " +
        "sum(1 - isr)::BIGINT AS cb FROM e GROUP BY 1, 2), " +
        "w AS (SELECT event_type, c, ca, cb, " +
        "sum(ca) OVER (PARTITION BY event_type ORDER BY c ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma, " +
        "sum(cb) OVER (PARTITION BY event_type ORDER BY c ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb, " +
        "sum(ca) OVER (PARTITION BY event_type) AS na, " +
        "sum(cb) OVER (PARTITION BY event_type) AS nb, " +
        "coalesce(lead(c, 1) OVER (PARTITION BY event_type ORDER BY c) " +
        "- c, 0) AS gap FROM h) " +
        "SELECT event_type, max(na)::BIGINT AS n_ref, " +
        "max(nb)::BIGINT AS n_cur, " +
        "floor(sum(abs(cuma * nb - cumb * na) * gap)::DOUBLE / " +
        "max(na * nb)::DOUBLE / 100.0 * 1000000 + 0.5) / 1000000.0 AS emd " +
        "FROM w GROUP BY 1 ORDER BY 1"),

    // chi-square homogeneity: per-type (o−e)²/e over both cells, exact
    // integer numerators ((o·g − rowt·colt)², every product ≤ 2^53)
    "drift_chi2" ->
      ("WITH e AS (SELECT event_type, " +
        "(ts < TIMESTAMP '2024-01-16 00:00:00')::INT AS isr FROM events), " +
        "t AS (SELECT event_type, sum(isr)::BIGINT AS oa, " +
        "sum(1 - isr)::BIGINT AS ob FROM e GROUP BY 1), " +
        "w AS (SELECT event_type, oa, ob, sum(oa) OVER ()::BIGINT AS na, " +
        "sum(ob) OVER ()::BIGINT AS nb FROM t) " +
        "SELECT event_type, oa AS n_ref, ob AS n_cur, " +
        "floor(((oa * (na + nb) - (oa + ob) * na)::DOUBLE * " +
        "(oa * (na + nb) - (oa + ob) * na)::DOUBLE / " +
        "((oa + ob) * na * (na + nb))::DOUBLE + " +
        "(ob * (na + nb) - (oa + ob) * nb)::DOUBLE * " +
        "(ob * (na + nb) - (oa + ob) * nb)::DOUBLE / " +
        "((oa + ob) * nb * (na + nb))::DOUBLE) " +
        "* 1000000 + 0.5) / 1000000.0 AS chi2_term " +
        "FROM w ORDER BY event_type"),

    // Jensen–Shannon terms of the categorical type mix
    "drift_js" ->
      ("WITH e AS (SELECT event_type, " +
        "(ts < TIMESTAMP '2024-01-16 00:00:00')::INT AS isr FROM events), " +
        "t AS (SELECT event_type, sum(isr)::BIGINT AS oa, " +
        "sum(1 - isr)::BIGINT AS ob FROM e GROUP BY 1), " +
        "w AS (SELECT event_type, oa, ob, sum(oa) OVER ()::BIGINT AS na, " +
        "sum(ob) OVER ()::BIGINT AS nb FROM t) " +
        "SELECT event_type, oa AS n_ref, ob AS n_cur, " +
        "floor((0.5 * (oa::DOUBLE / na::DOUBLE) * " +
        "ln((oa::DOUBLE / na::DOUBLE) / " +
        "((oa::DOUBLE / na::DOUBLE + ob::DOUBLE / nb::DOUBLE) / 2.0)) + " +
        "0.5 * (ob::DOUBLE / nb::DOUBLE) * " +
        "ln((ob::DOUBLE / nb::DOUBLE) / " +
        "((oa::DOUBLE / na::DOUBLE + ob::DOUBLE / nb::DOUBLE) / 2.0))) " +
        "* 1000000 + 0.5) / 1000000.0 AS js_term " +
        "FROM w ORDER BY event_type"),

    // Mann–Whitney: mid-ranks via the 2× integer scaling (rank2 =
    // 2·|{<v}| + cnt + 1); U's /2 is an exact binary halving
    "drift_mann_whitney" ->
      ("WITH e AS (SELECT event_type, floor(value * 100 + 0.5)::BIGINT AS c, " +
        "(ts < TIMESTAMP '2024-01-16 00:00:00')::INT AS isr FROM events), " +
        "h AS (SELECT event_type, c, sum(isr)::BIGINT AS ca, " +
        "sum(1 - isr)::BIGINT AS cb FROM e GROUP BY 1, 2), " +
        "w AS (SELECT event_type, ca, cb, (ca + cb) AS cc, " +
        "2 * (sum(ca + cb) OVER (PARTITION BY event_type ORDER BY c " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (ca + cb)) " +
        "+ (ca + cb) + 1 AS rank2 FROM h), " +
        "g AS (SELECT event_type, sum(ca)::BIGINT AS n_a, " +
        "sum(cb)::BIGINT AS n_b, sum(ca * rank2)::BIGINT AS ra2, " +
        "sum(cc * cc * cc - cc)::BIGINT AS ties FROM w GROUP BY 1) " +
        "SELECT event_type, n_a AS n_ref, n_b AS n_cur, " +
        "floor((ra2 - n_a * (n_a + 1))::DOUBLE / 2.0 * 10 + 0.5) / 10.0 " +
        "AS u, " +
        "floor(((ra2 - n_a * (n_a + 1))::DOUBLE / 2.0 - " +
        "(n_a * n_b)::DOUBLE / 2.0) / " +
        "sqrt((n_a * n_b)::DOUBLE / 12.0 * " +
        "((n_a + n_b + 1)::DOUBLE - " +
        "ties::DOUBLE / ((n_a + n_b) * (n_a + n_b - 1))::DOUBLE)) " +
        "* 1000000 + 0.5) / 1000000.0 AS z " +
        "FROM g ORDER BY 1"),

    // Welch's t: integer floor-mean centering keeps every sum < 2^53;
    // the Welch–Satterthwaite df mirrors the Spark chain op-for-op
    "drift_ttest_welch" ->
      ("WITH e AS (SELECT event_type, " +
        "(ts < TIMESTAMP '2024-01-16 00:00:00')::INT AS isr, " +
        "floor(value * 100 + 0.5)::BIGINT AS c FROM events), " +
        "w AS (SELECT event_type, isr, c, " +
        "((sum(c) OVER (PARTITION BY event_type, isr)) // " +
        "(count(*) OVER (PARTITION BY event_type, isr)))::BIGINT AS m0 " +
        "FROM e), " +
        "g AS (SELECT event_type, isr, count(*)::BIGINT AS n, " +
        "max(m0)::BIGINT AS m0, sum(c - m0)::BIGINT AS sd, " +
        "sum((c - m0) * (c - m0))::BIGINT AS sdd FROM w GROUP BY 1, 2), " +
        "v AS (SELECT event_type, isr, n, " +
        "m0::DOUBLE + sd::DOUBLE / n::DOUBLE AS mean_c, " +
        "(sdd::DOUBLE - sd::DOUBLE * sd::DOUBLE / n::DOUBLE) / " +
        "(n - 1)::DOUBLE AS s2 FROM g), " +
        "p AS (SELECT event_type, " +
        "max(CASE WHEN isr = 1 THEN n END)::BIGINT AS n_ref, " +
        "max(CASE WHEN isr = 0 THEN n END)::BIGINT AS n_cur, " +
        "max(CASE WHEN isr = 1 THEN mean_c END) AS ma, " +
        "max(CASE WHEN isr = 0 THEN mean_c END) AS mb, " +
        "max(CASE WHEN isr = 1 THEN s2 END) AS va, " +
        "max(CASE WHEN isr = 0 THEN s2 END) AS vb FROM v GROUP BY 1) " +
        "SELECT event_type, n_ref, n_cur, " +
        "floor(ma / 100.0 * 10000 + 0.5) / 10000.0 AS mean_ref, " +
        "floor(mb / 100.0 * 10000 + 0.5) / 10000.0 AS mean_cur, " +
        "floor((ma - mb) / sqrt(va / n_ref::DOUBLE + vb / n_cur::DOUBLE) " +
        "* 1000000 + 0.5) / 1000000.0 AS t, " +
        "floor((va / n_ref::DOUBLE + vb / n_cur::DOUBLE) * " +
        "(va / n_ref::DOUBLE + vb / n_cur::DOUBLE) / " +
        "((va / n_ref::DOUBLE) * (va / n_ref::DOUBLE) / " +
        "(n_ref - 1)::DOUBLE + " +
        "(vb / n_cur::DOUBLE) * (vb / n_cur::DOUBLE) / " +
        "(n_cur - 1)::DOUBLE) * 10000 + 0.5) / 10000.0 AS df " +
        "FROM p ORDER BY event_type"),

    // per-day PSI of the current half vs the reference half — the
    // streaming monitor's batch twin: interval bins from the same
    // arithmetic edge rule (unnest(range) recovers edge ranks), per-day
    // normalization over ALL populated bins (left join before the
    // filter, mirroring the Spark coalesce-0 shape)
    "stream_drift_psi" ->
      ("WITH e AS (SELECT floor(value * 100 + 0.5)::BIGINT AS c, ts " +
        "FROM events), " +
        "r AS (SELECT c, count(*)::BIGINT AS ca FROM e " +
        "WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1), " +
        "h AS (SELECT c, ca, sum(ca) OVER (ORDER BY c ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
        "sum(ca) OVER () AS na FROM r), " +
        "hb AS (SELECT c, ca, cum, na, cum - ca AS prev, " +
        "(1 + least(9, (10 * (cum - ca)) // na)) AS bin FROM h), " +
        "pb AS (SELECT bin, sum(ca)::BIGINT AS n_ref, " +
        "max(na)::BIGINT AS na FROM hb GROUP BY 1), " +
        "ed AS (SELECT unnest(range(((10 * prev) // na + 1)::BIGINT, " +
        "(least(9, (10 * cum) // na) + 1)::BIGINT)) AS bn, c FROM hb " +
        "WHERE (10 * prev) // na + 1 <= least(9, (10 * cum) // na)), " +
        "iv AS (SELECT bin, lo.lo AS lo, hi.hi AS hi FROM " +
        "(SELECT bn AS bin, c AS hi FROM ed) hi FULL JOIN " +
        "(SELECT bn + 1 AS bin, c AS lo FROM ed) lo USING (bin)), " +
        "cur AS (SELECT date_trunc('day', ts) AS day_start, c FROM e " +
        "WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'), " +
        "j AS (SELECT cur.day_start, iv.bin FROM cur JOIN iv ON " +
        "cur.c > coalesce(iv.lo, -9223372036854775808) AND " +
        "cur.c <= coalesce(iv.hi, 9223372036854775807)), " +
        "g AS (SELECT day_start, bin, count(*)::BIGINT AS n_cur FROM j " +
        "GROUP BY 1, 2), " +
        "t AS (SELECT g.day_start, g.bin, " +
        "coalesce(pb.n_ref, 0)::BIGINT AS n_ref, g.n_cur, pb.na, " +
        "sum(g.n_cur) OVER (PARTITION BY g.day_start) AS nb " +
        "FROM g LEFT JOIN pb USING (bin)) " +
        "SELECT day_start, bin::BIGINT AS bin, n_ref, n_cur, " +
        "floor((n_ref::DOUBLE / na::DOUBLE - n_cur::DOUBLE / nb::DOUBLE) * " +
        "ln((n_ref * nb)::DOUBLE / (n_cur * na)::DOUBLE) " +
        "* 1000000 + 0.5) / 1000000.0 AS psi_term " +
        "FROM t WHERE n_ref > 0 ORDER BY day_start, bin"),

    // rolling Pearson corr of cents vs the JSON k field: five exact
    // integer frame sums, zero-variance excluded by the integer test
    "win_rolling_corr" ->
      ("WITH e AS (SELECT user_id, event_id, ts, " +
        "floor(value * 100 + 0.5)::BIGINT AS x, " +
        "json_extract_string(props, '$.k')::BIGINT AS y FROM events), " +
        "w AS (SELECT user_id, event_id, " +
        "row_number() OVER win AS i, " +
        "sum(x) OVER winf AS sx, sum(y) OVER winf AS sy, " +
        "sum(x * x) OVER winf AS sxx, sum(y * y) OVER winf AS syy, " +
        "sum(x * y) OVER winf AS sxy " +
        "FROM e WINDOW win AS (PARTITION BY user_id ORDER BY " +
        "date_trunc('microseconds', ts), event_id), " +
        "winf AS (win ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)) " +
        "SELECT user_id, event_id, " +
        "floor((30 * sxy - sx * sy)::DOUBLE / " +
        "sqrt((30 * sxx - sx * sx)::DOUBLE * " +
        "(30 * syy - sy * sy)::DOUBLE) * 1000000 + 0.5) / 1000000.0 " +
        "AS rolling_corr " +
        "FROM w WHERE i >= 30 AND (30 * sxx - sx * sx) > 0 " +
        "AND (30 * syy - sy * sy) > 0 ORDER BY user_id, event_id"),

    // rolling median on cents (interpolation position 14.5 is exact
    // IEEE for int cents); µs-truncated order, full windows only
    "win_rolling_median" ->
      ("WITH e AS (SELECT user_id, event_id, ts, " +
        "floor(value * 100 + 0.5)::BIGINT AS xc FROM events), " +
        "w AS (SELECT user_id, event_id, " +
        "row_number() OVER win AS i, " +
        "quantile_cont(xc, 0.5) OVER (win ROWS BETWEEN 29 PRECEDING AND " +
        "CURRENT ROW) AS med " +
        "FROM e WINDOW win AS (PARTITION BY user_id ORDER BY " +
        "date_trunc('microseconds', ts), event_id)) " +
        "SELECT user_id, event_id, " +
        "floor(med / 100.0 * 10000 + 0.5) / 10000.0 AS rolling_median " +
        "FROM w WHERE i >= 30 ORDER BY user_id, event_id"),

    // rolling OLS slope: shifting-origin trick turns the moving
    // regression into two windowed integer sums (Σx/Σx² are the
    // constants 465/9455 ⇒ denominator 67425); µs-truncated order
    "win_ols_slope" ->
      ("WITH e AS (SELECT user_id, event_id, ts, " +
        "floor(value * 100 + 0.5)::BIGINT AS c FROM events), " +
        "w AS (SELECT user_id, event_id, c, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY " +
        "date_trunc('microseconds', ts), event_id)::BIGINT AS i FROM e), " +
        "f AS (SELECT user_id, event_id, i, " +
        "sum(c) OVER win AS sy, sum(i * c) OVER win AS siy " +
        "FROM w WINDOW win AS (PARTITION BY user_id ORDER BY i " +
        "ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)) " +
        "SELECT user_id, event_id, " +
        "floor((30 * (siy - (i - 30) * sy) - 465 * sy)::DOUBLE " +
        "/ 67425.0 / 100.0 * 1000000 + 0.5) / 1000000.0 AS slope " +
        "FROM f WHERE i >= 30 ORDER BY user_id, event_id"),

    // agg_custom_typed is deliberately NOT oracle-gated: Welford's parallel
    // merge order differs from a sequential avg(), and on decimal-grid
    // inputs the means land exactly on rounding boundaries (measured:
    // 58.55575 → 58.5557 vs 58.5558). ScalaTest asserts |welford - avg|
    // < 1e-9 instead.

    // -- round-11c governance audits (exact integer counts; the
    // -- l-diversity entropy terms use the drift_js snapped-ln recipe)
    "privacy_k_anonymity" ->
      ("SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment, " +
        "floor(c_acctbal / 1000)::BIGINT AS acctbal_band, " +
        "count(*) AS class_size, " +
        "(count(*) >= 5)::INT AS meets_k5 " +
        "FROM customer GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),

    "privacy_l_diversity" ->
      ("WITH cells AS (SELECT c_nationkey AS nationkey, " +
        "c_mktsegment AS mktsegment, " +
        "floor(c_acctbal / 1000)::BIGINT AS band, count(*) AS cnt " +
        "FROM customer GROUP BY 1, 2, 3), " +
        "w AS (SELECT nationkey, mktsegment, cnt, " +
        "sum(cnt) OVER (PARTITION BY nationkey, mktsegment)::BIGINT " +
        "AS class_size FROM cells) " +
        "SELECT nationkey, mktsegment, class_size, " +
        "count(*) AS l_distinct, " +
        "sum(floor(-(cnt::DOUBLE / class_size::DOUBLE) * " +
        "ln(cnt::DOUBLE / class_size::DOUBLE) * 1000000 + 0.5)::BIGINT) " +
        "/ 1000000.0 AS entropy_l " +
        "FROM w GROUP BY 1, 2, 3 ORDER BY 1, 2"),

    "sql_group_by_all" ->
      ("SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS day, " +
        "count(*) AS n_events, " +
        "sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents " +
        "FROM events GROUP BY ALL ORDER BY ALL"),

    // the text-lines roundtrip aggregates the ORIGINAL parquet here —
    // a hash match certifies the line codec end to end
    "source_text_lines" ->
      ("SELECT lang, count(*) AS n_docs, " +
        "sum(length(text))::BIGINT AS sum_chars, " +
        "max(doc_id) AS max_doc_id " +
        "FROM documents GROUP BY 1 ORDER BY 1"),
    )

    // The composed drift report reuses the seven gated monitor bodies
    // VERBATIM as subqueries — the composition itself is then hash-gated
    // against the same building blocks the Spark side unions.
    def shaped(metric: String, keyExpr: String, valueExpr: String,
        q: String): String =
      s"SELECT '$metric' AS metric, $keyExpr AS key, n_ref, n_cur, " +
        s"$valueExpr AS value FROM (${base(q)})"
    // The composed privacy report reuses the two gated audit bodies
    // VERBATIM as subqueries (pipeline_drift_report's recipe).
    val privacyReport =
      s"WITH k AS (${base("privacy_k_anonymity")}), " +
        s"l AS (${base("privacy_l_diversity")}), " +
        s"t2 AS (${base("privacy_t_closeness")}), " +
        "ka AS (SELECT mktsegment AS key, " +
        "min(class_size)::DOUBLE AS kanon_min_class, " +
        "sum((class_size < 5)::BIGINT)::DOUBLE AS kanon_violation_classes, " +
        "count(*)::DOUBLE AS kanon_total_classes FROM k GROUP BY 1), " +
        "la AS (SELECT mktsegment AS key, " +
        "min(l_distinct)::DOUBLE AS ldiv_min_l, " +
        "min(entropy_l) AS ldiv_min_entropy FROM l GROUP BY 1), " +
        "ta AS (SELECT mktsegment AS key, max(t) AS tclose_max_t FROM t2 GROUP BY 1) " +
        "SELECT 'kanon_min_class' AS metric, key, kanon_min_class AS value FROM ka " +
        "UNION ALL SELECT 'kanon_violation_classes', key, kanon_violation_classes FROM ka " +
        "UNION ALL SELECT 'kanon_total_classes', key, kanon_total_classes FROM ka " +
        "UNION ALL SELECT 'ldiv_min_l', key, ldiv_min_l FROM la " +
        "UNION ALL SELECT 'ldiv_min_entropy', key, ldiv_min_entropy FROM la " +
        "UNION ALL SELECT 'tclose_max_t', key, tclose_max_t FROM ta " +
        "ORDER BY metric, key"

    // CCNet buckets compose text_lm_score's body verbatim; tercile from
    // rank()−1 (exact strictly-better count in both engines), never an
    // interpolated percentile
    val perplexityBuckets =
      s"WITH s AS (${base("text_lm_score")}), " +
        "r AS (SELECT s.doc_id, d.lang, s.score, " +
        "rank() OVER (PARTITION BY d.lang ORDER BY s.score DESC) AS rk, " +
        "count(*) OVER (PARTITION BY d.lang) AS n_lang " +
        "FROM s JOIN documents d USING (doc_id)) " +
        "SELECT doc_id, lang, score, " +
        "(1 + least(2, floor(3 * (rk - 1) / n_lang)))::INT AS bucket, " +
        "CASE WHEN 1 + least(2, floor(3 * (rk - 1) / n_lang)) = 1 THEN 'head' " +
        "WHEN 1 + least(2, floor(3 * (rk - 1) / n_lang)) = 2 THEN 'middle' " +
        "ELSE 'tail' END AS tier " +
        "FROM r ORDER BY doc_id"

    // The composed dedup report reuses four gated dedup bodies VERBATIM
    def fracSql(f: String, n: String): String =
      s"floor($f::DOUBLE / $n::DOUBLE * 1000000 + 0.5) / 1000000.0"
    val dedupReport =
      s"WITH e AS (${base("dedup_exact_sha")}), " +
        s"p AS (${base("dedup_paragraph")}), " +
        s"g AS (${base("dedup_substring_kgram")}), " +
        s"j AS (${base("dedup_ngram_jaccard")}), " +
        s"cdc AS (${base("dedup_cdc_chunks")}), " +
        "x AS (SELECT a_id AS id, false AS isb FROM j " +
        "UNION ALL SELECT b_id, true FROM j) " +
        "SELECT 'cdc_chunk' AS method, sum(n_chunks)::DOUBLE AS n_units, " +
        "sum(dup_chunks)::DOUBLE AS flagged, " +
        fracSql("sum(dup_chunks)", "sum(n_chunks)") + " AS frac FROM cdc " +
        "UNION ALL SELECT 'exact_doc', sum(n_copies)::DOUBLE, " +
        "(sum(n_copies) - count(*))::DOUBLE AS flagged, " +
        fracSql("(sum(n_copies) - count(*))", "sum(n_copies)") + " AS frac FROM e " +
        "UNION ALL SELECT 'near_doc_jaccard', count(DISTINCT id)::DOUBLE, " +
        "count(DISTINCT CASE WHEN isb THEN id END)::DOUBLE, " +
        fracSql("count(DISTINCT CASE WHEN isb THEN id END)", "count(DISTINCT id)") + " FROM x " +
        "UNION ALL SELECT 'paragraph_seg', sum(n_seg)::DOUBLE, " +
        "sum(n_seg - n_kept)::DOUBLE, " +
        fracSql("sum(n_seg - n_kept)", "sum(n_seg)") + " FROM p " +
        "UNION ALL SELECT 'substring_window', sum(n_windows)::DOUBLE, " +
        "sum(dup_windows)::DOUBLE, " +
        fracSql("sum(dup_windows)", "sum(n_windows)") + " FROM g " +
        "ORDER BY method"

    base + ("pipeline_drift_report" -> (Seq(
      shaped("chi2", "event_type", "chi2_term", "drift_chi2"),
      shaped("emd", "event_type", "emd", "drift_emd"),
      shaped("js", "event_type", "js_term", "drift_js"),
      shaped("ks", "event_type", "d", "drift_ks"),
      shaped("mw", "event_type", "z", "drift_mann_whitney"),
      shaped("psi", "bin::VARCHAR", "psi_term", "drift_psi"),
      shaped("welch", "event_type", "t", "drift_ttest_welch"))
      .mkString(" UNION ALL ") + " ORDER BY metric, key")) +
      ("pipeline_privacy_report" -> privacyReport) +
      ("corpus_perplexity_buckets" -> perplexityBuckets) +
      ("pipeline_dedup_report" -> dedupReport)
  }
}
