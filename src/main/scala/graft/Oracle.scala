package graft

import graft.ops.Det.{sqlAvg2, sqlSum2}

/** DuckDB oracle SQL, one entry per oracle-checkable key in
  * `SparkEntry.queries` (SURVEY.md §2). Written against bare table names;
  * the driver registers each parquet file under its table name.
  *
  * Determinism rules applied to every statement (SURVEY.md §7.5):
  * total ORDER BY over a unique key, decimal-exact sums rounded to 2dp
  * (see [[graft.ops.Det]]), timestamps truncated/cast where derived,
  * explicit NULLS FIRST to match Spark's asc-nulls-first default.
  */
object Oracle {

  val sql: Map[String, String] = Map(
    // lineitem has no unique key (dup (l_orderkey,l_linenumber) pairs) →
    // ORDER BY ALL output columns, matching the Spark side's totalOrder.
    "scan_parquet" ->
      "SELECT * FROM lineitem ORDER BY ALL",

    "scan_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         ORDER BY ALL""",

    "scan_pruned_filter" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
         WHERE l_shipdate < TIMESTAMP '1996-01-01'
         ORDER BY ALL""",

    "filter_predicate" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
         FROM lineitem
         WHERE (l_quantity BETWEEN 10 AND 20 OR l_returnflag IN ('A','R'))
           AND NOT (l_discount > 0.05) AND l_linestatus = 'F'
         ORDER BY ALL""",

    "filter_like_regexp" ->
      """SELECT p_partkey, p_name, p_brand, p_type FROM part
         WHERE p_name LIKE '%widget%'
           AND regexp_matches(p_type, '^(ECONOMY|PROMO)$')
         ORDER BY p_partkey""",

    "filter_null_semantics" ->
      """SELECT o.o_orderkey,
                (t.tp IS NULL) AS was_pending,
                (t.tp IS NOT NULL) AS matched,
                (t.tp IS NOT DISTINCT FROM o.o_totalprice) AS price_eq_nullsafe
         FROM orders o
         LEFT JOIN (SELECT o_orderkey AS ok, o_totalprice AS tp
                    FROM orders WHERE o_orderstatus <> 'P') t
           ON o.o_orderkey = t.ok
         ORDER BY o.o_orderkey""",

    "project_case_when" ->
      """SELECT o_orderkey,
                CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 200000 THEN 'medium'
                     WHEN o_orderstatus = 'F' THEN 'large_final'
                     ELSE 'large_open' END AS bucket
         FROM orders ORDER BY o_orderkey""",

    "graph_traverse_3hop_agg" ->
      s"""SELECT r_name, n_name, count(*) AS n_orders,
                 ${sqlSum2("o_totalprice")} AS revenue
          FROM region
          JOIN nation ON n_regionkey = r_regionkey
          JOIN customer ON c_nationkey = n_nationkey
          JOIN orders ON o_custkey = c_custkey
          GROUP BY r_name, n_name
          ORDER BY r_name, n_name"""
  )
}
