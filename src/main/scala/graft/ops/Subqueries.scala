package graft.ops

import graft.{GraphModel, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery surface (scalar / IN / correlated) + recursive CTE.
  *
  * These run through `spark.sql` deliberately: the point is Catalyst's
  * decorrelation (RewriteCorrelatedScalarSubquery, IN → left-semi) and
  * the 4.x recursive-CTE execution (UnionLoop) — SURVEY.md §4.1 claims
  * made executable. Scalar thresholds use decimal-exact average
  * formulas so the comparison boundary is the identical double in both
  * engines.
  */
object Subqueries {

  private def t(spark: SparkSession, dir: String): Tables = {
    val tt = Tables(spark, dir)
    tt.orders.createOrReplaceTempView("graft_orders")
    tt.customer.createOrReplaceTempView("graft_customer")
    tt.nation.createOrReplaceTempView("graft_nation")
    tt
  }

  /** Orders above the global average price (uncorrelated scalar
    * subquery → one broadcast scalar). */
  def subqueryScalar(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql(
      """SELECT o_orderkey, o_totalprice FROM graft_orders
         WHERE o_totalprice > (
           SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  / COUNT(*) FROM graft_orders)
         ORDER BY o_orderkey""")
  }

  /** Customers in region 0's nations (IN-subquery → left-semi join). */
  def subqueryIn(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql(
      """SELECT c_custkey, c_name, c_nationkey FROM graft_customer
         WHERE c_nationkey IN (
           SELECT n_nationkey FROM graft_nation WHERE n_regionkey = 0)
         ORDER BY c_custkey""")
  }

  /** Orders above THEIR customer's average order value (correlated
    * scalar subquery → Catalyst decorrelates to aggregate + join). */
  def subqueryCorrelated(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM graft_orders o
         WHERE o_totalprice > (
           SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4)))
                       AS DOUBLE) / COUNT(*)
           FROM graft_orders o2 WHERE o2.o_custkey = o.o_custkey)
         ORDER BY o_orderkey""")
  }

  /** Min-hop reachability from the region-0 vertex over REVERSED edges
    * via WITH RECURSIVE (Spark 4.x UnionLoop execution) — the pure-SQL
    * twin of [[GraphOps.bfsKhop]], unbounded-frontier shape with a
    * depth guard. UNION ALL because Spark 4.1 does not yet support
    * UNION (distinct) inside a recursive CTE
    * ([UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE]) — so the working set
    * grows with the number of PATHS of length ≤ depth, not vertices.
    * Reverse traversal is tree-like here (each child has at most a
    * couple of parent paths) so that stays linear; on a multiplicative
    * graph at 100 TB use [[GraphOps.bfsKhop]], whose per-level
    * distinct + anti-join IS the deduplicated recursion. */
  def graphReachRecursive(spark: SparkSession, dir: String): DataFrame = {
    GraphModel.edgesCached(spark, dir)
      .createOrReplaceTempView("graft_edges")
    spark.sql(
      """WITH RECURSIVE reach(id, hop) AS (
           SELECT CAST(1000000000000 AS BIGINT), 0
           UNION ALL
           SELECT e.src, r.hop + 1
           FROM graft_edges e JOIN reach r ON e.dst = r.id
           WHERE r.hop < 3
         )
         SELECT id, CAST(min(hop) AS INT) AS hop FROM reach
         GROUP BY id ORDER BY hop, id""")
  }
}
