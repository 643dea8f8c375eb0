package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.6 sorts, limits, top-k, and set operations.
  *
  * `limitTopkGlobal` plans as TakeOrderedAndProject (per-partition heap +
  * driver merge of k rows) — no global sort at any scale. Set ops map to
  * Spark's native union/intersect/except, which plan as hash aggregates /
  * semi-joins on the shuffled key, the same shape a 100 TB de-dup union
  * needs.
  */
object SetOps {

  /** ORDER BY three keys, mixed direction, explicit NULLS FIRST. The
    * corpus has no NULLs, so nullif() injects them ('P' status → NULL)
    * to make null-ordering observable. */
  def sortMultikey(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("P")).as("status_nn"),
        col("o_orderpriority"), col("o_totalprice"))
      .orderBy(col("status_nn").desc_nulls_first,
        col("o_orderpriority").asc, col("o_orderkey").desc)

  /** Global top-10 by price — TakeOrderedAndProject, not a full sort. */
  def limitTopkGlobal(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** UNION ALL of the customer and supplier account views (schema
    * aligned by name). */
  def setUnionAll(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val c = t.customer.select(lit("customer").as("kind"),
      col("c_custkey").as("id"), col("c_name").as("name"),
      col("c_acctbal").as("acctbal"))
    val s = t.supplier.select(lit("supplier").as("kind"),
      col("s_suppkey").as("id"), col("s_name").as("name"),
      col("s_acctbal").as("acctbal"))
    c.unionByName(s).orderBy(col("kind"), col("id"))
  }

  /** UNION DISTINCT of nation keys present on either side. */
  def setUnionDistinct(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.select(col("c_nationkey").as("nationkey"))
      .union(t.supplier.select(col("s_nationkey")))
      .distinct()
      .orderBy(col("nationkey"))
  }

  /** Nations having BOTH customers and suppliers (INTERSECT distinct). */
  def setIntersect(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.select(col("c_nationkey").as("nationkey"))
      .intersect(t.supplier.select(col("s_nationkey")))
      .orderBy(col("nationkey"))
  }

  /** Nations with customers but no suppliers (EXCEPT distinct). */
  def setExcept(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.select(col("c_nationkey").as("nationkey"))
      .except(t.supplier.select(col("s_nationkey")))
      .orderBy(col("nationkey"))
  }

  /** Z-order (Morton) clustering: interleave the low 16 bits of two
    * scan dimensions (customer key × order day) into one sort key, then
    * audit the layout by bucketing the z-range and reporting each
    * bucket's min/max per dimension. Writing a 100 TB fact table sorted
    * by z-value is what makes BOTH `WHERE o_custkey BETWEEN …` and
    * `WHERE o_orderdate BETWEEN …` prune files via parquet min/max
    * stats — a 1-D sort only serves its leading column. The audit
    * output IS the data-skipping evidence: per-bucket dimension ranges
    * stay narrow in both x and y (each z-bucket is a small quadtree
    * cell), exactly the per-file stats a scan planner would prune on.
    * The interleave is 32 codegen'd shift/mask exprs — no UDF. */
  def sortZorderCluster(spark: SparkSession, dir: String): DataFrame = {
    // epoch day: calendar days since 1970 (o_orderdate is
    // TIMESTAMP_NTZ — datediff on the date cast matches DuckDB's
    // date_diff('day') midnight-crossing count; session TZ is UTC)
    val dayExpr =
      "cast(datediff(cast(o_orderdate as date), date '1970-01-01') as bigint)"
    val x = col("o_custkey").bitwiseAND(lit(65535L))
    val y = expr(dayExpr).bitwiseAND(lit(65535L))
    val z = (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
    Tables(spark, dir).orders
      .select(col("o_custkey"), expr(dayExpr).as("day"), z.as("zval"))
      // 2^16 → one bucket per (x-high-byte, y-high-byte) quadtree cell:
      // ~128 populated cells on this corpus (day varies in bits 0-11,
      // custkey in bits 0-10; a 2^24 divisor would collapse everything
      // into the single cell their constant high bits share)
      .withColumn("zbucket", expr("zval div 65536"))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_custkey")).as("min_cust"),
        max(col("o_custkey")).as("max_cust"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .orderBy(col("zbucket"))
  }
}
