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
}
