package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.9 graph traversal operators expressed as Catalyst joins.
  *
  * Traversals (point lookups / short walks) compile to hash joins, which
  * Catalyst broadcast-optimizes when the frontier or dim side is small —
  * far cheaper than Pregel supersteps for OLTP-style hops. The fixed-size
  * dims (`region` 5 rows, `nation` 25 rows — constant at every scale
  * factor) are explicitly broadcast; `customer`/`orders` are left to
  * Catalyst + AQE, which broadcasts them at test scale and falls back to
  * shuffled hash / sort-merge on the 100 TB cluster where they no longer
  * fit the broadcast threshold.
  */
object GraphOps {

  /** Flagship: region→nation→customer→orders 3-hop traversal with a
    * revenue rollup at the far end. Exercises scan, broadcast join,
    * shuffle agg and total-order sort in one plan. */
  def traverse3hopAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    broadcast(t.region)
      .join(broadcast(t.nation), col("n_regionkey") === col("r_regionkey"))
      .join(t.customer, col("c_nationkey") === col("n_nationkey"))
      .join(t.orders, col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        Det.sum2(col("o_totalprice")).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }
}
