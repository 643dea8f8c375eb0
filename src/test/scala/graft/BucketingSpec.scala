package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: THE shuffle-elimination pattern for
  * repeated fact⋈fact joins at cluster scale. Both facts are written
  * bucketed by the join key; the join then requires no Exchange on
  * either side — the property that turns a 100 TB shuffle into a local
  * merge per bucket. Asserted on the physical plan, not just claimed. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans with no Exchange") {
    val t = Tables(spark, sfDir)
    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    // DROP doesn't clean orphaned locations left by an interrupted run
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    Seq("graft_orders_b", "graft_lineitem_b").foreach { n =>
      val d = new java.io.File(new java.io.File(wh.getPath), n)
      if (d.exists()) {
        d.listFiles().foreach(_.delete()); d.delete()
      }
    }
    t.orders.write.bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("graft_orders_b")
    t.lineitem.write.bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("graft_lineitem_b")
    val joined = spark.table("graft_lineitem_b").hint("merge")
      .join(spark.table("graft_orders_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must read bucketed scans directly — no shuffle
    // before the SortMergeJoin (the only Exchange allowed is the
    // one-row final aggregation)
    assert(plan.contains("SortMergeJoin"), plan)
    val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      plan)
    assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      plan)
    // and results match the unbucketed join
    val plainRows = t.lineitem.join(t.orders,
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus").collect()
    assert(joined.orderBy("o_orderstatus").collect()
      .sameElements(plainRows))
  }
}
