package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** The persisted iteration inputs are pre-partitioned on their
  * per-round join keys; these tests pin the payoff — the big side's
  * exchange is GONE from the join plan (the local analog of bucketing
  * the edge table by src at write time). */
class PartitionReuseSpec extends SparkSpec {

  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectWithSubqueries { case s: ShuffleExchangeLike => s }.size
  }

  test("edge-cache join on src reuses the persisted partitioning") {
    val e = GraphModel.dedupEdgesCached(spark, sfDir)
    val contrib = e.select(col("src")).distinct()
      .select(col("src"), lit(1L).as("c"))
    val joined = e.join(contrib, "src")
    // one exchange for building contrib's distinct + at most one to
    // co-locate it with the cache's partitioning — never one on the
    // edge side itself. Without the repartition-at-persist this plan
    // shuffles the edge frame too (3 exchanges).
    assert(countShuffles(joined) <= 2,
      joined.queryExecution.executedPlan.toString.take(3000))
  }

  test("localCheckpoint preserves the pre-checkpoint partitioning") {
    val pairs = spark.range(100)
      .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
      .repartition(col("b_id"))
      .localCheckpoint()
    val probe = spark.range(50).select(col("id").as("b_id"),
      lit(7L).as("lab"))
    // the checkpointed side must NOT re-shuffle: only probe's side
    // exchanges (its own repartition to match)
    val joined = pairs.join(probe, "b_id")
    assert(countShuffles(joined) <= 1,
      joined.queryExecution.executedPlan.toString.take(3000))
  }
  test("triangle cache is computed once and shared across its four " +
      "consumers") {
    // prime the cache, then snapshot the enumeration frame; all four
    // keys must return plans rooted at the SAME checkpointed RDD
    // (i.e. the 3-way join never re-runs per consumer)
    val tri = graft.ops.GraphXAlgos.trianglesCached(spark, sfDir)
    val again = graft.ops.GraphXAlgos.trianglesCached(spark, sfDir)
    assert(tri eq again, "memoization must return the identical frame")
    // consumers run and agree on the census totals derived from it
    val hist = graft.ops.GraphXAlgos.triangleCount(spark, sfDir).collect()
    val nTri = tri.count()
    val mass = hist.map(r => r.getAs[Long]("n_triangles")
      * r.getAs[Long]("n_vertices")).sum
    assert(mass == 3 * nTri,
      s"per-vertex credit mass $mass != 3 × $nTri triangles")
  }
}
