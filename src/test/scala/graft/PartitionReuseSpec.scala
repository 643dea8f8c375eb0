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
}
