package graft

import java.nio.file.Files
import graft.ops.GraphOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source/sink round-trips: results written to parquet / CSV / JSON and
  * read back must survive losslessly (schema-aware formats) or up to
  * the format's documented type erasure (CSV). The engine's sink
  * surface is `DataFrameWriter` — these tests pin the formats a
  * pipeline would actually export to. */
class SourceSinkSpec extends SparkSpec {

  private lazy val result: DataFrame =
    GraphOps.traverse3hopAgg(spark, sfDir)

  private def tmp(): String =
    Files.createTempDirectory("graft_sink").toString

  test("parquet round-trip is lossless (schema + values)") {
    val dir = s"${tmp()}/out"
    result.write.parquet(dir)
    val back = spark.read.parquet(dir)
    // parquet read-back relaxes nullability; names + types must survive
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      result.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy(col("r_name"), col("n_name")).collect()
      .sameElements(result.collect()))
  }

  test("csv round-trip preserves values through header + explicit schema") {
    val dir = s"${tmp()}/out"
    result.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(result.schema).csv(dir)
    assert(back.orderBy(col("r_name"), col("n_name")).collect()
      .sameElements(result.collect()))
  }

  test("json round-trip preserves values with explicit schema") {
    val dir = s"${tmp()}/out"
    result.write.json(dir)
    val back = spark.read.schema(result.schema).json(dir)
    assert(back.orderBy(col("r_name"), col("n_name")).collect()
      .sameElements(result.collect()))
  }

  test("json source: events props parse identically from a json export") {
    val dir = s"${tmp()}/ev"
    val ev = Tables(spark, sfDir).events
      .select(col("event_id"), col("event_type"), col("props"))
    ev.write.json(dir)
    val back = spark.read.schema(ev.schema).json(dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
    val orig = ev.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))
    assert(back.orderBy("event_id").collect()
      .sameElements(orig.orderBy("event_id").collect()))
  }

  test("partitioned scan prunes directories via PartitionFilters") {
    val df = ops.Sources.scanPartitionedPruned(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the lang predicate must land in PartitionFilters (directory
    // pruning), not in the data filters
    assert(plan.contains("PartitionFilters"), plan.take(2000))
    val pf = plan.substring(plan.indexOf("PartitionFilters"))
      .takeWhile(_ != ']')
    assert(pf.contains("lang"), plan.take(2000))
    // and the result equals the plain filter on the originals
    val expect = Tables(spark, sfDir).documents
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id")).collect()
    assert(df.collect().sameElements(expect))
  }

  test("orc round-trip preserves values with explicit schema") {
    import org.apache.spark.sql.functions.col
    val got = ops.Sources.scanOrcRoundtrip(spark, sfDir).collect()
    val expect = Tables(spark, sfDir).orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .orderBy(col("o_orderkey")).collect()
    assert(got.sameElements(expect))
  }

  test("registered bucketed join plans with no exchange before the SMJ") {
    val df = ops.Sources.joinBucketedColocated(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      plan.take(3000))
    assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      plan.take(3000))
  }

  test("text round-trip census equals the direct column census") {
    import org.apache.spark.sql.functions._
    val r = graft.ops.Sources.scanTextRoundtrip(spark, sfDir)
      .collect().head
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .agg(count(lit(1)), sum(length(col("text")).cast("long")),
        min(length(col("text"))), max(length(col("text"))),
        countDistinct(col("text"))).collect().head
    assert(r.getAs[Long]("n_lines") == d.getLong(0))
    assert(r.getAs[Long]("total_chars") == d.getLong(1))
    assert(r.getAs[Int]("min_chars") == d.getInt(2))
    assert(r.getAs[Int]("max_chars") == d.getInt(3))
    assert(r.getAs[Long]("n_distinct") == d.getLong(4))
  }

  test("schema evolution: v1 rows NULL-fill the added column, batch " +
      "censuses equal a direct per-year recompute") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Sources.scanSchemaEvolution(spark, sfDir)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1995, 1996))
    val by = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(year(col("o_orderdate")).as("y"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .filter(col("y").isin(1995, 1996))
      .groupBy(col("y"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s")).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (n, s) = by(r.getInt(0))
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("sum_cents") == s)
      // the v1 batch predates the priority column: every row NULL;
      // the v2 batch wrote it: no NULLs
      assert(r.getAs[Long]("n_null_priority") ==
        (if (r.getInt(0) == 1995) n else 0L))
    }
  }
}
