package graft

import graft.ops.{Sources, Stats, TimeSeries}
import org.apache.spark.sql.functions._

/** Semantic checks for the round-4 additions: time-series gap-fill,
  * table profiling, and the non-parquet source round-trips (beyond the
  * sf0.001 smoke + DuckDB oracle layers). */
class TimeSeriesSpec extends SparkSpec {

  test("gapfill spine is contiguous at 15-minute steps with no dup buckets") {
    val rows = TimeSeries.timeseriesGapfill(spark, sfDir)
      .select(col("bucket_ts").cast("long")).collect().map(_.getLong(0))
    assert(rows.length > 1)
    assert(rows.distinct.length == rows.length, "duplicate buckets")
    val steps = rows.sliding(2).map { case Array(a, b) => b - a }.toSet
    assert(steps == Set(900L), s"non-contiguous spine steps: $steps")
  }

  test("gapfill zero-fills empty buckets and forward-fills last sum") {
    val rows = TimeSeries.timeseriesGapfill(spark, sfDir)
      .orderBy(col("bucket_ts")).collect()
    val gaps = rows.filter(_.getAs[Long]("n_events") == 0L)
    assert(gaps.nonEmpty, "corpus produced no gaps to fill")
    // a gap row carries sum_value 0 but ffill_value = previous non-gap sum
    rows.indices.drop(1).foreach { i =>
      val r = rows(i)
      if (r.getAs[Long]("n_events") == 0L) {
        assert(r.getAs[Double]("sum_value") == 0.0)
        assert(r.getAs[Double]("ffill_value") ==
          rows(i - 1).getAs[Double]("ffill_value"))
      }
    }
    // first bucket is by construction non-empty (spine starts at min)
    assert(rows.head.getAs[Long]("n_events") > 0L)
  }

  test("profile_table: no nulls, full distinct on the unique key column") {
    val byCol = Stats.profileTable(spark, sfDir).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(byCol.keySet == Set("l_orderkey", "l_returnflag", "l_shipdate"))
    val n = byCol("l_orderkey").getAs[Long]("n_rows")
    byCol.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_nulls") == 0L)
      assert(r.getAs[Long]("n_distinct") <= n)
    }
    assert(byCol("l_returnflag").getAs[Long]("n_distinct") == 3L)
    assert(byCol("l_shipdate").getAs[String]("min_val")
      .matches("\\d{4}-\\d{2}-\\d{2}"))
  }

  test("csv and json source round-trips equal the parquet originals") {
    val nation = Tables(spark, sfDir).nation
      .orderBy(col("n_nationkey")).collect()
    val viaCsv = Sources.scanCsvRoundtrip(spark, sfDir).collect()
    assert(viaCsv.sameElements(nation))

    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text"))
      .orderBy(col("doc_id")).collect()
    val viaJson = Sources.scanJsonRoundtrip(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text")).collect()
    assert(viaJson.sameElements(docs))
  }
}
