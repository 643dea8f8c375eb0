package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * One parquet file per table under `dir` (= an sf directory such as
  * `/root/testdata/sf0.01`). All reads go through `spark.read.parquet`
  * so Catalyst's vectorized reader, column pruning, predicate pushdown
  * and partition-size splitting (`spark.sql.files.maxPartitionBytes`)
  * apply unchanged at any scale — at 100 TB these become multi-file
  * directory scans with the identical plan shape.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp ([PARQUET_TYPE_ILLEGAL]). Read it as a raw
    * int64 (legacy conf) and truncate ns→µs with integer division
    * (double division would lose precision above 2^53). Downstream
    * queries see a normal µs TimestampType column.
    *
    * The conf belongs in every SparkSession BUILDER (Bench / Verify /
    * Smoke / Plans / SparkSpec all set it); the runtime set below is a
    * last-resort fallback for sessions built elsewhere, and is
    * call-order-sensitive — any scan of `events` planned before the
    * first `Tables.events` call in such a session would still fail. */
  def events: DataFrame = {
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .forall(_ != "true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
