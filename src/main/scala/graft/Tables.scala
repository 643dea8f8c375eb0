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

  /** `events.ts` normalized to a session-zone µs TimestampType no
    * matter which physical type the generator wrote:
    *
    *  - parquet TIMESTAMP(NANOS): Spark 4 refuses to read it as a
    *    timestamp ([PARQUET_TYPE_ILLEGAL]); the legacy conf reads it
    *    as a raw int64 and we truncate ns→µs with integer division
    *    (double division would lose precision above 2^53).
    *  - parquet TIMESTAMP(MICROS) without UTC adjustment: arrives as
    *    TIMESTAMP_NTZ; cast to the session-zone type (sessions here
    *    run UTC, so wall-clock values are unchanged).
    *
    * The nanosAsLong conf belongs in every SparkSession BUILDER
    * (Bench / Verify / Smoke / Plans / SparkSpec all set it); the
    * runtime set below is a last-resort fallback for sessions built
    * elsewhere, and is call-order-sensitive — any scan of a NANOS
    * `events` planned before the first `Tables.events` call in such a
    * session would still fail. */
  def events: DataFrame = {
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .forall(_ != "true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeTs(t("events"))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  /** Normalize an `events` frame's `ts` to session-zone TimestampType
    * regardless of the physical parquet type it was read as — see the
    * [[Tables.events]] Scaladoc for the per-type rationale. Shared by
    * the batch loader and the streaming file source (which must read
    * with whatever type the footer declares, then converge here). */
  def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // the plain cast preserves wall-clock ONLY under a UTC session
        // zone; every builder in this repo sets it, but a session built
        // elsewhere would silently shift every event — force it here,
        // at the cast, like the nanosAsLong fallback in Tables.events
        if (raw.sparkSession.conf.get("spark.sql.session.timeZone") != "UTC")
          raw.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
}
