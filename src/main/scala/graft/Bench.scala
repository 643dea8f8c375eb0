package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default matches the grading environment (local[32], shuffle=32);
    // round-2 measurement: 4 threads is ~20% slower on the GraphX block
    // under host load, 16 vs 32 indistinguishable within run noise
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // dev-only focus filter: comma-separated query keys (unset → all)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // events.parquet stores TIMESTAMP(NANOS), unreadable by Spark 4
      // without this (Tables.events also sets it defensively)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // NOTE: a THROWING key still contributes its elapsed wall time
      // to `total` (the -1L is only the count() replacement value, not
      // a time marker) — if a key ever starts failing, its row stays
      // honest but `total` includes the time spent failing; check
      // CORRECTNESS before reading bench deltas
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Locale.ROOT: a comma-decimal default locale (de_DE …) would make
    // "%.3f" emit "1,234" — invalid JSON
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // `total` is passed explicitly: the compact slowest-N line must
    // still report the FULL run's total, not the sum of the lines it
    // happens to list
    def toJson(rs: Iterable[(String, Double)], total: Double): String = {
      val qs = rs.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},""" +
        s""""unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = toJson(results, total)
    println(json)
    // also persist to a file: the driver's stdout JSON-line scrape has
    // failed to parse before (sbt log prefixes) — the file is unambiguous.
    // Skipped under the dev-only SPARK_GRAFT_ONLY filter: a focused run
    // must not clobber the authoritative full-run artifact.
    if (only.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
        json.getBytes("UTF-8")): Unit
    // The driver captures only the LAST ~2000 chars of output, so the
    // full ~110-query line above can never sit wholly inside its tail
    // window (BENCH_r01–r03 all recorded parsed:null with the line's
    // head cut off). Emit a compact line LAST — full total + the 15
    // slowest queries, well under the window — so the tail always
    // contains one complete parseable JSON line; the full map lives in
    // bench.json.
    println(toJson(results.toSeq.sortBy(-_._2).take(15), total))
    spark.stop()
  }
}
