package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only timing probe (r12: parameterized on any registered key,
  * default graph_louvain_move): warm-cache phase costs plus a per-job
  * trace (duration + call-site) of one full key execution — the tool
  * that attributed the r11 rewrite (the key is job-count-bound at
  * sf0.1, ~90 small jobs, no single hot stage). Not registered; run
  * via `sbt "runMain graft.ops.LouvainProbe [key]"`. */
object LouvainProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val key = args.headOption.getOrElse("graph_louvain_move")
    val fn = graft.SparkEntry.queries(key)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    if (key == "graph_warm_caches") {
      // per-stage breakdown via the registered keys that trigger each
      // session cache (marginal time = that cache's build)
      time("dedup_edges")(graft.GraphModel.dedupEdgesCached(spark, dir).count())
      time("und_edges")(graft.GraphModel.undEdgesCached(spark, dir).count())
      time("und_by_dst")(graft.GraphModel.undEdgesByDstCached(spark, dir).count())
      time("und_degrees")(GraphOps.undDegCached(spark, dir)._1.count())
      time("dedup_verts")(graft.GraphModel.dedupVertsCached(spark, dir).count())
      time("lpa_labels")(
        graft.SparkEntry.queries("graph_lpa_exact")(spark, dir).count())
      time("louvain_labels")(
        graft.SparkEntry.queries("graph_louvain")(spark, dir).count())
      time("within_parts")(graft.SparkEntry
        .queries("graph_community_refine")(spark, dir).count())
      time("triangles")(graft.SparkEntry
        .queries("graph_triangle_count")(spark, dir).count())
      time("brand_events")(Mining.seqBrandEvents(spark, dir).count())
    }
    time("warm caches")(GraphOps.graphWarmCaches(spark, dir).count())
    time("full key (warm #0)")(fn(spark, dir).count())
    @volatile var trace = false
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("callSite.short"))
            .orElse(Option(js.properties.getProperty("spark.job.description")))
            .getOrElse("?") + " | stages=" + js.stageInfos.map(si =>
              si.name.takeWhile(_ != '\n')).mkString("; ")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val v = starts.remove(je.jobId)
        if (trace && v != null)
          println(f"[job] ${je.jobId}%4d ${(System.nanoTime() - v._1) / 1e9}%7.2f s  ${v._2}")
      }
    })
    trace = true
    time("full key (traced)")(fn(spark, dir).count())
    trace = false
    spark.stop()
  }
}
