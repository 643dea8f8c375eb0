// package graft.ops (not .tools): the probe reaches private[ops]
// cache builders (seqBrandEvents) for phase attribution; test scope
// keeps it out of the library jar either way.
package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only phase-attribution probe (test scope — never ships in the
  * library jar): times each named phase AND sums executor task-seconds
  * per phase via a job-group listener, so wall-vs-compute splits are
  * measurable for cache builds that a registered key's bench slot
  * hides. Run: `sbt "Test/runMain graft.ops.PhaseProbe <mode>"`. */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val mode = args.headOption.getOrElse("warm")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // A/B lever for the job-train adjudication: SPARK_GRAFT_AQE=false
      // disables adaptive execution to measure its per-stage planning
      // latency against its coalesce/skew wins
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
    val stageGroup =
      new java.util.concurrent.ConcurrentHashMap[Integer, String]()
    def acc(g: String): Array[Long] =
      probe.computeIfAbsent(g, _ => new Array[Long](4))
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val g = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
          .getOrElse("_")
        js.stageIds.foreach(sid => stageGroup.put(sid, g))
        val a = acc(g); a.synchronized { a(3) += 1 }
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val g = stageGroup.get(Int.box(te.stageId))
        val m = te.taskMetrics
        if (g != null && m != null) {
          val a = acc(g)
          a.synchronized {
            a(0) += 1; a(1) += m.executorRunTime; a(2) += m.jvmGCTime
          }
        }
      }
    })
    def phase[T](tag: String)(f: => T): T = {
      spark.sparkContext.setJobGroup(tag, tag)
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.clearJobGroup()
      val a = probe.getOrDefault(tag, new Array[Long](4))
      println(f"[phase] $tag%-28s wall=$wall%7.2f s  jobs=${a(3)}%4d" +
        f"  tasks=${a(0)}%5d  task_s=${a(1) / 1000.0}%8.1f" +
        f"  gc_s=${a(2) / 1000.0}%6.1f")
      r
    }
    import graft.{GraphModel, SparkEntry}
    
    mode match {
      case "warm" =>
        phase("dedup_edges")(
          GraphModel.dedupEdgesCached(spark, dir).count())
        phase("und_twins") {
          GraphModel.undEdgesCached(spark, dir).count()
          GraphModel.undEdgesByDstCached(spark, dir).count()
        }
        phase("und_degrees")(GraphOps.undDegCached(spark, dir)._1.count())
        phase("dedup_verts")(
          GraphModel.dedupVertsCached(spark, dir).count())
        phase("lpa_labels")(
          SparkEntry.queries("graph_lpa_exact")(spark, dir).count())
        phase("louvain_labels")(
          SparkEntry.queries("graph_louvain")(spark, dir).count())
        phase("within_parts")(
          SparkEntry.queries("graph_community_refine")(spark, dir).count())
        phase("full_components")(
          SparkEntry.queries("graph_girvan_newman_cut")(spark, dir).count())
        phase("copurchase_pairs")(
          GraphXAlgos.copurchasePairsCached(spark, dir).count())
        phase("triangles")(
          GraphXAlgos.trianglesCached(spark, dir).count())
        phase("brand_events")(Mining.seqBrandEvents(spark, dir).count())
      case "seq" =>
        phase("brand_events")(Mining.seqBrandEvents(spark, dir).count())
        phase("seq_pairs")(
          SparkEntry.queries("mine_seq_pairs")(spark, dir).count())
        phase("seq_triples")(
          SparkEntry.queries("mine_seq_triples")(spark, dir).count())
        phase("seq_pairs_warm")(
          SparkEntry.queries("mine_seq_pairs")(spark, dir).count())
        phase("seq_triples_warm")(
          SparkEntry.queries("mine_seq_triples")(spark, dir).count())
      case "keys" =>
        // remaining args = registered keys, timed in order (caches
        // shared, so order = attribution order)
        args.drop(1).foreach { k =>
          phase(k)(SparkEntry.queries(k)(spark, dir).count())
        }
      case other =>
        println(s"unknown mode $other; use warm | seq | keys k1 k2 ...")
    }
    spark.stop()
  }
}
