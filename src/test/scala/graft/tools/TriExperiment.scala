// package graft.ops: reaches the pair cache; test scope, dev-only.
package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only triangle-enumeration plan experiment: times the current
  * degree-ordered wedge join against hinted and array-intersection
  * variants on the sf0.1 co-purchase projection.
  * Run: `sbt "Test/runMain graft.ops.TriExperiment"`. */
object TriExperiment {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
    val stageGroup =
      new java.util.concurrent.ConcurrentHashMap[Integer, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val g = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
          .getOrElse("_")
        js.stageIds.foreach(sid => stageGroup.put(sid, g))
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val g = stageGroup.get(Int.box(te.stageId))
        val m = te.taskMetrics
        if (g != null && m != null) {
          val a = probe.computeIfAbsent(g, _ => new Array[Long](2))
          a.synchronized {
            a(0) += m.executorRunTime; a(1) += m.jvmGCTime
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
      val a = probe.getOrDefault(tag, new Array[Long](2))
      println(f"[phase] $tag%-24s wall=$wall%7.2f s" +
        f"  task_s=${a(0) / 1000.0}%8.1f  gc_s=${a(1) / 1000.0}%6.1f")
      r
    }

    val pairs = phase("pairs") {
      val p = GraphXAlgos.copurchasePairsCached(spark, dir)
      p.count(); p
    }
    val deg = pairs.select(col("src").as("id"))
      .unionByName(pairs.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)

    def oriented: DataFrame = pairs
      .join(deg.select(col("id").as("src"), col("d").as("ds")), "src")
      .join(deg.select(col("id").as("dst"), col("d").as("dd")), "dst")
      .select(
        when(col("ds") < col("dd") ||
            (col("ds") === col("dd") && col("src") < col("dst")),
          struct(col("src").as("a"), col("dst").as("b"),
            col("dd").as("db")))
          .otherwise(struct(col("dst").as("a"), col("src").as("b"),
            col("ds").as("db"))).as("e"))
      .select(col("e.a"), col("e.b"), col("e.db"))

    // A: current shape (SMJ everywhere, AQE decides)
    def variantA(): Long = {
      val o = oriented
      val closure = o.select(col("a").as("ca"), col("b").as("cb"))
      o.as("e1")
        .join(o.as("e2"), col("e1.a") === col("e2.a") &&
          (col("e1.db") < col("e2.db") ||
            (col("e1.db") === col("e2.db") &&
              col("e1.b") < col("e2.b"))))
        .select(col("e1.b").as("u"), col("e2.b").as("w"))
        .join(closure, col("ca") === col("u") && col("cb") === col("w"),
          "left_semi")
        .count()
    }

    // B: same but shuffle-hash hints (no 35M-row sort)
    def variantB(): Long = {
      val o = oriented.localCheckpoint(true)
      val closure = o.select(col("a").as("ca"), col("b").as("cb"))
      o.as("e1")
        .join(o.as("e2").hint("shuffle_hash"),
          col("e1.a") === col("e2.a") &&
          (col("e1.db") < col("e2.db") ||
            (col("e1.db") === col("e2.db") &&
              col("e1.b") < col("e2.b"))))
        .select(col("e1.b").as("u"), col("e2.b").as("w"))
        .join(closure.hint("shuffle_hash"),
          col("ca") === col("u") && col("cb") === col("w"),
          "left_semi")
        .count()
    }

    // C: sorted out-neighbor arrays + per-edge intersection count
    // (counts only — enumeration would explode the intersection)
    def variantC(): Long = {
      val o = oriented.localCheckpoint(true)
      val nbrs = o.groupBy(col("a"))
        .agg(sort_array(collect_list(col("b"))).as("ns"))
        .localCheckpoint(true)
      o.select(col("a"), col("b"))
        .join(nbrs.select(col("a"), col("ns").as("na")), "a")
        .join(nbrs.select(col("a").as("b"), col("ns").as("nb")), "b")
        .select(size(array_intersect(col("na"), col("nb"))).as("k"))
        .agg(sum(col("k"))).collect()(0).getLong(0)
    }

    println("counts: A=" + phase("A_current")(variantA()) +
      " B=" + phase("B_shj")(variantB()) +
      " C=" + phase("C_arrays")(variantC()) +
      " A2=" + phase("A2_current_warm")(variantA()) +
      " B2=" + phase("B2_shj_warm")(variantB()))
    spark.stop()
  }
}
