// package graft.ops: reaches private[ops] seqBrandEvents; test scope.
package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev-only seq-triple stage decomposition at sf0.1. */
object SeqExperiment {
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
      println(f"[phase] $tag%-20s wall=$wall%7.2f s" +
        f"  task_s=${a(0) / 1000.0}%8.1f  gc_s=${a(1) / 1000.0}%6.1f")
      r
    }
    phase("events")(Mining.seqBrandEvents(spark, dir).count())
    val ob = Mining.seqBrandEvents(spark, dir)
      .select(col("cust"), col("brand"),
        (datediff(col("od"), lit("1970-01-01")).cast(LongType)
          * 10000000000L + col("ok")).as("t"))
    val w = ob.groupBy(col("cust"), col("brand"))
      .agg(min(col("t")).as("t_min"), max(col("t")).as("t_max"))
    phase("witness")(w.count())
    val bmap = w.select(col("brand")).distinct()
      .withColumn("bit",
        (row_number().over(Window.orderBy(col("brand"))) - 1)
          .cast(LongType))
    val wb = w.join(broadcast(bmap), "brand").localCheckpoint(true)
    phase("wb_chk")(wb.count())
    val first = wb.select(col("cust"), col("bit").as("abit"),
      col("t_min"))
    val obb = ob.join(broadcast(bmap), "brand")
      .select(col("cust"), col("bit").as("bbit"), col("t"))
    val mids = first.join(obb, Seq("cust"))
      .filter(col("t") > col("t_min") && col("bbit") =!= col("abit"))
      .groupBy(col("cust"), col("abit"), col("bbit"))
      .agg(min(col("t")).as("u"))
      .localCheckpoint(true)
    phase("mids_chk")(mids.count())
    val carr = wb.groupBy(col("cust"))
      .agg(collect_list(struct(
        expr("shiftleft(1L, CAST(bit AS INT))").as("cbm"),
        col("t_max"))).as("cs")).localCheckpoint(true)
    phase("carr_chk")(carr.count())
    val masked = mids.join(broadcast(carr), Seq("cust"))
      .select(col("abit"), col("bbit"),
        expr("""aggregate(cs, 0L, (acc, c) ->
                acc | CASE WHEN c.t_max > u THEN c.cbm ELSE 0L END)""")
          .as("mask")).localCheckpoint(true)
    phase("mask_chk")(masked.count())
    val sums = masked.groupBy(col("abit"), col("bbit"))
      .agg(expr("sum(shiftrightunsigned(mask, 0) & 1)").as("c0"),
        (1 until 64).map(i =>
          expr(s"sum(shiftrightunsigned(mask, $i) & 1)").as(s"c$i")): _*)
    phase("sums")(sums.count())
    phase("sums2")(sums.count())
    phase("mask2")(mids.join(broadcast(carr), Seq("cust"))
      .select(col("abit"), col("bbit"),
        expr("""aggregate(cs, 0L, (acc, c) ->
                acc | CASE WHEN c.t_max > u THEN c.cbm ELSE 0L END)""")
          .as("mask")).count())
    spark.stop()
  }
}
