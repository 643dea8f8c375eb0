package graft.ops

import org.apache.spark.sql.SparkSession

/** Dev-only probe for the seq-miner interaction (not registered). */
object SeqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"[probe] $tag rows=$n ${(System.nanoTime() - t0) / 1e9}s")
    }
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    time("pairs")(graft.ops.Mining.mineSeqPairs(spark, sfDir).count())
    val ob = graft.ops.Mining.seqBrandEvents(spark, sfDir)
      .select(col("cust"), col("brand"),
        (datediff(col("od"), lit("1970-01-01")).cast(LongType)
          * 10000000000L + col("ok")).as("t"))
    time("ob")(ob.count())
    val w = ob.groupBy(col("cust"), col("brand"))
      .agg(min(col("t")).as("t_min"), max(col("t")).as("t_max"))
    time("witness")(w.count())
    val first = w.select(col("cust"), col("brand").as("brand_a"),
      col("t_min"))
    val last = w.select(col("cust"), col("brand").as("brand_c"),
      col("t_max"))
    val mids = first
      .join(ob.select(col("cust"), col("brand").as("brand_b"),
        col("t")), Seq("cust"))
      .filter(col("t") > col("t_min") &&
        col("brand_a") =!= col("brand_b"))
      .groupBy(col("cust"), col("brand_a"), col("brand_b"))
      .agg(min(col("t")).as("u"))
    time("mids")(mids.count())
    val fin = mids.join(last, Seq("cust"))
      .filter(col("u") < col("t_max") &&
        col("brand_b") =!= col("brand_c") &&
        col("brand_a") =!= col("brand_c"))
      .groupBy(col("brand_a"), col("brand_b"), col("brand_c"))
      .agg(count(lit(1)).as("seq_support"))
    time("final")(fin.count())
    time("triples-registered")(
      graft.ops.Mining.mineSeqTriples(spark, sfDir).count())
    spark.stop()
  }
}
