package graft.ops

import graft.Tables
import graft.functions.{VecSumAggregator, VecSumMicroAggregator}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.4 aggregation operators.
  *
  * All grouped aggregations here plan as two-phase HashAggregate
  * (map-side partial + final after one shuffle on the group key) —
  * verified with `.explain("formatted")`. Grouping keys are
  * low-cardinality, so at 100 TB the shuffle moves one row per
  * (partition × key): the scan dominates, which is the right shape.
  */
object Aggregations {

  /** TPC-H Q1 shape: per (returnflag, linestatus) sums/avgs/counts with
    * discount/tax arithmetic. Per-row double products are bit-identical
    * across engines; only the sums need decimal-exact handling (Det). */
  def aggHashGroupby(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .withColumn("disc_price",
        Det.dec2(col("l_extendedprice")) * Det.dec2(lit(1) - col("l_discount")))
      .withColumn("charge",
        Det.dec2(col("l_extendedprice")) * Det.dec2(lit(1) - col("l_discount")) *
          Det.dec2(lit(1) + col("l_tax")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.sum2(col("l_quantity")).as("sum_qty"),
        Det.sum2(col("l_extendedprice")).as("sum_base_price"),
        Det.sumd2(col("disc_price")).as("sum_disc_price"),
        Det.sumd2(col("charge")).as("sum_charge"),
        Det.avg2(col("l_quantity")).as("avg_qty"),
        Det.avg2(col("l_extendedprice")).as("avg_price"),
        Det.avg2(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Exact distinct count per group (Expand + two-phase aggregate). */
  def aggCountDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag"))

  /** HLL++ approximate distinct — oracle=no (sketch internals are
    * engine-specific) but deterministic for a fixed dataset, covered by
    * a relative-error bound in the test suite. At 100 TB this is the
    * operator to reach for instead of exact distinct: constant memory,
    * no Expand blow-up. */
  def aggApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
      .orderBy(col("l_returnflag"))

  /** ROLLUP(r_name, n_name): hierarchy subtotals + grand total.
    * grouping() flags disambiguate real NULLs from subtotal rows. */
  def aggRollup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    broadcast(t.region)
      .join(broadcast(t.nation), col("n_regionkey") === col("r_regionkey"))
      .join(t.customer, col("c_nationkey") === col("n_nationkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping(col("r_name")).cast("int").as("g_region"),
        grouping(col("n_name")).cast("int").as("g_nation"),
        count(lit(1)).as("n_cust"),
        Det.sum2(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("g_region"), col("g_nation"),
        col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** CUBE(o_orderstatus, o_orderpriority): all 2^2 grouping sets. */
  def aggCube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        count(lit(1)).as("n_orders"),
        Det.sum2(col("o_totalprice")).as("sum_price"))
      .orderBy(col("g_status"), col("g_prio"),
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Explicit GROUPING SETS through the SQL front-end. */
  def aggGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).orders.createOrReplaceTempView("graft_orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
                CAST(grouping(o_orderstatus) AS INT) AS g_status,
                CAST(grouping(o_orderpriority) AS INT) AS g_prio,
                count(1) AS n_orders
         FROM graft_orders_gs
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY g_status, g_prio,
                  o_orderstatus ASC NULLS FIRST,
                  o_orderpriority ASC NULLS FIRST""")
  }

  /** Arg-max per group: each customer's highest-value order. Tie-broken
    * on (price, orderkey) via struct ordering so the result is total. */
  def aggMinMaxBy(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_custkey"))
      .agg(
        max_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("best_order"),
        max(col("o_totalprice")).as("best_price"),
        min_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("worst_order"))
      .orderBy(col("o_custkey"))

  /** Per-group sorted list aggregation. */
  def aggCollectSorted(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .filter(col("o_orderstatus") === "P")
      .groupBy(col("o_custkey"))
      .agg(array_join(sort_array(collect_list(col("o_orderkey")))
        .cast("array<string>"), ",").as("order_keys"))
      .orderBy(col("o_custkey"))

  /** Conditional aggregation: count_if / filtered sums per group (the
    * FILTER-clause surface). */
  def aggFiltered(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_orderpriority"))
      .agg(
        count_if(col("o_orderstatus") === "F").as("n_finished"),
        count_if(col("o_totalprice") > 200000).as("n_large"),
        Det.sum2(when(col("o_orderstatus") === "O", col("o_totalprice"))
          .otherwise(lit(0.0d))).as("open_revenue"))
      .orderBy(col("o_orderpriority"))

  /** Ordered string aggregation (listagg/string_agg surface): CSV of
    * order keys per customer, deterministic via sort_array. */
  def aggStringConcat(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .filter(col("o_orderstatus") === "P")
      .groupBy(col("o_custkey"))
      .agg(concat_ws(",",
        sort_array(collect_list(col("o_orderkey").cast("string"))))
        .as("order_csv"))
      .orderBy(col("o_custkey"))

  /** Fixed-width histogram of order value (25k buckets): one grouped
    * count over a computed bucket key — the single-pass distribution
    * profile an ingestion pipeline draws before choosing partition
    * bounds. Bucket arithmetic is exact (floor of a 2dp double / 25k,
    * re-scaled), so the key set is engine-identical. */
  def aggHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy((floor(col("o_totalprice") / 25000) * 25000)
        .cast("long").as("bucket_lo"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("bucket_lo"))

  /** Mode (most frequent value) of quantity per flag, deterministic:
    * `max(struct(count, -value))` picks the highest count with the
    * SMALLEST value on ties — a two-phase map-side-combinable
    * aggregate (the `lpaExactOn` argmax trick), where the textbook
    * row_number-over-count formulation sorts every group. At 100 TB
    * the first groupBy is the only data-sized shuffle; the argmax runs
    * over the (flag, quantity) histogram. */
  def aggMode(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("l_returnflag"))
      .agg(max(struct(col("c"), (-col("l_quantity")).as("nq"))).as("m"))
      .select(col("l_returnflag"), (-col("m.nq")).as("mode_qty"),
        col("m.c").as("mode_count"))
      .orderBy(col("l_returnflag"))

  /** Custom typed Aggregator (UDAF surface): element-wise vector sum of
    * embeddings per label; output kept scalar (rounded vector norm +
    * first component) for stability. oracle=no (float-sum order), but
    * decimal-free double sums here are still deterministic per JVM run;
    * the test suite checks against a sequential reference. */
  def aggCustomVecsum(spark: SparkSession, dir: String): DataFrame = {
    val vecsum = udaf(new VecSumAggregator(64))
    Tables(spark, dir).embeddings
      .groupBy(col("label"))
      .agg(vecsum(col("embedding")).as("sumvec"))
      .select(
        col("label"),
        round(sqrt(aggregate(col("sumvec"), lit(0.0d),
          (acc, x) => acc + x * x)), 2).as("norm"),
        round(element_at(col("sumvec"), 1), 2).as("first_dim"))
      .orderBy(col("label"))
  }

  /** The ORACLE-CHECKED custom-Aggregator exhibit: same typed
    * `Aggregator` surface and two-phase plan as [[aggCustomVecsum]],
    * but components are quantized map-side to floor(x·1e6) BIGINT
    * micro-units — integer addition is order-independent, so DuckDB
    * replays the per-label sums exactly (the float variant stays
    * registered as the order-sensitivity counterexample). */
  def aggCustomVecsumExact(spark: SparkSession, dir: String): DataFrame = {
    val vecsum = udaf(new VecSumMicroAggregator(64))
    Tables(spark, dir).embeddings
      .groupBy(col("label"))
      .agg(vecsum(col("embedding")).as("sumvec"))
      .select(
        col("label"),
        element_at(col("sumvec"), 1).as("first_dim_micro"),
        aggregate(col("sumvec"), lit(0L), (acc, x) => acc + x)
          .as("sum_all_micro"))
      .orderBy(col("label"))
  }

  /** BITMAP DISTINCT — exact distinct-user counts per event type via
    * OR-aggregated bitmap chunks (the bitmap-index / roaring trick):
    * user u sets bit u mod 32 of chunk u div 32, chunks combine with
    * the `bit_or` aggregate (map-side combinable, commutative), and
    * the distinct count is Σ popcount — EXACT like count(DISTINCT)
    * but with two ordinary hash aggregations instead of a
    * distinct-expand shuffle of raw ids: per-type state is the
    * NON-EMPTY chunk set (the groupBy only creates chunks some user
    * actually hits), i.e. between distinct/32 longs (dense id space,
    * the 32× win) and distinct longs (fully sparse 64-bit ids, where
    * the chunk trick degrades gracefully to count-distinct-equivalent
    * state — never worse, just uncompressed; a roaring-style
    * per-container array/bitmap switch is the layout that would
    * recover compression there, a memory-format concern below the
    * SQL surface). Chunk rows merge associatively so skewed types
    * cost the same as uniform ones.
    * 32-bit chunks because a 63-bit shift overflows DuckDB's checked
    * BIGINT — the replay stays engine-neutral. Both counts emitted;
    * their equality is the operator's own proof. */
  /** ROARING-LAYOUT DISTINCT — the sparse-safe sibling of
    * [[aggBitmapDistinct]] (the SCALING.md caveat row's "container
    * switch is the real fix", r12): ids are split into roaring's
    * 64Ki-value containers (`user div 65536`) and each container
    * CHOOSES its layout by the real roaring rule — cardinality ≤ 4096
    * → sorted ARRAY of 16-bit offsets (2 B/value), else a fixed 8 KiB
    * BITMAP — so sparse id spaces pay per-VALUE, dense ones per-RANGE,
    * and the worst case of either layout is bounded. Emitted per
    * event type: the exact distinct count (Σ container cardinalities
    * — containers partition the id space, so this IS exact), the
    * container census by layout, and the state-size comparison
    * against the dense 32-bit-chunk layout (8 B per non-empty chunk).
    *
    * Plan shape: ONE distinct-pair hash agg (map-side combinable),
    * then two container-keyed aggs over the distinct set — no
    * distinct-expand shuffle, no per-row state; at 100 TB the state
    * is the distinct (type, container) grid, orders below the event
    * count. All-integer output — nothing transcendental or float on
    * the hashed surface. */
  def aggBitmapRoaring(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).events
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("dup"))
    val conts = d
      .groupBy(col("event_type"), expr("user_id div 65536").as("cont"))
      .agg(count(lit(1)).as("card"))
      .select(col("event_type"), col("card"),
        when(col("card") <= 4096, col("card") * 2)
          .otherwise(lit(8192L)).as("bytes"),
        when(col("card") <= 4096, 1L).otherwise(0L).as("is_array"))
    val chunks = d
      .groupBy(col("event_type"), expr("user_id div 32").as("bkt"))
      .agg(count(lit(1)).as("cc"))
      .groupBy(col("event_type"))
      .agg((count(lit(1)) * 8).as("chunk_bytes"))
    conts.groupBy(col("event_type"))
      .agg(sum(col("card")).as("n_users"),
        count(lit(1)).as("n_containers"),
        sum(col("is_array")).as("n_array_containers"),
        (count(lit(1)) - sum(col("is_array"))).as("n_bitmap_containers"),
        sum(col("bytes")).as("roaring_bytes"))
      .join(chunks, "event_type")
      .select(col("event_type"), col("n_users"), col("n_containers"),
        col("n_array_containers"), col("n_bitmap_containers"),
        col("roaring_bytes"), col("chunk_bytes"),
        expr("(1000 * roaring_bytes) div chunk_bytes")
          .as("permille_vs_chunks"))
      .orderBy(col("event_type"))
  }

  def aggBitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    val chunks = Tables(spark, dir).events
      .select(col("event_type"),
        expr("user_id div 32").as("bkt"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))")
          .as("bit"))
      .groupBy(col("event_type"), col("bkt"))
      .agg(expr("bit_or(bit)").as("bits"))
    val exact = Tables(spark, dir).events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users_exact"))
    chunks.groupBy(col("event_type"))
      .agg(sum(expr("bit_count(bits)")).cast("long")
          .as("n_users_bitmap"),
        count(lit(1)).as("n_chunks"))
      .join(exact, "event_type")
      .select(col("event_type"), col("n_users_bitmap"),
        col("n_users_exact"), col("n_chunks"),
        (col("n_users_bitmap") === col("n_users_exact")).as("agree"))
      .orderBy(col("event_type"))
  }
}
