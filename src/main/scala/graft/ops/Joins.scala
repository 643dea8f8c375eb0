package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.3 join operators.
  *
  * Strategy notes for the 100 TB design point:
  *  - dim⋈fact joins broadcast the dim (`broadcast()` hint where the dim
  *    is bounded by construction, Catalyst/AQE threshold otherwise);
  *  - fact⋈fact joins shuffle on the join key — at scale these become
  *    sort-merge joins whose cost is one exchange per side; bucketing
  *    both facts on the key at write time would eliminate it entirely;
  *  - non-equi joins only ever appear with a broadcast-able side (the
  *    bracket table is O(1) rows) so they plan as BroadcastNestedLoop
  *    without a cartesian shuffle;
  *  - the as-of join reduces to equi-join on the partition key +
  *    per-key max, so it shuffles once on `user_id` — the same shape a
  *    dedicated as-of operator would need.
  */
object Joins {

  /** Fact⋈dim with an explicit broadcast hint (BroadcastHashJoin). */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
        col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Fact⋈fact with a merge hint → SortMergeJoin (the 100 TB default
    * when neither side broadcasts). Aggregated output keeps the oracle
    * payload small while still exercising the full shuffle. */
  def joinShuffleSortMerge(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem.hint("merge")
      .join(t.orders.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_lines"),
        Det.sum2(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** All customers, with their orders when present (NULLs otherwise). */
  def joinLeftOuter(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
  }

  /** Full outer on a partially-overlapping key: per-nation customer
    * counts vs per-nation supplier counts (15 of 25 nations lack
    * suppliers at small SF). */
  def joinFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val custPerNation = t.customer.groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("n_cust"))
    val suppPerNation = t.supplier.groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("n_supp"))
    custPerNation
      .join(suppPerNation, col("nk_c") === col("nk_s"), "full_outer")
      .select(
        coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
        col("n_cust"), col("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** Customers having at least one order (EXISTS → left semi join). */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Customers with no pending ('P') order (NOT EXISTS → left anti
    * join). The filtered right side keeps the result non-empty at every
    * SF, unlike customers-without-any-order which is empty from sf0.01
    * up — a vacuous check. */
  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders.filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Non-equi (theta) join against a tiny literal bracket table →
    * BroadcastNestedLoopJoin; aggregated per bracket. */
  def joinThetaRange(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val brackets = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("low", 0.0, 15.0),
        Row("mid", 15.0, 35.0),
        Row("high", 35.0, 51.0)),
      StructType(Seq(
        StructField("bracket", StringType),
        StructField("lo", DoubleType),
        StructField("hi", DoubleType))))
    t.lineitem
      .join(broadcast(brackets),
        col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy(col("bracket"))
      .agg(
        count(lit(1)).as("n_lines"),
        Det.sum2(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("bracket"))
  }

  /** As-of join: each purchase event matched to the same user's latest
    * prior signup/view. Spark has no native as-of operator; the
    * equivalent plan is an equi-join on the partition key (`user_id`)
    * plus a range predicate and per-key max — one shuffle, same as a
    * dedicated as-of join would cost. DuckDB's native ASOF JOIN is the
    * oracle. Timestamps are second-truncated on output (parquet stores
    * ns; Spark reads µs — SURVEY.md §1.3 hazard). */
  def joinAsof(spark: SparkSession, dir: String): DataFrame = {
    // second-truncate BEFORE comparing: Spark sees µs-truncated values
    // of the parquet ns timestamps while DuckDB sees native ns, so a
    // raw-ts range predicate can disagree for events inside the same
    // microsecond (SURVEY.md §1.3)
    val ev = Tables(spark, dir).events
      .withColumn("ts_sec", date_trunc("second", col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts_sec").as("p_ts"))
    val views = ev.filter(col("event_type").isin("signup", "view"))
      .select(col("user_id").as("v_user"), col("ts_sec").as("v_ts"))
    purchases
      .join(views,
        col("p_user") === col("v_user") && col("v_ts") <= col("p_ts"))
      .groupBy(col("p_id"), col("p_user"))
      .agg(max(col("v_ts")).as("prior_ts"))
      .orderBy(col("p_id"))
  }

  /** Max staleness for [[joinAsofTolerance]], seconds (1 day). */
  val AsofToleranceSec = 86400L

  /** As-of join with a TOLERANCE bound — [[joinAsof]] accepts a prior
    * event however stale; real feature-lookup pipelines bound the
    * staleness (pandas `merge_asof(tolerance=...)`): a purchase whose
    * latest prior signup/view is older than [[AsofToleranceSec]]
    * matches nothing and must still SURVIVE (left semantics, matched
    * flag) so downstream sees the coverage gap instead of silently
    * dropping rows. Same user-equi-key shape as [[joinAsof]]; the
    * tolerance predicate additionally BOUNDS the per-user candidate
    * window, which at 100 TB is what turns the as-of from
    * full-history-per-key into a time-bucketed range join. */
  def joinAsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .withColumn("ts_sec", date_trunc("second", col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts_sec").as("p_ts"))
    val views = ev.filter(col("event_type").isin("signup", "view"))
      .select(col("user_id").as("v_user"), col("ts_sec").as("v_ts"))
    purchases
      .join(views,
        col("p_user") === col("v_user") && col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") -
            expr(s"INTERVAL $AsofToleranceSec SECOND"),
        "left")
      .groupBy(col("p_id"), col("p_user"))
      .agg(max(col("v_ts")).as("prior_ts"))
      .select(col("p_id"), col("p_user"), col("prior_ts"),
        when(col("prior_ts").isNotNull, 1L).otherwise(0L).as("matched"))
      .orderBy(col("p_id"))
  }

  /** FORWARD-direction as-of join — the mirror of [[joinAsof]]
    * (pandas `merge_asof(direction='forward')`): each purchase picks
    * the EARLIEST signup/view at or after it, LEFT semantics with a
    * matched flag so tail purchases with nothing after them survive.
    * Same user-equi-key + min-agg shape as the backward variant — the
    * agg IS the as-of (no window, map-side combinable); at 100 TB the
    * predicate gains a coarse time-bucket term exactly like the
    * tolerance variant. */
  def joinAsofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .withColumn("ts_sec", date_trunc("second", col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts_sec").as("p_ts"))
    val views = ev.filter(col("event_type").isin("signup", "view"))
      .select(col("user_id").as("v_user"), col("ts_sec").as("v_ts"))
    purchases
      .join(views,
        col("p_user") === col("v_user") && col("v_ts") >= col("p_ts"),
        "left")
      .groupBy(col("p_id"), col("p_user"))
      .agg(min(col("v_ts")).as("next_ts"))
      .select(col("p_id"), col("p_user"), col("next_ts"),
        when(col("next_ts").isNotNull, 1L).otherwise(0L).as("matched"))
      .orderBy(col("p_id"))
  }

  /** NEAREST-direction as-of join — [[joinAsof]] looks only backward;
    * sensor/telemetry alignment wants the temporally closest match in
    * EITHER direction (pandas `merge_asof(direction='nearest')`).
    * Expressed as the user-keyed pair join + one per-purchase
    * row_number over the (|gap|, v_ts) total order, so the winner is
    * unique and tie-breaks to the earlier candidate identically in
    * both engines. The equi-key bounds the pair expansion to each
    * user's own events (~70 here); at 100 TB the join gains a coarse
    * time-bucket term so candidates stay a bounded window rather than
    * a user's full history. Signed gap kept (negative = match preceded
    * the purchase). */
  def joinAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .withColumn("ts_sec", date_trunc("second", col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts_sec").as("p_ts"))
    val views = ev.filter(col("event_type").isin("signup", "view"))
      .select(col("user_id").as("v_user"), col("ts_sec").as("v_ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_id"))
      .orderBy(col("abs_gap"), col("v_ts"))
    purchases
      .join(views, col("p_user") === col("v_user"))
      .withColumn("gap_sec",
        expr("unix_timestamp(v_ts) - unix_timestamp(p_ts)"))
      .withColumn("abs_gap", abs(col("gap_sec")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("p_id"), col("p_user"), col("v_ts").as("nearest_ts"),
        col("gap_sec"))
      .orderBy(col("p_id"))
  }

  /** Small bounded cartesian product. */
  def joinCrossLimited(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.region.crossJoin(t.nation)
      .select(col("r_regionkey"), col("r_name"), col("n_nationkey"),
        col("n_name"))
      .orderBy(col("r_regionkey"), col("n_nationkey"))
  }

  /** Range join via bucketing — the SCALE path for interval joins.
    * [[joinThetaRange]] works because its bracket side broadcasts; when
    * BOTH sides are large (interval⋈interval at 100 TB) a pure
    * inequality join degenerates to a nested-loop cartesian. The
    * standard fix, shown here end to end: quantize the range dimension
    * into fixed-width buckets, EXPLODE each interval onto every bucket
    * it overlaps, equi-join on the bucket id (an ordinary shuffle /
    * sort-merge join — `hint("merge")` forces that plan here so the
    * exhibit shows the scalable shape, not the broadcast shortcut),
    * then re-apply the exact range predicate to discard the bucket
    * false-positives. Join cost becomes O(rows × overlap-width), never
    * quadratic. Result is IDENTICAL to the plain theta join, which is
    * exactly what the oracle checks. */
  def joinRangeBucketed(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val brackets = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("low", 0.0, 15.0),
        Row("mid", 15.0, 35.0),
        Row("high", 35.0, 51.0)),
      StructType(Seq(
        StructField("bracket", StringType),
        StructField("lo", DoubleType),
        StructField("hi", DoubleType))))
    val bWidth = 5.0
    val bracketBuckets = brackets.withColumn("bucket",
      explode(sequence(floor(col("lo") / bWidth).cast(LongType),
        ceil(col("hi") / bWidth).cast(LongType) - 1)))
    val lines = t.lineitem.withColumn("bucket",
      floor(col("l_quantity") / bWidth).cast(LongType))
    lines
      .hint("merge")
      .join(bracketBuckets, Seq("bucket"))
      .filter(col("l_quantity") >= col("lo") &&
        col("l_quantity") < col("hi"))
      .groupBy(col("bracket"))
      .agg(
        count(lit(1)).as("n_lines"),
        Det.sum2(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("bracket"))
  }

  /** Minimum purchases per clock hour for that hour to count as a
    * "busy window" in [[joinIntervalOverlap]] (3 keeps the window set
    * non-empty from the smallest SF up). */
  val BusyHourMinPurchases = 3

  /** INTERVAL-OVERLAP join — `a.start ≤ b.end AND b.start ≤ a.end`,
    * the temporal/genomic workhorse the as-of family (latest-before,
    * nearest) does not cover: both operands are interval SETS and a
    * row matches every interval it overlaps, not one winner. Exhibit:
    * each user's daily activity span (min..max event second per
    * user-day) against the corpus's "busy windows" (clock hours with ≥
    * [[BusyHourMinPurchases]] purchases), counting overlapped busy
    * hours per span. Both interval sets live on the same clock, so the
    * join carries the CALENDAR DAY as an equi-key — the shuffle is an
    * ordinary hash join on `d` and the overlap predicate only fans out
    * within a day (≤ 24 busy hours), never across the corpus: the same
    * quantize-to-bucket discipline as [[joinRangeBucketed]], with the
    * day as the natural bucket (a span crossing midnight would explode
    * onto both days first). Inner join — spans overlapping no busy
    * hour drop out, keeping the result the exhibit of the MATCHES. */
  def joinIntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .withColumn("ts_sec", date_trunc("second", col("ts")))
    val spans = ev.groupBy(col("user_id"), to_date(col("ts_sec")).as("d"))
      .agg(min(col("ts_sec")).as("s_start"), max(col("ts_sec")).as("s_end"))
    val busy = ev.filter(col("event_type") === "purchase")
      .groupBy(date_trunc("hour", col("ts_sec")).as("h_start"))
      .agg(count(lit(1)).as("n_purchases"))
      .filter(col("n_purchases") >= BusyHourMinPurchases)
      .select(to_date(col("h_start")).as("d"), col("h_start"),
        (col("h_start") + expr("INTERVAL 1 HOUR")).as("h_end"))
    spans.join(busy, Seq("d"))
      .filter(col("s_start") < col("h_end") &&
        col("h_start") <= col("s_end"))
      .groupBy(col("user_id"), col("d"))
      .agg(count(lit(1)).as("n_busy_hours"),
        min(col("h_start")).as("first_busy"))
      .orderBy(col("user_id"), col("d"))
  }
}
