package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** §2.5 window functions.
  *
  * Every window here carries an explicit partition key (`o_orderstatus`,
  * `o_custkey`, `user_id`) so the sort is per-partition after one hash
  * exchange — the scalable shape. The single global window
  * (`windowMovingAvg`) runs over an already-aggregated daily series whose
  * cardinality is O(days), not O(rows), so a one-partition window is safe
  * at any scale factor.
  *
  * Determinism: every window `orderBy` is tie-broken down to a unique key
  * (orderkey / event_id) wherever the frame result depends on row order
  * (row_number, ntile, running frames); rank/dense_rank tolerate ties by
  * definition. Double sums inside frames go through decimal (see [[Det]]).
  */
object Windows {
  private val Fixed = DecimalType(18, 4)

  /** rank + dense_rank of orders by price within status. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc)
    Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        rank().over(w).as("price_rank"),
        dense_rank().over(w).as("price_dense_rank"))
      .orderBy(col("o_orderstatus"), col("price_rank"), col("o_orderkey"))
  }

  /** Top-3 orders per customer (row_number ≤ 3, tie-broken on key).
    * At scale this is the partial-sort-per-key pattern: one shuffle on
    * the partition key, no global sort. */
  def windowTopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    Tables(spark, dir).orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Batch sessionization: split each user's event stream into
    * sessions at >30-minute inactivity gaps — the lag-flag +
    * running-sum idiom (a gap row starts a new session; the cumulative
    * flag count IS the session id), i.e. the batch twin of the
    * streaming `session_window` operator with identical gap semantics
    * (strictly-greater, matching Spark's merge-at-exactly-gap
    * behavior). One hash exchange on user_id, per-partition sort, two
    * window passes over the same frame — no self-join. Output is the
    * per-session summary. */
  def windowSessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir).events
      .select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).as("ts_sec"))
      .withColumn("new_s",
        when(lag(col("ts_sec"), 1).over(w).isNull ||
          col("ts_sec") > lag(col("ts_sec"), 1).over(w)
            + expr("interval 30 minutes"), 1).otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_sec")).as("session_start"),
        max(col("ts_sec")).as("session_end"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Per-user previous/next event and inter-event gap (lag/lead).
    * Event times are second-truncated BEFORE ordering so both engines
    * (µs-truncated Spark vs ns-native DuckDB — SURVEY.md §1.3) order
    * identically; event_id breaks remaining ties. */
  def windowLagLead(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .withColumn("ts_sec", date_trunc("second", col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    ev.select(col("user_id"), col("event_id"), col("ts_sec"),
        lag(col("ts_sec"), 1).over(w).as("prev_ts"),
        lead(col("ts_sec"), 1).over(w).as("next_ts"))
      .withColumn("gap_sec",
        (unix_timestamp(col("ts_sec")) - unix_timestamp(col("prev_ts")))
          .cast("long"))
      .orderBy(col("user_id"), col("ts_sec"), col("event_id"))
  }

  /** Cumulative revenue per customer in (date, key) order — running
    * frame rowsBetween(unboundedPreceding, currentRow). */
  def windowRunningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir).orders
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        round(sum(col("o_totalprice").cast(Fixed)).over(w), 2)
          .cast(DoubleType).as("cum_revenue"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** 7-row moving average of order value over each CUSTOMER's order
    * sequence in (date, key) order — the per-entity smoothing read
    * ("is this account's basket trending up?"). Keyed on o_custkey so
    * the window is partitioned: every shard sorts only one customer's
    * orders, and the plan scales with customers × avg-orders instead
    * of putting the whole series in one task (the global daily-series
    * variant was the one unpartitioned-window shape in this family —
    * re-keyed per the round-8 scale audit). */
  def windowMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-6, 0)
    Tables(spark, dir).orders
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        round(col("o_totalprice").cast(Fixed), 2).cast(DoubleType)
          .as("order_value"),
        round(sum(col("o_totalprice").cast(Fixed)).over(w)
          .cast(DoubleType) / count(lit(1)).over(w) + lit(1e-9), 2)
          .as("ma7"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Value-range frame: how many orders of the same status fall within
    * 1000 below this order's price (rangeBetween). */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"))
      .rangeBetween(-1000, Window.currentRow)
    Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        count(lit(1)).over(w).as("n_within_1000"))
      .orderBy(col("o_orderkey"))
  }

  /** ntile / percent_rank / cume_dist quartile analytics per status.
    * Ordering tie-broken on o_orderkey so bucket boundaries are total. */
  def windowNtilePercent(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("o_orderkey"))
  }

  /** DISTINCT COUNT over a moving row frame — brand diversity of each
    * supplier's last 10 shipments. Spark has no `count(DISTINCT) OVER`,
    * so the idiom is `size(collect_set() OVER)`: the frame's set state
    * is bounded by the FRAME (10 rows), not the partition, so per-row
    * cost is O(frame) and the whole pass is the usual one hash
    * exchange + per-partition sort. The frame order is tie-broken to a
    * total order (shipdate, orderkey, linenumber) — with a ROWS frame
    * anything less makes the answer nondeterministic. DuckDB spells
    * the same thing natively as `count(DISTINCT …) OVER`, which is
    * what the oracle runs. */
  def windowCountDistinct(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // l_partkey closes the total order: lineitem carries duplicate
    // (orderkey, linenumber) pairs (FIXTURES.md), and with a ROWS
    // frame anything short of a total order is nondeterministic
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))
      .rowsBetween(-9, Window.currentRow)
    t.lineitem
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_partkey"))
      .join(t.part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_shipdate"),
        size(collect_set(col("p_brand")).over(w)).cast("long")
          .as("distinct_brands_10"))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"))
  }

  /** FIRST / LAST / NTH value navigation over ordered frames — each
    * shipment annotated with its supplier's first-ever price (running
    * frame), latest price (full-partition frame, which REQUIRES the
    * explicit unbounded-following frame: the default running frame
    * silently makes `last_value` mean "current row", the classic
    * window bug), and second-shipment price (`nth_value`, null for the
    * first row of a 1-shipment supplier). The order is the family's
    * total tie-break (shipdate, orderkey, linenumber, partkey); prices
    * in exact cents. One hash exchange + per-partition sort serves all
    * three frames. */
  def windowFirstLast(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))
    val run = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val full = ord.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables(spark, dir).lineitem
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_shipdate"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_shipdate"), col("cents"),
        first(col("cents")).over(run).as("first_cents"),
        last(col("cents")).over(full).as("last_cents"),
        nth_value(col("cents"), 2).over(full).as("second_cents"))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"))
  }

  /** TRAILING EXACT MEDIAN — the robust sibling of the moving average:
    * per user purchase series, the LOWER median of the bounded
    * trailing-9 frame in integer micro-units (lower median = element
    * (n+1) div 2 of the sorted frame — no float midpoint, so the row
    * is bit-identical cross-engine; the same exact-median convention
    * as `events_funnel_latency`). The frame is collected, sorted and
    * indexed per row — bounded 9-element state however long the
    * history, one hash exchange on the series key like every keyed
    * window. DuckDB replays it with `list() OVER` + `list_sort`. */
  def windowRunningMedian(spark: SparkSession, dir: String): DataFrame = {
    val D = DecimalType(18, 6)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
      .rowsBetween(-8, Window.currentRow)
    Tables(spark, dir).events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).as("ts_sec"),
        (col("value").cast(D) * 1000000).cast("long").as("v_micro"))
      .withColumn("fr", sort_array(collect_list(col("v_micro")).over(w)))
      .select(col("user_id"), col("event_id"), col("ts_sec"),
        col("v_micro"),
        expr("element_at(fr, CAST((size(fr) + 1) div 2 AS INT))")
          .as("median_micro"),
        size(col("fr")).as("n_frame"))
      .orderBy(col("user_id"), col("ts_sec"), col("event_id"))
  }

  /** Trailing VOLATILITY per customer order series — the rolling
    * spend-dispersion read next to [[windowRollingSlope]]'s trend:
    * exact integer population variance of the bounded 5-row frame,
    * var = (n·Σy² − (Σy)²) div n² in cents² — same moment-sum
    * discipline, no float accumulation anywhere, NULL-free (variance
    * of a 1-row frame is 0, as the formula gives). */
  def windowVolatility(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("x"), col("o_orderkey"))
      .rowsBetween(-4, Window.currentRow)
    Tables(spark, dir).orders
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1970-01-01"))
          .cast(LongType).as("x"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("y"))
      .select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("n"),
        sum(col("y")).over(w).as("sy"),
        sum(col("y") * col("y")).over(w).as("syy"))
      .select(col("o_custkey"), col("o_orderkey"), col("n"),
        expr("CAST((n * syy - sy * sy) div (n * n) AS BIGINT)")
          .as("var_cents2"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** GAPS-AND-ISLANDS streak detection — per user purchase series,
    * the longest run of strictly-increasing purchase amounts (exact
    * cents): the classic island construction, break flag = NOT
    * (value > lag), island id = running sum of breaks, then two keyed
    * reduces (island lengths → per-user max/count). A first row's
    * NULL lag comparison is null → break, identically in both
    * engines. All windows are series-keyed with O(1) state; nothing
    * global anywhere. */
  def windowStreaks(spark: SparkSession, dir: String): DataFrame = {
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    Tables(spark, dir).events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).as("ts_sec"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("brk",
        when(col("cents") > lag(col("cents"), 1).over(wo), 0L)
          .otherwise(1L))
      .withColumn("isl", sum(col("brk")).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("isl"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_purchases"),
        max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"))
      .orderBy(col("user_id"))
  }

  /** Trailing OLS trend per customer order series — the rolling
    * "is this account's spend rising" read. Slope over the bounded
    * 5-row frame from EXACT integer moment sums (x = epoch day,
    * y = price cents; n·Σxy − Σx·Σy over n·Σx² − (Σx)², milli units
    * via integer div — the [[Stats.statsLinreg]] discipline applied
    * to a sliding frame). nullif → NULL slope when the frame has no
    * x-variance (single order, or same-day frame) in both engines.
    * Keyed window, O(1) frame state, one hash exchange at any scale. */
  def windowRollingSlope(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("x"), col("o_orderkey"))
      .rowsBetween(-4, Window.currentRow)
    Tables(spark, dir).orders
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1970-01-01"))
          .cast(LongType).as("x"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("y"))
      .select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("n"),
        sum(col("x")).over(w).as("sx"),
        sum(col("y")).over(w).as("sy"),
        sum(col("x") * col("y")).over(w).as("sxy"),
        sum(col("x") * col("x")).over(w).as("sxx"))
      .select(col("o_custkey"), col("o_orderkey"), col("n"),
        expr("CAST((1000 * (n * sxy - sx * sy)) div " +
          "nullif(n * sxx - sx * sx, 0) AS BIGINT)").as("slope_milli"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** PERIOD-OVER-PERIOD PERCENT CHANGE — each user's day-over-day
    * purchase-revenue delta in exact permille (the growth read under
    * every "up/down X% vs yesterday" tile): one keyed daily agg, one
    * lag window on the AGGREGATED per-(user, day) frame, delta =
    * 1000·(cur − prev) div prev with the first day NULL (no prior
    * period — the honest answer, not 0). Deltas are signed and both
    * engines truncate toward zero. */
  def windowPctChange(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"),
        to_date(date_trunc("day", col("ts"))).as("d"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)"))
        .as("rev_cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    daily
      .withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
      .select(col("user_id"), col("d"), col("rev_cents"),
        col("prev_cents"),
        expr("""CAST((1000 * (rev_cents - prev_cents))
                div nullif(prev_cents, 0) AS BIGINT)""")
          .as("pct_change_permille"))
      .orderBy(col("user_id"), col("d"))
  }
}
