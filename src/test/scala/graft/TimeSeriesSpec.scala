package graft

import graft.ops.{Joins, Sources, Stats, TimeSeries}
import org.apache.spark.sql.functions._

/** Semantic checks for the round-4 additions: time-series gap-fill,
  * table profiling, and the non-parquet source round-trips (beyond the
  * sf0.001 smoke + DuckDB oracle layers). */
class TimeSeriesSpec extends SparkSpec {

  test("gapfill spine is contiguous at 15-minute steps with no dup buckets") {
    val rows = TimeSeries.timeseriesGapfill(spark, sfDir)
      .select(col("bucket_ts").cast("long")).collect().map(_.getLong(0))
    assert(rows.length > 1)
    assert(rows.distinct.length == rows.length, "duplicate buckets")
    val steps = rows.sliding(2).map { case Array(a, b) => b - a }.toSet
    assert(steps == Set(900L), s"non-contiguous spine steps: $steps")
  }

  test("gapfill zero-fills empty buckets and forward-fills last sum") {
    val rows = TimeSeries.timeseriesGapfill(spark, sfDir)
      .orderBy(col("bucket_ts")).collect()
    val gaps = rows.filter(_.getAs[Long]("n_events") == 0L)
    assert(gaps.nonEmpty, "corpus produced no gaps to fill")
    // a gap row carries sum_value 0 but ffill_value = previous non-gap sum
    rows.indices.drop(1).foreach { i =>
      val r = rows(i)
      if (r.getAs[Long]("n_events") == 0L) {
        assert(r.getAs[Double]("sum_value") == 0.0)
        assert(r.getAs[Double]("ffill_value") ==
          rows(i - 1).getAs[Double]("ffill_value"))
      }
    }
    // first bucket is by construction non-empty (spine starts at min)
    assert(rows.head.getAs[Long]("n_events") > 0L)
  }

  test("interpolate: observed buckets exact, gaps bounded by their " +
      "neighbors on a contiguous spine") {
    val rows = TimeSeries.timeseriesInterpolate(spark, sfDir)
      .orderBy(col("bucket_ts")).collect()
    val ts = rows.map(_.getAs[java.sql.Timestamp]("bucket_ts").getTime)
    assert(ts.sliding(2).forall { case Array(a, b) => b - a == 900000L },
      "non-contiguous spine")
    // observed buckets carry their exact centi-unit sum (cross-check
    // against the gapfill's double sum, exact at 2dp)
    val gf = TimeSeries.timeseriesGapfill(spark, sfDir)
      .orderBy(col("bucket_ts")).collect()
    assert(gf.length == rows.length)
    rows.zip(gf).foreach { case (r, g) =>
      if (r.getAs[Long]("n_events") > 0L)
        assert(r.getAs[Long]("value_interp_c") ==
          math.round(g.getAs[Double]("sum_value") * 100))
    }
    // every gap value lies within [min, max] of its nearest observed
    // neighbors (linear interpolation never overshoots)
    val vals = rows.map(r => (r.getAs[Long]("n_events"),
      r.getAs[Long]("value_interp_c")))
    vals.indices.foreach { i =>
      if (vals(i)._1 == 0L) {
        val prev = (i - 1 to 0 by -1).find(j => vals(j)._1 > 0L)
          .map(j => vals(j)._2)
        val next = (i + 1 until vals.length).find(j => vals(j)._1 > 0L)
          .map(j => vals(j)._2)
        val lo = (prev.toSeq ++ next.toSeq).min
        val hi = (prev.toSeq ++ next.toSeq).max
        assert(vals(i)._2 >= lo && vals(i)._2 <= hi,
          s"gap at $i interpolates outside [$lo, $hi]")
      }
    }
  }

  test("xcorr: 7 lags, Pearson bounds hold, lag 0 matches a direct " +
      "recomputation") {
    val rows = TimeSeries.timeseriesXcorr(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("lag")).toSeq == (-3L to 3L))
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("r")) <= 1.0 + 1e-9)
      // lag L drops |L| boundary pairs from the spine
      val n0 = rows.find(_.getAs[Long]("lag") == 0L).get.getAs[Long]("n")
      assert(r.getAs[Long]("n") ==
        n0 - math.abs(r.getAs[Long]("lag")))
    }
    // recompute lag-0 correlation directly from the bucket counts
    val counts = Tables(spark, sfDir).events
      .filter(col("event_type").isin("purchase", "click"))
      .select(expr("unix_timestamp(ts) div 900").as("b"),
        col("event_type")).collect()
      .groupBy(_.getLong(0))
    val (b0, b1) = (counts.keys.min, counts.keys.max)
    val xs = (b0 to b1).map(b => counts.get(b).fold(0)(
      _.count(_.getString(1) == "purchase")))
    val ys = (b0 to b1).map(b => counts.get(b).fold(0)(
      _.count(_.getString(1) == "click")))
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val sxy = xs.zip(ys).map { case (a, c) => a * c }.sum.toDouble
    val sxx = xs.map(a => a * a).sum.toDouble
    val syy = ys.map(c => c * c).sum.toDouble
    val want = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val got = rows.find(_.getAs[Long]("lag") == 0L).get.getAs[Double]("r")
    assert(math.abs(got - want) < 1e-6, s"lag0 r=$got, direct=$want")
  }

  test("asof nearest: gap is minimal vs the backward asof, ties go " +
      "to the earlier candidate") {
    import graft.ops.Joins
    val nearest = Joins.joinAsofNearest(spark, sfDir).collect()
      .map(r => r.getAs[Long]("p_id") ->
        (r.getAs[java.sql.Timestamp]("nearest_ts"),
          r.getAs[Long]("gap_sec"))).toMap
    val backward = Joins.joinAsof(spark, sfDir).collect()
      .map(r => r.getAs[Long]("p_id") ->
        r.getAs[java.sql.Timestamp]("prior_ts")).toMap
    assert(nearest.nonEmpty)
    // every purchase with a backward match has a nearest match, and
    // the nearest |gap| can only be <= the backward gap
    val pTs = Tables(spark, sfDir).events
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), date_trunc("second", col("ts")).as("t"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[java.sql.Timestamp]("t")).toMap
    backward.foreach { case (pid, priorTs) =>
      val (nTs, gap) = nearest(pid)
      val backGap = (pTs(pid).getTime - priorTs.getTime) / 1000
      assert(math.abs(gap) <= backGap,
        s"purchase $pid: nearest |$gap| worse than backward $backGap")
      // sign convention: negative gap = match preceded the purchase
      assert(gap == (nTs.getTime - pTs(pid).getTime) / 1000)
    }
  }

  test("pattern match: journey letters reconcile with event counts " +
      "and the regex answers subsequence containment") {
    val rows = TimeSeries.eventsPatternMatch(spark, sfDir).collect()
    val byUser = Tables(spark, sfDir).events
      .groupBy(col("user_id")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    assert(rows.length == byUser.size)
    rows.foreach { r =>
      val j = r.getAs[String]("journey")
      assert(j.length == r.getAs[Long]("n_events"))
      assert(j.length == byUser(r.getAs[Long]("user_id")))
      assert(j.forall("VCPSE".contains(_)), s"unexpected letter in $j")
      // the regex must agree with a direct subsequence check
      val manual = {
        val v = j.indexOf('V')
        val c = if (v >= 0) j.indexOf('C', v + 1) else -1
        v >= 0 && c >= 0 && j.indexOf('P', c + 1) >= 0
      }
      assert(r.getAs[Boolean]("converted") == manual, s"regex vs scan: $j")
      assert(r.getAs[Int]("n_purchases") == j.count(_ == 'P'))
    }
    assert(rows.exists(_.getAs[Boolean]("converted")),
      "no user ever converted — pattern untested")
  }

  test("scd2 as-of: exactly one valid interval per user active at T, " +
      "containment holds") {
    val t = java.sql.Timestamp.valueOf(TimeSeries.Scd2AsofTs)
    val rows = TimeSeries.scd2AsofLookup(spark, sfDir).collect()
    val ids = rows.map(_.getAs[Long]("user_id"))
    assert(ids.distinct.length == ids.length, "duplicate user at T")
    rows.foreach(r => assert(!r.getAs[java.sql.Timestamp]("valid_from")
      .after(t)))
    // cross-check against the full history: row count = users whose
    // first event precedes T, and the picked row is the latest <= T
    val hist = TimeSeries.scd2History(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("user_id"))
    val expect = hist.flatMap { case (uid, rs) =>
      rs.filter(!_.getAs[java.sql.Timestamp]("valid_from").after(t))
        .sortBy(_.getAs[java.sql.Timestamp]("valid_from").getTime)
        .lastOption.map(uid -> _.getAs[Long]("event_id"))
    }
    assert(rows.map(r => r.getAs[Long]("user_id") ->
      r.getAs[Long]("event_id")).toMap == expect)
  }

  test("rfm: quartiles are balanced, code composes digits, recency " +
      "anchored at zero") {
    val rows = TimeSeries.eventsRfmSegment(spark, sfDir).collect()
    assert(rows.nonEmpty)
    Seq("r_q", "f_q", "m_q").foreach { c =>
      val sizes = rows.groupBy(_.getAs[Int](c)).map(_._2.length)
      assert(rows.map(_.getAs[Int](c)).forall(q => q >= 1 && q <= 4))
      assert(sizes.max - sizes.min <= 1, s"$c quartiles unbalanced")
    }
    rows.foreach { r =>
      assert(r.getAs[Int]("rfm_code") ==
        r.getAs[Int]("r_q") * 100 + r.getAs[Int]("f_q") * 10 +
          r.getAs[Int]("m_q"))
      assert(r.getAs[Int]("recency_days") >= 0)
      assert(r.getAs[Long]("spend_c") > 0L)
    }
    // the most recent purchaser anchors recency at exactly 0
    assert(rows.exists(_.getAs[Int]("recency_days") == 0))
  }

  test("profile_table: no nulls, full distinct on the unique key column") {
    val byCol = Stats.profileTable(spark, sfDir).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(byCol.keySet == Set("l_orderkey", "l_returnflag", "l_shipdate"))
    val n = byCol("l_orderkey").getAs[Long]("n_rows")
    byCol.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_nulls") == 0L)
      assert(r.getAs[Long]("n_distinct") <= n)
    }
    assert(byCol("l_returnflag").getAs[Long]("n_distinct") == 3L)
    assert(byCol("l_shipdate").getAs[String]("min_val")
      .matches("\\d{4}-\\d{2}-\\d{2}"))
  }

  test("csv and json source round-trips equal the parquet originals") {
    val nation = Tables(spark, sfDir).nation
      .orderBy(col("n_nationkey")).collect()
    val viaCsv = Sources.scanCsvRoundtrip(spark, sfDir).collect()
    assert(viaCsv.sameElements(nation))

    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text"))
      .orderBy(col("doc_id")).collect()
    val viaJson = Sources.scanJsonRoundtrip(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text")).collect()
    assert(viaJson.sameElements(docs))
  }

  test("OHLC: low <= open/close <= high, events conserved") {
    val rows = TimeSeries.timeseriesOhlc(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val purchases = Tables(spark, sfDir).events
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == purchases)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h, s"open outside [low, high]: $r")
      assert(l <= c && c <= h, s"close outside [low, high]: $r")
    }
  }

  test("funnel: anchored at first view, steps ordered inside the window") {
    val rows = TimeSeries.eventsFunnelDetect(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = Tables(spark, sfDir).events
      .selectExpr("user_id", "event_type",
        "unix_seconds(date_trunc('second', ts)) as sec").collect()
      .groupBy(_.getAs[Long]("user_id"))
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val (v, c, p) = (r.getAs[Long]("view_sec"),
        r.getAs[Long]("click_sec"), r.getAs[Long]("purchase_sec"))
      assert(v <= c && c <= v + TimeSeries.FunnelWindowSec)
      assert(c <= p && p <= c + TimeSeries.FunnelWindowSec)
      val byType = ev(u).groupBy(_.getAs[String]("event_type"))
        .view.mapValues(_.map(_.getAs[Long]("sec")))
      // anchor is the user's FIRST view; click/purchase are the first
      // qualifying events of their type
      assert(v == byType("view").min)
      assert(c == byType("click")
        .filter(s => s >= v && s <= v + TimeSeries.FunnelWindowSec).min)
      assert(p == byType("purchase")
        .filter(s => s >= c && s <= c + TimeSeries.FunnelWindowSec).min)
    }
  }

  test("SCD2: per-user intervals chain with exactly one open row") {
    val rows = TimeSeries.scd2History(spark, sfDir).collect()
    val events = Tables(spark, sfDir).events.count()
    assert(rows.length == events)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      // already ordered (valid_from, event_id) within user by the sort
      rs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ==
            b.getAs[java.sql.Timestamp]("valid_from"),
            s"user $u: interval chain broken")
        case _ =>
      }
      assert(rs.count(_.getAs[Boolean]("is_current")) == 1,
        s"user $u: open-row count != 1")
      assert(rs.last.getAs[Boolean]("is_current"))
    }
  }

  test("retention cohort: offset-0 cell equals cohort size, user mass " +
      "conserved") {
    import org.apache.spark.sql.functions.col
    val rows = graft.ops.TimeSeries.eventsRetentionCohort(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_day"))
    // every user is active on their own first day, so the offset-0
    // cell is the cohort's full size and no later cell exceeds it
    byCohort.foreach { case (day, cells) =>
      val zero = cells.find(_.getAs[Int]("day_offset") == 0)
      assert(zero.isDefined, s"cohort $day missing offset 0")
      val size = zero.get.getAs[Long]("n_users")
      assert(cells.forall(_.getAs[Long]("n_users") <= size), s"$day")
    }
    // cohort sizes sum to the distinct user count
    val total = byCohort.values
      .map(_.find(_.getAs[Int]("day_offset") == 0).get
        .getAs[Long]("n_users")).sum
    val users = Tables(spark, sfDir).events
      .select(col("user_id")).distinct().count()
    assert(total == users)
  }

  test("markov transitions: mass = events - users, rows sum to ~1000 " +
      "permille per source type") {
    import org.apache.spark.sql.functions.col
    val rows = graft.ops.TimeSeries.eventsMarkovTransitions(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // each user with k events contributes k-1 transitions
    val ev = Tables(spark, sfDir).events
    val expectMass = ev.count() - ev.select(col("user_id"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expectMass)
    // permille floor-rounds, so each source row group sums to
    // (1000 - cells, 1000]
    rows.groupBy(_.getAs[String]("event_type")).foreach {
      case (t, cells) =>
        val s = cells.map(_.getAs[Long]("permille")).sum
        assert(s <= 1000 && s > 1000 - cells.length, s"$t: $s")
    }
  }

  test("ewma: binary-decay recompute matches for one user; first row " +
      "is half its own value") {
    import org.apache.spark.sql.functions.col
    val rows = graft.ops.TimeSeries.timeseriesEwma(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val uid = rows.head.getAs[Long]("user_id")
    val mine = rows.filter(_.getAs[Long]("user_id") == uid)
    // first point: only the k=0 term contributes
    assert(mine.head.getAs[Long]("ewma_micro")
      == mine.head.getAs[Long]("v_micro") / 2)
    // sequential recompute of the truncated dyadic sum
    val vs = mine.map(_.getAs[Long]("v_micro"))
    mine.zipWithIndex.foreach { case (r, i) =>
      val expect = (0 to 7).map { k =>
        (if (i - k >= 0) vs(i - k) else 0L) / (1L << (k + 1))
      }.sum
      assert(r.getAs[Long]("ewma_micro") == expect, s"row $i")
    }
  }

  test("holt: weights are the exact A^j*c expansion, recompute matches, " +
      "forecast = level + trend, constant series converges to level") {
    val (wl, wb) = graft.ops.TimeSeries.holtWeights(8)
    // j=0..4 pairs hand-derived from A^j·c (over 65536): (1/2, 1/4)
    // (3/8, 1/16) (7/32, −3/64) (11/128, −23/256) (−1/512, −91/1024)
    // — the trend weight turns negative at j=2, the level at j=4
    assert(wl.take(5) == Seq(32768L, 24576L, 14336L, 5632L, -128L), wl)
    assert(wb.take(5) == Seq(16384L, 4096L, -3072L, -5888L, -5824L), wb)
    val rows = graft.ops.TimeSeries.timeseriesHolt(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("forecast_micro")
        == r.getAs[Long]("level_micro") + r.getAs[Long]("trend_micro"))
    }
    // sequential recompute of the truncated floor-term sums per user
    val uid = rows.head.getAs[Long]("user_id")
    val mine = rows.filter(_.getAs[Long]("user_id") == uid)
    val vs = mine.map(_.getAs[Long]("v_micro"))
    def fd(p: Long): Long = (p - (((p % 65536) + 65536) % 65536)) / 65536
    mine.zipWithIndex.foreach { case (r, i) =>
      val lvl = (0 to 7).map(k =>
        fd((if (i - k >= 0) vs(i - k) else 0L) * wl(k))).sum
      val trd = (0 to 7).map(k =>
        fd((if (i - k >= 0) vs(i - k) else 0L) * wb(k))).sum
      assert(r.getAs[Long]("level_micro") == lvl, s"level row $i")
      assert(r.getAs[Long]("trend_micro") == trd, s"trend row $i")
    }
    // invariant of the exact weights: a steady series has level → y
    // and trend → 0 (Σwl = 65536·(1−tail), Σwb ≈ 0); after 8 equal
    // points of 1.0 the level is within 6% of 1.0 and |trend| < 0.07
    val y = 1000000L
    val lvlSteady = (0 to 7).map(k => fd(y * wl(k))).sum
    val trdSteady = (0 to 7).map(k => fd(y * wb(k))).sum
    assert(math.abs(lvlSteady - y) < 60000L, lvlSteady.toString)
    assert(math.abs(trdSteady) < 70000L, trdSteady.toString)
  }

  test("anomaly z-scores: |z| >= 2, trailing frame never sees the " +
      "current row") {
    val rows = graft.ops.TimeSeries.timeseriesAnomaly(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => math.abs(r.getAs[Double]("z")) >= 2.0))
    // recompute one flagged point sequentially from raw history
    val r0 = rows.head
    val uid = r0.getAs[Long]("user_id")
    import org.apache.spark.sql.functions.col
    val hist = Tables(spark, sfDir).events
      .filter(col("event_type") === "purchase" && col("user_id") === uid)
      .select(org.apache.spark.sql.functions
        .date_trunc("second", col("ts")).as("ts_sec"),
        col("event_id"), col("value"))
      .orderBy(col("ts_sec"), col("event_id"))
      .collect()
    val idx = hist.indexWhere(
      _.getAs[Long]("event_id") == r0.getAs[Long]("event_id"))
    val frame = hist.slice(math.max(0, idx - 20), idx)
      .map(_.getAs[Double]("value"))
    val n = frame.length
    assert(n >= 5)
    val mean = frame.sum / n
    val variance = (frame.map(v => v * v).sum - frame.sum * frame.sum / n) /
      (n - 1)
    val z = (r0.getAs[Double]("value") - mean) / math.sqrt(variance)
    assert(math.abs(z - r0.getAs[Double]("z")) < 1e-3)
  }

  test("attribution: touch strictly precedes its conversion, is the " +
      "user's latest prior touch, gap within the 7-day lookback") {
    val rows = graft.ops.TimeSeries.eventsAttribution(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gap = r.getAs[Long]("gap_sec")
      assert(gap >= 0 && gap <= 7L * 24 * 3600, s"gap out of window: $gap")
      assert(Set("click", "view")(r.getAs[String]("touch_type")))
    }
    // replay one conversion sequentially from the raw event history
    val r0 = rows.head
    val uid = r0.getAs[Long]("user_id")
    val hist = Tables(spark, sfDir).events
      .filter(col("user_id") === uid)
      .select(date_trunc("second", col("ts")).as("ts_sec"),
        col("event_id"), col("event_type"))
      .orderBy(col("ts_sec"), col("event_id"))
      .collect()
    val convIdx = hist.indexWhere(
      _.getAs[Long]("event_id") == r0.getAs[Long]("conv_id"))
    assert(convIdx > 0)
    val lastTouch = hist.slice(0, convIdx).reverse
      .find(h => Set("click", "view")(h.getAs[String]("event_type")))
    assert(lastTouch.isDefined)
    assert(lastTouch.get.getAs[Long]("event_id") ==
      r0.getAs[Long]("touch_id"))
  }
  test("interval overlap: reported counts equal brute-force busy-hour " +
      "overlaps within the day") {
    val rows = Joins.joinIntervalOverlap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("tss"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("tss").getTime))
    val busyHours = ev.filter(_._2 == "purchase")
      .groupBy(_._3 / 3600000L)
      .collect { case (h, rs)
        if rs.size >= Joins.BusyHourMinPurchases => h }.toSet
    val spans = ev.groupBy(e => (e._1, e._3 / 86400000L))
      .map { case (k, es) => k -> (es.map(_._3).min, es.map(_._3).max) }
    val expect = spans.flatMap { case ((u, d), (s0, s1)) =>
      val hs = busyHours.filter(h => h * 3600000L / 86400000L == d &&
        s0 < (h + 1) * 3600000L && h * 3600000L <= s1)
      if (hs.isEmpty) None
      else Some((u, d) -> (hs.size.toLong, hs.min * 3600000L))
    }
    assert(rows.length == expect.size, "one row per overlapping span")
    rows.foreach { r =>
      val key = (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("d").toLocalDate.toEpochDay)
      val (n, first) = expect(key)
      assert(r.getAs[Long]("n_busy_hours") == n, s"span $key count")
      assert(r.getAs[java.sql.Timestamp]("first_busy").getTime == first,
        s"span $key first busy hour")
    }
  }

  test("seasonal dow/hod: bucket partition sums to the corpus and the " +
      "weighted index centers on 1000") {
    val rows = TimeSeries.timeseriesSeasonalDow(spark, sfDir).collect()
    val total = Tables(spark, sfDir).events.count()
    Seq("dow", "hod").foreach { kind =>
      val ks = rows.filter(_.getAs[String]("kind") == kind)
      assert(ks.map(_.getAs[Long]("n_events")).sum == total, s"$kind sum")
      // Σ n·index ÷ N = 1000 up to per-bucket floor loss (< 1 each)
      val wsum = ks.map(r =>
        r.getAs[Long]("n_events") * r.getAs[Long]("index_permille")).sum
      val mean = wsum.toDouble / total
      assert(mean > 995 && mean <= 1000.5, s"$kind weighted mean $mean")
    }
    val dows = rows.filter(_.getAs[String]("kind") == "dow")
      .map(_.getAs[Int]("bucket")).sorted
    assert(dows.sameElements(1 to 7))
  }

  test("cusum changepoint: one row per type, statistic matches a " +
      "sequential recompute, zero-sum telescoping holds") {
    val rows = graft.ops.TimeSeries.timeseriesCusum(spark, sfDir)
      .collect()
    val types = Tables(spark, sfDir).events
      .select("event_type").distinct().count()
    assert(rows.length == types)
    // recompute per type from the raw table
    val daily = Tables(spark, sfDir).events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("event_type", "day").agg(sum("c").as("x"))
      .collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date](1).toString,
        r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { row =>
      val et = row.getAs[String]("event_type")
      val series = daily(et).sortBy(_._2)
      val n = series.length.toLong
      val tot = series.map(_._3).sum
      var pre = 0L
      val svs = series.zipWithIndex.map { case ((_, day, x), i) =>
        pre += x
        (day, n * pre - (i + 1) * tot)
      }
      // CUSUM telescopes to zero at the last point
      assert(svs.last._2 == 0L, s"$et CUSUM endpoint not zero")
      val maxAbs = svs.map(s => math.abs(s._2)).max
      val expected = svs.filter(s =>
        math.abs(s._2) == maxAbs).minBy(_._1)
      assert(row.getAs[Long]("n_days") == n)
      assert(row.getAs[Long]("cusum_stat") == math.abs(expected._2))
      assert(row.getAs[java.sql.Date]("cp_day").toString == expected._1)
      assert(row.getAs[String]("direction") ==
        (if (expected._2 < 0) "up" else "down"))
    }
  }

  test("seasonal anomaly: exact cross-multiplied z-test matches a " +
      "float z recompute away from the boundary") {
    val rows = graft.ops.TimeSeries
      .timeseriesAnomalySeasonal(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val stl = graft.ops.TimeSeries.timeseriesStlDecompose(spark, sfDir)
      .select(col("event_type"), col("day"), col("resid7")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    assert(rows.length == stl.length)
    val byType = stl.groupBy(_._1)
    rows.foreach { r =>
      val et = r.getString(0)
      val rs = byType(et).map(_._3).map(BigInt(_))
      val n = BigInt(rs.length); val m = rs.sum
      val s2 = rs.map(x => x * x).sum
      val resid = BigInt(r.getLong(3))
      val lhs = (n * resid - m) * (n * resid - m)
      val rhs = 4 * (n * s2 - m * m)
      assert(r.getBoolean(4) == (lhs >= rhs),
        s"$et ${r.getDate(1)}")
      // float cross-check away from the exact boundary
      if (lhs != rhs && rhs.signum > 0) {
        val z = (resid.toDouble - m.toDouble / n.toDouble) /
          math.sqrt((n * s2 - m * m).toDouble / (n * n).toDouble)
        if (math.abs(math.abs(z) - 2.0) > 1e-6)
          assert(r.getBoolean(4) == (math.abs(z) >= 2.0))
      }
    }
    // sanity: anomalies exist but are a minority
    val flags = rows.count(_.getBoolean(4))
    assert(flags < rows.length / 2)
  }

  test("DECIMAL(38,0) headroom guard: the documented magnitude bounds " +
      "behind the anomaly-seasonal and power-sample-size cross-" +
      "multiplies hold with >= 1 order of headroom") {
    // Both keys keep 128-bit-exact products at DECIMAL(38,0)/HUGEINT;
    // past the documented corpus scale they would overflow (ANSI throw
    // on Spark 4, saturation on DuckDB). This test recomputes every
    // product that the queries form and pins it <= 10^37 so scale
    // growth fails HERE, loudly, not at query time. (ADVICE r12.)
    val bound = BigInt(10).pow(37)
    // anomaly_seasonal: products over per-type residual moments
    val stl = graft.ops.TimeSeries.timeseriesStlDecompose(spark, sfDir)
      .select(col("event_type"), col("resid7")).collect()
      .map(r => (r.getString(0), BigInt(r.getLong(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    stl.foreach { case (et, rs) =>
      val n = BigInt(rs.length); val m = rs.sum
      val s2 = rs.map(x => x * x).sum
      val maxAbsR = rs.map(_.abs).max
      assert(m * m <= bound, s"$et: m^2 near DECIMAL(38,0) overflow")
      assert((n * maxAbsR + m.abs).pow(2) <= bound,
        s"$et: (n*r - m)^2 near DECIMAL(38,0) overflow")
      assert(4 * (n * s2 + m * m) <= bound,
        s"$et: 4*(n*s2 - m^2) near DECIMAL(38,0) overflow")
    }
    // power_sample_size: 2*K*(n*s2 - s1^2) and 1e6*n^2*delta^2
    val cents = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .select(expr("CAST(round(value * 100) AS BIGINT)")).collect()
      .map(r => BigInt(r.getLong(0)))
    val n = BigInt(cents.length)
    val s1 = cents.sum
    val s2 = cents.map(x => x * x).sum
    val delta = s1 / (20 * n)
    assert(2 * 7848878 * (n * s2 + s1 * s1) <= bound,
      "power: 2*K*(n*s2 - s1^2) near DECIMAL(38,0) overflow")
    assert(BigInt(1000000) * n * n * delta * delta <= bound,
      "power: 1e6*n^2*delta^2 near DECIMAL(38,0) overflow")
  }

  test("pettitt: rank identity matches the O(n²) double-sign sum, " +
      "argmax and direction agree") {
    val rows = graft.ops.TimeSeries.timeseriesPettitt(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val daily = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => (t._2, t._3))).toMap
    rows.foreach { r =>
      val et = r.getString(0)
      val xs = daily(et)
      val n = xs.length
      // brute-force Pettitt: U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j)
      val us = (1 until n).map { t =>
        var u = 0L
        for (i <- 0 until t; j <- t until n)
          u += java.lang.Long.signum(xs(i)._2 - xs(j)._2)
        (xs(t - 1)._1, u)
      }
      val best = us.maxBy { case (d, u) => (math.abs(u), d > "") }
      val bestK = us.map { case (_, u) => math.abs(u) }.max
      val bestDay = us.filter { case (_, u) => math.abs(u) == bestK }
        .map(_._1).min
      val bestU = us.find(_._1 == bestDay).get._2
      assert(r.getAs[Long]("n_days") == n.toLong)
      assert(r.getAs[Long]("k_stat") == bestK, s"$et k")
      assert(r.getAs[java.sql.Date]("cp_day").toString == bestDay,
        s"$et day (brute best=$best)")
      assert(r.getAs[String]("direction") ==
        (if (bestU < 0) "up" else "down"))
    }
  }

  test("rolling r2: window moments recompute exactly, r2 in [0,1000], " +
      "direction tracks covariance sign") {
    val rows = graft.ops.TimeSeries.timeseriesRollingR2(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val grid = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type").isin("purchase", "click"))
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy(col("day"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("x"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("y"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
      .sortBy(_._1.toEpochDay)
    val d0 = grid.head._1
    val d1 = grid.last._1
    val byDay = grid.map(t => t._1 -> (t._2, t._3)).toMap
    val spine = Iterator.iterate(d0)(_.plusDays(1))
      .takeWhile(!_.isAfter(d1))
      .map(d => (d, byDay.getOrElse(d, (0L, 0L)))).toVector
    val expect = (13 until spine.length).map { i =>
      val w = spine.slice(i - 13, i + 1).map(_._2)
      val n = BigInt(14)
      val sx = BigInt(w.map(_._1).sum); val sy = BigInt(w.map(_._2).sum)
      val sxy = w.map(t => BigInt(t._1) * t._2).sum
      val sxx = w.map(t => BigInt(t._1) * t._1).sum
      val syy = w.map(t => BigInt(t._2) * t._2).sum
      val cov = n * sxy - sx * sy
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      val r2 = if (vx == 0 || vy == 0) None
        else Some((BigInt(1000) * cov * cov / (vx * vy)).toLong)
      (spine(i)._1.toString, r2,
        if (cov > 0) "pos" else if (cov < 0) "neg" else "zero")
    }
    assert(rows.length == expect.length)
    rows.zip(expect).foreach { case (r, (day, r2, dirn)) =>
      assert(r.getAs[java.sql.Date]("day").toString == day)
      val got = if (r.isNullAt(1)) None else Some(r.getLong(1))
      assert(got == r2, s"$day r2")
      got.foreach(v => assert(v >= 0 && v <= 1000, s"$day range"))
      assert(r.getAs[String]("direction") == dirn)
    }
  }

  test("churn hazard: lifetimes recompute, at-risk telescopes, the " +
      "last observed week always churns at 1000 permille") {
    val rows = graft.ops.TimeSeries.eventsChurnHazard(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val life = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg((date_trunc("second", max(col("ts"))).cast("long")
        - date_trunc("second", min(col("ts"))).cast("long")).as("d"))
      .collect().map(_.getAs[Long]("d") / 604800L)
    val byW = life.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    assert(rows.map(_.getAs[Long]("week")).toSet == byW.keySet)
    rows.foreach { r =>
      val w = r.getAs[Long]("week")
      assert(r.getAs[Long]("n_churned") == byW(w))
      val atRisk = life.count(_ >= w).toLong
      assert(r.getAs[Long]("n_at_risk") == atRisk)
      assert(r.getAs[Long]("hazard_permille") ==
        1000L * byW(w) / atRisk)
    }
    // everyone still at risk at the max week churns there
    assert(rows.maxBy(_.getAs[Long]("week"))
      .getAs[Long]("hazard_permille") == 1000L)
    // at-risk counts telescope down to the total user count at week 0..min
    assert(rows.minBy(_.getAs[Long]("week"))
      .getAs[Long]("n_at_risk") == life.length.toLong)
  }

  test("mann-kendall: brute-force sign sum and tie-corrected variance " +
      "reproduce every field, significance matches a float sigma " +
      "check away from the boundary") {
    val rows = graft.ops.TimeSeries.timeseriesMannKendall(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val daily = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap
    rows.foreach { r =>
      val xs = daily(r.getString(0))
      val n = xs.length.toLong
      var s = 0L
      for (i <- xs.indices; j <- i + 1 until xs.length)
        s += java.lang.Long.signum(xs(j) - xs(i))
      val tcorr = xs.groupBy(identity).values.map(_.length.toLong)
        .filter(_ > 1).map(c => c * (c - 1) * (2 * c + 5)).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tcorr
      assert(r.getAs[Long]("n_days") == n)
      assert(r.getAs[Long]("s_stat") == s)
      assert(r.getAs[Long]("var18") == var18)
      assert(r.getAs[Boolean]("is_significant") ==
        (18 * s * s >= 4 * var18))
      val z = s.toDouble / math.sqrt(var18.toDouble / 18.0)
      if (math.abs(math.abs(z) - 2.0) > 1e-6)
        assert(r.getAs[Boolean]("is_significant") == (math.abs(z) >= 2))
      assert(r.getAs[String]("direction") ==
        (if (s > 0) "up" else if (s < 0) "down" else "flat"))
    }
  }

  test("transition entropy: per-state terms regroup the markov matrix, " +
      "bounded by log2 of the fanout") {
    val rows = graft.ops.TimeSeries.eventsTransitionEntropy(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val tr = graft.ops.TimeSeries.eventsMarkovTransitions(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n")))
      .groupBy(_._1)
    rows.foreach { r =>
      val et = r.getString(0)
      val cells = tr(et)
      val t = cells.map(_._3).sum
      assert(r.getAs[Long]("n_transitions") == t)
      assert(r.getAs[Long]("n_next_states") == cells.length.toLong)
      val expect = cells.map { case (_, _, n) =>
        val term = -(n.toDouble / t) *
          (math.log(n.toDouble / t) / math.log(2.0)) * 1e6
        // boundary-distance guard (r13 advice): the op computes
        // log2(p) (DuckDB-textually-identical) while this recompute
        // uses ln/ln2 — the two can differ in the last ULP, so prove
        // per-term that no value sits within 1e-3 of its round-half
        // boundary, where such variance could flip the rounded micro
        val frac = term - math.floor(term)
        assert(math.abs(frac - 0.5) > 1e-3,
          s"$et term near rounding boundary: $term")
        math.round(term)
      }.sum
      assert(r.getAs[Long]("entropy_bits_micro") == expect, et)
      // entropy of a K-outcome distribution is at most log2(K)
      val bound = math.log(cells.length.toDouble) / math.log(2.0) * 1e6
      assert(r.getAs[Long]("entropy_bits_micro") <= bound + cells.length)
      assert(r.getAs[Long]("entropy_bits_micro") >= 0L)
    }
  }

  test("permutation test: observed split reproduced, every relabeling " +
      "cross-multiply recomputes, p in [0, 1000]") {
    val r = graft.ops.Stats.statsPermutationTest(spark, sfDir)
      .collect().head
    def md5h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    }
    val users = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("x"))
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    def split(f: Long => Long) = {
      val (a, b) = users.partition { case (u, _) => f(u) == 0 }
      (BigInt(a.length), a.map(t => BigInt(t._2)).sum,
        BigInt(b.length), b.map(t => BigInt(t._2)).sum)
    }
    val (nao, s1ao, nbo, s1bo) = split(u => md5h60(s"graft-ab:$u") % 2)
    assert(r.getAs[Long]("mean_a_cents") == (s1ao / nao).toLong)
    assert(r.getAs[Long]("mean_b_cents") == (s1bo / nbo).toLong)
    val dObs = (s1ao * nbo - s1bo * nao).abs
    val wObs = nao * nbo
    val extreme = (0 until graft.ops.Stats.PermTestB).count { b =>
      val (na, s1a, nb, s1b) =
        split(u => md5h60(s"graft-perm:$b:$u") % 2)
      (s1a * nb - s1b * na).abs * wObs >= dObs * (na * nb)
    }
    assert(r.getAs[Long]("n_perms") ==
      graft.ops.Stats.PermTestB.toLong)
    assert(r.getAs[Long]("n_extreme") == extreme.toLong)
    assert(r.getAs[Long]("p_permille") ==
      1000L * extreme / graft.ops.Stats.PermTestB)
    assert(r.getAs[Long]("p_permille") >= 0L &&
      r.getAs[Long]("p_permille") <= 1000L)
  }

  test("welch t-test: exact-moment recompute reproduces every field, " +
      "flag matches a float t² away from the boundary") {
    val r = graft.ops.Stats.statsTtestWelch(spark, sfDir).collect().head
    def md5h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    }
    val users = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("x"))
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    val (ga, gb) = users.partition { case (u, _) =>
      md5h60(s"graft-ab:$u") % 2 == 0 }
    def mom(g: Array[(Long, Long)]) = (BigInt(g.length),
      g.map(t => BigInt(t._2)).sum, g.map(t => BigInt(t._2).pow(2)).sum)
    val (na, s1a, s2a) = mom(ga); val (nb, s1b, s2b) = mom(gb)
    assert(r.getAs[Long]("n_a") == na.toLong)
    assert(r.getAs[Long]("n_b") == nb.toLong)
    assert(r.getAs[Long]("mean_a_cents") == (s1a / na).toLong)
    assert(r.getAs[Long]("mean_b_cents") == (s1b / nb).toLong)
    val df = s1a * nb - s1b * na
    val va = na * s2a - s1a * s1a; val vb = nb * s2b - s1b * s1b
    val num = BigInt(1000) * df * df * (na - 1) * (nb - 1)
    val den = va * nb * nb * (nb - 1) + vb * na * na * (na - 1)
    assert(r.getAs[Long]("t2_milli") == (num / den).toLong)
    assert(r.getAs[Boolean]("is_significant") == (num / den >= 4000))
    // float cross-check away from the boundary
    val t2f = (df.toDouble * df.toDouble * (na - 1).toDouble
      * (nb - 1).toDouble) / den.toDouble
    if (math.abs(t2f - 4.0) > 1e-3)
      assert(r.getAs[Boolean]("is_significant") == (t2f >= 4.0))
    // headroom guard (the TimeSeriesSpec DECIMAL(38,0) discipline)
    assert(num.abs <= BigInt(10).pow(37) && den <= BigInt(10).pow(37))
  }

  test("position attribution: credits sum to exactly 1000 permille " +
      "per conversion, positions rank by time, window respected") {
    val rows = graft.ops.TimeSeries
      .eventsAttributionPosition(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byConv = rows.groupBy(_.getAs[Long]("conv_id"))
    byConv.foreach { case (cid, rs) =>
      assert(rs.map(_.getAs[Long]("credit_permille")).sum == 1000L,
        s"conv $cid credits must sum to 1000")
      val k = rs.head.getAs[Long]("k")
      assert(rs.length.toLong == k)
      assert(rs.map(_.getAs[Long]("pos")).sorted.toSeq ==
        (1L to k).toSeq)
      if (k >= 3) {
        val byPos = rs.map(r =>
          r.getAs[Long]("pos") -> r.getAs[Long]("credit_permille")).toMap
        assert(byPos(k) == 400L)
        val mid = 200L / (k - 2)
        assert(byPos(1L) == 400L + 200L - mid * (k - 2))
        (2L until k).foreach(p => assert(byPos(p) == mid))
      }
    }
    // window respected: every touch strictly precedes its conversion
    // by at most 7 days (recompute from the raw events)
    val ts = Tables(spark, sfDir).events
      .select(col("event_id"), date_trunc("second", col("ts")))
      .collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    rows.foreach { r =>
      val gap = ts(r.getAs[Long]("conv_id")) - ts(r.getAs[Long]("touch_id"))
      assert(gap > 0 && gap <= 7L * 24 * 3600 * 1000)
    }
  }

  test("stl decompose: trend+seasonal+residual reassemble exactly at " +
      "7x scale, full-window rule holds, dow means recompute") {
    val rows = graft.ops.TimeSeries.timeseriesStlDecompose(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val daily = Tables(spark, sfDir).events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("event_type", "day").agg(sum("c").as("x"))
      .collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date](1).toString,
        r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // interior days only: n - 6 rows per type with >= 7 days
    val expectRows = daily.values.map(s => math.max(0, s.length - 6)).sum
    assert(rows.length == expectRows)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (et, rs) =>
      val series = daily(et)
      val trendOf = series.sliding(7).map { w =>
        (w(3)._2, w.map(_._3).sum) // center day -> 7-day sum
      }.toMap
      val d7Of = series.drop(3).dropRight(3).map { case (_, day, x) =>
        day -> (7L * x - trendOf(day))
      }.toMap
      val dowMean = d7Of.toSeq.groupBy { case (day, _) =>
        java.time.LocalDate.parse(day).getDayOfWeek.getValue % 7 + 1
      }.view.mapValues { ds =>
        val s = ds.map(_._2).sum; s / ds.length // Long division truncates
      }.toMap
      rs.foreach { r =>
        val day = r.getAs[java.sql.Date]("day").toString
        val dow = java.time.LocalDate.parse(day)
          .getDayOfWeek.getValue % 7 + 1
        assert(r.getAs[Long]("trend7") == trendOf(day))
        assert(r.getAs[Long]("d7") == d7Of(day))
        assert(r.getAs[Long]("seas7") == dowMean(dow), s"$et $day")
        // the decomposition reassembles exactly: 7x = trend + seas + resid
        assert(7L * r.getAs[Long]("x") ==
          r.getAs[Long]("trend7") + r.getAs[Long]("seas7")
            + r.getAs[Long]("resid7"))
      }
    }
  }

  test("asof tolerance: matched rows within the window, unmatched rows " +
      "survive with null prior, tolerance only removes matches") {
    val tol = graft.ops.Joins.joinAsofTolerance(spark, sfDir).collect()
    val plain = graft.ops.Joins.joinAsof(spark, sfDir).collect()
      .map(r => r.getAs[Long]("p_id") ->
        r.getAs[java.sql.Timestamp]("prior_ts")).toMap
    // every purchase survives (left semantics): one row per purchase
    val nPurch = Tables(spark, sfDir).events
      .filter(col("event_type") === "purchase").count()
    assert(tol.length == nPurch)
    var unmatched = 0
    tol.foreach { r =>
      val m = r.getAs[Long]("matched")
      val p = r.getAs[java.sql.Timestamp]("prior_ts")
      assert((m == 1L) == (p != null))
      if (m == 0L) unmatched += 1
      // a bounded match must equal the unbounded one (same latest
      // prior); a dropped match means the unbounded prior was stale
      if (p != null)
        assert(p == plain(r.getAs[Long]("p_id")))
    }
    assert(unmatched > 0, "tolerance never fired — widen the probe")
  }

  test("funnel latency: one row, median <= p90, converted bounded by " +
      "viewing users") {
    val r = graft.ops.TimeSeries.eventsFunnelLatency(spark, sfDir)
      .collect()
    assert(r.length == 1)
    val (n, med, p90) = (r(0).getAs[Long]("n_converted"),
      r(0).getAs[Long]("median_s"), r(0).getAs[Long]("p90_s"))
    val viewers = Tables(spark, sfDir).events
      .filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(n > 0 && n <= viewers)
    assert(med > 0 && med <= p90)
  }

  test("dau wau: distinct censuses replay exactly, wau >= dau, " +
      "stickiness exact") {
    val rows = TimeSeries.eventsDauWau(spark, sfDir).collect()
    val ud = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"),
        datediff(date_trunc("day", col("ts")), lit("1970-01-01"))
          .cast("long").as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val days = ud.map(_._2).distinct.sorted
    assert(rows.map(_.getAs[Long]("day")).toSeq == days.toSeq)
    rows.foreach { r =>
      val d = r.getAs[Long]("day")
      val dau = ud.count(_._2 == d).toLong
      val wau = ud.filter(u => u._2 >= d - 6 && u._2 <= d)
        .map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("dau") == dau)
      assert(r.getAs[Long]("wau") == wau)
      assert(wau >= dau)
      assert(r.getAs[Long]("stickiness_permille") == 1000 * dau / wau)
    }
  }

  test("inter arrival: per-type gap quantiles replay exactly from " +
      "the raw streams") {
    val rows = TimeSeries.eventsInterArrival(spark, sfDir).collect()
    val evs = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("event_type"), col("event_id"),
        date_trunc("second", col("ts")).cast("long").as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val gapsByType = evs.groupBy(e => (e._1, e._2)).toSeq
      .flatMap { case ((_, t), es) =>
        val sorted = es.sortBy(e => (e._4, e._3))
        sorted.sliding(2).collect {
          case Array(a, b) => t -> (b._4 - a._4)
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(rows.length == gapsByType.size)
    rows.foreach { r =>
      val g = gapsByType(r.getString(0))
      val n = g.length
      assert(r.getAs[Long]("n_gaps") == n.toLong)
      assert(r.getAs[Long]("median_gap_s") == g(((n + 1) / 2 - 1)))
      assert(r.getAs[Long]("p90_gap_s") == g((9 * (n - 1)) / 10))
      assert(r.getAs[Long]("min_gap_s") == g.head)
      assert(r.getAs[Long]("max_gap_s") == g.last)
    }
  }

  test("ab lift: assignment/conversion/z replay exactly from the raw " +
      "events, variants partition the purchasers") {
    val r = TimeSeries.eventsAbLift(spark, sfDir).collect().head
    val purch = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value")).collect()
      .map(x => (x.getLong(0), x.getDouble(1)))
    def hash60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(15), 16)
    }
    val byUser = purch.groupBy(_._1).toSeq.map { case (u, vs) =>
      val cents = vs.map(v => math.floor(v._2 * 100 + 0.5).toLong).sum
      val conv = if (cents / vs.length >= 5000) 1L else 0L
      (hash60(s"graft-ab:$u") % 2, conv)
    }
    val a = byUser.filter(_._1 == 0); val b = byUser.filter(_._1 == 1)
    assert(r.getAs[Long]("n_a") == a.size && r.getAs[Long]("n_b") == b.size)
    assert(a.size + b.size == purch.map(_._1).distinct.length)
    val (ca, cb) = (a.map(_._2).sum, b.map(_._2).sum)
    assert(r.getAs[Long]("c_a") == ca && r.getAs[Long]("c_b") == cb)
    assert(r.getAs[Long]("rate_a_permille") == 1000 * ca / a.size)
    assert(r.getAs[Long]("rate_b_permille") == 1000 * cb / b.size)
    val (na, nb) = (a.size.toLong, b.size.toLong)
    val p = (ca + cb).toDouble / (na + nb)
    val z = (ca.toDouble / na - cb.toDouble / nb) /
      math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb)) * 1000000.0
    // HALF_UP = away from zero on ties, mirrored for either sign
    val zMicro = if (z >= 0) math.floor(z + 0.5).toLong
      else -math.floor(-z + 0.5).toLong
    assert(r.getAs[Long]("z_micro") == zMicro)
  }

  test("stationary distribution: matches the 8-round power-iteration " +
      "recompute, mass within quantization of 1e6") {
    val rows = TimeSeries.eventsMarkovStationary(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("pi8_micro")).toMap
    val trans = TimeSeries.eventsMarkovTransitions(spark, sfDir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Long]("n")))
      .toMap
    val states = trans.keySet.flatMap(k => Seq(k._1, k._2))
    val tot = states.map(s =>
      s -> trans.collect { case ((a, _), c) if a == s => c }.sum).toMap
    var pi = states.map(s => s -> 1000000L / states.size).toMap
    for (_ <- 1 to 8) {
      pi = states.map { t =>
        t -> states.toSeq.map { s =>
          val c = trans.getOrElse((s, t), 0L)
          if (c == 0L) 0L else pi(s) * c / tot(s)
        }.sum
      }.toMap
    }
    states.foreach(s => assert(rows(s) == pi(s), s))
    // truncating divisions only ever LOSE mass, boundedly
    val mass = rows.values.sum
    assert(mass <= 1000000L && mass > 990000L, mass)
  }

  test("absorption prob: matches the 6-round fixed-point recompute, " +
      "purchase pinned at 1e6, bounded") {
    val rows = TimeSeries.eventsAbsorptionProb(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("absorb6_micro")).toMap
    assert(rows("purchase") == 1000000L)
    assert(rows.values.forall(v => v >= 0L && v <= 1000000L))
    // exact recompute from the collected transition grid
    val trans = TimeSeries.eventsMarkovTransitions(spark, sfDir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Long]("n")))
      .toMap
    val states = trans.keySet.flatMap(k => Seq(k._1, k._2))
    val tot = states.map(s =>
      s -> trans.collect { case ((a, _), c) if a == s => c }.sum).toMap
    var a = states.map(s =>
      s -> (if (s == "purchase") 1000000L else 0L)).toMap
    for (_ <- 1 to TimeSeries.AbsorbSteps) {
      a = states.map { s =>
        s -> (if (s == "purchase") 1000000L
        else {
          val num = states.toSeq.map(t =>
            BigInt(trans.getOrElse((s, t), 0L)) * a(t)).sum
          if (tot(s) == 0L) 0L else (num / tot(s)).toLong
        })
      }.toMap
    }
    states.foreach(s => assert(rows(s) == a(s), s))
  }

  test("scd2 merge: incremental apply reproduces the full rebuild " +
      "row for row") {
    val merged = TimeSeries.scd2MergeIncremental(spark, sfDir)
    val rebuilt = TimeSeries.scd2History(spark, sfDir)
      .select(merged.columns.map(col): _*)
    assert(merged.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(merged).isEmpty)
    // the cut actually splits the corpus: both sides non-trivial
    val cut = lit(TimeSeries.Scd2AsofTs).cast("timestamp")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    assert(ev.filter(col("ts") <= cut).count() > 0)
    assert(ev.filter(col("ts") > cut).count() > 0)
  }

  test("cohort ltv: cumulative revenue monotone per cohort, ltv = " +
      "cum div members, buyers bounded by cohort size") {
    val rows = TimeSeries.eventsCohortLtv(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getDate(0)).foreach { case (_, rs) =>
      val byAge = rs.sortBy(_.getAs[Int]("age_week"))
      val cum = byAge.map(_.getAs[Long]("cum_rev_cents"))
      assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
      // running sum reconstructs from the per-age cells
      assert(cum.last == byAge.map(_.getAs[Long]("rev_cents")).sum)
      byAge.foreach { r =>
        assert(r.getAs[Long]("n_buyers") <=
          r.getAs[Long]("cohort_users"))
        assert(r.getAs[Long]("ltv_cents_per_user") ==
          r.getAs[Long]("cum_rev_cents") /
            r.getAs[Long]("cohort_users"))
        assert(r.getAs[Int]("age_week") >= 0)
      }
    }
    // cohort sizes partition the user universe
    val nUsers = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id")).distinct().count()
    val sizes = rows.groupBy(_.getDate(0)).view
      .mapValues(_.head.getAs[Long]("cohort_users")).values.sum
    assert(sizes <= nUsers)
  }

  test("forecast eval: exact recompute from the holt frame, skill " +
      "identity holds") {
    val r = graft.ops.TimeSeries.timeseriesForecastEval(spark, sfDir)
      .collect().head
    val h = graft.ops.TimeSeries.timeseriesHolt(spark, sfDir)
      .select(col("user_id"), col("ts_sec"), col("event_id"),
        col("v_micro"), col("forecast_micro")).collect()
      .map(x => (x.getLong(0), x.get(1).toString, x.getLong(2),
        x.getLong(3), x.getLong(4)))
      .groupBy(_._1).values.flatMap { g =>
        val s = g.sortBy(t => (t._2, t._3))
        s.zip(s.drop(1)).map { case (a, b) => (a._5, a._4, b._4) }
      }.toSeq // (forecast, cur, next-actual)
    val n = h.size.toLong
    assert(r.getAs[Long]("n_eval") == n)
    val ae = h.map(t => BigInt((t._1 - t._3).abs)).sum
    val nae = h.map(t => BigInt((t._2 - t._3).abs)).sum
    def fd(num: BigInt, den: BigInt): BigInt =
      (num - ((num % den + den) % den)) / den
    assert(r.getAs[Long]("mae_micro") == fd(ae, BigInt(n)).toLong)
    assert(r.getAs[Long]("naive_mae_micro") == fd(nae, BigInt(n)).toLong)
    val terms = h.filter(t => t._1.abs + t._3.abs > 0)
      .map(t => BigInt(2000) * BigInt((t._1 - t._3).abs)
        / (BigInt(t._1.abs) + BigInt(t._3.abs)))
    assert(r.getAs[Long]("smape_permille") ==
      fd(terms.sum, BigInt(terms.size)).toLong)
    assert(r.getAs[Long]("skill_permille") ==
      fd(BigInt(1000) * (nae - ae), nae).toLong)
    // purchases are near-noise, so persistence is a strong baseline:
    // the skill score must be SMALL either way — the honest read this
    // eval key exists to surface (|skill| < 100 permille on this data)
    assert(math.abs(r.getAs[Long]("skill_permille")) < 100L)
  }

  test("cuped lift: exact-moment recompute reproduces every field, " +
      "adjustment removes variance") {
    val r = graft.ops.TimeSeries.eventsCupedLift(spark, sfDir)
      .collect().head
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").cast("string"), col("value"))
      .collect().map(e => (e.getLong(0), e.getString(1), e.getDouble(2)))
    val per = ev.groupBy(_._1).map { case (uid, es) =>
      val x = es.filter(_._2 < "2024-01-16")
        .map(e => math.round(e._3 * 100)).sum
      val y = es.filter(_._2 >= "2024-01-16")
        .map(e => math.round(e._3 * 100)).sum
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-ab:$uid".getBytes("UTF-8"))
      val v = java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.take(15), 16) % 2
      (v, BigInt(x), BigInt(y))
    }.toSeq
    def mom(v: Long) = {
      val g = per.filter(_._1 == v)
      (BigInt(g.length), g.map(_._2).sum, g.map(_._3).sum,
        g.map(t => t._2 * t._2).sum, g.map(t => t._2 * t._3).sum,
        g.map(t => t._3 * t._3).sum)
    }
    val (na, sxa, sya, sxxa, sxya, syya) = mom(0)
    val (nb, sxb, syb, sxxb, sxyb, syyb) = mom(1)
    val (nn, sxp, syp) = (na + nb, sxa + sxb, sya + syb)
    val aa = nn * (sxya + sxyb) - sxp * syp
    val bb = nn * (sxxa + sxxb) - sxp * sxp
    val dy = nn * (syya + syyb) - syp * syp
    def fd(num: BigInt, den: BigInt): BigInt =
      (num - ((num % den + den) % den)) / den
    val th = fd(BigInt(1000000) * aa, bb)
    assert(r.getAs[Long]("n_a") == na.toLong)
    assert(r.getAs[Long]("n_b") == nb.toLong)
    assert(r.getAs[Long]("theta_micro") == th.toLong)
    assert(r.getAs[Long]("mean_y_a_micro") ==
      fd(BigInt(1000000) * sya, na).toLong)
    assert(r.getAs[Long]("mean_yadj_a_micro") ==
      fd(BigInt(1000000) * sya * nn - th * (sxa * nn - sxp * na),
        na * nn).toLong)
    assert(r.getAs[Long]("mean_yadj_b_micro") ==
      fd(BigInt(1000000) * syb * nn - th * (sxb * nn - sxp * nb),
        nb * nn).toLong)
    val vr = fd(BigInt(1000) * (BigInt("1000000000000") * dy
      - BigInt(2000000) * th * aa + th * th * bb),
      BigInt("1000000000000") * dy)
    assert(r.getAs[Long]("varratio_permille") == vr.toLong)
    // optimal θ can only shrink variance; quantizing θ to micro-units
    // perturbs the ratio by ≤ (1e-6)²·var(x)/var(y), so at worst the
    // floor lands exactly on 1000 — never above, never negative
    assert(vr >= 0 && vr <= 1000, vr.toString)
  }

  test("bollinger breakout: trailing-window census recomputes " +
      "from raw daily cents, current day excluded from its own band") {
    val rows = graft.ops.TimeSeries
      .timeseriesBollingerBreakout(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows.nonEmpty)
    val daily = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("x"))
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("x")))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(v => BigInt(v._3)).toVector).toMap
    daily.foreach { case (et, xs) =>
      var nDays = 0L; var nHi = 0L; var nLo = 0L
      for (i <- xs.indices if i >= 14) {
        val w = xs.slice(i - 14, i)
        val s1 = w.sum; val s2 = w.map(v => v * v).sum
        val d = BigInt(14) * xs(i) - s1
        val v = BigInt(14) * s2 - s1 * s1
        nDays += 1
        if (d > 0 && d * d > 4 * v) nHi += 1
        if (d < 0 && d * d > 4 * v) nLo += 1
      }
      if (nDays > 0) {
        val r = rows(et)
        assert(r.getAs[Long]("n_days") == nDays, et)
        assert(r.getAs[Long]("n_hi") == nHi, et)
        assert(r.getAs[Long]("n_lo") == nLo, et)
        assert(r.getAs[Long]("breakout_permille") ==
          1000L * (nHi + nLo) / nDays, et)
      } else assert(!rows.contains(et), et)
    }
  }

  test("rsi: permille and state recompute from raw daily deltas; " +
      "cross-multiplied calls agree with the permille thresholds") {
    val out = graft.ops.TimeSeries.timeseriesRsi(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toString) -> r).toMap
    assert(out.nonEmpty)
    val daily = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("x"))
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("x")))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(v => (v._2, v._3)).toVector).toMap
    var checked = 0
    daily.foreach { case (et, xs) =>
      val deltas = xs.indices.drop(1)
        .map(i => (xs(i)._1, xs(i)._2 - xs(i - 1)._2))
      for (i <- deltas.indices if i >= 13) {
        val w = deltas.slice(i - 13, i + 1)
        val g = w.map(_._2).filter(_ > 0).sum
        val l = -w.map(_._2).filter(_ < 0).sum
        val r = out((et, deltas(i)._1))
        if (g + l == 0) {
          assert(r.isNullAt(r.fieldIndex("rsi_permille")), et)
          assert(r.isNullAt(r.fieldIndex("state")), et)
        } else {
          val rsi = 1000L * g / (g + l)
          assert(r.getAs[Long]("rsi_permille") == rsi, (et, i))
          val expState = if (3 * g >= 7 * l) "overbought"
            else if (7 * g <= 3 * l) "oversold" else "neutral"
          assert(r.getAs[String]("state") == expState, (et, i))
          // the integer calls must agree with the permille thresholds
          assert((expState == "overbought") == (rsi >= 700), (et, i))
        }
        checked += 1
      }
    }
    assert(checked == out.size)
  }

  test("new vs returning: daily split recomputes from first-seen " +
      "days; day one is all-new and the split partitions actives") {
    val rows = graft.ops.TimeSeries.eventsNewVsReturning(spark, sfDir)
      .collect().sortBy(_.getAs[java.sql.Date]("day").toString)
    val ud = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("day").toString))
    val first = ud.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val byDay = ud.groupBy(_._2)
    assert(rows.length == byDay.size)
    rows.foreach { r =>
      val day = r.getAs[java.sql.Date]("day").toString
      val act = byDay(day)
      val nNew = act.count(u => first(u._1) == day).toLong
      assert(r.getAs[Long]("n_active") == act.length.toLong, day)
      assert(r.getAs[Long]("n_new") == nNew, day)
      assert(r.getAs[Long]("n_returning") == act.length - nNew, day)
      assert(r.getAs[Long]("new_permille") ==
        1000 * nNew / act.length, day)
    }
    assert(rows.head.getAs[Long]("new_permille") == 1000L)
  }

  test("session depth histogram: distribution reconciles with the " +
      "registered sessionize frame and the bounce-rate bucket") {
    val ses = graft.ops.Windows.windowSessionize(spark, sfDir)
      .collect().map(_.getAs[Long]("n_events"))
    val rows = graft.ops.TimeSeries
      .eventsSessionDepthHistogram(spark, sfDir).collect()
    val expect = ses.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val d = r.getAs[Long]("n_events")
      assert(r.getAs[Long]("n_sessions") == expect(d), d)
      assert(r.getAs[Long]("share_permille") ==
        1000 * expect(d) / ses.length, d)
    }
    // bucket 1 must equal the bounce-rate keys' total bounce count
    val bounces = graft.ops.TimeSeries.eventsBounceRate(spark, sfDir)
      .collect().map(_.getAs[Long]("n_bounce")).sum
    assert(rows.find(_.getAs[Long]("n_events") == 1L)
      .map(_.getAs[Long]("n_sessions")).getOrElse(0L) == bounces)
  }

  test("repeat purchase rate: cohort cells recompute from raw " +
      "purchase streams and buyers partition across cohorts") {
    val rows = graft.ops.TimeSeries
      .eventsRepeatPurchaseRate(spark, sfDir).collect()
    val users = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("CAST(date_trunc('second', ts) AS LONG)").as("sec"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sec")))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val cohorts = users.toVector.map { case (_, secs) =>
      (secs.min / 604800, secs.length) }
    val byW = cohorts.groupBy(_._1)
    assert(rows.length == byW.size)
    assert(rows.map(_.getAs[Long]("n_buyers")).sum == users.size.toLong)
    rows.foreach { r =>
      val cs = byW(r.getAs[Long]("cohort_week"))
      val rep = cs.count(_._2 >= 2).toLong
      assert(r.getAs[Long]("n_buyers") == cs.length.toLong)
      assert(r.getAs[Long]("n_repeat") == rep)
      assert(r.getAs[Long]("repeat_permille") ==
        1000 * rep / cs.length)
    }
  }

  test("bounce rate: census reconciles with the registered sessionize " +
      "frame and the permille is the exact ratio") {
    val ses = graft.ops.Windows.windowSessionize(spark, sfDir)
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("session_start")
        .toLocalDateTime.toLocalDate.toString,
        r.getAs[Long]("n_events")))
    val rows = graft.ops.TimeSeries.eventsBounceRate(spark, sfDir)
      .collect()
    val byDay = ses.groupBy(_._1)
    assert(rows.length == byDay.size)
    rows.foreach { r =>
      val day = r.getAs[java.sql.Date]("day").toString
      val s = byDay(day)
      val b = s.count(_._2 == 1L).toLong
      assert(r.getAs[Long]("n_sessions") == s.length.toLong, day)
      assert(r.getAs[Long]("n_bounce") == b, day)
      assert(r.getAs[Long]("bounce_permille") == 1000 * b / s.length,
        day)
    }
  }

  test("hourly profile: shares are exact permille per cell and is_peak " +
      "marks each type's modal hour with earliest-hour tie-break") {
    val rows = graft.ops.TimeSeries.eventsHourlyProfile(spark, sfDir)
      .collect()
    val cells = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), hour(col("ts")).cast("long").as("hr"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hr")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byType = cells.groupBy(_._1._1)
    assert(rows.length == cells.size)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val hr = r.getAs[Long]("hr")
      val n = cells((et, hr))
      val t = byType(et).values.sum
      assert(r.getAs[Long]("n") == n, (et, hr))
      assert(r.getAs[Long]("share_permille") == 1000 * n / t, (et, hr))
      val peak = byType(et).toVector
        .map { case ((_, h), c) => (-c, h) }.min._2
      assert(r.getAs[Boolean]("is_peak") == (hr == peak), (et, hr))
    }
  }

  test("sma cross: 7/21 crossover census recomputes from raw daily " +
      "cents; crosses only counted against a complete previous day") {
    val rows = graft.ops.TimeSeries.timeseriesSmaCross(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows.nonEmpty)
    val daily = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("x"))
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("x")))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(v => BigInt(v._3)).toVector).toMap
    daily.foreach { case (et, xs) =>
      val above = (20 until xs.length).map { i =>
        val s7 = xs.slice(i - 6, i + 1).sum
        val s21 = xs.slice(i - 20, i + 1).sum
        s7 * 3 > s21
      }
      if (above.nonEmpty) {
        val r = rows(et)
        assert(r.getAs[Long]("n_days") == above.length.toLong, et)
        assert(r.getAs[Long]("days_above") ==
          above.count(identity).toLong, et)
        assert(r.getAs[Long]("n_golden") == above.zip(above.tail)
          .count { case (p, c) => c && !p }.toLong, et)
        assert(r.getAs[Long]("n_death") == above.zip(above.tail)
          .count { case (p, c) => p && !c }.toLong, et)
      } else assert(!rows.contains(et), et)
    }
  }
}
