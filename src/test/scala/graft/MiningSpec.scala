package graft

import graft.ops.Mining
import org.apache.spark.sql.functions._

/** Invariants for the mining / decision-support family (the DuckDB
  * oracle checks exact values; these pin the algebraic properties that
  * must hold at ANY scale). */
class MiningSpec extends SparkSpec {

  test("frequent pairs: support threshold + downward closure") {
    val pairs = Mining.mineFrequentPairs(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Long]("pair_support") >= Mining.MinSupport))
    // downward closure: a pair's support cannot exceed either item's
    val t = Tables(spark, sfDir)
    val isup = t.lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { p =>
      val s = p.getAs[Long]("pair_support")
      assert(s <= isup(p.getAs[Long]("part_a")))
      assert(s <= isup(p.getAs[Long]("part_b")))
    }
  }

  test("assoc rules: two per pair, bounded confidence, symmetric lift") {
    val nPairs = Mining.mineFrequentPairs(spark, sfDir).count()
    val rules = Mining.mineAssocRules(spark, sfDir).collect()
    assert(rules.length == 2 * nPairs)
    assert(rules.forall(r => r.getAs[Long]("conf_permille") >= 0 &&
      r.getAs[Long]("conf_permille") <= 1000))
    // lift's cross-product is commutative, so the floor division gives
    // the IDENTICAL value in both directions
    val lift = rules.map(r => (r.getAs[Long]("antecedent"),
      r.getAs[Long]("consequent")) -> r.getAs[Long]("lift_permille")).toMap
    lift.foreach { case ((a, c), l) => assert(lift((c, a)) == l) }
  }

  test("skyline: sound (nothing dominated) and complete (everything " +
      "excluded is dominated)") {
    val parts = Tables(spark, sfDir).part
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        col("p_size")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val sky = Mining.querySkyline(spark, sfDir).collect()
      .map(r => r.getAs[Long]("p_partkey")).toSet
    def dominated(b: String, pr: Double, sz: Int) = parts.exists {
      case (qb, _, qp, qs) => qb == b && qp <= pr && qs >= sz &&
        (qp < pr || qs > sz)
    }
    parts.foreach { case (b, k, pr, sz) =>
      assert(sky.contains(k) == !dominated(b, pr, sz),
        s"part $k skyline membership mismatch")
    }
  }

  test("bloom-filtered join equals the plain semi-join (no false " +
      "negatives survive, false positives removed)") {
    val t = Tables(spark, sfDir)
    val expect = t.lineitem
      .join(t.part.filter(col("p_size") === 50).select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_lines"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Mining.joinBloomFiltered(spark, sfDir).collect()
      .map(r => r.getAs[Long]("l_partkey") -> r.getAs[Long]("n_lines"))
      .toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("scd1 merge: action accounting and key uniqueness") {
    val base = Tables(spark, sfDir).customer
    val nBase = base.count()
    val nDel = base.filter(col("c_custkey") % 10 === 7).count()
    val nUpd = base.filter(col("c_custkey") % 10 === 3).count()
    val nIns = base.filter(col("c_custkey") % 10 === 1).count()
    val out = Mining.tableMergeScd1(spark, sfDir)
    val byAction = out.groupBy(col("action")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byAction("updated") == nUpd)
    assert(byAction("inserted") == nIns)
    assert(byAction("kept") == nBase - nDel - nUpd)
    assert(out.select(col("custkey")).distinct().count() == out.count())
  }

  test("seq pairs: asymmetric support, ≥ MinSupport, and one pattern's " +
      "support equals a first-principles recompute") {
    val rows = Mining.mineSeqPairs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("seq_support") >= Mining.MinSupport)
      assert(r.getAs[String]("brand_a") != r.getAs[String]("brand_b"))
    }
    // recompute the top pattern's support driver-side from raw tables
    val top = rows.head
    val (ba, bb) = (top.getAs[String]("brand_a"),
      top.getAs[String]("brand_b"))
    val t = Tables(spark, sfDir)
    val ords = t.orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("string"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._2).view.mapValues(_.sortBy(o => (o._3, o._1))
        .take(Mining.MaxSeqOrders)).toMap
    val brandOf = t.lineitem.select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val partBrand = t.part.select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val support = ords.count { case (_, os) =>
      val seq = os.map(o => brandOf.getOrElse(o._1, Set.empty)
        .map(partBrand))
      seq.indices.exists(i => seq(i).contains(ba) &&
        (i + 1 until seq.length).exists(j => seq(j).contains(bb)))
    }
    assert(top.getAs[Long]("seq_support") == support,
      s"top pattern ($ba→$bb) support mismatch")
  }

  test("gini impurity: bounded by the k-class maximum, 0 iff one class") {
    val rows = graft.ops.Stats.aggGiniImpurity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getAs[Long]("n_classes")
      val g = r.getAs[Long]("gini_micro")
      val cap = 1000000L * (k - 1) / k // uniform-over-k upper bound
      assert(g >= 0 && g <= cap, s"gini $g outside [0, $cap] for k=$k")
      if (k == 1) assert(g == 0)
    }
  }

  test("linreg: per-brand slope equals a driver-side exact recompute") {
    val rows = graft.ops.Stats.statsLinreg(spark, sfDir).collect()
    assert(rows.length == 25)
    val t = Tables(spark, sfDir)
    val yearly = t.lineitem
      .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"),
        (year(col("o_orderdate")) - lit(1995)).cast("long").as("x"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .as("y"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("x"),
        r.getAs[Long]("y")))
      .groupBy(_._1)
    rows.foreach { r =>
      val pts = yearly(r.getString(0)).map(p => (p._2, p._3))
      val n = pts.length.toLong
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      assert(r.getAs[Long]("slope_milli") ==
        1000 * (n * sxy - sx * sy) / (n * sxx - sx * sx))
    }
  }

  test("chi2: grid complete, totals conserved, contributions and " +
      "statistic match an exact recompute") {
    val rows = graft.ops.Stats.statsChi2(spark, sfDir).collect()
    val obs = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("o"))
      .toMap
    val langs = obs.keys.map(_._1).toSeq.distinct
    val srcs = obs.keys.map(_._2).toSeq.distinct
    assert(rows.length == langs.length * srcs.length) // full R×C grid
    val n = obs.values.sum
    assert(rows.map(_.getAs[Long]("observed")).sum == n)
    val rTot = obs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cTot = obs.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    var total = 0L
    rows.foreach { r =>
      val (l, s) = (r.getString(0), r.getString(1))
      val o = r.getAs[Long]("observed")
      assert(o == obs.getOrElse((l, s), 0L))
      val e = rTot(l).toDouble * cTot(s) / n
      assert(r.getAs[Long]("expected_centi") == rTot(l) * cTot(s) * 100 / n)
      val contrib = math.floor((o - e) * (o - e) / e * 1000000.0 + 0.5)
      assert(r.getAs[Long]("contrib_micro") == contrib.toLong)
      total += contrib.toLong
      assert(r.getAs[Long]("dof") ==
        (langs.length - 1).toLong * (srcs.length - 1))
    }
    assert(rows.forall(_.getAs[Long]("chi2_micro") == total))
  }

  test("rolling slope: every trailing-5 frame matches the exact " +
      "integer OLS recompute; variance-free frames are NULL") {
    val rows = graft.ops.Windows.windowRollingSlope(spark, sfDir)
      .collect()
    val orders = Tables(spark, sfDir).orders
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1970-01-01"))
          .cast("long").as("x"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == orders.length)
    val frames = orders.groupBy(_._1).view.mapValues { os =>
      val sorted = os.sortBy(o => (o._3, o._2))
      sorted.zipWithIndex.map { case ((_, ok, _, _), i) =>
        ok -> sorted.slice(math.max(0, i - 4), i + 1)
      }.toMap
    }.toMap
    rows.foreach { r =>
      val fr = frames(r.getAs[Long]("o_custkey"))(r.getAs[Long]("o_orderkey"))
      val nn = fr.length.toLong
      assert(r.getAs[Long]("n") == nn)
      val sx = fr.map(_._3).sum; val sy = fr.map(_._4).sum
      val sxx = fr.map(o => o._3 * o._3).sum
      val sxy = fr.map(o => o._3 * o._4).sum
      val den = nn * sxx - sx * sx
      if (den == 0) assert(r.isNullAt(r.fieldIndex("slope_milli")))
      else assert(r.getAs[Long]("slope_milli") ==
        1000 * (nn * sxy - sx * sy) / den)
    }
  }

  test("ks test: exact cross-multiplied distance matches a driver " +
      "recompute over both samples") {
    val r = graft.ops.Stats.statsKsTest(spark, sfDir).collect().head
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), col("n_chars")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val a = docs.filter(_._1 == "src0").map(_._2).sorted
    val b = docs.filter(_._1 == "src1").map(_._2).sorted
    assert(r.getAs[Long]("n_a") == a.length.toLong)
    assert(r.getAs[Long]("n_b") == b.length.toLong)
    val support = (a ++ b).distinct.sorted
    val dn = support.map(v => v ->
      math.abs(a.count(_ <= v).toLong * b.length -
        b.count(_ <= v).toLong * a.length)).toMap
    val best = support.map(v => (dn(v), v)).sortBy(p => (-p._1, p._2)).head
    assert(r.getAs[Long]("d_num") == best._1)
    assert(r.getAs[Long]("d_at") == best._2)
    assert(r.getAs[Long]("ks_permille") ==
      1000 * best._1 / (a.length.toLong * b.length))
  }

  test("entropy: per-source language-mix entropy matches recompute " +
      "and sits in [0, ln(L)]") {
    val rows = graft.ops.Stats.statsEntropy(spark, sfDir).collect()
    val cl = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("c")))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.length == cl.size)
    rows.foreach { r =>
      val cs = cl(r.getString(0))
      val n = cs.sum
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("n_langs") == cs.length.toLong)
      val exp = cs.map { c =>
        val p = c.toDouble / n
        math.floor(-p * math.log(p) * 1000000.0 + 0.5).toLong
      }.sum
      val got = r.getAs[Long]("entropy_micro")
      assert(got == exp, s"${r.getString(0)}: $got vs $exp")
      assert(got >= 0 &&
        got <= math.ceil(math.log(cs.length.toDouble) * 1000000).toLong)
    }
  }

  test("seq triples: top-20 matches a full driver-side enumeration, " +
      "support anti-monotone vs pairs") {
    val rows = graft.ops.Mining.mineSeqTriples(spark, sfDir).collect()
    assert(rows.length <= 20)
    val t = Tables(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val ob = t.orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= graft.ops.Mining.MaxSeqOrders)
      .join(t.lineitem.select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .join(t.part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("p_brand")).distinct()
      .withColumn("o_orderdate",
        col("o_orderdate").cast("timestamp").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val support = ob.groupBy(_._1).values.flatMap { evs =>
      val es = evs.map(e => ((e._3, e._2), e._4))
      (for {
        a <- es; b <- es if a._1._1 < b._1._1 ||
          (a._1._1 == b._1._1 && a._1._2 < b._1._2)
        c <- es if b._1._1 < c._1._1 ||
          (b._1._1 == c._1._1 && b._1._2 < c._1._2)
        if a._2 != b._2 && b._2 != c._2 && a._2 != c._2
      } yield (a._2, b._2, c._2)).distinct
    }.toSeq.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expTop = support.toSeq
      .map { case ((a, b, c), s) => (a, b, c, s) }
      .sortBy(x => (-x._4, x._1, x._2, x._3)).take(20)
    val got = rows.map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getAs[Long]("seq_support")))
    assert(got.toSeq == expTop, s"\ngot ${got.take(3).toSeq}…" +
      s"\nexp ${expTop.take(3)}…")
  }

  test("drawdown: per-user peak/trough replay exactly in cents") {
    val rows = graft.ops.TimeSeries.timeseriesDrawdown(spark, sfDir)
      .collect()
    val purch = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).cast("long").as("s"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) * 100 + 0.5).toLong))
    assert(rows.length == purch.map(_._1).distinct.length)
    val series = purch.groupBy(_._1)
    rows.foreach { r =>
      val vs = series(r.getLong(0)).sortBy(p => (p._3, p._2))
        .map(_._4)
      assert(r.getAs[Long]("n_purchases") == vs.length.toLong)
      assert(r.getAs[Long]("peak_cents") == vs.max)
      val dd = vs.scanLeft(Long.MinValue)(math.max).tail
        .zip(vs).map { case (pk, v) => pk - v }.max
      assert(r.getAs[Long]("max_drawdown_cents") == dd, r.getLong(0))
    }
  }

  test("qq table: nine deciles, nearest-rank exact for both samples") {
    val rows = graft.ops.Stats.statsQqTable(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 9L))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), col("n_chars"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def dec(src: String, i: Long): Long = {
      val s = docs.filter(_._1 == src).sortBy(d => (d._2, d._3))
      s(((i * s.length + 9) / 10 - 1).toInt)._2
    }
    rows.foreach { r =>
      val i = r.getAs[Long]("decile")
      assert(r.getAs[Long]("q_a") == dec("src0", i))
      assert(r.getAs[Long]("q_b") == dec("src1", i))
      assert(r.getAs[Long]("qq_diff") ==
        r.getAs[Long]("q_a") - r.getAs[Long]("q_b"))
    }
    // deciles are nondecreasing in i for each sample
    val qa = rows.map(_.getAs[Long]("q_a"))
    qa.sliding(2).foreach(w => assert(w(1) >= w(0)))
  }

  test("streaks: island decomposition replays exactly per user") {
    val rows = graft.ops.Windows.windowStreaks(spark, sfDir).collect()
    val purch = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).cast("long").as("s"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) * 100 + 0.5).toLong))
    assert(rows.length == purch.map(_._1).distinct.length)
    val series = purch.groupBy(_._1)
    rows.foreach { r =>
      val vs = series(r.getLong(0)).sortBy(p => (p._3, p._2))
        .map(_._4)
      val runs = scala.collection.mutable.ArrayBuffer[Long]()
      var cur = 0L
      vs.indices.foreach { i =>
        if (i == 0 || vs(i) <= vs(i - 1)) {
          if (cur > 0) runs += cur
          cur = 1L
        } else cur += 1
      }
      if (cur > 0) runs += cur
      assert(r.getAs[Long]("n_purchases") == vs.length.toLong)
      assert(r.getAs[Long]("longest_streak") == runs.max, r.getLong(0))
      assert(r.getAs[Long]("n_streaks") == runs.length.toLong)
    }
  }

  test("benford: digit census and reference replay exactly, shares " +
      "sum to ~1e6") {
    val rows = graft.ops.Stats.statsBenford(spark, sfDir).collect()
    val digits = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_totalprice")).collect()
      .map(r => math.floor(r.getDouble(0) * 100 + 0.5).toLong
        .toString.head.asDigit.toLong)
    val exp = digits.groupBy(identity).view.mapValues(_.length.toLong)
    assert(rows.map(_.getAs[Long]("digit")).toSet == exp.keySet)
    val total = digits.length.toLong
    rows.foreach { r =>
      val d = r.getAs[Long]("digit")
      assert(r.getAs[Long]("n") == exp(d))
      assert(r.getAs[Long]("obs_micro") == 1000000L * exp(d) / total)
      val b = math.log(1.0 + 1.0 / d) / math.log(10.0) * 1000000.0
      assert(r.getAs[Long]("benford_micro") == math.floor(b + 0.5).toLong)
      // transcendental-provenance guarantee (r12 audit): every value in
      // the enumerable 9-point log domain sits far from its round-half
      // boundary, so no cross-engine libm variance (~1e-15) can flip it
      val frac = b - math.floor(b)
      assert(math.abs(frac - 0.5) > 1e-3, s"digit $d near boundary: $b")
    }
    val s = rows.map(_.getAs[Long]("obs_micro")).sum
    assert(s > 999900L && s <= 1000000L) // floor-div shortfall only
  }

  test("volatility: trailing-5 exact variance replays per frame, " +
      "zero on 1-row frames") {
    val rows = graft.ops.Windows.windowVolatility(spark, sfDir)
      .collect()
    val orders = Tables(spark, sfDir).orders
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1970-01-01"))
          .cast("long").as("x"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val frames = orders.groupBy(_._1).view.mapValues { os =>
      val s = os.sortBy(o => (o._3, o._2))
      s.zipWithIndex.map { case ((_, ok, _, _), i) =>
        ok -> s.slice(math.max(0, i - 4), i + 1).map(_._4)
      }.toMap
    }.toMap
    rows.foreach { r =>
      val ys = frames(r.getAs[Long]("o_custkey"))(r.getAs[Long]("o_orderkey"))
      val n = ys.length.toLong
      assert(r.getAs[Long]("n") == n)
      val v = (n * ys.map(y => y * y).sum - ys.sum * ys.sum) / (n * n)
      assert(r.getAs[Long]("var_cents2") == v)
      if (n == 1) assert(v == 0L)
    }
  }

  test("skew/kurtosis: central moments replay exactly from decimal " +
      "power sums") {
    val rows = graft.ops.Stats.aggSkewKurtosis(spark, sfDir).collect()
    val xs = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_quantity")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val v = xs(r.getString(0))
      val n = v.length.toLong
      assert(r.getAs[Long]("n") == n)
      def psum(p: Int): Double =
        v.map(x => BigDecimal(Seq.fill(p)(x).product) // exact products
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val (s1, s2, s3, s4) = (psum(1), psum(2), psum(3), psum(4))
      val mu = s1 / n
      val m2 = s2 / n - mu * mu
      val m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu
      val m4 = s4 / n - 4.0 * mu * (s3 / n) + 6.0 * mu * mu * (s2 / n) -
        3.0 * mu * mu * mu * mu
      assert(r.getAs[Double]("skewness") == r6(m3 / (m2 * math.sqrt(m2))))
      assert(r.getAs[Double]("kurtosis_excess") ==
        r6(m4 / (m2 * m2) - 3.0))
    }
  }

  test("token histogram: power-of-two buckets replay, doc mass " +
      "conserved per source") {
    val rows = graft.ops.TextOps.corpusTokenHistogram(spark, sfDir)
      .collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length))
    val exp = docs.map { case (s, n) =>
      (s, java.lang.Long.highestOneBit(n.toLong))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.length == exp.size)
    rows.foreach { r =>
      val k = (r.getString(0), r.getAs[Long]("bucket_lo"))
      assert((k._2 & (k._2 - 1)) == 0L) // a power of two
      assert(r.getAs[Long]("n_docs") == exp(k), k)
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length.toLong)
  }

  test("star topk: 20 rows, revenue non-increasing, custkey breaks ties") {
    val rows = graft.ops.Relational.sqlStarTopk(spark, sfDir).collect()
    assert(rows.length == 20)
    val rev = rows.map(_.getAs[Double]("revenue"))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
  }

  test("lateral topk: at most 2 rows per customer, each exactly the " +
      "customer's top-2 orders by cents") {
    val rows = graft.ops.Relational.joinLateralTopk(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val byCust = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.groupBy(_.getLong(0)).foreach { case (ck, rs) =>
      assert(rs.length <= 2)
      val want = byCust(ck).sortBy(o => (-o._3, o._2)).take(2)
        .map(o => (o._2, o._3)).toSeq
      val got = rs.sortBy(r => (-r.getLong(2), r.getLong(1)))
        .map(r => (r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"cust $ck")
    }
    // every customer with at least one order is present
    assert(rows.map(_.getLong(0)).distinct.length == byCust.size)
  }

  test("bitmap distinct: popcount sum equals the exact distinct " +
      "count for every event type") {
    val rows = graft.ops.Aggregations.aggBitmapDistinct(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    val exact = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Boolean]("agree"))
      assert(r.getAs[Long]("n_users_bitmap") == exact(r.getString(0)))
      assert(r.getAs[Long]("n_users_exact") == exact(r.getString(0)))
      // chunking actually compresses: fewer chunks than users
      assert(r.getAs[Long]("n_chunks") <= r.getAs[Long]("n_users_exact"))
    }
  }

  test("roaring layout: container census replays first-principles, " +
      "counts exact, layout rule and byte accounting hold") {
    val rows = graft.ops.Aggregations.aggBitmapRoaring(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val pairs = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("user_id")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = pairs.groupBy(_._1)
    rows.foreach { r =>
      val t = r.getString(0)
      val users = byType(t).map(_._2).distinct
      val conts = users.groupBy(_ / 65536).view.mapValues(_.length).toMap
      val chunks = users.map(_ / 32).distinct.length
      assert(r.getAs[Long]("n_users") == users.length.toLong)
      assert(r.getAs[Long]("n_containers") == conts.size.toLong)
      val arr = conts.values.count(_ <= 4096)
      assert(r.getAs[Long]("n_array_containers") == arr.toLong)
      assert(r.getAs[Long]("n_bitmap_containers") ==
        (conts.size - arr).toLong)
      val bytes = conts.values
        .map(c => if (c <= 4096) 2L * c else 8192L).sum
      assert(r.getAs[Long]("roaring_bytes") == bytes)
      assert(r.getAs[Long]("chunk_bytes") == 8L * chunks)
      assert(r.getAs[Long]("permille_vs_chunks") ==
        1000L * bytes / (8L * chunks))
    }
  }

  test("power analysis: n_required matches the closed form computed " +
      "with exact rationals, ceiling holds") {
    val r = graft.ops.Stats.statsPowerSampleSize(spark, sfDir)
      .collect().head
    val cents = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .select(expr("CAST(round(value * 100) AS BIGINT)")).collect()
      .map(_.getLong(0)).map(BigInt(_))
    val n = BigInt(cents.length)
    val s1 = cents.sum; val s2 = cents.map(c => c * c).sum
    val mean = s1 / n
    val delta = s1 / (20 * n)
    val num = 2 * BigInt(7848878) * (n * s2 - s1 * s1)
    val den = BigInt(1000000) * n * n * delta * delta
    val nreq = (num + den - 1) / den
    assert(r.getAs[Long]("n_obs") == n.toLong)
    assert(r.getAs[Long]("mean_cents") == mean.toLong)
    assert(r.getAs[Long]("delta_cents") == delta.toLong)
    assert(r.getAs[Long]("n_required_per_arm") == nreq.toLong)
    // sanity: the ceiling never undershoots the real-valued formula
    val exact = 2.0 * 7.848878 * ((n * s2 - s1 * s1).toDouble
      / (n * n).toDouble) / (delta * delta).toDouble
    assert(nreq.toDouble >= exact - 1e-9)
  }

  test("session stats: census recomputes from a first-principles " +
      "sessionization, single-event share consistent") {
    val r = graft.ops.Streaming.eventsSessionStats(spark, sfDir)
      .collect().head
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"),
        date_trunc("second", col("ts")).cast("long")).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val sessions = ev.values.flatMap { ts =>
      val buf = scala.collection.mutable.Buffer.empty[Seq[Long]]
      var cur = scala.collection.mutable.Buffer(ts.head)
      ts.tail.foreach { t =>
        if (t - cur.last > 1800L) { buf += cur.toSeq
          cur = scala.collection.mutable.Buffer(t) }
        else cur += t
      }
      buf += cur.toSeq
      buf
    }.toSeq
    val nS = sessions.length.toLong
    assert(r.getAs[Long]("n_sessions") == nS)
    assert(r.getAs[Long]("n_events_total") ==
      sessions.map(_.length.toLong).sum)
    assert(r.getAs[Long]("single_permille") ==
      1000L * sessions.count(_.length == 1) / nS)
    // real event span (last - first), not the gap-inclusive window
    assert(r.getAs[Long]("mean_dur_sec") ==
      sessions.map(s => s.last - s.head).sum / nS)
    assert(r.getAs[Long]("max_events") ==
      sessions.map(_.length.toLong).max)
  }

  test("spearman: rho matches a first-principles average-rank " +
      "recompute and lies in [-1, 1]") {
    val r = graft.ops.Stats.statsSpearman(spark, sfDir).collect().head
    val spend = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("y"))
    val pairs = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("x"))
      .join(spend, col("c_custkey") === col("o_custkey"))
      .select("x", "y").collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    def avgRank2(vs: Array[Long]): Map[Long, Long] = {
      val sorted = vs.sorted
      // doubled average rank = min_rank + max_rank per tie group
      sorted.zipWithIndex.groupBy(_._1).map { case (v, g) =>
        v -> (g.map(_._2 + 1L).min + g.map(_._2 + 1L).max)
      }
    }
    val rxm = avgRank2(pairs.map(_._1)); val rym = avgRank2(pairs.map(_._2))
    val rx = pairs.map(p => BigInt(rxm(p._1)))
    val ry = pairs.map(p => BigInt(rym(p._2)))
    val n = BigInt(pairs.length)
    val num = (n * rx.zip(ry).map { case (a, b) => a * b }.sum
      - rx.sum * ry.sum).toDouble
    val den = math.sqrt(
      (n * rx.map(a => a * a).sum - rx.sum * rx.sum).toDouble
        * (n * ry.map(a => a * a).sum - ry.sum * ry.sum).toDouble)
    val expect = BigDecimal.valueOf(num / den)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("n") == pairs.length.toLong)
    assert(r.getAs[Double]("rho") == expect)
    assert(math.abs(r.getAs[Double]("rho")) <= 1.0)
  }

  test("key skew census: stats recompute per key, uniform keys read " +
      "~1000 permille, skew is max-to-mean exactly") {
    val rows = graft.ops.Stats.profileKeySkew(spark, sfDir).collect()
    assert(rows.length == 4)
    def recompute(table: String, key: String): (Long, Long, Long) = {
      val c = spark.read.parquet(s"$sfDir/$table.parquet")
        .groupBy(col(key)).agg(count(lit(1)).as("c")).collect()
        .map(_.getLong(1))
      (c.sum, c.length.toLong, c.max)
    }
    val expect = Map(
      "events.user_id" -> recompute("events", "user_id"),
      "lineitem.l_orderkey" -> recompute("lineitem", "l_orderkey"),
      "lineitem.l_partkey" -> recompute("lineitem", "l_partkey"),
      "orders.o_custkey" -> recompute("orders", "o_custkey"))
    rows.foreach { r =>
      val (n, d, mx) = expect(r.getString(0))
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_distinct") == d)
      assert(r.getAs[Long]("max_freq") == mx)
      val sk = r.getAs[Long]("skew_permille")
      assert(sk == 1000L * mx * d / n)
      assert(sk >= 1000L) // max >= mean always
    }
  }

  test("mann-whitney: 2U1 matches the brute-force pairwise count and " +
      "U1 + U2 = 2·na·nb") {
    val r = graft.ops.Stats.statsMannWhitney(spark, sfDir).collect().head
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), size(split(col("text"), " ")).cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val a = docs.filter(_._1 == "src0").map(_._2)
    val b = docs.filter(_._1 == "src1").map(_._2)
    val u1x2 = (for (x <- a; y <- b) yield
      if (x > y) 2L else if (x == y) 1L else 0L).sum
    assert(r.getAs[Long]("n_a") == a.length.toLong)
    assert(r.getAs[Long]("n_b") == b.length.toLong)
    assert(r.getAs[Long]("u1_x2") == u1x2)
    assert(r.getAs[Long]("u1_x2") + r.getAs[Long]("u2_x2") ==
      2L * a.length * b.length)
    assert(r.getAs[Long]("auc_micro") ==
      1000000L * u1x2 / (2L * a.length * b.length))
  }

  test("cramers v: effect size in [0, 1e6], chi2 total matches the " +
      "chi2 key's sum") {
    val r = graft.ops.Stats.statsCramersV(spark, sfDir).collect().head
    val v = r.getAs[Long]("cramers_v_micro")
    assert(v >= 0L && v <= 1000000L)
    val chi2 = graft.ops.Stats.statsChi2(spark, sfDir).collect()
      .head.getAs[Long]("chi2_micro")
    assert(r.getAs[Long]("chi2_micro") == chi2)
    val want = math.round(math.sqrt(chi2 / 1000000.0 /
      (r.getAs[Long]("n") * r.getAs[Long]("dof_min"))) * 1000000.0)
    assert(v == want)
  }

  test("pct change: recomputes from the daily frame, first day null, " +
      "signed truncation") {
    val rows = graft.ops.Windows.windowPctChange(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"),
        to_date(date_trunc("day", col("ts"))).as("d"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c"))
      .collect().map(r => (r.getLong(0), r.getDate(1), r.getLong(2)))
    assert(rows.length == daily.length)
    val byUser = daily.groupBy(_._1).view
      .mapValues(_.sortBy(_._2.getTime)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val want = byUser(u)
      val got = rs.sortBy(_.getDate(1).getTime)
      assert(got.head.isNullAt(got.head.fieldIndex("prev_cents")))
      got.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("rev_cents") == want(i)._3)
        if (i > 0) {
          val prev = want(i - 1)._3
          assert(r.getAs[Long]("prev_cents") == prev)
          assert(r.getAs[Long]("pct_change_permille") ==
            1000L * (want(i)._3 - prev) / prev)
        }
      }
    }
  }

  test("cohens d: exact rational d2 reproduces a float recompute, " +
      "magnitude bands read off the integer thresholds") {
    val r = graft.ops.Stats.statsCohensD(spark, sfDir).collect().head
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
    val df = s1a * nb - s1b * na
    val va = na * s2a - s1a * s1a; val vb = nb * s2b - s1b * s1b
    val d2 = BigInt(1000) * df * df * (na + nb - 2) /
      (na * nb * (va * nb + vb * na))
    assert(r.getAs[Long]("d2_milli") == d2.toLong)
    // float cross-check of the definition: d = (m1-m2)/s_pooled
    val m1 = s1a.toDouble / na.toDouble
    val m2 = s1b.toDouble / nb.toDouble
    val sp2 = (va.toDouble / na.toDouble + vb.toDouble / nb.toDouble) /
      (na + nb - 2).toDouble
    val d2f = (m1 - m2) * (m1 - m2) / sp2
    assert(math.abs(r.getAs[Long]("d2_milli") / 1000.0 - d2f) < 1e-2)
    val expectMag =
      if (d2 >= 640) "large" else if (d2 >= 250) "medium"
      else if (d2 >= 40) "small" else "negligible"
    assert(r.getAs[String]("magnitude") == expectMag)
  }

  test("wilcoxon signed-rank: doubled-rank statistic and tie-corrected " +
      "variance recompute, flag matches a float z away from boundary") {
    val r = graft.ops.Stats.statsWilcoxonSigned(spark, sfDir)
      .collect().head
    val ds = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg((sum(when(col("ts") >= lit("2024-01-16"),
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
        - sum(when(col("ts") < lit("2024-01-16"),
            expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L)))
        .as("d")).collect().map(_.getAs[Long]("d")).filter(_ != 0L)
    val n = ds.length.toLong
    // doubled average ranks of |d|
    val sorted = ds.map(math.abs).sorted
    val r2Of = sorted.zipWithIndex.groupBy(_._1).view.mapValues { g =>
      2L * (g.map(_._2).min + 1) + g.length - 1
    }.toMap
    val t2p = ds.filter(_ > 0).map(d => r2Of(math.abs(d))).sum
    val tcorr = sorted.groupBy(identity).values
      .map(_.length.toLong).map(t => t * t * t - t).sum
    val mu2 = n * (n + 1) / 2
    val var12 = 2 * n * (n + 1) * (2 * n + 1) - tcorr
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("n_pos") == ds.count(_ > 0).toLong)
    assert(r.getAs[Long]("t2_plus") == t2p)
    assert(r.getAs[Long]("mu2") == mu2)
    assert(r.getAs[Long]("var12") == var12)
    assert(r.getAs[Boolean]("is_significant") ==
      (12 * (t2p - mu2) * (t2p - mu2) >= 4 * var12))
    // float cross-check: z = (T - mu)/sigma with T = t2p/2 etc.
    val z = (t2p - mu2) / 2.0 / math.sqrt(var12 / 48.0)
    if (math.abs(math.abs(z) - 2.0) > 1e-6)
      assert(r.getAs[Boolean]("is_significant") == (math.abs(z) >= 2.0))
  }

  test("levene brown-forsythe: medians rank-addressed, z moments " +
      "recompute, F agrees with a float recompute to 1 micro-unit") {
    val r = graft.ops.Stats.statsLeveneBf(spark, sfDir).collect().head
    val xs = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderstatus"),
        expr("CAST(round(o_totalprice) AS BIGINT)")).collect()
      .map(row => (row.getString(0), row.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val zs = xs.map { case (g, v) =>
      val med = v((v.length + 1) / 2 - 1) // exact lower median
      g -> v.map(x => math.abs(x - med))
    }
    val n = BigInt(zs.values.map(_.length).sum)
    val k = BigInt(zs.size)
    def bi(l: Long) = BigInt(l)
    val s1t = zs.values.map(_.map(bi).sum).sum
    val bsum = zs.values.map { z =>
      val s1 = z.map(bi).sum
      BigInt(1000) * s1 * s1 / z.length
    }.sum
    val ssw = zs.values.map { z =>
      val s1 = z.map(bi).sum; val s2 = z.map(x => bi(x) * x).sum
      BigInt(1000) * (z.length * s2 - s1 * s1) / z.length
    }.sum
    val ssb = bsum - BigInt(1000) * s1t * s1t / n
    assert(r.getAs[Long]("n") == n.toLong)
    assert(r.getAs[Long]("k") == k.toLong)
    assert(r.getAs[Long]("ssb_milli") == ssb.toLong)
    assert(r.getAs[Long]("ssw_milli") == ssw.toLong)
    assert(r.getAs[Long]("f_milli") ==
      (BigInt(1000) * ssb * (n - k) / (ssw * (k - 1))).toLong)
    // sanity vs a float BF recompute
    val fFloat = (ssb.toDouble * (n - k).toDouble) /
      (ssw.toDouble * (k - 1).toDouble)
    assert(math.abs(r.getAs[Long]("f_milli") / 1e3 - fFloat) < 1e-2)
  }

  test("anova: SSB/SSW match the power-sum recompute and F is " +
      "non-negative") {
    val r = graft.ops.Stats.statsAnova(spark, sfDir).collect().head
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), col("n_chars")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val groups = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = docs.length.toLong
    val k = groups.size.toLong
    def bTerm(xs: Array[Long]) = {
      val s1 = xs.map(BigInt(_)).sum
      (BigInt(1000000) * s1 * s1 / xs.length).toLong
    }
    def wTerm(xs: Array[Long]) = {
      val s1 = xs.map(BigInt(_)).sum
      val s2 = xs.map(x => BigInt(x) * x).sum
      (BigInt(1000000) * (s2 * xs.length - s1 * s1) / xs.length).toLong
    }
    val s1t = docs.map(d => BigInt(d._2)).sum
    val bsum = groups.values.map(g => BigInt(bTerm(g))).sum
    val ssb = (bsum - BigInt(1000000) * s1t * s1t / n).toLong
    val ssw = groups.values.map(g => BigInt(wTerm(g))).sum.toLong
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("k") == k)
    assert(r.getAs[Long]("ssb_micro") == ssb)
    assert(r.getAs[Long]("ssw_micro") == ssw)
    val f = (BigInt(1000000) * ssb * (n - k) / (BigInt(ssw) * (k - 1)))
      .toLong
    assert(r.getAs[Long]("f_micro") == f)
    assert(f >= 0L)
  }

  test("theil-sen: per-brand slope is the lower median of the exact " +
      "pairwise slopes") {
    val rows = graft.ops.Stats.statsTheilSen(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val t = Tables(spark, sfDir)
    val yearly = t.lineitem
      .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"),
        (year(col("o_orderdate")) - lit(1995)).cast("long").as("x"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val ys = yearly(r.getString(0)).sortBy(_._2)
      // BigInt / truncates toward zero, same as Spark div / DuckDB //
      val slopes = (for {
        (_, xa, ya) <- ys; (_, xb, yb) <- ys if xa < xb
      } yield (BigInt(1000) * (yb - ya) / (xb - xa)).toLong).sorted
      assert(r.getAs[Long]("n_pairs") == slopes.length.toLong)
      assert(r.getAs[Long]("ts_slope_milli") ==
        slopes((slopes.length + 1) / 2 - 1), r.getString(0))
    }
  }

  test("bootstrap ci: range brackets the plain mean, 16 replicates, " +
      "weights recompute from the md5 draw") {
    val r = graft.ops.Stats.statsBootstrapCi(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_replicates") == 16L)
    val lo = r.getAs[Long]("boot_lo_cents")
    val hi = r.getAs[Long]("boot_hi_cents")
    assert(lo <= hi)
    assert(lo <= r.getAs[Long]("mean_cents") &&
      r.getAs[Long]("mean_cents") <= hi)
    // replicate means recomputed from first principles (md5 draw →
    // Poisson weight → weighted truncating mean)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(b: Int, id: Long): Long = {
      val hex = md.digest(s"graft-boot:$b:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val cuts = graft.ops.Stats.BootCuts
    val means = (1 to 16).map { b =>
      val ws = orders.map { case (id, c) =>
        val x = u(b, id)
        val w = cuts.indexWhere(x < _) match {
          case -1 => 4L; case i => i.toLong
        }
        (w, w * c)
      }
      ws.map(_._2).sum / ws.map(_._1).sum
    }
    assert(lo == means.min && hi == means.max)
  }

  test("gini: per-nation coefficient matches the sorted-rank recompute " +
      "and sits in [0, 1e6)") {
    val rows = graft.ops.Stats.statsGiniLorenz(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val t = Tables(spark, sfDir)
    val spend = t.orders
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byNation = t.customer
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view
      .mapValues(_.map(p => spend.getOrElse(p._2, 0L)).sorted).toMap
    rows.foreach { r =>
      val xs = byNation(r.getString(0))
      val n = xs.length.toLong
      val tot = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) =>
        BigInt(i + 1) * x }.sum
      val g = (BigInt(1000000) * (2 * six - BigInt(n + 1) * tot) /
        (BigInt(n) * tot)).toLong
      assert(r.getAs[Long]("n_cust") == n)
      assert(r.getAs[Long]("total_cents") == tot)
      assert(r.getAs[Long]("gini_micro") == g, r.getString(0))
      assert(g >= 0L && g < 1000000L)
    }
  }

  test("reservoir sample: per source exactly min(8, group size) rows, " +
      "and they are the hash-priority minima (salted cut = unsalted)") {
    val rows = graft.ops.Stats.sampleReservoirGroup(spark, sfDir)
      .collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def prio(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rsv:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.take(15), 16)
    }
    val expect = docs.groupBy(_._1).view.mapValues(_.map(_._2)
      .sortBy(id => (prio(id), id)).take(8).toSeq).toMap
    val got = rows.groupBy(_.getString(0))
    assert(got.keySet == expect.keySet)
    got.foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq ==
        (1 to rs.length))
      assert(rs.sortBy(_.getAs[Int]("rk"))
        .map(_.getAs[Long]("doc_id")).toSeq == expect(src), src)
      rs.foreach(r =>
        assert(r.getAs[Long]("prio") == prio(r.getAs[Long]("doc_id"))))
    }
  }

  test("recursive CTE reach: per-depth counts equal the direct " +
      "frontier recompute (region tree: nations, cust+supp, orders)") {
    val rows = graft.ops.Relational.sqlRecursiveReach(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        r.getAs[Long]("n_vertices")).toMap
    val t = Tables(spark, sfDir)
    val nat = t.nation.select(col("n_regionkey"), col("n_nationkey"))
      .collect().map(r => r.getInt(0) -> r.getInt(1))
    val custN = t.customer.select(col("c_custkey"), col("c_nationkey"))
      .collect().map(r => r.getInt(1)).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val suppN = t.supplier.select(col("s_suppkey"), col("s_nationkey"))
      .collect().map(r => r.getInt(1)).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    // depth 3 reaches an order via its customer (BY) OR via any of
    // its lineitem suppliers (FROM) — distinct order vertices
    val custNat = t.customer.select(col("c_custkey"), col("c_nationkey"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val suppNat = t.supplier.select(col("s_suppkey"), col("s_nationkey"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ords = t.orders.select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val liSupp = t.lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val off = graft.GraphModel.RegionOff
    nat.groupBy(_._1).foreach { case (reg, ns) =>
      val region = off + reg
      assert(rows((region, 0)) == 1L)
      assert(rows((region, 1)) == ns.length.toLong)
      val nkeys = ns.map(_._2).toSet
      assert(rows((region, 2)) ==
        ns.map(n => custN.getOrElse(n._2, 0L)
          + suppN.getOrElse(n._2, 0L)).sum)
      val reached3 = (ords.filter(o => nkeys(custNat(o._2))).map(_._1)
        ++ liSupp.filter(l => nkeys(suppNat(l._2))).map(_._1)).toSet
      assert(rows.get((region, 3)).getOrElse(0L) ==
        reached3.size.toLong, s"region $reg depth 3")
    }
  }

  test("psi drift: 10 bins, counts partition both years, terms " +
      "non-negative and match a driver-side smoothed recompute") {
    val rows = graft.ops.Stats.statsPsiDrift(spark, sfDir).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).toSeq == (0L to 9L))
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderdate").cast("string"), col("o_totalprice"))
      .collect()
      .map(r => (r.getString(0).take(4).toInt,
        math.round(r.getDouble(1) * 100)))
      .filter(t => t._1 == 1995 || t._1 == 1996)
    val lo = o.map(_._2).min; val hi = o.map(_._2).max
    def bin(c: Long): Long = (c - lo) * 10 / (hi - lo + 1)
    val na = o.filter(_._1 == 1995).groupBy(t => bin(t._2)).view
      .mapValues(_.length.toLong).toMap
    val nb = o.filter(_._1 == 1996).groupBy(t => bin(t._2)).view
      .mapValues(_.length.toLong).toMap
    val (ta, tb) = (na.values.sum, nb.values.sum)
    rows.foreach { r =>
      val b = r.getLong(0)
      assert(r.getAs[Long]("n_a") == na.getOrElse(b, 0L))
      assert(r.getAs[Long]("n_b") == nb.getOrElse(b, 0L))
      val p = (na.getOrElse(b, 0L) + 1).toDouble / (ta + 10)
      val q = (nb.getOrElse(b, 0L) + 1).toDouble / (tb + 10)
      assert(r.getAs[Long]("p_micro") ==
        math.floor(p * 1000000.0 + 0.5).toLong)
      val term = math.floor((p - q) * math.log(p / q)
        * 1000000.0 + 0.5).toLong
      assert(r.getAs[Long]("term_micro") == term, s"bin $b")
      assert(term >= 0L) // (p−q) and ln(p/q) always share a sign
    }
    assert(rows.map(_.getAs[Long]("n_a")).sum == ta)
    assert(rows.map(_.getAs[Long]("n_b")).sum == tb)
  }

  test("snapshot diff: classes partition the key set, unchanged has " +
      "zero delta, added equals the new customers' full revenue") {
    val rows = graft.ops.Relational.tableSnapshotDiff(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_keys"), r.getAs[Double]("delta_total"))).toMap
    assert(!rows.contains("removed")) // cumulative facts only grow
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"), col("o_orderdate").cast("string"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def cents(x: Double): Long = math.round(x * 100)
    val a = o.filter(_._2 < "1996-01-01").groupBy(_._1).view
      .mapValues(g => (g.map(t => cents(t._3)).sum, g.length)).toMap
    val b = o.filter(_._2 < "1997-01-01").groupBy(_._1).view
      .mapValues(g => (g.map(t => cents(t._3)).sum, g.length)).toMap
    val added = b.keySet -- a.keySet
    val changed = a.keySet.filter(k => b(k) != a(k))
    val unchanged = a.keySet.filter(k => b(k) == a(k))
    assert(rows("added")._1 == added.size.toLong)
    assert(rows.get("changed").map(_._1).getOrElse(0L) ==
      changed.size.toLong)
    assert(rows.get("unchanged").map(_._1).getOrElse(0L) ==
      unchanged.size.toLong)
    assert(rows.get("unchanged").forall(_._2 == 0.0))
    val addedCents = added.toSeq.map(k => b(k)._1).sum
    assert(math.round(rows("added")._2 * 100) == addedCents)
    val changedCents = changed.toSeq.map(k => b(k)._1 - a(k)._1).sum
    rows.get("changed").foreach(c =>
      assert(math.round(c._2 * 100) == changedCents))
  }

  test("cohens kappa: confusion matrix recomputes from raw docs, " +
      "kappa matches the exact BigInt rational and a float recompute") {
    val r = graft.ops.Stats.statsCohensKappa(spark, sfDir)
      .collect().head
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("w"))
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    val rated = docs.map { case (nc, w) =>
      (nc >= 200L, nc >= 4 * w && nc <= 8 * w) }
    val n = rated.length.toLong
    val n11 = rated.count { case (a, b) => a && b }.toLong
    val n10 = rated.count { case (a, b) => a && !b }.toLong
    val n01 = rated.count { case (a, b) => !a && b }.toLong
    val n00 = n - n11 - n10 - n01
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("n11") == n11)
    assert(r.getAs[Long]("n10") == n10)
    assert(r.getAs[Long]("n01") == n01)
    assert(r.getAs[Long]("n00") == n00)
    val e = BigInt(n11 + n10) * (n11 + n01) + BigInt(n01 + n00) * (n10 + n00)
    val kappa = (BigInt(1000) * (BigInt(n) * (n11 + n00) - e)) /
      (BigInt(n) * n - e)
    assert(r.getAs[Long]("kappa_permille") == kappa.toLong)
    // float cross-check of the definition
    val po = (n11 + n00).toDouble / n
    val pe = e.toDouble / (n.toDouble * n)
    assert(math.abs(r.getAs[Long]("kappa_permille") / 1000.0 -
      (po - pe) / (1 - pe)) < 2e-3)
    // kappa must sit strictly below raw agreement unless pe = 0
    assert(r.getAs[Long]("kappa_permille") <=
      r.getAs[Long]("po_permille"))
  }

  test("matthews corr: numerator exact from the recomputed confusion " +
      "matrix, mcc matches a float recompute and is bounded") {
    val r = graft.ops.Stats.statsMatthewsCorr(spark, sfDir)
      .collect().head
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("w"))
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    val rated = docs.map { case (nc, w) =>
      (nc >= 200L, nc >= 4 * w && nc <= 8 * w) }
    val n11 = rated.count { case (a, b) => a && b }.toLong
    val n10 = rated.count { case (a, b) => a && !b }.toLong
    val n01 = rated.count { case (a, b) => !a && b }.toLong
    val n00 = rated.length - n11 - n10 - n01
    assert(r.getAs[Long]("mcc_num") ==
      (BigInt(n11) * n00 - BigInt(n10) * n01).toLong)
    val marg = Seq(n11 + n10, n11 + n01, n00 + n10, n00 + n01)
    if (marg.contains(0L)) assert(r.isNullAt(r.fieldIndex("mcc")))
    else {
      val mcc = (BigInt(n11) * n00 - BigInt(n10) * n01).toDouble /
        math.sqrt(marg.map(_.toDouble).product)
      assert(math.abs(r.getAs[Double]("mcc") - mcc) < 2e-6)
      assert(math.abs(r.getAs[Double]("mcc")) <= 1.0)
    }
  }

  test("kendall tau-b: brute-force pair census over the bucketed grid " +
      "matches concordant/discordant and the tie-corrected tau") {
    val r = graft.ops.Stats.statsKendallTau(spark, sfDir)
      .collect().head
    val pts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(expr(s"n_chars div ${graft.ops.Stats.KendallBxWidth}"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)" +
          s" div ${graft.ops.Stats.KendallByWidth}"))
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    var conc = 0L; var disc = 0L
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val s = (pts(i)._1 - pts(j)._1) * (pts(i)._2 - pts(j)._2)
      if (pts(i)._1 != pts(j)._1 && pts(i)._2 != pts(j)._2) {
        if (s > 0) conc += 1 else disc += 1
      }
    }
    val n = pts.length.toLong
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("concordant") == conc)
    assert(r.getAs[Long]("discordant") == disc)
    val tx2 = pts.groupBy(_._1).values
      .map(g => BigInt(g.length) * (g.length - 1)).sum
    val ty2 = pts.groupBy(_._2).values
      .map(g => BigInt(g.length) * (g.length - 1)).sum
    val denom = math.sqrt(
      (BigInt(n) * (n - 1) - tx2).toDouble *
        (BigInt(n) * (n - 1) - ty2).toDouble)
    val tau = BigDecimal((conc - disc) * 2.0 / denom)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("tau") - tau) < 2e-6)
    assert(math.abs(r.getAs[Double]("tau")) <= 1.0)
  }

  test("fdr bh: per-type permutation p-values recompute exactly, " +
      "step-up flags are a prefix of the p-ascending order") {
    val rows = graft.ops.Stats.statsFdrBh(spark, sfDir).collect()
    assert(rows.nonEmpty)
    def md5h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    }
    val ut = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("x"))
      .collect()
      .map(row => (row.getLong(0), row.getString(1), row.getLong(2)))
    val types = ut.map(_._2).distinct.sorted
    val k = types.length.toLong
    assert(rows.length.toLong == k)
    val expectP = types.map { t =>
      val g = ut.filter(_._2 == t)
      def split(f: Long => Long) = {
        val (a, b) = g.partition { case (u, _, _) => f(u) == 0 }
        (BigInt(a.length), a.map(x => BigInt(x._3)).sum,
          BigInt(b.length), b.map(x => BigInt(x._3)).sum)
      }
      val (na, s1a, nb, s1b) = split(u => md5h60(s"graft-ab:$u") % 2)
      val dObs = (s1a * nb - s1b * na).abs; val wObs = na * nb
      val ex = (0 until graft.ops.Stats.FdrB).count { b =>
        val (pna, ps1a, pnb, ps1b) =
          split(u => md5h60(s"graft-fdr:$b:$u") % 2)
        (ps1a * pnb - ps1b * pna).abs * wObs >= dObs * (pna * pnb)
      }
      t -> 1000L * ex / graft.ops.Stats.FdrB
    }.toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("p_permille") ==
        expectP(r.getAs[String]("event_type")))
    }
    // BH structure: ranks are 1..K in p-ascending (type tie-break)
    // order, thresholds are (50 i) div K, and the significant set is
    // exactly the prefix up to the LARGEST raw-passing rank
    val byRank = rows.sortBy(_.getAs[Long]("rank_asc"))
    assert(byRank.map(_.getAs[Long]("rank_asc")).toSeq ==
      (1L to k).toSeq)
    assert(byRank.map(r => (r.getAs[Long]("p_permille"),
      r.getAs[String]("event_type"))).toSeq ==
      byRank.map(r => (r.getAs[Long]("p_permille"),
        r.getAs[String]("event_type"))).sortBy(identity).toSeq)
    byRank.foreach(r => assert(r.getAs[Long]("bh_threshold_permille")
      == 50L * r.getAs[Long]("rank_asc") / k))
    val rawPass = byRank.map(r =>
      r.getAs[Long]("p_permille") * k <= 50L * r.getAs[Long]("rank_asc"))
    val iMax = rawPass.lastIndexOf(true)
    byRank.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Boolean]("is_significant") == (i <= iMax)) }
  }

  test("hhi: exact ppm concentration recomputes from per-customer " +
      "spend; bounds 1/n <= HHI <= 1 and top-share <= sqrt(HHI) hold") {
    val rows = graft.ops.Stats.statsHhi(spark, sfDir).collect()
    assert(rows.length == 25)
    val spend = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .groupBy("o_custkey").agg(sum(col("c")).as("s"))
      .join(spark.read.parquet(s"$sfDir/customer.parquet")
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        "o_custkey")
      .collect()
      .map(r => (r.getAs[Int]("c_nationkey").toLong,
        r.getAs[Long]("s")))
      .groupBy(_._1).view.mapValues(_.map(v => BigInt(v._2))).toMap
    val names = spark.read.parquet(s"$sfDir/nation.parquet").collect()
      .map(r => r.getAs[String]("n_name") ->
        r.getAs[Int]("n_nationkey").toLong).toMap
    rows.foreach { r =>
      val ss = spend(names(r.getAs[String]("n_name")))
      val tot = ss.sum
      val hhi = BigInt(1000000) * ss.map(v => v * v).sum / (tot * tot)
      val top = BigInt(1000000) * ss.max / tot
      assert(r.getAs[Long]("n_customers") == ss.size.toLong)
      assert(r.getAs[Long]("hhi_ppm") == hhi)
      assert(r.getAs[Long]("top_share_ppm") == top)
      // 10^6/n <= HHI <= 10^6, and the max share can't exceed sqrt(HHI)
      assert(hhi >= BigInt(1000000) / ss.size && hhi <= BigInt(1000000))
      assert(top.toDouble <= math.sqrt(hhi.toDouble * 1e6) + 1)
    }
  }

  test("trimmed mean: sharded global rank drops exactly the n/10 " +
      "cheapest and priciest customers; both means recompute exactly") {
    val r = graft.ops.Stats.statsTrimmedMean(spark, sfDir)
      .collect().head
    val ss = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .groupBy("o_custkey").agg(sum(col("c")).as("s"))
      .collect().map(x => (x.getAs[Long]("s"), x.getAs[Long]("o_custkey")))
      .sortBy(identity).map(_._1)
    val n = ss.length.toLong
    val k = n / 10
    val kept = ss.slice(k.toInt, (n - k).toInt)
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("k_dropped") == k)
    assert(r.getAs[Long]("n_kept") == n - 2 * k)
    assert(r.getAs[Long]("mean_cents") ==
      (ss.map(BigInt(_)).sum / n).toLong)
    assert(r.getAs[Long]("trimmed_mean_cents") ==
      (kept.map(BigInt(_)).sum / kept.length).toLong)
    // the trim must bite from both tails: trimmed lies strictly
    // inside [min kept, max kept]
    assert(r.getAs[Long]("trimmed_mean_cents") >= kept.head &&
      r.getAs[Long]("trimmed_mean_cents") <= kept.last)
  }

  test("iqr outliers: grouped sharded rank reproduces per-nation " +
      "percentile_disc quartiles and the cross-multiplied fences") {
    val rows = graft.ops.Stats.statsIqrOutliers(spark, sfDir).collect()
    assert(rows.length == 25)
    val byNat = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .groupBy("o_custkey").agg(sum(col("c")).as("s"))
      .join(spark.read.parquet(s"$sfDir/customer.parquet")
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        "o_custkey")
      .collect()
      .map(r => (r.getAs[Int]("c_nationkey"), r.getAs[Long]("s")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    val keyOf = spark.read.parquet(s"$sfDir/nation.parquet").collect()
      .map(r => r.getAs[String]("n_name") ->
        r.getAs[Int]("n_nationkey")).toMap
    rows.foreach { r =>
      val ss = byNat(keyOf(r.getAs[String]("n_name")))
      val n = ss.length.toLong
      val q1 = ss(((n + 3) / 4 - 1).toInt)
      val q3 = ss(((3 * n + 3) / 4 - 1).toInt)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("q1_cents") == q1)
      assert(r.getAs[Long]("q3_cents") == q3)
      assert(r.getAs[Long]("n_high") ==
        ss.count(x => 2 * x > 5 * q3 - 3 * q1).toLong)
      assert(r.getAs[Long]("n_low") ==
        ss.count(x => 2 * x < 5 * q1 - 3 * q3).toLong)
    }
  }

  test("ols two: Cramer betas recompute from exact BigInt normal " +
      "equations and the fit beats the intercept-only model") {
    val r = graft.ops.Stats.statsOlsTwo(spark, sfDir).collect().head
    val grid = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(to_date(col("o_orderdate")).as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .groupBy("day").agg(sum(col("c")).as("y"))
      .select(datediff(col("day"), lit("1995-01-01")).cast("long")
          .as("x1"),
        when(dayofweek(col("day")).isin(1, 7), 1L).otherwise(0L)
          .as("x2"), col("y"))
      .collect()
      .map(x => (BigInt(x.getAs[Long]("x1")),
        BigInt(x.getAs[Long]("x2")), BigInt(x.getAs[Long]("y"))))
    val n = BigInt(grid.length)
    val sx1 = grid.map(_._1).sum; val sx2 = grid.map(_._2).sum
    val s11 = grid.map(g => g._1 * g._1).sum
    val s12 = grid.map(g => g._1 * g._2).sum
    val s22 = grid.map(g => g._2 * g._2).sum
    val sy = grid.map(_._3).sum
    val s1y = grid.map(g => g._1 * g._3).sum
    val s2y = grid.map(g => g._2 * g._3).sum
    def det(m: Seq[Seq[BigInt]]): BigInt =
      m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
        m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
        m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
    val d = det(Seq(Seq(n, sx1, sx2), Seq(sx1, s11, s12),
      Seq(sx2, s12, s22)))
    val d0 = det(Seq(Seq(sy, sx1, sx2), Seq(s1y, s11, s12),
      Seq(s2y, s12, s22)))
    val d1 = det(Seq(Seq(n, sy, sx2), Seq(sx1, s1y, s12),
      Seq(sx2, s2y, s22)))
    val d2 = det(Seq(Seq(n, sx1, sy), Seq(sx1, s11, s1y),
      Seq(sx2, s12, s2y)))
    assert(r.getAs[Long]("n_days") == n)
    assert(r.getAs[Long]("beta0_milli") == (1000 * d0 / d))
    assert(r.getAs[Long]("beta1_milli") == (1000 * d1 / d))
    assert(r.getAs[Long]("beta2_milli") == (1000 * d2 / d))
    // the OLS solution minimizes SSE, so it can't lose to b1=b2=0
    val b0 = BigDecimal(d0) / BigDecimal(d)
    val b1 = BigDecimal(d1) / BigDecimal(d)
    val b2 = BigDecimal(d2) / BigDecimal(d)
    val mean = BigDecimal(sy) / BigDecimal(n)
    val sse = grid.map { g =>
      val e = BigDecimal(g._3) -
        (b0 + b1 * BigDecimal(g._1) + b2 * BigDecimal(g._2))
      e * e
    }.sum
    val sst = grid.map { g =>
      val e = BigDecimal(g._3) - mean; e * e }.sum
    assert(sse <= sst)
  }

  test("price histogram: log2 buckets recompute bitwise and shares " +
      "partition each status to within truncation") {
    val rows = graft.ops.Stats.profilePriceHistogram(spark, sfDir)
      .collect()
    val cells = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderstatus"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .collect()
      .map { r =>
        val c = r.getAs[Long]("c")
        (r.getAs[String]("o_orderstatus"),
          java.lang.Long.highestOneBit(c)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.length == cells.size)
    val byStatus = cells.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    rows.foreach { r =>
      val k = (r.getAs[String]("o_orderstatus"),
        r.getAs[Long]("bucket_lo"))
      assert(java.lang.Long.bitCount(k._2) == 1, k)
      assert(r.getAs[Long]("n") == cells(k), k)
      assert(r.getAs[Long]("share_permille") ==
        1000 * cells(k) / byStatus(k._1), k)
    }
  }

  test("poisson dispersion: D recomputes as the exact rational over " +
      "daily counts and the squared normal call matches the float one") {
    val rows = graft.ops.Stats.statsPoissonDispersion(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    val daily = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("c")))
      .groupBy(_._1).view.mapValues(_.map(v => BigInt(v._2))).toMap
    rows.foreach { r =>
      val cs = daily(r.getAs[String]("event_type"))
      val n = BigInt(cs.length)
      val cc = cs.sum
      val s2 = cs.map(c => c * c).sum
      val num = n * s2 - cc * cc
      assert(r.getAs[Long]("n_days") == n)
      assert(r.getAs[Long]("n_events") == cc)
      assert(r.getAs[Long]("mean_milli") == 1000 * cc / n)
      assert(r.getAs[Long]("d_milli") == 1000 * num / cc)
      assert(r.getAs[Boolean]("is_overdispersed") ==
        (num > (n - 1) * cc))
      val dev = num - (n - 1) * cc
      assert(r.getAs[Boolean]("is_significant") ==
        (dev * dev >= 8 * (n - 1) * cc * cc))
      // the integer call agrees with the float z formula
      val d = num.toDouble / cc.toDouble
      val z = (d - (n.toDouble - 1)) /
        math.sqrt(2 * (n.toDouble - 1))
      assert(r.getAs[Boolean]("is_significant") ==
        (math.abs(z) >= 2.0 - 1e-12))
    }
  }

  test("runs test: R, the sign census and the exact z2 rational all " +
      "recompute from raw daily deltas with zeros dropped") {
    val rows = graft.ops.Stats.statsRunsTest(spark, sfDir).collect()
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
      .mapValues(_.sortBy(_._2).map(_._3).toVector).toMap
    daily.foreach { case (et, xs) =>
      val sgns = xs.zip(xs.tail).map { case (a, b) => b - a }
        .filter(_ != 0L).map(d => if (d > 0) 1L else -1L)
      if (sgns.nonEmpty) {
        val r = rows(et)
        val n = sgns.length.toLong
        val up = sgns.count(_ == 1L).toLong
        val down = n - up
        val runs = 1L + sgns.zip(sgns.tail).count(p => p._1 != p._2)
        assert(r.getAs[Long]("n") == n, et)
        assert(r.getAs[Long]("n_up") == up, et)
        assert(r.getAs[Long]("n_down") == down, et)
        assert(r.getAs[Long]("runs") == runs, et)
        val den = BigInt(2) * up * down * (2 * up * down - n)
        if (up == 0 || down == 0 || den <= 0)
          assert(r.isNullAt(r.fieldIndex("z2_milli")), et)
        else {
          val s = BigInt(n) * runs - 2 * up * down - n
          assert(r.getAs[Long]("z2_milli") ==
            (1000 * s * s * (n - 1) / den).toLong, et)
          assert(r.getAs[Boolean]("is_significant") ==
            (s * s * (n - 1) >= 4 * den), et)
        }
      } else assert(!rows.contains(et), et)
    }
  }

  test("mood median: pooled lower median, 2x2 census and the exact " +
      "chi2 rational all recompute from the raw per-user spends") {
    val r = graft.ops.Stats.statsMoodMedian(spark, sfDir)
      .collect().head
    val users = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("x"))
      .select(col("user_id"), col("x"),
        (graft.ops.TextOps.md5Hash60(concat(lit("graft-ab:"),
          col("user_id").cast("string"))) % 2).as("v"))
      .collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("x"),
        x.getAs[Long]("v")))
    val n = users.length.toLong
    val med = users.map(u => (u._2, u._1)).sorted
      .apply((((n + 1) / 2) - 1).toInt)._1
    val n00 = users.count(u => u._3 == 0 && u._2 <= med).toLong
    val n01 = users.count(u => u._3 == 0 && u._2 > med).toLong
    val n10 = users.count(u => u._3 == 1 && u._2 <= med).toLong
    val n11 = users.count(u => u._3 == 1 && u._2 > med).toLong
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("median_cents") == med)
    assert((r.getAs[Long]("n00"), r.getAs[Long]("n01"),
      r.getAs[Long]("n10"), r.getAs[Long]("n11")) ==
      ((n00, n01, n10, n11)))
    val dd = BigInt(n00) * n11 - BigInt(n01) * n10
    val marg = BigInt(n00 + n01) * (n10 + n11) * (n00 + n10) *
      (n01 + n11)
    if (marg == 0) assert(r.isNullAt(r.fieldIndex("chi2_milli")))
    else {
      assert(r.getAs[Long]("chi2_milli") ==
        (1000 * BigInt(n) * dd * dd / marg).toLong)
      assert(r.getAs[Boolean]("is_significant") ==
        (1000000 * BigInt(n) * dd * dd >= 3841459 * marg))
      // both arms see both sides of the pooled median at this corpus
      assert(n00 > 0 && n01 > 0 && n10 > 0 && n11 > 0)
    }
  }
}
