package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Property tests for the oracle=no dedup/text ops: MinHash recall vs
  * exact Jaccard ground truth, SimHash candidate soundness, fingerprint
  * determinism. */
class DedupSpec extends SparkSpec {

  private lazy val exactPairs: Map[(Long, Long), Double] =
    TextOps.textNgramJaccard(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("jaccard"))
      .toMap

  test("minhash finds every pair with Jaccard ≥ 0.7 (high-sim recall)") {
    val found = TextOps.dedupNearMinhash(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val must = exactPairs.filter(_._2 >= 0.7).keySet
    assert(must.nonEmpty, "corpus should contain planted near-dups")
    val missed = must -- found
    assert(missed.isEmpty, s"minhash missed high-similarity pairs: $missed")
  }

  test("minhash reports only pairs whose verified Jaccard ≥ 0.5") {
    val rows = TextOps.dedupNearMinhash(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5, s"pair below threshold: $r")
      // verify stage must agree with the independent exact computation
      val key = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      assert(math.abs(exactPairs(key) - j) < 1e-9)
    }
  }

  test("simhash pairs are token-level similar (its actual signal)") {
    val sim = TextOps.dedupSimhash(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(sim.nonEmpty)
    // SimHash approximates TOKEN-set overlap (order-insensitive), not
    // trigram overlap — verify against token-set Jaccard ground truth.
    val tokens = Tables(spark, sfDir).documents.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(' ').toSet)
      .toMap
    val tokJac = sim.map { case (a, b) =>
      val (ta, tb) = (tokens(a), tokens(b))
      (ta intersect tb).size.toDouble / (ta union tb).size
    }
    val lowSim = tokJac.count(_ < 0.5)
    assert(lowSim <= sim.size / 5,
      s"$lowSim of ${sim.size} simhash pairs have token Jaccard < 0.5")
  }

  test("fingerprints are deterministic across runs") {
    val a = TextOps.textFingerprint(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = TextOps.textFingerprint(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.size == 500)
  }

  test("near-dup pairs share fingerprints more often than random pairs") {
    val fp = TextOps.textFingerprint(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nearDup = exactPairs.filter(_._2 >= 0.9).keySet
    assert(nearDup.nonEmpty)
    val sharing = nearDup.count { case (a, b) => fp(a) == fp(b) }
    // min-hash fingerprint: P(match) = Jaccard ≈ 0.9+
    assert(sharing >= nearDup.size / 2,
      s"only $sharing of ${nearDup.size} near-dup pairs share fingerprints")
  }

  test("df-cap drops ultra-common shingles and keeps rare ones") {
    import spark.implicits._
    // one shingle over the cap (df = MaxShingleDf + 5), one under
    val hot = (1L to TextOps.MaxShingleDf + 5).map(d => (d, "hot gram x"))
    val rare = Seq((1L, "rare gram y"), (2L, "rare gram y"))
    val capped = TextOps.capShingleDf(
      (hot ++ rare).toDF("doc_id", "shingle")).collect()
    assert(capped.forall(_.getAs[String]("shingle") == "rare gram y"))
    assert(capped.length == 2)
  }

  test("LSH bucket cap drops degenerate buckets, keeps normal ones") {
    import spark.implicits._
    val degenerate = (1L to TextOps.MaxLshBucket + 10).map(d => (d, 0, 42))
    val normal = Seq((1L, 1, 7), (2L, 1, 7), (3L, 1, 7))
    val kept = TextOps.capLshBuckets(
      (degenerate ++ normal).toDF("doc_id", "band_id", "band_hash"))
      .collect()
    assert(kept.length == 3)
    assert(kept.forall(_.getAs[Int]("band_id") == 1))
  }

  test("dedup clusters: pairs co-clustered, canonicals are cluster minima") {
    val rows = TextOps.dedupClusterCanonical(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster"), r.getAs[Boolean]("is_canonical")))
      .toMap
    assert(rows.size == 500)
    // every >= 0.5 pair landed in the same cluster
    val dupPairs = exactPairs.filter(_._2 >= 0.5).keySet
    assert(dupPairs.nonEmpty)
    dupPairs.foreach { case (a, b) =>
      assert(rows(a)._1 == rows(b)._1, s"pair ($a,$b) split across clusters")
    }
    // a cluster's canonical is its min member, and nothing else is
    rows.groupBy(_._2._1).foreach { case (cluster, members) =>
      assert(cluster == members.keys.min)
      members.foreach { case (id, (_, canon)) =>
        assert(canon == (id == cluster))
      }
    }
  }

  test("cluster size census regroups the canonical labeling and " +
      "partitions the corpus") {
    val labels = TextOps.dedupClusterCanonical(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster"))
    val expect = labels.groupBy(_._2).values
      .map(_.length.toLong).groupBy(identity).view
      .mapValues(g => (g.size.toLong, g.sum)).toMap
    val rows = TextOps.dedupClusterSizes(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("cluster_size")).toSet ==
      expect.keySet)
    rows.foreach { r =>
      val (nc, nd) = expect(r.getAs[Long]("cluster_size"))
      assert(r.getAs[Long]("n_clusters") == nc)
      assert(r.getAs[Long]("n_docs") == nd)
    }
    // the census partitions the corpus: doc masses sum to the corpus
    assert(rows.map(_.getAs[Long]("n_docs")).sum == labels.length)
    // and this corpus HAS non-singleton near-dup families
    assert(rows.exists(r => r.getAs[Long]("cluster_size") > 1L))
  }

  test("quality-vs-dedup cross-tab recomputes from the canonical " +
      "labeling and the curriculum quality score") {
    val removed = TextOps.dedupClusterCanonical(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        !r.getAs[Boolean]("is_canonical")).toMap
    val stop = Set("the", "a", "of", "to", "and", "in", "is", "it")
    val q = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val t = r.getAs[String]("text").split(" ", -1)
        val ns = t.count(stop)
        r.getAs[Long]("doc_id") ->
          1000L * (t.length - ns) / (t.length + 1)
      }
    val expect = q.groupBy(_._2 / 100).view.mapValues { g =>
      (g.length.toLong, g.count(d => removed(d._1)).toLong) }.toMap
    val rows = TextOps.corpusQualityVsDedup(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("q_band")).toSet == expect.keySet)
    rows.foreach { r =>
      val (nd, nr) = expect(r.getAs[Long]("q_band"))
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Long]("n_removed_docs") == nr)
      assert(r.getAs[Long]("removed_permille") == 1000L * nr / nd)
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == q.length)
  }

  test("exact dedup is a partition of the corpus") {
    val rows = TextOps.dedupExact(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_copies")).sum == 500L)
    val keeps = rows.map(_.getAs[Long]("keep_id"))
    assert(keeps.distinct.length == keeps.length)
  }

  test("language-ID output is deterministic and total") {
    val a = TextOps.textLangId(spark, sfDir).collect()
    val b = TextOps.textLangId(spark, sfDir).collect()
    assert(a.length == 500)
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
  }

  test("lang confusion matrix regroups the detector output and " +
      "partitions the corpus; diagonal = the correct flags") {
    val det = TextOps.textLangId(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("predicted"),
        r.getAs[Boolean]("correct")))
    val expect = det.groupBy(t => (t._1, t._2)).view
      .mapValues(_.length.toLong).toMap
    val rows = TextOps.corpusLangConfusion(spark, sfDir).collect()
    assert(rows.map(r => (r.getAs[String]("lang_true"),
      r.getAs[String]("lang_pred"))).toSet == expect.keySet)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") == expect(
        (r.getAs[String]("lang_true"), r.getAs[String]("lang_pred"))))
    }
    // cells partition the corpus; the diagonal mass is exactly the
    // detector's own correct count
    assert(rows.map(_.getAs[Long]("n_docs")).sum == det.length)
    val diag = rows.filter(r => r.getAs[String]("lang_true") ==
      r.getAs[String]("lang_pred")).map(_.getAs[Long]("n_docs")).sum
    assert(diag == det.count(_._3).toLong)
  }

  test("PII scrub: no digits survive redaction, surrogate ids are " +
      "consistent per user and never the raw id") {
    val rows = TextOps.textRedactPii(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      !r.getAs[String]("props_redacted").exists(_.isDigit)))
    val raw = Tables(spark, sfDir).events
      .select("event_id", "user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val surrogate = rows.map(r =>
      raw(r.getAs[Long]("event_id")) -> r.getAs[String]("pseudo_uid"))
    // same user → same surrogate (joinability preserved)
    assert(surrogate.groupBy(_._1).forall(_._2.map(_._2).distinct.length == 1))
    // surrogate never literally leaks the id
    assert(surrogate.forall { case (uid, s) => s != uid.toString })
  }

  test("stratified sample takes ~20% of every language stratum, " +
      "deterministically") {
    val sample = TextOps.corpusSampleStratified(spark, sfDir).collect()
    val sampled = sample.groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.length).toMap
    val full = Tables(spark, sfDir).documents.groupBy(col("lang"))
      .count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    assert(full.keySet == sampled.keySet)
    full.foreach { case (lang, n) =>
      assert(sampled(lang) == (n * 2) / 10,
        s"$lang: ${sampled(lang)} of $n")
    }
    val again = TextOps.corpusSampleStratified(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(again == sample.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("containment dominates Jaccard and covers every near-dup pair") {
    val cont = TextOps.textNgramContainment(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("containment")).toMap
    val jac = TextOps.textNgramJaccard(spark, sfDir).collect()
      .filter(_.getAs[Double]("jaccard") >= 0.5)
    assert(jac.nonEmpty)
    jac.foreach { r =>
      val (a, b, j) = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("jaccard"))
      // inter/|A| >= inter/|A∪B| — both directions of any Jaccard-0.5
      // pair clear the containment threshold (rounding gives 0.001 slack)
      assert(cont.getOrElse((a, b), 0.0) >= j - 0.001, s"($a,$b)")
      assert(cont.getOrElse((b, a), 0.0) >= j - 0.001, s"($b,$a)")
    }
  }

  test("minhash eval: estimator is permille-bounded, err is the |diff|, " +
      "detector pairs estimate high") {
    val rows = graft.ops.TextOps.dedupMinhashEval(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Long]("est_permille")
      val x = r.getAs[Long]("exact_permille")
      assert(e >= 0L && e <= 1000L && x >= 0L && x <= 1000L)
      assert((0 to 16).map(m => m * 1000L / 16).contains(e),
        s"estimate $e not on the k/16 grid")
      assert(r.getAs[Long]("err_permille") == math.abs(e - x))
    }
    // every pair the DETECTOR verified at >= 0.5 appears here with a
    // high estimate (the bands that found it imply agreeing minima)
    val verified = graft.ops.TextOps.dedupNearMinhash(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    val est = rows.map(r => (r.getAs[Long]("a_id"),
      r.getAs[Long]("b_id")) -> r.getAs[Long]("est_permille")).toMap
    verified.foreach { p =>
      assert(est.contains(p), s"verified pair $p missing from eval")
      assert(est(p) >= 125L, s"verified pair $p estimates ${est(p)}")
    }
  }

  test("incremental lsh: every batch doc verdicts once, dup targets " +
      "point outside the batch, dup_of ⇔ status") {
    val t = Tables(spark, sfDir)
    val batch = t.documents
      .filter(col("doc_id") % TextOps.IncBatchMod === TextOps.IncBatchRem)
      .count()
    val rows = TextOps.dedupIncrementalLsh(spark, sfDir).collect()
    assert(rows.length == batch)
    rows.foreach { r =>
      val dup = r.getAs[String]("status") == "dup"
      assert(r.isNullAt(r.fieldIndex("dup_of")) != dup)
      if (dup)
        assert(r.getAs[Long]("dup_of") % TextOps.IncBatchMod
          != TextOps.IncBatchRem, "dup_of must be an indexed doc")
    }
  }

  test("edit-distance dedup: covers the verified minhash pairs, " +
      "distances match a reference Wagner–Fischer on the prefixes") {
    val rows = TextOps.dedupEditDistance(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byPair = rows.map(r => (r.getAs[Long]("a_id"),
      r.getAs[Long]("b_id")) -> r.getAs[Long]("edit_dist")).toMap
    // candidate discipline: same buckets as the Jaccard detector, so
    // every pair the detector verified must be scored here too
    TextOps.dedupNearMinhash(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
      .foreach(p => assert(byPair.contains(p),
        s"verified minhash pair $p missing from edit-distance output"))
    // bounds + reference distance on a sample of pairs
    val texts = Tables(spark, sfDir).documents.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").take(TextOps.EditPrefix)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = d(0); d(0) = i
        for (j <- 1 to b.length) {
          val cur = d(j)
          d(j) = math.min(math.min(d(j) + 1, d(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      d(b.length)
    }
    rows.foreach { r =>
      val sim = r.getAs[Long]("edit_sim_permille")
      assert(sim >= 0L && sim <= 1000L, s"sim out of range: $r")
    }
    rows.take(25).foreach { r =>
      val (a, b) = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      assert(r.getAs[Long]("edit_dist") == lev(texts(a), texts(b)),
        s"distance mismatch for ($a,$b)")
    }
  }

  test("source overlap: census equals regrouping the verified " +
      "near-dup pairs, canonical pair order, flags exact") {
    val census = TextOps.corpusSourceOverlap(spark, sfDir).collect()
    val srcOf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = TextOps.dedupNearMinhash(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    val exp = pairs.map { case (a, b) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(census.map(_.getAs[Long]("n_pairs")).sum == pairs.length)
    assert(census.length == exp.size)
    census.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(k._1 <= k._2)
      assert(r.getAs[Long]("n_pairs") == exp(k), k)
      assert(r.getAs[Boolean]("within_source") == (k._1 == k._2))
    }
  }

  test("source rate: per-source near-dup doc counts regroup the " +
      "verified pairs' member set, permille exact") {
    val rows = TextOps.dedupSourceRate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val srcOf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val nearIds = TextOps.dedupNearMinhash(spark, sfDir).collect()
      .flatMap(r => Seq(r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
      .toSet
    val bySrc = srcOf.groupBy(_._2)
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val s = r.getString(0)
      val ids = bySrc(s).map(_._1)
      val hits = ids.count(nearIds)
      assert(r.getAs[Long]("n_docs") == ids.length.toLong)
      assert(r.getAs[Long]("n_near_docs") == hits.toLong, s)
      assert(r.getAs[Long]("near_permille") ==
        1000L * hits / ids.length)
    }
    // non-degenerate on this corpus: some docs DO sit in near pairs
    assert(rows.map(_.getAs[Long]("n_near_docs")).sum > 0)
  }

  test("dedup impact: removed docs/tokens regroup the cluster " +
      "labeling, permille exact, mass conserved") {
    val rows = TextOps.corpusDedupImpact(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val cl = TextOps.dedupClusterCanonical(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("is_canonical")).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2)
    rows.foreach { r =>
      val s = r.getString(0)
      val ds = docs(s)
      val removed = ds.filter(d => !cl(d._1))
      assert(r.getAs[Long]("n_docs") == ds.length.toLong)
      assert(r.getAs[Long]("n_removed_docs") == removed.length.toLong)
      val tokRem = removed.map(_._3).sum
      val tokAll = ds.map(_._3).sum
      assert(r.getAs[Long]("tokens_removed") == tokRem)
      assert(r.getAs[Long]("n_tokens") == tokAll)
      assert(r.getAs[Long]("removed_permille") ==
        1000L * tokRem / tokAll)
    }
    // this corpus HAS near-dup clusters — the report must be non-zero
    assert(rows.map(_.getAs[Long]("n_removed_docs")).sum > 0)
  }

  test("minhash sweep: counts monotone non-increasing in threshold, " +
      "the 300-cut covers every verified detector pair") {
    val rows = TextOps.dedupMinhashSweep(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("threshold_milli")).toSeq ==
      Seq(300L, 400L, 500L, 600L, 700L))
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    val docs = rows.map(_.getAs[Long]("n_docs"))
    pairs.zip(pairs.tail).foreach { case (a, b) =>
      assert(a >= b, "pair counts must fall as the threshold rises") }
    docs.zip(docs.tail).foreach { case (a, b) => assert(a >= b) }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") <= 2 * r.getAs[Long]("n_pairs")) }
    // every detector pair (rounded j >= 0.5 => floor-milli >= 499)
    // survives the 300 cut
    val detector = TextOps.dedupNearMinhash(spark, sfDir).count()
    assert(pairs.head >= detector)
    assert(pairs.head > 0, "sweep found no candidates at 300")
  }

  test("fertility by lang: totals reconcile with the per-source " +
      "encode census, ratios recompute exactly") {
    val byLang = TextOps.corpusFertilityLang(spark, sfDir).collect()
    val bySource = TextOps.corpusBpeEncode(spark, sfDir).collect()
    assert(byLang.nonEmpty)
    // same corpus, same vocab — the two groupings must agree in total
    assert(byLang.map(_.getAs[Long]("n_words")).sum ==
      bySource.map(_.getAs[Long]("n_words")).sum)
    assert(byLang.map(_.getAs[Long]("n_tokens")).sum ==
      bySource.map(_.getAs[Long]("n_tokens")).sum)
    byLang.foreach { r =>
      assert(r.getAs[Long]("fertility_milli") ==
        1000L * r.getAs[Long]("n_tokens") / r.getAs[Long]("n_words"))
      // BPE can only split words: fertility >= 1 token/word
      assert(r.getAs[Long]("fertility_milli") >= 1000L)
    }
  }

  test("truncation waste: per-source loss/pad recompute from the raw " +
      "token counts, permille exact") {
    val rows = TextOps.corpusTruncationWaste(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val l = TextOps.TruncContextLen
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"),
        size(split(col("text"), " ")).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    rows.foreach { r =>
      val s = r.getString(0)
      val ts = toks(s).map(_._2)
      assert(r.getAs[Long]("n_docs") == ts.length.toLong)
      assert(r.getAs[Long]("n_trunc_docs") == ts.count(_ > l).toLong)
      val lost = ts.map(t => math.max(t - l, 0L)).sum
      val pad = ts.map(t => math.max(l - t, 0L)).sum
      assert(r.getAs[Long]("tokens_lost") == lost)
      assert(r.getAs[Long]("pad_tokens") == pad)
      assert(r.getAs[Long]("waste_permille") ==
        1000L * (lost + pad) / (ts.length * l))
    }
    // the chosen L must exercise BOTH sides on this corpus
    assert(rows.map(_.getAs[Long]("tokens_lost")).sum > 0)
    assert(rows.map(_.getAs[Long]("pad_tokens")).sum > 0)
  }

  test("mix report: token shares sum to the corpus budget, permille " +
      "recomputes exactly, cap flag consistent") {
    val rows = TextOps.corpusMixReport(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val tot = rows.map(_.getAs[Long]("n_tokens")).sum
    val docTotal = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long")).collect()
      .map(_.getLong(0)).sum
    assert(tot == docTotal, "every token lands in exactly one cell")
    rows.foreach { r =>
      val share = 1000L * r.getAs[Long]("n_tokens") / tot
      assert(r.getAs[Long]("share_permille") == share)
      assert(r.getAs[Boolean]("over_cap") == (share > 300L))
    }
  }

  test("split leakage: spine complete, pair census regroups the " +
      "near-dup pairs under the salted-hash split, doc mass conserved") {
    val rows = TextOps.corpusSplitLeakage(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("leak", "train", "val"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0))
    def splitOf(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-split:$id".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      if (java.lang.Long.parseLong(hex, 16) % 1000 < 900) "train"
      else "val"
    }
    val nTrain = docs.count(splitOf(_) == "train").toLong
    val m = rows.map(r => r.getString(0) ->
      (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs"))).toMap
    assert(m("train")._2 == nTrain)
    assert(m("val")._2 == docs.length - nTrain)
    assert(m("leak")._2 == 0L)
    val pairs = TextOps.dedupNearMinhash(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    val expCls = pairs.groupBy { case (a, b) =>
      val (sa, sb) = (splitOf(a), splitOf(b))
      if (sa == sb) sa else "leak"
    }.view.mapValues(_.length.toLong).toMap
    Seq("train", "val", "leak").foreach { c =>
      assert(m(c)._1 == expCls.getOrElse(c, 0L), c)
    }
    assert(m.values.map(_._1).sum == pairs.length.toLong)
  }

  /** First-principles replay of the substring-run algorithm in plain
    * Scala (shingle map → capped position pairs → maximal diagonal
    * runs), independent of any Spark machinery. */
  private lazy val substringGroundTruth
      : (Map[Long, Array[String]], Set[(Long, Long, Int, Int, Long)]) = {
    val k = TextOps.SubstrShingle
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ", -1))
      .toMap
    val occ = scala.collection.mutable.Map
      .empty[String, List[(Long, Int)]]
    for ((id, t) <- docs; p <- 1 to t.length - k + 1)
      occ.updateWith(t.slice(p - 1, p - 1 + k).mkString(" ")) {
        prev => Some((id, p) :: prev.getOrElse(Nil))
      }
    val hits = scala.collection.mutable.Map
      .empty[(Long, Long, Int), List[Int]] // (a, b, diag) -> pa list
    for ((_, locs) <- occ if locs.size <= TextOps.SubstrMaxOcc;
         (a, pa) <- locs; (b, pb) <- locs if a < b)
      hits.updateWith((a, b, pa - pb)) {
        prev => Some(pa :: prev.getOrElse(Nil))
      }
    val runs = hits.flatMap { case ((a, b, diag), pas) =>
      val sorted = pas.sorted
      // split sorted positions into maximal consecutive runs
      val groups = sorted.foldLeft(List.empty[List[Int]]) {
        case (acc @ (h :: rest), p) if h.head == p - 1 =>
          (p :: h) :: rest
        case (acc, p) => List(p) :: acc
      }
      groups.map(g => (a, b, g.min, g.min - diag,
        (g.size + k - 1).toLong))
    }.toSet
    (docs, runs)
  }

  test("substring dedup reproduces the first-principles maximal runs") {
    val (docs, expect) = substringGroundTruth
    val got = TextOps.dedupSubstringExact(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Int]("a_start"), r.getAs[Int]("b_start"),
        r.getAs[Long]("span_tokens"))).toSet
    assert(expect.nonEmpty, "corpus should contain shared spans")
    assert(got == expect)
    // every reported span is VERBATIM identical text in both documents
    val k = TextOps.SubstrShingle
    got.foreach { case (a, b, sa, sb, span) =>
      assert(span >= k)
      val (ta, tb) = (docs(a), docs(b))
      assert(ta.slice(sa - 1, sa - 1 + span.toInt).sameElements(
        tb.slice(sb - 1, sb - 1 + span.toInt)),
        s"span not verbatim: ($a,$b,$sa,$sb,$span)")
    }
  }

  test("substring census matches an independent interval-union sweep") {
    val (docs, runs) = substringGroundTruth
    // union-merge intervals per document from both endpoints
    val byDoc = runs.toSeq.flatMap { case (a, b, sa, sb, span) =>
      Seq((a, sa, sa + span.toInt - 1), (b, sb, sb + span.toInt - 1))
    }.groupBy(_._1)
    val expect = byDoc.map { case (id, ivs) =>
      val covered = ivs.flatMap { case (_, st, en) => st to en }.toSet
      // merged-span count = number of contiguous covered stretches
      val nSpans = covered.toSeq.sorted.foldLeft((0, -10)) {
        case ((n, prev), t) =>
          (if (t == prev + 1) n else n + 1, t)
      }._1.toLong
      id -> (nSpans, covered.size.toLong)
    }
    val got = TextOps.dedupSubstringCensus(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("dup_tokens"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_permille")))
      .toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, (nSpans, dupTok, nTok, permille)) =>
      assert((nSpans, dupTok) == expect(id), s"doc $id")
      assert(nTok == docs(id).length.toLong)
      assert(dupTok <= nTok)
      assert(permille == 1000 * dupTok / nTok)
    }
  }

  test("cross-source matrix: cells recompute from the verified pair " +
      "frame, are unordered-normalized, and shares sum to ~1000") {
    val src = graft.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source"))
      .toMap
    val pairs = graft.ops.TextOps.dedupNearMinhash(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    val expect = pairs
      .map { case (a, b) =>
        val (sa, sb) = (src(a), src(b))
        if (sa <= sb) (sa, sb) else (sb, sa) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = graft.ops.TextOps.dedupCrossSourceMatrix(spark, sfDir)
      .collect()
    assert(rows.length == expect.size)
    val tot = pairs.length.toLong
    rows.foreach { r =>
      val cell = (r.getAs[String]("source_a"),
        r.getAs[String]("source_b"))
      assert(cell._1 <= cell._2, cell)
      assert(r.getAs[Long]("n_pairs") == expect(cell), cell)
      assert(r.getAs[Long]("share_permille") ==
        1000 * expect(cell) / tot, cell)
    }
    val shares = rows.map(_.getAs[Long]("share_permille"))
    assert(shares.sum <= 1000L && shares.sum >= 1000L - rows.length)
  }
}
