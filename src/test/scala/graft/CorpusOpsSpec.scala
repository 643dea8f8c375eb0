package graft

import org.apache.spark.sql.functions._
import graft.ops.{Joins, SetOps, TextOps}

/** Semantic checks for the round-5 corpus-curation + layout operators.
  * Each is verified against an independent Scala recomputation from the
  * raw tables (the DuckDB oracle covers the cross-engine contract; this
  * layer covers the SEMANTICS against first principles). */
class CorpusOpsSpec extends SparkSpec {

  private def docs: Map[Long, String] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("deterministic shuffle: shards in 0..15, per-shard ranks " +
      "contiguous, mass conserved, rerun identical") {
    val run1 = TextOps.corpusShuffleDeterministic(spark, sfDir).collect()
    assert(run1.length == docs.size)
    val byShard = run1.groupBy(_.getAs[Int]("shard_id"))
    assert(byShard.keySet.forall(s => s >= 0 && s <= 15))
    byShard.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("shard_rank")).sorted.toSeq
        == (1 to rs.length))
    }
    val run2 = TextOps.corpusShuffleDeterministic(spark, sfDir).collect()
    assert(run1.map(_.toSeq).toSeq == run2.map(_.toSeq).toSeq)
  }

  test("vocab zipf census: contiguous ranks, nonincreasing counts, " +
      "coverage ends at exactly 1000 permille") {
    val rows = TextOps.textVocabZipf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ranks = rows.map(_.getAs[Int]("zipf_rank"))
    assert(ranks.toSeq == (1 to rows.length))
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.toSeq == cnts.sortBy(-_).toSeq)
    val cum = rows.map(_.getAs[Long]("cum_permille"))
    assert(cum.toSeq == cum.sorted.toSeq)       // monotone coverage
    assert(cum.last == 1000L)                   // full mass at the tail
    // total token mass equals a direct recount
    val total = docs.values.map(_.split(" ").length.toLong).sum
    assert(cnts.sum == total)
  }

  test("text_repetition_score matches a per-doc recomputation") {
    val got = TextOps.textRepetitionScore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val expected = docs.collect {
      case (id, text) if text.split(" ").length >= 2 =>
        val toks = text.split(" ")
        val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).map(_._2.size)
        val n = grams.size.toLong
        val d = counts.size.toLong
        id -> (n, d,
          BigDecimal((n - d).toDouble / n)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(counts.max.toDouble / n)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) => assert(got(id) == e, s"doc $id") }
  }

  test("text_bigram_logprob matches a first-principles recomputation") {
    val got = TextOps.textBigramLogprob(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // corpus-wide ML bigram model from first principles
    val allBi = docs.toSeq.flatMap { case (id, text) =>
      val t = text.split(" ")
      if (t.length >= 2) t.sliding(2).map(p => (id, p(0), p(1))).toSeq
      else Seq.empty
    }
    val cB = allBi.groupBy(b => (b._2, b._3)).map { case (k, v) =>
      k -> v.size.toLong }
    val cW = allBi.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val nll = cB.map { case ((w1, w2), cb) =>
      (w1, w2) -> math.round(1e6 * math.log(cW(w1).toDouble / cb)) }
    val expected = allBi.groupBy(_._1).map { case (id, bs) =>
      val total = bs.map(b => nll((b._2, b._3))).sum
      id -> (bs.size.toLong, total, total / bs.size)
    }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) => assert(got(id) == e, s"doc $id") }
    // surprise is nonnegative: P(w2|w1) <= 1 exactly by construction
    got.values.foreach { case (_, tot, avg) =>
      assert(tot >= 0L && avg >= 0L) }
  }

  test("text_contamination_ngram: hits recomputed from the shingle sets") {
    val srcByDoc = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingleSet(text: String): Set[String] = {
      val t = text.split(" ")
      if (t.length < 3) Set.empty
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val bench = docs.collect {
      case (id, text) if srcByDoc(id) == "src0" => shingleSet(text)
    }.flatten.toSet
    val got = TextOps.textContaminationNgram(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = docs.collect {
      case (id, text)
          if srcByDoc(id) != "src0" && shingleSet(text).nonEmpty =>
        val sh = shingleSet(text)
        id -> (sh.size.toLong, sh.count(bench.contains).toLong)
    }
    assert(got == expected)
    // benchmark docs themselves are never scored
    assert(got.keySet.forall(srcByDoc(_) != "src0"))
  }

  test("corpus_pack_sequences: bins partition each language stream") {
    val out = TextOps.corpusPackSequences(spark, sfDir).collect()
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_tok").as("tok")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byLang = out.groupBy(_.getString(0))
    assert(byLang.keySet == all.keySet)
    byLang.foreach { case (lang, rows) =>
      // every doc lands in exactly one bin, token mass is conserved
      assert(rows.map(_.getLong(2)).sum == all(lang)._1)
      assert(rows.map(_.getLong(3)).sum == all(lang)._2)
      // bins are filled in order: doc-id spans of consecutive bins
      // never overlap (the stream is chunked, not reshuffled)
      val spans = rows.sortBy(_.getLong(1))
        .map(r => (r.getLong(4), r.getLong(5)))
      spans.foreach { case (lo, hi) => assert(lo <= hi) }
      spans.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
        case _ =>
      }
      // no bin starts beyond the stream's token count / capacity
      val maxBin = rows.map(_.getLong(1)).max
      assert(maxBin <= all(lang)._2 / TextOps.PackCapacity)
    }
  }

  test("corpus_quality_band keeps the 10-90 percentile body per stratum") {
    val out = TextOps.corpusQualityBand(spark, sfDir).collect()
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.forall { r =>
      val pr = r.getDouble(3); pr >= 0.1 && pr <= 0.9
    })
    // the band keeps the body: strictly between 50% and 90% of docs
    // (exactly 80% only in the continuous limit; small strata quantize)
    assert(out.length > total * 0.5 && out.length < total * 0.9)
  }

  test("prepare pipeline ≡ band survivors, deduped, packed (mass check)") {
    val out = TextOps.corpusPreparePipeline(spark, sfDir).collect()
    // stage-wise recomputation from the already-tested components:
    // banded docs per lang (quality band) minus exact dups = the doc
    // and token mass the packed manifest must carry, exactly
    val banded = TextOps.corpusQualityBand(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val texts = docs
    val keep = texts.filter { case (id, _) => banded.contains(id) }
      .groupBy(_._2).map { case (_, same) => same.keys.min }.toSet
    val tokensByLang = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .filter(r => keep.contains(r.getLong(0)))
      .groupBy(_.getString(1))
      .map { case (lang, rs) =>
        lang -> (rs.length.toLong,
          rs.map(_.getString(2).split(" ").length.toLong).sum)
      }
    val got = out.groupBy(_.getString(0)).map { case (lang, rows) =>
      lang -> (rows.map(_.getLong(2)).sum, rows.map(_.getLong(3)).sum)
    }
    assert(got == tokensByLang)
  }

  test("sort_zorder_cluster buckets bound BOTH dimensions (skipping)") {
    val rows = SetOps.sortZorderCluster(spark, sfDir).collect()
    val nOrders = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nOrders)
    rows.foreach { r =>
      // zbucket fixes bits 16+ of the interleave = the high bytes of
      // both dimensions → every bucket's per-dimension spread is < 256.
      // This is the parquet-min/max pruning property a 1-D sort only
      // gives its leading column.
      assert(r.getLong(3) - r.getLong(2) <= 255, s"cust spread: $r")
      assert(r.getLong(5) - r.getLong(4) <= 255, s"day spread: $r")
    }
  }

  test("join_range_bucketed ≡ join_theta_range, on a shuffled equi-join") {
    val bucketed = Joins.joinRangeBucketed(spark, sfDir)
    val theta = Joins.joinThetaRange(spark, sfDir).collect()
    assert(bucketed.collect().toSeq == theta.toSeq)
    // the point of the exhibit: the bucket equi-key lets the planner
    // use a shuffle join (no broadcast-nested-loop on the range side)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("ngram lm: conditionals are exact permille of prefix mass and " +
      "ranking is total") {
    val rows = graft.ops.TextOps.corpusNgramLm(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 200)
    rows.foreach { r =>
      val c = r.getAs[Long]("c"); val p = r.getAs[Long]("prefix_n")
      assert(c >= 3 && c <= p)
      assert(r.getAs[Long]("p_permille") == 1000 * c / p)
    }
    val cs = rows.map(_.getAs[Long]("c"))
    assert(cs.toSeq == cs.sortBy(-_).toSeq, "not ranked by count")
    // prefix mass reconciles with a direct recount for the top bigram
    val top = rows.head
    val docs = Tables(spark, sfDir).documents.collect()
      .map(_.getAs[String]("text"))
    val expect = docs.map(_.split(" ", -1).sliding(2).count(p =>
      p.length == 2 && p(0) == top.getAs[String]("w1") &&
        p(1) == top.getAs[String]("w2"))).sum
    assert(top.getAs[Long]("c") == expect, "top bigram count mismatch")
  }

  test("chunk overlap: full windows share their stride overlap and " +
      "chunks reconstruct the document") {
    import graft.ops.TextOps.{ChunkStride, ChunkTokens}
    val rows = graft.ops.TextOps.corpusChunkOverlap(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("n_tokens"), r.getAs[String]("chunk_text")))
    val docs = Tables(spark, sfDir).documents.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (docId, cs) =>
      val toks = docs(docId).split(" ", -1)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong),
        s"doc $docId chunk ids not dense")
      assert(sorted.length ==
        (toks.length + ChunkStride - 1) / ChunkStride)
      sorted.foreach { case (_, cid, n, text) =>
        val st = cid.toInt * ChunkStride
        val expect = toks.slice(st, st + ChunkTokens)
        assert(n == expect.length && text == expect.mkString(" "),
          s"doc $docId chunk $cid mismatch")
      }
      // consecutive full windows overlap by ChunkTokens − ChunkStride
      sorted.sliding(2).foreach {
        case Array((_, _, n1, t1), (_, _, n2, t2))
            if n1 == ChunkTokens && n2 > 0 =>
          val tail = t1.split(" ", -1).drop(ChunkStride)
          assert(t2.split(" ", -1).startsWith(tail),
            s"doc $docId overlap broken")
        case _ =>
      }
    }
  }
  test("oov rate: bounded permille matching brute-force LM membership") {
    val lm = TextOps.corpusNgramLm(spark, sfDir).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"))).toSet
    val rows = TextOps.textOovRate(spark, sfDir).collect()
    val docs = Tables(spark, sfDir).documents.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ", -1))
      .filter(_._2.length >= 2).toMap
    assert(rows.length == docs.size, "one row per multi-token document")
    rows.foreach { r =>
      val bis = docs(r.getAs[Long]("doc_id")).sliding(2)
        .map(a => (a(0), a(1))).toSeq
      val oov = bis.count(b => !lm(b))
      assert(r.getAs[Long]("n_bigrams") == bis.length.toLong)
      val perm = r.getAs[Long]("oov_permille")
      assert(perm == 1000L * oov / bis.length, s"doc ${r.getAs[Long]("doc_id")}")
      assert(perm >= 0L && perm <= 1000L)
    }
  }
  test("window dup rate: permille matches a brute-force cross-doc " +
      "window recount") {
    val rows = TextOps.textWindowDupRate(spark, sfDir).collect()
    val docs = Tables(spark, sfDir).documents.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ", -1).toIndexedSeq)
    val windows = docs.flatMap { case (id, t) =>
      (0 until t.length by 48).map(st =>
        (id, t.slice(st, st + 64).mkString(" ")))
    }
    val sharedTexts = windows.groupBy(_._2)
      .filter(_._2.map(_._1).distinct.length >= 2).keySet
    val expect = windows.groupBy(_._1).map { case (id, ws) =>
      id -> (ws.length.toLong, ws.count(w => sharedTexts(w._2)).toLong)
    }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, dup) = expect(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_windows") == n)
      assert(r.getAs[Long]("n_dup_windows") == dup)
      assert(r.getAs[Long]("dup_permille") == 1000 * dup / n)
    }
  }
  test("epoch plan: budget allocation and epoch arithmetic from first " +
      "principles") {
    val rows = TextOps.corpusEpochPlan(spark, sfDir).collect()
    val docs = Tables(spark, sfDir).documents.collect()
      .map(r => (r.getAs[String]("source"),
        r.getAs[String]("text").split(" ", -1).length.toLong))
    val avail = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.map(_._2).sum }
    def rate(src: String) = src.drop(3).toInt % 4 match {
      case 0 => 1000L; case 1 => 500L; case 2 => 250L; case _ => 125L
    }
    val wTotal = avail.keys.toSeq.map(rate).sum
    assert(rows.map(_.getAs[String]("source")).toSet == avail.keySet)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("rate_permille") == rate(src))
      assert(r.getAs[Long]("avail_tokens") == avail(src))
      val target = TextOps.EpochPlanBudget * rate(src) / wTotal
      assert(r.getAs[Long]("target_tokens") == target)
      assert(r.getAs[Long]("epochs_micro") ==
        target * 1000000L / avail(src))
    }
    // the budget is conserved up to per-source floor loss
    val allocated = rows.map(_.getAs[Long]("target_tokens")).sum
    assert(allocated <= TextOps.EpochPlanBudget &&
      allocated > TextOps.EpochPlanBudget - rows.length)
  }

  test("rejection sample: reproducible, band-thresholded, acceptance " +
      "rate tracks the band permille") {
    val run1 = TextOps.corpusRejectionSample(spark, sfDir).collect()
    val run2 = TextOps.corpusRejectionSample(spark, sfDir).collect()
    assert(run1.map(_.toSeq).toSeq == run2.map(_.toSeq).toSeq)
    assert(run1.nonEmpty)
    val all = Tables(spark, sfDir).documents
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def band(n: Long): Long =
      TextOps.RejectBands.collectFirst {
        case (lo, p) if n >= lo => p
      }.getOrElse(TextOps.RejectBaseP)
    run1.foreach { r =>
      assert(r.getAs[Long]("accept_permille") ==
        band(all(r.getAs[Long]("doc_id"))))
    }
    // acceptance rate per band within a generous binomial tolerance
    val acceptedByBand = run1.groupBy(_.getAs[Long]("accept_permille"))
      .view.mapValues(_.length.toLong).toMap
    val totalByBand = all.values.groupBy(band)
      .view.mapValues(_.size.toLong).toMap
    totalByBand.foreach { case (p, n) =>
      if (n >= 100) {
        val rate = 1000L * acceptedByBand.getOrElse(p, 0L) / n
        assert(math.abs(rate - p) <= 150,
          s"band $p permille accepted at $rate of $n docs")
      }
    }
  }

  /** First-principles BM25 recomputation over the raw text (same
    * double-arithmetic shape as the operator, half-up micro round). */
  private def bm25Expected: Map[Long, (Long, Long)] = {
    val tokens = docs.view.mapValues(_.split(" ").filter(_.nonEmpty))
    val dl = tokens.mapValues(_.length.toLong).toMap
    val nDocs = dl.size.toLong
    val avgdl = dl.values.sum.toDouble / nDocs
    val q = TextOps.Bm25Query
    val tf: Map[(Long, String), Long] = tokens.toMap.flatMap {
      case (id, ts) =>
        q.flatMap { t =>
          val n = ts.count(_ == t)
          if (n > 0) Some((id, t) -> n.toLong) else None
        }
    }
    val df = q.map(t => t -> tf.keys.count(_._2 == t).toLong).toMap
    tf.groupBy(_._1._1).map { case (id, m) =>
      val micros = m.map { case ((_, t), f) =>
        val idf = math.log((nDocs - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
        val s = idf * (f * TextOps.Bm25K1p1) /
          (f + TextOps.Bm25K1 *
            (TextOps.Bm25OneMinusB + TextOps.Bm25B * dl(id) / avgdl)) *
          1000000.0
        math.floor(s + 0.5).toLong // HALF_UP for the positive scores
      }
      id -> (micros.sum, micros.size.toLong)
    }
  }

  test("bm25 topk: matches a first-principles Scala recomputation, " +
      "scores positive and descending") {
    val rows = TextOps.textBm25Topk(spark, sfDir).collect()
    assert(rows.length == 10)
    val exp = bm25Expected
    val expTop = exp.toSeq.map { case (id, (s, h)) => (id, s, h) }
      .sortBy { case (id, s, _) => (-s, id) }.take(10)
    val got = rows.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("bm25_micro"), r.getAs[Long]("n_terms_hit")))
    assert(got.toSeq == expTop, s"\ngot ${got.toSeq}\nexp $expTop")
    val scores = got.map(_._2)
    assert(scores.forall(_ > 0L))
    scores.sliding(2).foreach(w => assert(w(1) <= w(0)))
  }

  test("hybrid rrf: fusion arithmetic exact from the leg ranks, " +
      "probe doc excluded, descending, lex leg consistent with bm25") {
    import graft.ops.VectorOps
    val rows = VectorOps.retrievalHybridRrf(spark, sfDir).collect()
    assert(rows.length == 10)
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == 10 && !ids.contains(0L))
    def leg(r: org.apache.spark.sql.Row, c: String): Long =
      if (r.isNullAt(r.fieldIndex(c))) 0L
      else 1000000L / (VectorOps.RrfC + r.getAs[Int](c))
    rows.foreach { r =>
      assert(!(r.isNullAt(r.fieldIndex("rank_lex")) &&
        r.isNullAt(r.fieldIndex("rank_sem"))))
      assert(r.getAs[Long]("rrf_micro") ==
        leg(r, "rank_lex") + leg(r, "rank_sem"))
    }
    val s = rows.map(_.getAs[Long]("rrf_micro"))
    s.sliding(2).foreach(w => assert(w(1) <= w(0), s.toSeq))
    // the lex leg's rank-1 doc is bm25's global top doc (doc 0 is not
    // in the bm25 top anyway at this corpus, but guard independently)
    val bmTop = bm25Expected.toSeq.filter(_._1 != 0L)
      .sortBy { case (id, (sc, _)) => (-sc, id) }.head._1
    rows.find(r => !r.isNullAt(r.fieldIndex("rank_lex")) &&
        r.getAs[Int]("rank_lex") == 1)
      .foreach(r => assert(r.getAs[Long]("doc_id") == bmTop))
  }

  test("gopher filters: census matches the per-doc rule recompute") {
    val rows = TextOps.corpusGopherFilters(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val stop = Set("the", "a", "of", "to", "and", "in", "is", "it")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val verdicts = docs.map { case (src, text) =>
      val t = text.split(" ", -1)
      val n = t.length.toLong
      val mtl = 1000000L * t.map(_.length.toLong).sum / n
      val short = 1000L * t.count(_.length <= 2) / n
      val nStop = t.count(stop).toLong
      (src, n >= 25 && n <= 500, mtl >= 3900000L && mtl <= 5000000L,
        short <= 300L, nStop >= 2L)
    }
    verdicts.groupBy(_._1).foreach { case (src, vs) =>
      val r = rows(src)
      assert(r.getAs[Long]("n_docs") == vs.length.toLong)
      assert(r.getAs[Long]("fail_count") == vs.count(!_._2).toLong)
      assert(r.getAs[Long]("fail_mtl") == vs.count(!_._3).toLong)
      assert(r.getAs[Long]("fail_short") == vs.count(!_._4).toLong)
      assert(r.getAs[Long]("fail_stop") == vs.count(!_._5).toLong)
      val nPass = vs.count(v => v._2 && v._3 && v._4 && v._5).toLong
      assert(r.getAs[Long]("n_pass") == nPass)
      assert(r.getAs[Long]("pass_permille") == 1000L * nPass / vs.length)
    }
    // the battery must actually discriminate at this corpus: some doc
    // fails somewhere, most pass overall
    val all = rows.values.toSeq
    assert(all.map(_.getAs[Long]("n_pass")).sum <
      all.map(_.getAs[Long]("n_docs")).sum)
    assert(all.map(_.getAs[Long]("n_pass")).sum > 0L)
  }

  test("hapax ratio: per-language census matches the type-table " +
      "recompute") {
    val rows = TextOps.textHapaxRatio(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1).view.mapValues { ds =>
      val counts = ds.flatMap(_._2.split(" ", -1))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      (counts.size.toLong, counts.values.sum,
        counts.values.count(_ == 1L).toLong)
    }.toMap
    assert(rows.length == byLang.size)
    rows.foreach { r =>
      val (types, tokens, hapax) = byLang(r.getString(0))
      assert(r.getAs[Long]("n_types") == types)
      assert(r.getAs[Long]("n_tokens") == tokens)
      assert(r.getAs[Long]("n_hapax") == hapax)
      assert(r.getAs[Long]("hapax_type_permille") ==
        1000L * hapax / types)
      assert(r.getAs[Long]("hapax_token_permille") ==
        1000L * hapax / tokens)
    }
  }

  test("pack bestfit: FFD recomputed per shard, bounded by the " +
      "token lower bound") {
    val C = TextOps.PackCapacity
    val rows = TextOps.corpusPackBestfit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
    def shardOf(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"graft-shuffle:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      "0123456789abcdef".indexOf(hex.head)
    }
    def ffd(ns: Seq[Long]): Int = {
      val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
      ns.foreach { x =>
        bins.indexWhere(_ + x <= C) match {
          case -1 => bins += x
          case i  => bins(i) += x
        }
      }
      bins.length
    }
    val byShard = docs.groupBy(d => shardOf(d._1))
    assert(rows.length == byShard.size)
    rows.foreach { r =>
      val ds = byShard(r.getInt(0))
      val ns = ds.sortBy(d => (-d._2, d._1)).map(_._2).toSeq
      val tot = ns.sum
      val nb = ffd(ns).toLong
      assert(r.getAs[Long]("n_docs") == ds.length.toLong)
      assert(r.getAs[Long]("total_tokens") == tot)
      assert(r.getAs[Long]("bins_ffd") == nb, s"shard ${r.getInt(0)}")
      val lb = (tot + C - 1) / C
      assert(r.getAs[Long]("bins_lb") == lb)
      assert(nb >= lb)
      assert(r.getAs[Long]("waste_permille") ==
        1000L * (nb * C - tot) / (nb * C))
    }
  }

  test("unigram prune: seed, Viterbi segmentation, usage and prune " +
      "recompute from first principles") {
    val L = TextOps.UnigramMaxWordLen
    val P = TextOps.UnigramMaxPieceLen
    // word-frequency table from the raw corpus
    val wc = docs.values.flatMap(_.split(" ", -1))
      .filter(w => w.matches(s"^[a-z]{1,$L}$$"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    // seed: all substrings ≤ P chars; singles + top multi by freq
    val freq = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- wc; i <- 0 until w.length;
         l <- 1 to math.min(P, w.length - i))
      freq.updateWith(w.substring(i, i + l)) {
        p => Some(p.getOrElse(0L) + c)
      }
    val seed = freq.filter(_._1.length == 1).keySet ++
      freq.filter(_._1.length > 1).toSeq
        .sortBy { case (p, f) => (-f, p) }
        .take(TextOps.UnigramSeedTopK).map(_._1)
    val tot = seed.toSeq.map(freq).sum
    def costNano(p: String): Long = {
      // Spark round(x, 9) rounds the shortest-decimal-string repr
      // HALF_UP (= BigDecimal.valueOf semantics)
      val r9 = BigDecimal.valueOf(
        math.log(freq(p).toDouble / tot) + 1e-12)
        .setScale(9, scala.math.BigDecimal.RoundingMode.HALF_UP)
      (-r9 * BigDecimal(1000000000L)).toLongExact
    }
    // Viterbi DP with (cost, len, piece) tie-break
    def segment(w: String): Seq[String] = {
      val best = Array.fill[(Long, Int, String)](w.length + 1)(null)
      best(0) = (0L, 0, "")
      for (p <- 1 to w.length) {
        val arms = for (l <- 1 to math.min(P, p);
             piece = w.substring(p - l, p) if seed(piece))
          yield (best(p - l)._1 + costNano(piece), l, piece)
        best(p) = arms.min
      }
      // backpointer walk (yields pieces end-to-start)
      Iterator.iterate(w.length)(p => p - best(p)._2)
        .takeWhile(_ > 0).map(p => best(p)._3).toSeq
    }
    val usage = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- wc; p <- segment(w))
      usage.updateWith(p)(u => Some(u.getOrElse(0L) + c))
    val keptMulti = seed.toSeq.filter(_.length > 1)
      .sortBy(p => (-usage.getOrElse(p, 0L), p))
      .take(TextOps.UnigramKeepTopK).toSet
    val rows = TextOps.corpusUnigramPrune(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("piece")).toSet == seed)
    rows.foreach { r =>
      val p = r.getAs[String]("piece")
      assert(r.getAs[Int]("piece_len") == p.length)
      assert(r.getAs[Long]("freq_w") == freq(p))
      assert(r.getAs[Long]("usage") == usage.getOrElse(p, 0L), p)
      assert(r.getAs[Boolean]("kept") ==
        (p.length == 1 || keptMulti(p)), p)
    }
    // every word's Viterbi path reassembles the word exactly
    wc.keys.foreach { w =>
      assert(segment(w).reverse.mkString == w, w)
    }
  }

  test("curriculum plan: phases are quality terciles, in-phase order " +
      "is the deterministic md5 shuffle, every doc planned once") {
    val rows = TextOps.corpusCurriculumPlan(spark, sfDir).collect()
    assert(rows.length == docs.size)
    assert(rows.map(_.getLong(0)).distinct.length == docs.size)
    val stop = Set("the", "a", "of", "to", "and", "in", "is", "it")
    val q = docs.map { case (id, text) =>
      val t = text.split(" ", -1)
      val ns = t.count(stop)
      id -> 1000L * (t.length - ns) / (t.length + 1)
    }
    rows.foreach(r => assert(r.getLong(1) == q(r.getLong(0))))
    // phases partition the (q desc, id) total order into terciles:
    // every phase-1 doc ranks before every phase-2 doc, etc.
    val ordered = rows.sortBy(r => (-r.getLong(1), r.getLong(0)))
      .map(_.getLong(2))
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b })
    val sizes = rows.groupBy(_.getLong(2)).view.mapValues(_.length)
    assert(sizes.values.max - sizes.values.min <= 1) // ntile balance
    // in-phase positions are contiguous 1..k and follow the md5 order
    def md5h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    }
    rows.groupBy(_.getLong(2)).values.foreach { ph =>
      val byPos = ph.sortBy(_.getLong(3))
      assert(byPos.map(_.getLong(3)).toSeq == (1L to ph.length).toSeq)
      val keys = byPos.map(r =>
        (md5h60(s"graft-curr:${r.getLong(0)}"), r.getLong(0)))
      assert(keys.zip(keys.tail).forall { case (a, b) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2) })
    }
  }

  test("value concentration: top-k shares recompute exactly and are " +
      "monotone in the percentile") {
    val rows = graft.ops.TimeSeries
      .eventsValueConcentration(spark, sfDir).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 5L, 10L))
    val per = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ranked = per.sortBy { case (u, v) => (-v, u) }.map(_._2)
    val total = ranked.sum
    val n = ranked.length.toLong
    rows.foreach { r =>
      val p = r.getLong(0)
      val k = (n * p + 99) / 100
      assert(r.getLong(1) == k)
      assert(r.getLong(2) == 1000L * ranked.take(k.toInt).sum / total)
    }
    val shares = rows.map(_.getLong(2))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    // the heaviest 1% of users capture at least 1% (10 permille) of
    // value by construction — they are the above-average tail
    assert(shares.head >= 10L)
  }

  test("pmi bigrams: lift is the exact integer ratio over brute-force " +
      "counts, min support holds, ranking is total") {
    val rows = graft.ops.TextOps.textPmiBigrams(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    val bigrams = Tables(spark, sfDir).documents.collect()
      .map(_.getAs[String]("text")).flatMap(t =>
        t.split(" ", -1).sliding(2).filter(_.length == 2)
          .map(p => (p(0), p(1))).toVector)
    val n = BigInt(bigrams.length)
    val pair = bigrams.groupBy(identity).view.mapValues(_.length).toMap
    val first = bigrams.groupBy(_._1).view.mapValues(_.length).toMap
    val second = bigrams.groupBy(_._2).view.mapValues(_.length).toMap
    rows.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      val c = r.getAs[Long]("c")
      assert(c >= 20 && c == pair((w1, w2)).toLong, (w1, w2))
      assert(r.getAs[Long]("cx") == first(w1).toLong)
      assert(r.getAs[Long]("cy") == second(w2).toLong)
      assert(r.getAs[Long]("lift_ppm") ==
        BigInt(1000000) * c * n / (BigInt(first(w1)) * second(w2)))
    }
    val lifts = rows.map(_.getAs[Long]("lift_ppm"))
    assert(lifts.toSeq == lifts.sortBy(-_).toSeq, "not ranked by lift")
    // the returned top-30 must dominate every excluded supported pair
    val minReturned = lifts.last
    val excludedMax = pair.filter(_._2 >= 20).collect {
      case ((w1, w2), c)
          if !rows.exists(r => r.getAs[String]("w1") == w1 &&
            r.getAs[String]("w2") == w2) =>
        BigInt(1000000) * c * n / (BigInt(first(w1)) * second(w2))
    }
    assert(excludedMax.isEmpty ||
      excludedMax.max <= BigInt(minReturned))
  }

  test("char class profile: per-source counts recompute from raw " +
      "text and the four classes partition every character") {
    val rows = graft.ops.TextOps.textCharClassProfile(spark, sfDir)
      .collect()
    val bySrc = Tables(spark, sfDir).documents
      .select(col("source"), col("text")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text")))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val texts = bySrc(r.getAs[String]("source"))
      val nc = texts.map(_.length.toLong).sum
      val l = texts.map(_.count(c => c >= 'a' && c <= 'z').toLong).sum
      val d = texts.map(_.count(c => c >= '0' && c <= '9').toLong).sum
      val s = texts.map(_.count(_ == ' ').toLong).sum
      assert(r.getAs[Long]("n_chars") == nc)
      assert(r.getAs[Long]("letters_permille") == 1000 * l / nc)
      assert(r.getAs[Long]("digits_permille") == 1000 * d / nc)
      assert(r.getAs[Long]("spaces_permille") == 1000 * s / nc)
      assert(r.getAs[Long]("other_permille") ==
        1000 * (nc - l - d - s) / nc)
    }
  }

  test("length gini: cell-frame identity matches the O(n^2) textbook " +
      "mean-absolute-difference definition per source") {
    val rows = graft.ops.TextOps.corpusLengthGini(spark, sfDir)
      .collect()
    val bySrc = Tables(spark, sfDir).documents
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
    rows.foreach { r =>
      val xs = bySrc(r.getAs[String]("source"))
      val n = BigInt(xs.length)
      val sx = xs.map(BigInt(_)).sum
      // G = sum_i sum_j |xi - xj| / (2 n sum_x), exact via BigInt
      val mad = (for (a <- xs; b <- xs) yield (BigInt(a) - b).abs).sum
      val expect = 1000 * mad / (2 * n * sx)
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("mean_chars") == sx / n)
      assert(BigInt(r.getAs[Long]("gini_permille")) == expect,
        r.getAs[String]("source"))
    }
  }

  test("vocab growth: sweep points recompute from first-occurrence " +
      "docs, curve is monotone with diminishing type yield") {
    val rows = graft.ops.TextOps.corpusVocabGrowth(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("pct"))
    assert(rows.map(_.getAs[Long]("pct")).toSeq ==
      Seq(10L, 25L, 50L, 100L))
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text").split(" ", -1)))
    val n = docs.length.toLong
    // the contiguity assumption the prefix cut rides on
    assert(docs.map(_._1).sorted.toSeq == (0L until n))
    rows.foreach { r =>
      val pct = r.getAs[Long]("pct")
      val pref = docs.filter(_._1 * 100 < pct * n)
      assert(r.getAs[Long]("n_docs") == pref.length.toLong)
      assert(r.getAs[Long]("n_tokens") ==
        pref.map(_._2.length.toLong).sum)
      assert(r.getAs[Long]("vocab") ==
        pref.flatMap(_._2).distinct.length.toLong)
    }
    val v = rows.map(_.getAs[Long]("vocab"))
    assert(v.zip(v.tail).forall { case (a, b) => a <= b })
  }

  test("lm coverage sweep: permille mass recomputes from brute-force " +
      "bigram counts under the LM's own (c desc, w1, w2) order") {
    val rows = graft.ops.TextOps.corpusLmCoverageSweep(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(50L, 100L, 200L))
    val counts = Tables(spark, sfDir).documents.collect()
      .map(_.getAs[String]("text")).flatMap(t =>
        t.split(" ", -1).sliding(2).filter(_.length == 2)
          .map(p => (p(0), p(1))).toVector)
      .groupBy(identity).view.mapValues(_.length.toLong).toVector
      .map { case ((w1, w2), c) => (c, w1, w2) }
      .sortBy { case (c, w1, w2) => (-c, w1, w2) }
    val nb = counts.map(_._1).sum
    rows.foreach { r =>
      val k = r.getAs[Long]("k").toInt
      val covered = counts.take(k).map(_._1).sum
      assert(r.getAs[Long]("n_bigrams") == nb)
      assert(r.getAs[Long]("covered") == covered, k)
      assert(r.getAs[Long]("coverage_permille") == 1000 * covered / nb)
    }
    // coverage must be monotone in k
    val cov = rows.map(_.getAs[Long]("covered"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b })
  }

  test("length deciles: boundaries are exact percentile_disc values " +
      "per source, monotone in d, and bracket the observed range") {
    val rows = graft.ops.TextOps.corpusLengthDeciles(spark, sfDir)
      .collect()
    val bySrc = Tables(spark, sfDir).documents
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    assert(rows.length == bySrc.size * 9)
    rows.foreach { r =>
      val ss = bySrc(r.getAs[String]("source"))
      val d = r.getAs[Long]("decile")
      val n = ss.length.toLong
      // percentile_disc(d/10): value at 1-based rank ceil(d*n/10)
      val expect = ss(((d * n + 9) / 10 - 1).toInt)
      assert(r.getAs[Long]("boundary_chars") == expect,
        (r.getAs[String]("source"), d))
    }
    bySrc.keys.foreach { src =>
      val bs = rows.filter(_.getAs[String]("source") == src)
        .sortBy(_.getAs[Long]("decile")).map(_.getAs[Long]("boundary_chars"))
      assert(bs.zip(bs.tail).forall { case (a, b) => a <= b }, src)
      assert(bs.head >= bySrc(src).head && bs.last <= bySrc(src).last)
    }
  }
}
