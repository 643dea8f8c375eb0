package graft

import graft.ops.MultimodalOps

/** Tests for the multimodal binary plumbing: schema, determinism, and
  * frame-sampling arithmetic (the stubbed codec is deterministic by
  * construction, so everything downstream is assertable). */
class MultimodalSpec extends SparkSpec {

  test("decode pipeline emits the typed schema with one row per blob") {
    val df = MultimodalOps.multimodalDecode(spark, sfDir)
    assert(df.columns.toSeq == Seq("media_id", "kind", "byte_len",
      "width", "height", "n_frames", "frame_sig"))
    assert(df.count() == 500)
  }

  test("decode is deterministic across runs") {
    val a = MultimodalOps.multimodalDecode(spark, sfDir).collect()
    val b = MultimodalOps.multimodalDecode(spark, sfDir).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
  }

  test("byte_len equals n_chars and frames cover the payload") {
    val rows = MultimodalOps.multimodalDecode(spark, sfDir).collect()
    val nChars = Tables(spark, sfDir).documents.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars")).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val len = r.getAs[Long]("byte_len")
      assert(len == nChars(id)) // ascii corpus: 1 byte per char
      val frames = r.getAs[Long]("n_frames")
      assert(frames == (len + 31) / 32)
    }
  }

  test("fake resolutions stay within the stub's declared range") {
    val rows = MultimodalOps.multimodalDecode(spark, sfDir).collect()
    rows.foreach { r =>
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      assert(w >= 640 && w <= 640 + 6 * 16)
      assert(h >= 360 && h <= 360 + 4 * 16)
    }
  }
  test("size stats: per-kind byte and frame totals match the decode run") {
    val stats = MultimodalOps.multimodalSizeStats(spark, sfDir).collect()
      .map(r => r.getAs[String]("kind") -> r).toMap
    val decoded = MultimodalOps.multimodalDecode(spark, sfDir).collect()
      .groupBy(_.getAs[String]("kind"))
    assert(stats.keySet == decoded.keySet)
    decoded.foreach { case (kind, rs) =>
      val s = stats(kind)
      val lens = rs.map(_.getAs[Long]("byte_len"))
      assert(s.getAs[Long]("n_media") == rs.length.toLong)
      assert(s.getAs[Long]("total_bytes") == lens.sum)
      assert(s.getAs[Long]("min_bytes") == lens.min)
      assert(s.getAs[Long]("max_bytes") == lens.max)
      assert(s.getAs[Long]("total_frames") ==
        rs.map(_.getAs[Long]("n_frames")).sum)
    }
  }

  test("checksum dedup census: distinct ≤ media, reclaim = gap, and " +
      "the corpus has no byte-identical blobs") {
    val rows = MultimodalOps.multimodalDedupChecksum(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_media")
      val d = r.getAs[Long]("n_distinct")
      assert(d <= n)
      assert(r.getAs[Long]("n_dup_copies") == n - d)
      assert(d == n, "this corpus has no exact-duplicate blobs")
    }
  }

  test("phash dedup: signature recomputes from the hex histogram, " +
      "near pairs verified at hamming 1-2 under the bucket cap") {
    val rows = MultimodalOps.multimodalPhashDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // recompute every signature from first principles
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val hx = r.getAs[String]("text").getBytes("UTF-8")
          .map("%02X".format(_)).mkString
        val counts = hx.groupBy(identity).view.mapValues(_.length)
        val phash = (0 until 16).map { j =>
          val d = "0123456789ABCDEF"(j)
          if (16L * counts.getOrElse(d, 0) > hx.length) 1L << j else 0L
        }.sum
        (r.getLong(0), r.getAs[String]("source").split("_")(0), phash)
      }
    val byKind = docs.groupBy(_._2)
    rows.foreach { r =>
      val kind = r.getAs[String]("kind")
      val sigs = byKind(kind).map(_._3)
      assert(r.getAs[Long]("n_media") == sigs.length.toLong)
      assert(r.getAs[Long]("n_distinct_phash") ==
        sigs.distinct.length.toLong)
      assert(r.getAs[Long]("n_dup_copies") ==
        (sigs.length - sigs.distinct.length).toLong)
      // brute-force the banded near-pair count with the cap
      val members = byKind(kind).sortBy(_._1)
      def bucketed(band: Long => Long) = members
        .groupBy(m => band(m._3)).values
        .flatMap(_.sortBy(_._1).take(MultimodalOps.PhashBandCap))
        .toSet
      val hi = bucketed(_ / 256); val lo = bucketed(_ % 256)
      val pairs = (for {
        a <- members; b <- members
        if a._1 < b._1
        if (hi(a) && hi(b) && a._3 / 256 == b._3 / 256) ||
          (lo(a) && lo(b) && a._3 % 256 == b._3 % 256)
        h = java.lang.Long.bitCount(a._3 ^ b._3)
        if h >= 1 && h <= 2
      } yield (a._1, b._1)).distinct
      assert(r.getAs[Long]("n_near_pairs") == pairs.length.toLong,
        s"$kind near pairs")
    }
  }

  test("shard plan: mass conserved, shards contiguous, assignment " +
      "replays the offset rule exactly") {
    import org.apache.spark.sql.functions._
    val plan = MultimodalOps.multimodalShardPlan(spark, sfDir).collect()
    val blobs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        element_at(split(col("source"), "_"), 1).as("kind"),
        length(col("text").cast("binary")).cast("long").as("len"))
      .collect()
      .map(r => (r.getAs[String]("kind"), r.getLong(0), r.getLong(2)))
    val budget = MultimodalOps.ShardBudgetBytes
    val expected = blobs.groupBy(_._1).toSeq.flatMap { case (k, bs) =>
      var off = 0L
      bs.sortBy(_._2).map { case (_, id, len) =>
        val s = off / budget; off += len; (k, s, id, len)
      }
    }.groupBy(p => (p._1, p._2)).map { case ((k, s), ps) =>
      (k, s) -> (ps.length.toLong, ps.map(_._4).sum,
        ps.map(_._3).min, ps.map(_._3).max)
    }
    assert(plan.length == expected.size)
    plan.foreach { r =>
      val key = (r.getString(0), r.getAs[Long]("shard_id"))
      val (n, bytes, lo, hi) = expected(key)
      assert(r.getAs[Long]("n_blobs") == n, key)
      assert(r.getAs[Long]("shard_bytes") == bytes, key)
      assert(r.getAs[Long]("first_id") == lo &&
        r.getAs[Long]("last_id") == hi, key)
    }
    // shards are contiguous 0..max within each kind
    plan.groupBy(_.getString(0)).values.foreach { rs =>
      val ids = rs.map(_.getAs[Long]("shard_id")).sorted
      assert(ids.toSeq == (0L until ids.length).toSeq)
    }
  }

  test("payload entropy: per-blob recompute, bounded by log2 of the " +
      "symbol count, rails consistent") {
    import org.apache.spark.sql.functions._
    val rows = MultimodalOps.multimodalPayloadEntropy(spark, sfDir)
      .collect()
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    rows.take(100).foreach { r =>
      val t = texts(r.getLong(0))
      val counts = t.groupBy(identity).view.mapValues(_.length).toMap
      val n = t.length.toDouble
      val h = counts.values.map { c =>
        math.round(-(c / n) * (math.log(c / n) / math.log(2.0))
          * 1000000.0)
      }.sum
      assert(r.getAs[Long]("n_bytes") == t.length.toLong)
      assert(r.getAs[Long]("n_symbols") == counts.size.toLong)
      assert(r.getAs[Long]("entropy_bits_micro") == h, r.getLong(0))
      // entropy ≤ log2(distinct symbols), modulo per-term rounding
      val cap = math.log(counts.size.toDouble) / math.log(2.0)
      assert(h <= (cap * 1000000.0).toLong + counts.size)
      assert(r.getAs[Boolean]("flag_low") == (h < 500000L))
      assert(r.getAs[Boolean]("flag_high") == (h > 7900000L))
    }
  }

  test("frame sample: every 4th 64-byte frame, offsets and head " +
      "fingerprints match a per-payload byte recompute") {
    import org.apache.spark.sql.functions._
    val rows = MultimodalOps.multimodalFrameSample(spark, sfDir)
      .collect()
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    val expTotal = texts.values.map { t =>
      val nf = t.getBytes("UTF-8").length / 64
      if (nf > 0) (nf + 3) / 4 else 0
    }.sum
    assert(rows.length == expTotal)
    rows.take(200).foreach { r =>
      val idx = r.getAs[Long]("frame_idx")
      assert(idx % 4 == 0)
      assert(r.getAs[Long]("byte_off") == idx * 64)
      val bytes = texts(r.getLong(0)).getBytes("UTF-8")
      assert(idx * 64 + 64 <= bytes.length) // only FULL frames sampled
      val head = bytes.slice(idx.toInt * 64, idx.toInt * 64 + 8)
        .map("%02X".format(_)).mkString
      assert(r.getAs[String]("frame_head_hex") == head, r.getLong(0))
    }
  }
}
