package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (§2.10).
  *
  * Media (image/audio/video) is carried as an opaque `binary` column
  * with typed metadata alongside. Decode / feature-extract / frame-
  * sample run as batched per-partition transforms
  * (`Dataset.mapPartitions` — the JVM analog of `mapInPandas`: one
  * executor-side function invocation per partition batch, vectorizable,
  * no per-row serialization round-trips).
  *
  * The codec itself is STUBBED (no image/audio libraries in this
  * environment — see [[decodeStub]]): it derives deterministic fake
  * dimensions from the bytes. Everything around it — the binary schema,
  * the typed Encoders, the partition-batch call shape, the frame
  * sampling loop — is the real plumbing a production decode would use;
  * swapping in a real codec changes only the stub body.
  *
  * Scale: decode is embarrassingly parallel (narrow, no shuffle) and
  * sized by `spark.sql.files.maxPartitionBytes`; at 100 TB of media the
  * partition count scales linearly and nothing here aggregates.
  */
object MultimodalOps {

  /** Opaque media payload + routing metadata. */
  final case class MediaBlob(media_id: Long, kind: String,
    content: Array[Byte])

  /** Typed decode output. */
  final case class MediaFeatures(media_id: Long, kind: String,
    byte_len: Long, width: Int, height: Int, n_frames: Long,
    frame_sig: Long)

  /** STUB — stands in for the real codec (e.g. JPEG decode / PCM
    * parse). Deterministic fake resolution derived from a polynomial
    * content hash so tests have stable expectations. */
  private def decodeStub(b: Array[Byte]): (Int, Int) = {
    var h = 17L
    var i = 0
    while (i < b.length) { h = h * 31 + (b(i) & 0xff); i += 1 }
    (640 + math.floorMod(h, 7L).toInt * 16,
      360 + math.floorMod(h / 7, 5L).toInt * 16)
  }

  /** Shared with Oracle so the SQL replay can't silently drift. */
  private[graft] val FrameBytes = 32
  private val SampleEvery = 4

  /** Decode + frame-sample pipeline over fake media built from the
    * documents corpus (text bytes as payload — the container has no
    * real media, the plumbing doesn't care). Batch shape: one
    * `mapPartitions` call per partition, iterating blobs. */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Tables(spark, dir).documents
      .select(col("doc_id").as("media_id"),
        element_at(split(col("source"), "_"), 1).as("kind"),
        col("text").cast("binary").as("content"))
      .as[MediaBlob]
    blobs.mapPartitions { batch =>
      batch.map { blob =>
        val bytes = blob.content
        val (w, h) = decodeStub(bytes) // STUB boundary — real codec here
        // frame-sample: fixed-size frames, keep every SampleEvery-th,
        // fold a checksum over the kept frames
        val nFrames = (bytes.length + FrameBytes - 1) / FrameBytes
        var sig = 0L
        var f = 0
        while (f < nFrames) {
          if (f % SampleEvery == 0) {
            var i = f * FrameBytes
            val end = math.min(i + FrameBytes, bytes.length)
            var fh = 1125899906842597L
            while (i < end) { fh = fh * 31 + (bytes(i) & 0xff); i += 1 }
            sig ^= fh
          }
          f += 1
        }
        MediaFeatures(blob.media_id, blob.kind, bytes.length.toLong,
          w, h, nFrames.toLong, sig)
      }
    }.toDF().orderBy(col("media_id"))
  }

  /** Per-kind size census over the media store — the capacity-planning
    * read (rows, bytes, frame estimates per modality) every media
    * pipeline runs before sizing a decode fleet. Unlike the decode
    * key, nothing here needs the codec: byte length and the
    * fixed-width frame count come off the binary column itself, so
    * this IS DuckDB-oracled (UTF-8 octet length replays the
    * text→binary cast). One map-side-combinable agg on `kind` — a
    * handful of groups at any corpus size. */
  def multimodalSizeStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(element_at(split(col("source"), "_"), 1).as("kind"),
        length(col("text").cast("binary")).cast("long").as("byte_len"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("byte_len")).as("total_bytes"),
        min(col("byte_len")).as("min_bytes"),
        max(col("byte_len")).as("max_bytes"),
        sum(expr(s"(byte_len + ${FrameBytes - 1}) div $FrameBytes"))
          .as("total_frames"))
      .orderBy(col("kind"))

  /** CHECKSUM dedup census over the media store — media dedup in
    * production is checksum-first (hash the bytes, never decode):
    * per modality, the blob count, distinct-checksum count, and the
    * redundant copies a content-addressed store would reclaim. The
    * md5 runs on the binary column (codec-free); the per-kind
    * count-distinct is one shuffle on the 32-hex key, the same plan
    * at any corpus size. This corpus has no byte-identical blobs, so
    * the reclaim column is zero — the plan, not the number, is the
    * deliverable (its near-dup siblings live in the text family). */
  def multimodalDedupChecksum(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(element_at(split(col("source"), "_"), 1).as("kind"),
        md5(col("text").cast("binary")).as("checksum"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        countDistinct(col("checksum")).as("n_distinct"),
        (count(lit(1)) - countDistinct(col("checksum")))
          .as("n_dup_copies"))
      .orderBy(col("kind"))

  /** Bucket cap for the banded hamming join below — the
    * [[graft.ops.TextOps]] LSH-bucket discipline applied to signature
    * bands; shared with the oracle. */
  private[graft] val PhashBandCap = 64

  /** PERCEPTUAL-HASH-style near-dup census over the media store — the
    * codec-free analog of image aHash: a 16-bit content signature
    * (bit j = hex digit j occurs above its mean frequency in the
    * payload's hex image — a byte-histogram shape descriptor,
    * deterministic in any engine), then (1) exact-signature collision
    * counts and (2) NEAR pairs at hamming distance 1-2 found by a
    * BANDED self-join: signatures meet iff their high or low byte
    * matches (pigeonhole: every hamming-1 pair is guaranteed caught;
    * a hamming-2 pair only when both flips land in one band — the
    * documented recall trade of banding), with each (kind, band,
    * value) bucket capped at [[PhashBandCap]] members by media_id (the
    * LSH-bucket cap, so the join is never quadratic in a heavy
    * bucket). A real deployment widens the signature to 64 bits off
    * decoded pixels — the banding, cap, and popcount-verify plumbing
    * here are exactly that pipeline's. Per kind: media count, distinct
    * signatures, exact collisions, near pairs. (On this corpus the
    * word-soup payloads have near-uniform digit histograms, so most
    * signatures collide — which is precisely what makes the bucket cap
    * bind at sf0.1 and proves the join stays bounded under degenerate
    * signatures, the worst case a real store hits.) */
  def multimodalPhashDedup(spark: SparkSession, dir: String): DataFrame = {
    val hexDigits = "0123456789ABCDEF"
    val sig = Tables(spark, dir).documents
      .select(col("doc_id").as("media_id"),
        element_at(split(col("source"), "_"), 1).as("kind"),
        hex(col("text").cast("binary")).as("hx"))
      .withColumn("n", length(col("hx")).cast("long"))
      .withColumn("phash", (0 until 16).map { j =>
        val d = hexDigits(j)
        when(lit(16L) * (col("n")
            - length(expr(s"replace(hx, '$d', '')")).cast("long"))
          > col("n"), lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _))
      .select(col("media_id"), col("kind"), col("phash"))
      .localCheckpoint(true) // read by the census + both band legs
    val census = sig.groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        countDistinct(col("phash")).as("n_distinct_phash"),
        (count(lit(1)) - countDistinct(col("phash")))
          .as("n_dup_copies"))
    val bands = sig
      .select(col("media_id"), col("kind"), col("phash"),
        lit(1).as("band"), expr("phash div 256").as("bv"))
      .unionByName(sig.select(col("media_id"), col("kind"),
        col("phash"), lit(0).as("band"), expr("phash % 256").as("bv")))
    val wCap = Window.partitionBy(col("kind"), col("band"), col("bv"))
      .orderBy(col("media_id"))
    val capped = bands.withColumn("rn", row_number().over(wCap))
      .filter(col("rn") <= PhashBandCap)
      .select(col("kind"), col("band"), col("bv"),
        col("media_id"), col("phash"))
    val pairs = capped.as("x")
      .join(capped.as("y"), Seq("kind", "band", "bv"))
      .filter(col("x.media_id") < col("y.media_id"))
      .select(col("kind"), col("x.media_id").as("ida"),
        col("y.media_id").as("idb"), col("x.phash").as("pa"),
        col("y.phash").as("pb"))
      .distinct() // a pair matching both bands counts once
      .filter(expr("bit_count(pa ^ pb) BETWEEN 1 AND 2"))
      .groupBy(col("kind")).agg(count(lit(1)).as("n_near_pairs"))
    census.join(pairs, Seq("kind"), "left")
      .select(col("kind"), col("n_media"), col("n_distinct_phash"),
        col("n_dup_copies"),
        coalesce(col("n_near_pairs"), lit(0L)).as("n_near_pairs"))
      .orderBy(col("kind"))
  }

  /** MAGIC-NUMBER census — the format-validation read an ingest
    * pipeline runs before any decode: the first 4 bytes of every blob
    * hex-encoded (the "magic", codec-free) censused per modality,
    * top-5 magics per kind. A kind whose top magic isn't its
    * container signature, or whose census fragments across many
    * magics, is a corrupted/mislabeled batch. One narrow projection +
    * a (kind, magic) keyed agg + a per-kind bounded window — the
    * shuffle carries 8-hex keys, never payloads. */
  def multimodalMagicCensus(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("kind"))
      .orderBy(col("n_media").desc, col("magic_hex"))
    Tables(spark, dir).documents
      .select(element_at(split(col("source"), "_"), 1).as("kind"),
        // cast to binary FIRST, then slice: the magic is the first 4
        // BYTES of the payload (a multibyte char must not widen the
        // slice, as the earlier substring-then-encode shape did)
        hex(substring(col("text").cast("binary"), 1, 4)).as("magic_hex"))
      .groupBy(col("kind"), col("magic_hex"))
      .agg(count(lit(1)).as("n_media"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("kind"), col("magic_hex"), col("n_media"), col("rk"))
      .orderBy(col("kind"), col("rk"))
  }

  /** Byte budget per output shard for [[multimodalShardPlan]];
    * shared with the oracle replay. */
  private[graft] val ShardBudgetBytes = 4096L

  /** SHARD-PLAN — the webdataset-style layout step between ingest and
    * training: media blobs are packed into fixed-byte-budget shards
    * per modality so a trainer streams whole shards instead of seeking
    * per blob. Deterministic offset-addressed assignment: within each
    * kind (ordered by media_id), a blob starts in shard
    * floor(preceding-bytes / budget) — the exact rule a sequential
    * shard writer implements, replayable with no RNG or state. Output
    * = the plan manifest per (kind, shard): blob count, byte size, id
    * range. The running sum is a KEYED window (O(1) state per kind);
    * at 100 TB the plan is one narrow scan + one hash exchange on
    * kind, and the manifest is shard-count-sized. */
  def multimodalShardPlan(spark: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("kind")).orderBy(col("media_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    Tables(spark, dir).documents
      .select(col("doc_id").as("media_id"),
        element_at(split(col("source"), "_"), 1).as("kind"),
        length(col("text").cast("binary")).cast("long").as("byte_len"))
      .withColumn("off", coalesce(sum(col("byte_len")).over(w), lit(0L)))
      .withColumn("shard_id",
        expr(s"CAST(off div $ShardBudgetBytes AS BIGINT)"))
      .groupBy(col("kind"), col("shard_id"))
      .agg(count(lit(1)).as("n_blobs"),
        sum(col("byte_len")).as("shard_bytes"),
        min(col("media_id")).as("first_id"),
        max(col("media_id")).as("last_id"))
      .orderBy(col("kind"), col("shard_id"))
  }

  /** PAYLOAD BYTE-ENTROPY — the codec-free corruption/encryption QC
    * read before any decode is attempted: a blob whose symbol entropy
    * is near-maximal is compressed/encrypted/noise, one near zero is
    * padding or a stuck encoder; both get quarantined without opening
    * a codec. Per blob the symbol histogram (one (media_id, symbol)
    * keyed count, map-side combinable — per-blob work at any corpus
    * size) and Shannon entropy with each term micro-rounded exactly
    * like `stats_entropy` (identical double shape both engines).
    * Flags at < 0.5 or > 7.9 of the 8-bit ceiling — on this corpus
    * the symbols are text bytes so values sit far from both rails;
    * the FLAGS are the operator, the rails are production-real. */
  def multimodalPayloadEntropy(spark: SparkSession, dir: String)
      : DataFrame = {
    val cells = Tables(spark, dir).documents
      .select(col("doc_id").as("media_id"),
        element_at(split(col("source"), "_"), 1).as("kind"),
        explode(expr(
          "transform(sequence(1, length(text)), i -> substring(text, i, 1))"))
          .as("sym"))
      .groupBy(col("media_id"), col("kind"), col("sym"))
      .agg(count(lit(1)).as("c"))
    cells
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy(col("media_id"))))
      .select(col("media_id"), col("kind"), col("n"),
        round(-(col("c") / col("n")) * log(2.0, col("c") / col("n"))
          * lit(1000000.0)).cast("long").as("t_micro"))
      .groupBy(col("media_id"), col("kind"))
      .agg(max(col("n")).as("n_bytes"),
        count(lit(1)).as("n_symbols"),
        sum(col("t_micro")).as("entropy_bits_micro"))
      .withColumn("flag_low", col("entropy_bits_micro") < 500000L)
      .withColumn("flag_high", col("entropy_bits_micro") > 7900000L)
      .orderBy(col("media_id"))
  }

  /** FRAME SAMPLING — the video-pipeline plumbing for "decode every
    * k-th frame": the payload is treated as a fixed-width frame array
    * (64-byte frames standing in for the codec's GOP structure, which
    * the stubbed decoder cannot parse in this container), every 4th
    * frame is sampled DETERMINISTICALLY (idx 0, 4, 8, … — the
    * reproducible-preprocessing requirement), and each sampled frame
    * emits its byte offset plus an 8-byte head fingerprint. All byte
    * math runs on the hex image of the payload so both engines slice
    * identically. Scale shape: pure per-row columnar work — the frame
    * explode multiplies rows by n_frames/4 but never shuffles, and at
    * 100 TB the offsets feed ranged reads of the media store instead
    * of full-payload decodes; a real decoder slots in as a mapInPandas
    * over exactly this (doc, offset) frame plan. */
  def multimodalFrameSample(spark: SparkSession, dir: String)
      : DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"),
        element_at(split(col("source"), "_"), 1).as("kind"),
        hex(col("text").cast("binary")).as("hx"),
        expr("CAST(length(CAST(text AS BINARY)) div 64 AS BIGINT)")
          .as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("kind"), col("hx"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(4L)))
          .as("frame_idx"))
      .select(col("doc_id"), col("kind"), col("frame_idx"),
        (col("frame_idx") * 64).as("byte_off"),
        expr("substring(hx, CAST(frame_idx * 128 + 1 AS INT), 16)")
          .as("frame_head_hex"))
      .orderBy(col("doc_id"), col("frame_idx"))
}
