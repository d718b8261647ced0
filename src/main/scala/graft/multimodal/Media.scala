package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal column plumbing (SURVEY.md §2.6).
  *
  * Media payloads are opaque `binary` columns plus a typed metadata
  * struct — the schema/partitioning/batching layer a 100 TB
  * image/audio corpus needs, with the decode kernel stubbed (the
  * image/audio codecs are not in this container). The Spark-side
  * shapes are real: binary columns survive parquet round-trips,
  * feature extraction runs as a batched `mapPartitions` (the JVM
  * analogue of `mapInPandas`: one buffer per batch, vectorizable
  * kernel boundary), and partitioning is by media bucket so one
  * executor handles one shard of blobs.
  */
object Media {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** §2.6#41 — ingest: text payloads stood in as UTF-8 binary blobs
    * with a typed metadata struct (mime/width/height derived
    * deterministically so the oracle can check the metadata surface).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("media"),
        struct(
          when(col("doc_id") % 3 === 0, lit("image/png"))
            .when(col("doc_id") % 3 === 1, lit("audio/wav"))
            .otherwise(lit("video/mp4")).as("mime"),
          (col("n_chars") % 640).cast("long").as("width"),
          (col("n_chars") % 480).cast("long").as("height"),
          col("source").as("origin")).as("meta"))

  /** Oracle-checked metadata surface of the ingest. */
  def mmIngest(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"),
        length(col("media")).cast("long").as("n_bytes"),
        col("meta.mime").as("mime"),
        col("meta.width").as("width"),
        col("meta.height").as("height"))
      .orderBy(col("doc_id"))

  /** §2.6#278 — per-container storage profile: asset count, byte
    * totals/extremes, and distinct (width, height) geometry count per
    * mime type — the capacity-planning readout a media lake runs
    * before a transcode or re-shard. One narrow metadata pass (the
    * binary payload contributes only its length) reducing map-side
    * onto the bounded mime axis; the geometry distinct is a
    * two-level agg, never a global distinct.
    */
  def mmFormatProfile(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("meta.mime").as("mime"),
        length(col("media")).cast("long").as("n_bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .groupBy(col("mime"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"),
        (sum(col("n_bytes")).cast("double") / count(lit(1))).as("avg_bytes"),
        countDistinct(col("width"), col("height")).as("n_geometries"))
      .orderBy(col("mime"))

  /** §2.6#286 — payload size outliers per mime: assets whose byte
    * length sits more than 2σ from their container's mean — the
    * truncated-upload / runaway-transcode detector a media lake runs
    * after every ingest batch. Mean/σ come from exact integer
    * sufficient sums (n, Σx, Σx²) on the bounded mime axis,
    * broadcast back over one narrow metadata pass; the z-test is
    * the identical IEEE expression in both engines.
    */
  def mmSizeOutliers(spark: SparkSession, dir: String): DataFrame = {
    val sized = mediaTable(spark, dir)
      .select(col("meta.mime").as("mime"),
        length(col("media")).cast("long").as("n_bytes"))
    // s2 accumulates in decimal: per-row squares fit a long (payloads
    // < 2³¹ bytes), but their SUM crosses 2⁶³ at ~10⁷ megabyte-scale
    // assets — exactly the design point — and non-ANSI long sums wrap
    // silently. Decimal(38) is exact to 10³⁸ and the oracle's HUGEINT
    // sum matches it bit-for-bit after the one double cast.
    val stats = sized.groupBy(col("mime"))
      .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("s1"),
        sum((col("n_bytes") * col("n_bytes")).cast("decimal(38,0)")).as("s2"))
      .select(col("mime"), col("n"),
        (col("s1").cast("double") / col("n")).as("mean_b"),
        sqrt((col("s2").cast("double") -
          col("s1").cast("double") * col("s1") / col("n")) /
          (col("n") - 1)).as("sd_b"))
    sized.join(broadcast(stats), Seq("mime"))
      .groupBy(col("mime"))
      .agg(count(lit(1)).as("n_assets"),
        sum(when(abs(col("n_bytes") - col("mean_b")) > lit(2.0) * col("sd_b"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("mime"), col("n_assets"), col("n_outliers"),
        // exact-count quotient, emitted unrounded (tie-attractor rule)
        (col("n_outliers").cast("double") / col("n_assets"))
          .as("outlier_rate"))
      .orderBy(col("mime"))
  }

  /** §2.6#183 — exact payload dedup over the binary column: one
    * digest shuffle with map-side combine (the media twin of
    * dedup_exact), plus the cross-container signal — identical bytes
    * ingested under DIFFERENT mime types (n_mimes > 1), the
    * "same asset, different wrapper" case a storage dedup must
    * catch — and the wasted-bytes readout.
    */
  def mmPayloadDedup(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"), md5(col("media")).as("digest"),
        length(col("media")).cast("long").as("n_bytes"),
        col("meta.mime").as("mime"))
      .groupBy(col("digest"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("survivor_doc"),
        max(col("n_bytes")).as("n_bytes"),
        countDistinct(col("mime")).as("n_mimes"),
        ((count(lit(1)) - 1) * max(col("n_bytes"))).as("wasted_bytes"))
      .orderBy(col("survivor_doc"))

  /** Oracle-checked surface of the feature pipeline: doc_id, byte
    * length, and the stub checksum, computed through the real
    * distributed path (binary column → batched mapPartitions kernel →
    * DataFrame). The oracle recomputes the byte-sum from the text
    * (payloads here are ASCII, so UTF-8 bytes == character codes).
    */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir))
      .select(col("doc_id"), col("n_bytes"), col("checksum"))
      .orderBy(col("doc_id"))

  /** §2.6#42 — feature extraction plumbing: batched per-partition
    * kernel over the binary column. The decode step is a
    * deterministic STUB (byte-sum checksum + an 8-bucket byte
    * histogram as the "feature"); a real deployment swaps
    * [[stubKernel]] for the codec call without touching the
    * distributed shape.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("media")).rdd.mapPartitions { rows =>
      rows.grouped(64).flatMap { batch => // batch boundary = vectorized-kernel call
        batch.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          // real codecs first (PNG/JPEG via imageio, WAV via
          // javax.sound), stub for every other payload — same
          // distributed shape either way
          val (checksum, hist) = imageKernel(bytes)
            .orElse(audioKernel(bytes))
            .getOrElse(stubKernel(bytes))
          Row(id, bytes.length.toLong, checksum, hist)
        }
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  val vadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("energies", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Per-frame energy extraction: the batched kernel boundary of a
    * VAD/segmentation pipeline — frame the payload (16-byte frames
    * standing in for PCM windows), one mean-energy value per frame.
    * Energies are exact rationals (integer sum ÷ frame length, one
    * IEEE division) so downstream thresholding is reproducible. A
    * real deployment swaps this kernel for the codec + RMS window
    * without touching the distributed shape.
    */
  def frameEnergies(media: DataFrame, frameBytes: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("media")).rdd.mapPartitions { rows =>
      rows.grouped(64).flatMap { batch => // batch boundary = vectorized-kernel call
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val es = bytes.grouped(frameBytes)
            .map(f => f.map(b => (b & 0xff).toLong).sum.toDouble / f.length)
            .toArray
          Row(r.getLong(0), es)
        }
      }
    }
    spark.createDataFrame(rdd, vadSchema)
  }

  /** §2.6 `mm_vad_segments` — activity segmentation over media
    * payloads (the audio VAD shape): kernel-extracted frame energies,
    * a fixed activity threshold, and gaps-and-islands run-length
    * merging into maximal active segments — all narrow per-doc work
    * after one posexplode, with the only shuffle the per-doc window/
    * rollup on doc_id. Reports frames / active frames / segment count
    * / longest run per payload.
    */
  def mmVadSegments(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val framed = frameEnergies(mediaTable(spark, dir))
      .select(col("doc_id"), posexplode(col("energies")))
      .toDF("doc_id", "idx", "e")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("idx"))
    val segs = framed.filter(col("e") > 95.0)
      .withColumn("grp", col("idx") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp")).agg(count(lit(1)).as("len"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"), max(col("len")).as("max_run"),
        sum(col("len")).as("n_active"))
    framed.groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
      .join(segs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_frames"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
      .orderBy(col("doc_id"))
  }

  /** §2.6 `mm_scene_detect` — shot-boundary detection over video
    * payloads (the video twin of [[mmVadSegments]]): the kernel frames
    * each `video/mp4` payload into 64-byte spans (standing in for
    * decoded frames), a scene CUT fires where consecutive frame
    * energies jump by more than 5, and cut positions fold into
    * scenes (cumulative-cut-count grouping — gaps-and-islands).
    * Per payload: frames, cuts, scenes, and the longest scene. Only
    * the mime filter, one kernel pass, and one doc_id window/rollup —
    * at 100 TB the frame explosion is bounded by payload size and
    * everything after the kernel is the compact (doc, frame) grid.
    */
  def mmSceneDetect(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vids = mediaTable(spark, dir)
      .filter(col("meta").getField("mime") === "video/mp4")
    val framed = frameEnergies(vids, frameBytes = 64)
      .select(col("doc_id"), posexplode(col("energies")))
      .toDF("doc_id", "idx", "e")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("idx"))
    val scenes = framed
      .withColumn("prev_e", lag(col("e"), 1).over(w))
      .withColumn("cut",
        when(col("prev_e").isNotNull && abs(col("e") - col("prev_e")) > 5.0, 1L)
          .otherwise(0L))
      .withColumn("scene", sum(col("cut")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perScene = scenes.groupBy(col("doc_id"), col("scene"))
      .agg(count(lit(1)).as("len"))
    perScene.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_scenes"), max(col("len")).as("max_scene_frames"),
        sum(col("len")).as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        (col("n_scenes") - 1L).as("n_cuts"), col("n_scenes"),
        col("max_scene_frames"))
      .orderBy(col("doc_id"))
  }

  /** §2.6#293 — acoustic fingerprint + exact-fingerprint dedup census
    * over the audio payloads: the energy-delta-sign fingerprint (the
    * published Shazam/Chromaprint family's core idea — bit i is set
    * iff frame i+1 is louder than frame i, over the first 32 deltas of
    * the 16-byte-frame energy envelope from the same kernel as
    * [[mmVadSegments]]), then payloads collapse on the fingerprint.
    * The acoustic twin of [[mmPayloadDedup]] (byte-identical) and
    * [[mmPhash]] (image gradient): clips whose byte containers differ
    * but whose loudness envelope matches still share a signature. Per
    * doc: frame count, fingerprint, the cluster keeper and its size.
    * Scale shape: one kernel pass, one fingerprint-keyed shuffle for
    * the census, one same-key join back — nothing pairwise, and no
    * broadcast (distinct fingerprints scale with the corpus).
    */
  def mmAudioFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val audio = mediaTable(spark, dir)
      .filter(col("meta").getField("mime") === "audio/wav")
    // sequence(0, n-2) is DESCENDING when n < 2 — guard single-frame
    // payloads to the empty fingerprint instead
    val nd = least(size(col("energies")) - 1, lit(32))
    val fp = frameEnergies(audio)
      .select(col("doc_id"),
        size(col("energies")).cast("long").as("n_frames"),
        when(size(col("energies")) > 1,
          aggregate(
            transform(sequence(lit(0), nd - 1),
              i => when(
                element_at(col("energies"), i + 2) >
                  element_at(col("energies"), i + 1),
                // 2^i exact in double for i <= 31, cast back to long
                pow(lit(2.0), i).cast("long")).otherwise(lit(0L))),
            lit(0L), _ + _))
          .otherwise(lit(0L)).as("fingerprint"))
    val census = fp.groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_cluster"))
    fp.join(census, Seq("fingerprint"))
      .select(col("doc_id"), col("n_frames"), col("fingerprint"),
        col("keeper"), col("n_cluster"),
        (col("doc_id") === col("keeper")).as("is_keeper"))
      .orderBy(col("doc_id"))
  }

  /** PNG / JPEG magic-byte sniff — cheap pre-filter so non-image
    * payloads never pay a decode attempt.
    */
  def looksLikeImage(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      ((bytes(0) == 0x89.toByte && bytes(1) == 'P'.toByte) || // PNG
        (bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte)) // JPEG

  /** REAL decode kernel: `javax.imageio` (ships in the JDK — no new
    * dependency) decodes PNG/JPEG payloads; the feature is an 8-bucket
    * luminance histogram over the decoded pixels and the checksum is
    * the total integer luminance (content-derived, unlike the stub's
    * transport byte-sum). Returns None when the payload is not a
    * decodable image so the caller falls back to [[stubKernel]].
    */
  def imageKernel(bytes: Array[Byte]): Option[(Long, Seq[Double])] = {
    if (!looksLikeImage(bytes)) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) None
    else {
      val hist = new Array[Double](8)
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(lum * 8 / 256) += 1.0
          sum += lum
          x += 1
        }
        y += 1
      }
      Some((sum, hist.toSeq))
    }
  }

  /** WAV magic sniff (RIFF....WAVE). */
  def looksLikeWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R'.toByte && bytes(1) == 'I'.toByte &&
      bytes(2) == 'F'.toByte && bytes(3) == 'F'.toByte &&
      bytes(8) == 'W'.toByte && bytes(9) == 'A'.toByte &&
      bytes(10) == 'V'.toByte && bytes(11) == 'E'.toByte

  /** REAL audio decode kernel: `javax.sound.sampled` (in the JDK)
    * parses WAV containers; for 16-bit PCM the feature is an 8-bucket
    * amplitude histogram over the decoded samples and the checksum is
    * the total absolute amplitude. None for anything undecodable so
    * the caller falls back to [[stubKernel]].
    */
  def audioKernel(bytes: Array[Byte]): Option[(Long, Seq[Double])] = {
    if (!looksLikeWav(bytes)) return None
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
      else {
        val data = ais.readAllBytes()
        val big = fmt.isBigEndian
        val hist = new Array[Double](8)
        var sum = 0L
        var i = 0
        while (i + 1 < data.length) {
          val s =
            if (big) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
            else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
          sum += math.abs(s.toInt)
          hist(((s.toInt + 32768) * 8) / 65536) += 1.0
          i += 2
        }
        Some((sum, hist.toSeq))
      }
    } catch { case _: Exception => None }
  }

  /** STUB resize kernel: deterministic down-sampling of the payload
    * to `targetBytes` by stride selection — stands in for an image
    * resize; the distributed shape (binary in, smaller binary out,
    * same batching) is the real one.
    */
  def stubResize(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
    if (bytes.length <= targetBytes) bytes
    else {
      val out = new Array[Byte](targetBytes)
      val stride = bytes.length.toDouble / targetBytes
      var i = 0
      while (i < targetBytes) { out(i) = bytes((i * stride).toInt); i += 1 }
      out
    }

  /** STUB frame sampler: splits the payload into `frames` equal spans
    * and returns (frame_idx, span) pairs — the video frame-sampling
    * plumbing with a deterministic fake decoder.
    */
  def stubFrameSample(bytes: Array[Byte], frames: Int): Seq[(Int, Array[Byte])] = {
    val span = math.max(1, bytes.length / frames)
    (0 until frames).flatMap { f =>
      val start = f * span
      if (start >= bytes.length) None
      else Some(f -> bytes.slice(start, math.min(start + span, bytes.length)))
    }
  }

  /** Resize pass over the media table — batched mapPartitions like
    * [[extractFeatures]].
    */
  def resizeMedia(media: DataFrame, targetBytes: Int): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("resized", BinaryType, nullable = false),
      StructField("orig_bytes", LongType, nullable = false)))
    val rdd = media.select(col("doc_id"), col("media")).rdd.mapPartitions { rows =>
      rows.grouped(64).flatMap(_.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.getLong(0), stubResize(bytes, targetBytes), bytes.length.toLong)
      })
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Frame-sampling pass: one output row per sampled frame. */
  def sampleFrames(media: DataFrame, frames: Int): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val rdd = media.select(col("doc_id"), col("media")).rdd.mapPartitions { rows =>
      rows.grouped(64).flatMap(_.flatMap { r =>
        stubFrameSample(r.getAs[Array[Byte]](1), frames).map { case (i, b) =>
          Row(r.getLong(0), i, b)
        }
      })
    }
    spark.createDataFrame(rdd, schema)
  }

  /** §2.6#68 oracle surface: resize (stride selection to 64 bytes)
    * and 4-way frame sampling, reported per doc as byte counts plus
    * the resized payload's byte-sum checksum. Both passes run through
    * the real batched-kernel path ([[resizeMedia]]/[[sampleFrames]]);
    * the checksum reuses [[extractFeatures]] on the resized column.
    */
  def mmResizeFrames(spark: SparkSession, dir: String): DataFrame = {
    val media = mediaTable(spark, dir)
    val resized = resizeMedia(media, 64)
    val rChk = extractFeatures(resized.select(col("doc_id"), col("resized").as("media")))
      .select(col("doc_id"), col("n_bytes").as("resized_bytes"),
        col("checksum").as("resized_checksum"))
    val frames = sampleFrames(media, 4)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame"))).cast("long").as("frames_bytes"))
    resized.select(col("doc_id"), col("orig_bytes"))
      .join(rChk, Seq("doc_id"))
      .join(frames, Seq("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** STUB decode kernel — deterministic fake standing in for the real
    * image/audio codec (not available in this container).
    */
  def stubKernel(bytes: Array[Byte]): (Long, Seq[Double]) = {
    var sum = 0L
    val hist = new Array[Double](8)
    var i = 0
    while (i < bytes.length) {
      val u = bytes(i) & 0xff
      sum += u
      hist(u % 8) += 1.0
      i += 1
    }
    (sum, hist.toSeq)
  }

  /** §2.6 — perceptual hash of every media payload: one narrow
    * codegen-adjacent pass per blob through the native
    * [[graft.functions.DHash32]] gradient kernel (no shuffle, no
    * collect — the 100 TB path is scan → hash → write).
    */
  def mmPhash(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"),
        graft.functions.MediaFunctions.dhash32(col("media")).as("phash"))
      .orderBy(col("doc_id"))

  /** §2.6 — perceptual near-dup pairs: the multimodal twin of
    * [[graft.dedup.Dedup.dedupSimhash]]. Each 32-bit dHash is cut
    * into 4 8-bit LSH bands; candidate pairs share at least one band
    * (equi-join on (band index, band value) — never all-pairs), and
    * survive when full Hamming distance ≤ 3. Band width trades
    * recall for candidate volume; at 100 TB the band join shuffles
    * on band value and stays linear in candidates.
    */
  def mmPhashDedup(spark: SparkSession, dir: String): DataFrame = {
    // exact-collapse BEFORE banding: the candidate relation is a pure
    // function of the phash (band share ∧ hamming ≤ 3), so payloads
    // with identical fingerprints — every byte-identical duplicate
    // included — collapse to one representative with a multiplicity,
    // and the band self-join is quadratic only in DISTINCT
    // fingerprints per bucket, never in duplicate-cluster depth (the
    // 9.4× stress tail this op carried before). `n_pairs` reports how
    // many underlying payload pairs each rep pair stands for;
    // byte-identical clusters themselves are mm_payload_dedup's
    // readout, exactly as exact text dups are dedup_exact's.
    val hashed = mediaTable(spark, dir)
      .select(col("doc_id"),
        graft.functions.MediaFunctions.dhash32(col("media")).as("phash"))
      .groupBy(col("phash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
    val banded = hashed.select(col("doc_id"), col("phash"), col("n_copies"),
        explode(sequence(lit(0), lit(3))).as("j"))
      .withColumn("band", expr("shiftright(phash, cast(j * 8 as int)) & 255"))
    val a = banded.select(col("j"), col("band"), col("doc_id").as("a_id"),
      col("phash").as("a_hash"), col("n_copies").as("na"))
    val b = banded.select(col("j"), col("band"), col("doc_id").as("b_id"),
      col("phash").as("b_hash"), col("n_copies").as("nb"))
    a.join(b, Seq("j", "band"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_hash").bitwiseXOR(col("b_hash"))).cast("long").as("hamming"),
        (col("na") * col("nb")).as("n_pairs"))
      .filter(col("hamming") <= 3)
      .distinct()
      .orderBy(col("a_id"), col("b_id"))
  }
}
