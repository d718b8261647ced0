package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Media
import graft.text.TextAnalysis

class TextAndMediaSpec extends GraftSpec {

  test("token counts are positive and consistent with given n_chars") {
    val r = TextAnalysis.textTokens(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_ws_tokens") > 0)
      assert(row.getAs[Long]("len_chars") === row.getAs[Long]("n_chars"))
    }
  }

  test("quality scores live in [0, 1] and ratios are sane") {
    TextAnalysis.textQuality(spark, sf).collect().foreach { row =>
      val q = row.getAs[Double]("quality_score")
      assert(q >= 0.0 && q <= 1.0)
      val sr = row.getAs[Double]("space_ratio")
      assert(sr > 0.0 && sr < 1.0)
    }
  }

  test("langid always predicts a label from the closed set") {
    val preds = TextAnalysis.textLangid(spark, sf)
      .select(col("predicted_lang")).distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "de", "es", "fr", "und")))
  }

  test("fingerprint clusters cover every doc exactly once") {
    val r = TextAnalysis.textFingerprint(spark, sf)
    assert(r.count() === graft.sources.Tables.documents(spark, sf).count())
  }

  test("ngram stats: 5 top bigrams per language") {
    val r = TextAnalysis.textNgramStats(spark, sf).groupBy(col("lang")).count().collect()
    r.foreach(row => assert(row.getLong(1) === 5L))
  }

  test("media ingest produces binary payloads measured correctly") {
    val m = Media.mediaTable(spark, sf)
    val row = m.select(col("doc_id"), length(col("media")).as("len"), col("meta.mime"))
      .orderBy(col("doc_id")).first()
    assert(row.getAs[Int]("len") > 0)
    assert(Set("image/png", "audio/wav", "video/mp4").contains(row.getAs[String]("mime")))
  }

  test("feature extraction stub: batched kernel output matches a driver-side recompute") {
    val media = Media.mediaTable(spark, sf).limit(10).cache()
    val feats = Media.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getSeq[Double](3))).toMap
    media.collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val bytes = r.getAs[Array[Byte]]("media")
      val (ck, hist) = Media.stubKernel(bytes)
      val (nb, fck, fhist) = feats(id)
      assert(nb === bytes.length.toLong)
      assert(fck === ck)
      assert(fhist === hist)
      assert(fhist.sum === bytes.length.toDouble)
    }
  }

  test("resize stub preserves ids and respects the byte budget") {
    val media = Media.mediaTable(spark, sf).limit(20).cache()
    val resized = Media.resizeMedia(media, 32).collect()
    assert(resized.length === 20)
    resized.foreach { r =>
      assert(r.getAs[Array[Byte]]("resized").length <= 32)
      assert(r.getAs[Long]("orig_bytes") > 0)
    }
  }

  test("frame sampling emits ordered spans that reassemble within the payload") {
    val media = Media.mediaTable(spark, sf).limit(5).cache()
    val frames = Media.sampleFrames(media, 4).collect()
    val byDoc = frames.groupBy(_.getLong(0))
    assert(byDoc.size === 5)
    byDoc.values.foreach { fs =>
      assert(fs.map(_.getInt(1)).sorted.toSeq === (0 until fs.length))
      assert(fs.forall(_.getAs[Array[Byte]]("frame").nonEmpty))
    }
  }

  test("pii mask: injected email and id are detected and scrubbed from every doc") {
    val r = TextAnalysis.textPiiMask(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_emails") >= 1L)
      assert(row.getAs[Long]("n_long_numbers") >= 1L)
      assert(row.getAs[String]("masked_digest").matches("[0-9a-f]{32}"))
    }
    // the masked text still differs per doc (the corpus text survives)
    assert(r.map(_.getAs[String]("masked_digest")).distinct.length > 1)
  }

  test("freq tokens sketch in its exact regime matches the exact groupBy") {
    val got = TextAnalysis.textFreqTokens(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val exact = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), explode(TextAnalysis.tokensCol(col("text"))).as("token"))
      .groupBy(col("lang"), col("token")).count()
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("count").desc, col("token"))).cast("long"))
      .filter(col("rnk") <= 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.sorted.toSeq === exact.sorted.toSeq)
  }

  test("dhash32: monotone ramps hash to all-zeros/all-ones; short payloads to 0") {
    import spark.implicits._
    val up = Array.tabulate[Byte](66)(i => i.toByte)
    val down = Array.tabulate[Byte](66)(i => (200 - i).toByte)
    val short = Array[Byte](1, 2, 3)
    val r = Seq((1L, up), (2L, down), (3L, short)).toDF("id", "payload")
      .select(col("id"), graft.functions.MediaFunctions.dhash32(col("payload")).as("h"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) === 0L)            // rising means: no falling gradient bit
    assert(r(2L) === 0xFFFFFFFFL)   // falling means: every gradient bit set
    assert(r(3L) === 0L)            // < 33 bytes: no meaningful gradient
  }

  test("phash dedup pairs are deduped, ordered, within radius, with exact multiplicities") {
    val hashes = Media.mmPhash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // phash-group sizes and representatives (min doc id per fingerprint)
    val groups = hashes.toSeq.groupBy(_._2)
      .map { case (h, ds) => h -> (ds.map(_._1).min, ds.size.toLong) }
    val pairs = Media.mmPhashDedup(spark, sf).collect()
    val seen = scala.collection.mutable.Set.empty[(Long, Long)]
    pairs.foreach { p =>
      val (a, b, h, np) = (p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3))
      assert(a < b)
      assert(seen.add((a, b)), s"duplicate pair ($a,$b)")
      assert(h === java.lang.Long.bitCount(hashes(a) ^ hashes(b)).toLong)
      assert(h <= 3L)
      // endpoints are fingerprint-group representatives, and the pair
      // multiplicity is exactly the product of the two group depths
      assert(groups(hashes(a))._1 === a, s"$a is not its fingerprint group's rep")
      assert(groups(hashes(b))._1 === b, s"$b is not its fingerprint group's rep")
      assert(np === groups(hashes(a))._2 * groups(hashes(b))._2)
    }
  }

  test("BM25: 3 query terms, ranks dense 1..k, rarer of two terms scores higher idf") {
    val r = TextAnalysis.textBm25(spark, sf).cache()
    val byWord = r.collect().groupBy(_.getAs[String]("word"))
    assert(byWord.size === 3)
    byWord.foreach { case (w, rows) =>
      val ranks = rows.map(_.getAs[Long]("rnk")).sorted.toSeq
      assert(ranks === (1L to ranks.length).toSeq, s"term $w ranks not dense")
      // scores strictly non-increasing in rank, all positive
      val byRank = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("bm25"))
      assert(byRank.forall(_ > 0))
      byRank.sliding(2).foreach {
        case Array(hi, lo) => assert(hi >= lo, s"term $w rank order broken")
        case _ =>
      }
    }
    r.unpersist()
  }

  test("PMI: pairs meet the min-count floor and beat independent-word frequency") {
    val rows = TextAnalysis.textPmi(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ab") >= 5)
      // top-20 collocations should all be positively associated
      assert(r.getAs[Double]("pmi") > 0,
        s"bigram '${r.getAs[String]("bigram")}' non-positive PMI in top set")
    }
    // descending by pmi
    val ps = rows.map(_.getAs[Double]("pmi"))
    assert(ps.sameElements(ps.sorted(Ordering[Double].reverse)))
  }

  test("scene detect: only video payloads; scenes = cuts + 1; frames conserved") {
    val rows = graft.multimodal.Media.mmSceneDetect(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 3 === 2L, "non-video doc in scene detection")
      assert(r.getLong(3) === r.getLong(2) + 1L, "scenes != cuts + 1")
      assert(r.getLong(4) <= r.getLong(1), "longest scene exceeds frame count")
      assert(r.getLong(4) >= 1L)
    }
    // frame counts match an independent framing of the same payloads
    val expFrames = graft.multimodal.Media.mediaTable(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 2)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.ceil(
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("media")) / 64.0).cast("long").as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) === expFrames(r.getLong(0))))
  }

  test("audio fingerprint: only audio payloads; census is consistent; bits bounded") {
    val rows = graft.multimodal.Media.mmAudioFingerprint(spark, sf).collect()
    assert(rows.nonEmpty)
    val byFp = rows.groupBy(_.getAs[Long]("fingerprint"))
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 3 === 1L, "non-audio doc fingerprinted")
      // <= 32 delta bits -> fingerprint < 2^32
      assert(r.getAs[Long]("fingerprint") >= 0L)
      assert(r.getAs[Long]("fingerprint") < (1L << 32))
      val cluster = byFp(r.getAs[Long]("fingerprint"))
      assert(r.getAs[Long]("n_cluster") === cluster.length.toLong)
      assert(r.getAs[Long]("keeper") === cluster.map(_.getAs[Long]("doc_id")).min)
      assert(r.getAs[Boolean]("is_keeper") ===
        (r.getAs[Long]("doc_id") === r.getAs[Long]("keeper")))
    }
    // identical payloads share a fingerprint: re-fingerprint one doc's
    // energies by hand and check the bit rule on a sample row
    val one = rows.minBy(_.getAs[Long]("doc_id"))
    val es = graft.multimodal.Media.frameEnergies(
        graft.multimodal.Media.mediaTable(spark, sf)
          .filter(org.apache.spark.sql.functions.col("doc_id") ===
            one.getAs[Long]("doc_id")))
      .collect().head.getSeq[Double](1)
    val expected = es.sliding(2).take(32).zipWithIndex.collect {
      case (Seq(a, b), i) if b > a => 1L << i
    }.sum
    assert(one.getAs[Long]("fingerprint") === expected)
    assert(one.getAs[Long]("n_frames") === es.length.toLong)
  }
}
