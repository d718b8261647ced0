package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.similarity.Ann

class DedupSpec extends GraftSpec {

  /** Synthetic documents dir with known near-duplicates, matching the
    * documents schema, so candidate-pair generation has positives.
    */
  lazy val dupDir: String = {
    import spark.implicits._
    val base = "spark shuffle join partition broadcast hash aggregate sort merge " +
      "scan filter project window stream batch column row vector table"
    val docs = Seq(
      (0L, base, "en", "s0", base.length.toLong),
      (1L, base, "en", "s1", base.length.toLong), // exact dup of 0
      (2L, base.replace("vector", "tensor"), "en", "s2", base.length.toLong), // near-dup
      (3L, "completely different tiny text about nothing at all here now", "en", "s3", 60L),
      (4L, base.toUpperCase, "en", "s4", base.length.toLong)) // case-dup of 0
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-dup").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup collapses case-insensitive duplicates") {
    val clusters = Dedup.dedupExact(spark, dupDir).collect()
    // docs 0, 1, 4 share a digest (lower-cased identity)
    val big = clusters.filter(_.getAs[Long]("n_docs") === 3)
    assert(big.length === 1)
    assert(big(0).getAs[Long]("keeper_doc_id") === 0L)
    assert(Dedup.dedupExactSurvivors(spark, dupDir).count() === 3) // 0, 2, 3
  }

  test("minhash LSH candidates find exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashCandidatePairs(spark, dupDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"exact dup pair missing: $pairs")
    assert(pairs.contains((0L, 4L)), s"case dup pair missing: $pairs")
    assert(pairs.contains((0L, 2L)), s"near dup pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"unrelated doc paired: $pairs")
  }

  test("minhash signatures are deterministic") {
    val a = Dedup.minhashSignatures(spark, dupDir).orderBy("doc_id").collect()
    val b = Dedup.minhashSignatures(spark, dupDir).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("simhash: identical docs identical, near-dups close, unrelated far") {
    def hamming(x: String, y: String): Int = x.zip(y).count(p => p._1 != p._2)
    val fp = Dedup.dedupSimhash(spark, dupDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(0L) === fp(1L))
    assert(fp(0L) === fp(4L))
    assert(hamming(fp(0L), fp(2L)) <= 6)
    assert(hamming(fp(0L), fp(3L)) > 6)
    assert(fp.values.forall(_.length === 32))
  }

  test("simhash hamming-band pairs include the duplicate family") {
    val pairs = Dedup.simhashCandidatePairs(spark, dupDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 4L)))
  }

  test("ngram jaccard scores the near-dup above threshold, unrelated below") {
    val rows = Dedup.dedupNgramJaccard(spark, dupDir, threshold = 0.0).collect()
    val j = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    val m = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("n_doc_pairs")).toMap
    // doc 1 is a VERBATIM copy of 0: collapsed into representative 0
    // (n_copies = 2) before verification — the (0,1) pair is exact
    // dedup's job (#27), not re-verified here
    assert(!j.contains((0L, 1L)))
    assert(j((0L, 4L)) === 1.0) // case-dup: distinct text, same tokens
    assert(m((0L, 4L)) === 2L)  // stands for (0,4) and (1,4)
    assert(j((0L, 2L)) > 0.8)
    assert(m((0L, 2L)) === 2L)
    assert(j.get((0L, 3L)).forall(_ < 0.2)) // different len_band may exclude entirely
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val pairs = Ann.dedupEmbeddingCos(spark, sf).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getAs[Double]("cos") >= 0.35)
    }
  }

  test("connected components collapse candidate pairs into clusters") {
    import spark.implicits._
    // chain 1-2, 2-3; separate pair 10-11; isolated 20 is absent (no edges)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) === 1L && cc(2L) === 1L && cc(3L) === 1L)
    assert(cc(10L) === 10L && cc(11L) === 10L)
    assert(!cc.contains(20L))
  }

  test("connected components on the real candidate pairs assign each doc one cluster") {
    val pairs = Dedup.minhashCandidatePairs(spark, dupDir)
    val cc = Dedup.connectedComponents(pairs)
    assert(cc.groupBy("doc_id").count().filter(org.apache.spark.sql.functions.col("count") > 1).count() === 0)
    val clusters = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 0,1,2,4 form one near-dup family → same cluster, rooted at 0
    assert(Set(0L, 1L, 2L, 4L).flatMap(clusters.get).forall(_ === 0L))
  }

  test("payload dedup: identical bytes collapse across mime containers, wasted bytes counted") {
    import org.apache.spark.sql.functions._
    val rows = graft.multimodal.Media.mmPayloadDedup(spark, dupDir).collect()
    // docs 0 and 1 share the exact payload (byte-identical text);
    // doc_id 0 → image/png, doc_id 1 → audio/wav: a cross-mime dup
    val dup = rows.filter(_.getLong(2) == 0L).head
    assert(dup.getLong(1) === 2L, "docs 0 and 1 must collapse")
    assert(dup.getLong(4) === 2L, "cross-mime duplicate must be visible")
    assert(dup.getLong(5) === dup.getLong(3), "one redundant copy's bytes wasted")
    // case-dup (doc 4) does NOT collapse at byte level
    assert(rows.exists(r => r.getLong(2) == 4L && r.getLong(1) == 1L))
    // unique payloads waste nothing
    rows.filter(_.getLong(1) == 1L).foreach(r => assert(r.getLong(5) === 0L))
  }

  test("quality survivors: one survivor per cluster, and it has the cluster's max quality") {
    import org.apache.spark.sql.functions._
    val surv = Dedup.dedupQualitySurvivors(spark, sf).collect()
    assert(surv.nonEmpty)
    val quality = graft.text.TextAnalysis.textQuality(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(7)).toMap
    val clusters = Dedup.dedupCcClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    surv.foreach { r =>
      val (cid, size, sdoc, squal) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val members = byCluster(cid)
      assert(members.length.toLong === size)
      assert(members.contains(sdoc))
      assert(math.abs(members.map(quality).max - squal) < 1e-9)
      assert(math.abs(quality(sdoc) - squal) < 1e-9)
    }
  }

  test("containment dominates jaccard on every candidate pair and is 1 for self-contained sets") {
    val rows = Dedup.dedupContainment(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nA, nB, nC, cont) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(nC <= math.min(nA, nB))
      val jaccard = nC.toDouble / (nA + nB - nC)
      assert(cont >= jaccard - 1e-9, "containment must dominate jaccard")
      if (nC == math.min(nA, nB)) assert(cont === 1.0)
    }
  }

  test("dedup by source: redundant <= in-dup-clusters <= docs; totals conserve") {
    val rows = graft.dedup.Dedup.corpusDedupBySource(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(4) <= r.getLong(3))
    }
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === total)
    // global redundancy matches the exact-dedup cluster accounting
    val redundant = graft.dedup.Dedup.dedupExact(spark, sf)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("n_docs") - 1)).collect()(0).getLong(0)
    assert(rows.map(_.getLong(4)).sum === redundant)
  }

  test("length profile: percentiles ordered and inside the observed range") {
    val rows = graft.text.TextAnalysis.textLengthProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p10, p50, p90) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p10 <= p50 && p50 <= p90)
      assert(r.getLong(1) > 0)
    }
  }

  test("substring dedup: copies fully covered, near-dup prefix region exact, coverage bounded") {
    // dupDir: docs 0, 1 verbatim copies and 4 a case-dup -> all three
    // are TOKEN-identical (19 tokens), collapse to rep 0 with
    // n_copies = 3, and every span has multiplicity >= 3 -> full
    // coverage. Doc 2 changes token index 17 ("vector" -> "tensor"),
    // so windows 0..2 (of 0..4 at n = 15) still live in >= 2 docs ->
    // exactly one maximal region of 2 - 0 + 15 = 17 tokens. Doc 3 is
    // 10 tokens < n -> no spans at all.
    val n = 15
    val got = Dedup.dedupSubstring(spark, dupDir, n).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    for (id <- Seq(0L, 1L, 4L))
      assert(got(id) === ((19L, 1L, 19L, 19L, 1000000L)), s"copy $id: ${got(id)}")
    assert(got(2L) === ((19L, 1L, 17L, 17L, (17L * 1000000L) / 19L)), s"near-dup: ${got(2L)}")
    assert(got(3L) === ((10L, 0L, 0L, 0L, 0L)), s"short doc: ${got(3L)}")
    // and on the real corpus: one verdict per doc, coverage bounded,
    // regions never under the window size
    val rows = Dedup.dedupSubstring(spark, sf, n).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length === graft.sources.Tables.documents(spark, sf).count())
    assert(rows.exists(_._3 > 0), "corpus has near-dup families; some cross-doc span must surface")
    rows.foreach { case (id, nTok, nReg, dupTok, longest, ppm) =>
      assert(dupTok <= nTok, s"doc $id coverage exceeds its tokens")
      assert((nReg == 0) == (dupTok == 0))
      if (nReg > 0) assert(longest >= n && dupTok >= n, s"doc $id region under the window size")
      assert(ppm <= 1000000L)
    }
  }
}
