package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphOps
import graft.similarity.Ann
import graft.sources.Tables
import graft.text.{CorpusOps, TextAnalysis}

/** Invariant coverage for the round-11 operators: exact two-pass
  * heavy hitters, multiprobe LSH, Kneser–Ney perplexity, overlapping
  * chunking, and label-prop modularity. Each test cross-checks the
  * distributed result against an independent local recomputation or
  * a conservation law (never against the op's own machinery).
  */
class Round11OpsSpec extends GraftSpec {

  private def localTokens(): Seq[String] =
    Tables.documents(spark, sf).select(col("text")).collect()
      .toSeq.flatMap(_.getString(0).trim.toLowerCase.split("\\s+"))

  test("heavy hitters exact: output equals the brute-force count>=n/128 cut, counts exact") {
    val toks = localTokens()
    val n = toks.size.toLong
    val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      .filter { case (_, c) => c * TextAnalysis.HhReportDiv >= n }
    val got = TextAnalysis.textHeavyHittersExact(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "test corpus must produce at least one heavy hitter")
    assert(got.map(_._1).toSet === exact.keySet, "reported token set is the exact cut")
    got.foreach { case (t, (cnt, bp)) =>
      assert(cnt === exact(t), s"count for '$t' must be EXACT, not a sketch estimate")
      assert(bp === cnt * 10000L / n, s"share_bp for '$t'")
    }
  }

  test("multiprobe LSH: dominates single-bucket recall and never probes past Hamming distance 1") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val p = Ann.derivedPlanes(emb.size.toLong)
    def bucket(v: Array[Double]): String =
      (0 until p).map(i => if (v(i) > 0) '1' else '0').mkString
    val single = Ann.annLshTopk(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(3)).sorted.reverse).toMap
    val multi = Ann.annLshMultiprobe(spark, sf).collect()
    val multiByQ = multi.groupBy(_.getLong(0))
    // per query: the multiprobe candidate pool contains the home
    // bucket, so at every rank its cosine is >= the single-bucket one
    single.foreach { case (q, sCos) =>
      val mCos = multiByQ(q).map(_.getDouble(2)).sorted.reverse
      sCos.zipWithIndex.foreach { case (c, i) =>
        assert(i < mCos.length && mCos(i) >= c - 1e-9,
          s"query $q rank ${i + 1}: multiprobe $mCos must dominate single-bucket $sCos")
      }
    }
    // every hit must come from a bucket at Hamming distance <= 1
    multi.foreach { r =>
      val (q, v) = (r.getLong(0), r.getLong(1))
      val d = bucket(emb(q)).zip(bucket(emb(v))).count { case (a, b) => a != b }
      assert(d <= 1, s"hit ($q,$v) at Hamming distance $d — probe set leaked")
    }
  }

  test("KN perplexity: matches a from-scratch local Kneser-Ney recomputation") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.split("\\s+").toSeq))
    val byLang = docs.groupBy(_._2)
    val expect = docs.map { case (id, lang, toks) =>
      val corpus = byLang(lang).flatMap(d => d._3.sliding(2).filter(_.size == 2).map(w => (w(0), w(1))))
      val cBg = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val types = cBg.keySet
      val cW1 = corpus.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val tW1 = types.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val n1W2 = types.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val b = types.size.toLong
      val nll = toks.sliding(2).filter(_.size == 2).map { w =>
        val bg = (w(0), w(1))
        val pkn = (cBg(bg) - 0.75) / cW1(w(0)) +
          0.75 * tW1(w(0)) / cW1(w(0)) * (n1W2(w(1)).toDouble / b)
        -math.log(pkn)
      }.toSeq
      id -> (nll.size.toLong,
        BigDecimal(nll.sum / nll.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = TextAnalysis.textPerplexityKn(spark, sf).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val (id, nb, s) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(nb === expect(id)._1, s"doc $id bigram count")
      assert(math.abs(s - expect(id)._2) <= 1e-4 + 1e-9, s"doc $id KN score $s vs ${expect(id)._2}")
    }
  }

  test("chunk overlap: full coverage, stride law, content-addressed md5") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+").toSeq).toMap
    val got = CorpusOps.corpusChunkOverlap(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(got.keySet === docs.keySet, "every doc chunks")
    got.foreach { case (id, rows) =>
      val toks = docs(id)
      val n = toks.size
      val chunks = rows.sortBy(_.getLong(1)).map(r =>
        (r.getLong(1), r.getLong(2).toInt, r.getLong(3).toInt, r.getString(4)))
      val expChunks = 1 + (if (n > 128) (n - 128 + 95) / 96 else 0)
      assert(chunks.length === expChunks, s"doc $id chunk count for $n tokens")
      chunks.zipWithIndex.foreach { case ((ci, start, len, md5hex), i) =>
        assert(ci === i.toLong && start === i * 96, s"doc $id stride law")
        assert(len === math.min(start + 128, n) - start, s"doc $id chunk len")
        val text = toks.slice(start, start + len).mkString(" ")
        val dig = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(md5hex === dig, s"doc $id chunk $ci content address")
      }
      // coverage: last chunk reaches the end, every token in >=1 chunk
      val (_, lastStart, lastLen, _) = chunks.last
      assert(lastStart + lastLen === n, s"doc $id tail coverage")
    }
  }

  test("eventStream replays directory-shaped tables (the production/ScaleUp layout) in full") {
    import graft.streaming.StreamWatcher
    // land events as a Spark-written DIRECTORY of part files and
    // replay: the stream must see every row — the glob-filter form
    // silently replayed an EMPTY stream on this layout, which is how
    // the r10 sf1/skew bench artifacts carried ~0.16s phantom times
    // for the whole replay family
    val root = java.nio.file.Files.createTempDirectory("graft-evdir-").toString
    spark.read.parquet(s"$sf/events.parquet")
      .repartition(4).write.parquet(s"$root/events.parquet")
    val n = spark.read.parquet(s"$root/events.parquet").count()
    assert(n > 0)
    val dirCount = StreamWatcher.replayToBatch(
      StreamWatcher.eventStream(spark, root).agg(count(lit(1)).as("n")), "complete")
      .collect()(0).getLong(0)
    assert(dirCount === n, "directory layout must replay every event row")
    // and the flat single-file layout (driver testdata) still works
    val flatCount = StreamWatcher.replayToBatch(
      StreamWatcher.eventStream(spark, sf).agg(count(lit(1)).as("n")), "complete")
      .collect()(0).getLong(0)
    assert(flatCount === n, "flat layout must replay every event row")
  }

  test("modularity: conservation laws and cross-op equalities hold") {
    val row = GraphOps.graphModularity(spark, sf).collect()(0)
    // q in parts-per-10¹² since r15 (pure-integer surface)
    val (nComm, m, intra, q) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(4) / 1e12)
    // full-graph edge count must equal graph_triangles' n_edges
    val tri = GraphOps.graphTriangles(spark, sf).collect()(0)
    assert(m === tri.getLong(1), "m must equal the triangles op's full-graph edge count")
    assert(intra <= m && intra >= 0, "intra-community edges bounded by m")
    // the community count must equal label_prop's total cluster count
    val lp = GraphOps.graphLabelProp(spark, sf).collect()
      .map(_.getLong(1)).sum
    assert(nComm === lp, "modularity communities == label-prop clusters")
    assert(q > -0.5 && q < 1.0, s"Newman Q bound: $q")
    // a partition with any intra mass on this corpus should be positive
    assert(intra > 0 && q > 0, "dedup clusters are genuine communities")
  }
}
