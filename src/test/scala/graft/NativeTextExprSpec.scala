package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

class NativeTextExprSpec extends GraftSpec {

  test("minhash plan evaluates the signature expression once, not per band") {
    val plan = Dedup.dedupMinhashLsh(spark, sf).queryExecution.executedPlan.toString
    val n = "(?i)minhashsigs".r.findAllIn(plan).length
    assert(n <= 1, s"MinHashSigs appears $n times in the physical plan:\n${plan.take(3000)}")
  }

  test("simhash matches the portable HOF formulation bit-for-bit") {
    import graft.text.TextAnalysis.tokensCol
    val nibbleSets = Seq("89abcdef", "4567cdef", "2367abef", "13579bdf")
    val hashes = transform(tokensCol(col("text")), t => md5(t))
    val nToks = size(col("hashes"))
    val bitCols = (0 until 32).map { k =>
      val pos = k / 4 + 1
      val inSet: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        h => nibbleSets(k % 4).map(c => substring(h, pos, 1) === c.toString).reduce(_ || _)
      when(size(filter(col("hashes"), inSet)) * 2 > nToks, lit("1")).otherwise(lit("0"))
    }
    val hof = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), hashes.as("hashes"))
      .select(col("doc_id"), concat(bitCols: _*).as("hof_hash"))
    val native = Dedup.dedupSimhash(spark, sf)
    val joined = native.join(hof, "doc_id")
    assert(joined.filter(col("simhash32") =!= col("hof_hash")).count() === 0)
  }

  test("jaccard_sorted matches the intersect/union composition bit-for-bit") {
    import graft.functions.TextFunctions.jaccard_sorted
    import graft.text.TextAnalysis.tokensCol
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), array_sort(array_distinct(tokensCol(col("text")))).as("ts"))
    val a = docs.as("a"); val b = docs.as("b")
    val pairs = a.join(b, col("a.doc_id") < col("b.doc_id")).limit(20000)
      .select(
        jaccard_sorted(col("a.ts"), col("b.ts")).as("native"),
        (size(array_intersect(col("a.ts"), col("b.ts"))).cast("double") /
          size(array_union(col("a.ts"), col("b.ts"))).cast("double")).as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("winnow_fingerprints equals the portable slice/array_min formulation") {
    import graft.functions.TextFunctions.winnow_fingerprints
    val k = 8; val w = 4
    val portable = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        expr(s"transform(sequence(1, length(text) - ${k - 1}), i -> md5(substring(text, i, $k)))").as("kg"))
      .select(col("doc_id"),
        expr(s"array_sort(array_distinct(transform(sequence(1, size(kg) - ${w - 1}), j -> array_min(slice(kg, j, $w)))))").as("fps_p"))
    val native = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), winnow_fingerprints(col("text"), k, w).as("fps_n"))
    val joined = native.join(portable, "doc_id")
    assert(joined.filter(col("fps_n") =!= col("fps_p")).count() === 0)
    assert(joined.count() === 500)
  }

  test("jaro-winkler: known values, threshold gating, edge cases, symmetry") {
    import graft.functions.JaroWinkler.similarity
    assert(math.abs(similarity("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(similarity("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(similarity("dwayne", "duane") - 0.8400000000000001) < 1e-12)
    // below the 0.7 boost threshold the prefix must NOT boost
    assert(math.abs(similarity("ab", "az") - 2.0 / 3) < 1e-12)
    assert(similarity("", "") === 1.0)
    assert(similarity("abc", "") === 0.0)
    assert(similarity("same", "same") === 1.0)
    assert(similarity("az", "by") === 0.0)
    val pairs = Seq(("lavender", "lavendar"), ("widget", "gizmo"), ("spring", "string"))
    pairs.foreach { case (a, b) =>
      assert(similarity(a, b) === similarity(b, a), s"asymmetric on ($a, $b)")
    }
  }

  test("jaro-winkler and dup-stats generate compilable whole-stage code (no interpreted fallback)") {
    // fallback=false turns any janino failure into a hard error, so a
    // pass means doGenCode produced genuinely compilable code and the
    // kernels stayed inside whole-stage codegen
    val strict = spark.newSession()
    strict.conf.set("spark.sql.codegen.fallback", "false")
    strict.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val repStrict = graft.text.TextAnalysis.textRepetition(strict, sf).collect()
    val repBase = graft.text.TextAnalysis.textRepetition(spark, sf).collect()
    assert(repStrict.toSeq === repBase.toSeq)
    val fjStrict = graft.analytics.Relational.qFuzzyJoin(strict, sf).collect()
    val fjBase = graft.analytics.Relational.qFuzzyJoin(spark, sf).collect()
    assert(fjStrict.toSeq === fjBase.toSeq)
  }

  test("length-prune rule injects the derived guard and preserves results exactly") {
    import graft.analytics.Relational
    // session WITHOUT the rule: baseline results
    val plain = spark.newSession()
    plain.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val baseline = {
      // build the same query without ensureRegistered by inlining the shape
      import graft.functions.JaroWinkler.jaro_winkler
      val names = graft.sources.Tables.part(plain, sf)
        .select(col("p_name").as("name"))
        .groupBy(col("name")).agg(count(lit(1)).as("n_parts"))
        .withColumn("blk", split(col("name"), " ").getItem(0))
      val a = names.select(col("blk"), col("name").as("name_a"), col("n_parts").as("n_a"))
      val b = names.select(col("blk"), col("name").as("name_b"), col("n_parts").as("n_b"))
      a.join(b, Seq("blk")).filter(col("name_a") < col("name_b"))
        .withColumn("jw", round(jaro_winkler(col("name_a"), col("name_b")), 4))
        .filter(col("jw") >= 0.88)
        .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"), col("jw"))
        .orderBy(col("name_a"), col("name_b")).collect()
    }
    val withRule = Relational.qFuzzyJoin(spark, sf)
    assert(withRule.collect().toSeq === baseline.toSeq)
    // the derived guard (least/greatest of lengths) must be in the optimized plan
    val opt = withRule.queryExecution.optimizedPlan.toString.toLowerCase
    assert(opt.contains("least(length") || opt.contains("least(char_length"),
      s"derived length guard missing from plan:\n$opt")
  }

  test("fuzzy join only emits pairs above threshold, never a name with itself") {
    val rows = graft.analytics.Relational.qFuzzyJoin(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getDouble(4) >= 0.88)
    }
  }
}
