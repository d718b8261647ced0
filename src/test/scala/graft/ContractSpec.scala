package graft

/** Driver-contract invariants: the exact things the round harness
  * depends on (entry smoke, registry/oracle key alignment, every
  * query analyzable).
  */
class ContractSpec extends GraftSpec {

  test("entry (driver smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; oracle coverage is total") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val orphanOracles = o.diff(q)
    assert(orphanOracles.isEmpty, s"oracles without queries: $orphanOracles")
    val uncovered = q.diff(o)
    assert(uncovered.isEmpty, s"queries without oracles: $uncovered")
  }

  test("every registered query analyzes against sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.schema.fields.nonEmpty, s"$name has no schema")
      df.queryExecution.assertAnalyzed()
    }
  }

  test("no oracle SQL contains an unsubstituted interpolation or stray margin") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // JSON paths use bare '$'; Scala interpolation residue is '${' or '$invCte'-style
      assert(!sql.contains("${") && !sql.matches("(?s).*\\$[a-zA-Z].*"),
        s"$name oracle has an unsubstituted interpolation")
      // a line starting with the || concat operator is fine; a single
      // leading | is stripMargin residue
      assert(!sql.linesIterator.exists(l =>
        l.trim.startsWith("|") && !l.trim.startsWith("||")),
        s"$name oracle has an unstripped margin")
    }
  }
}
