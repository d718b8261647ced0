package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{jaccard_sorted, simhash32}
import graft.plans.TopK

/** Seeded randomized cross-validation: native expressions and the
  * custom operator checked against plain-Scala reference
  * implementations on generated inputs (fixed seed — deterministic).
  */
class RandomizedSpec extends GraftSpec {

  private val rnd = new Random(42)
  private val vocab = Vector("a", "bb", "ccc", "dd", "e", "ff", "g", "hhh", "ij", "kl")

  test("Quantiles.exact equals Spark's percentile aggregate on random groups") {
    import spark.implicits._
    val rows = (0 until 2000).map { i =>
      (s"g${rnd.nextInt(7)}", rnd.nextDouble() * 1000)
    }
    val df = rows.toDF("k", "v")
    val qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9, "p999" -> 0.999)
    val got = graft.analytics.Quantiles.exact(df, "k", "v", qs)
      .collect().map(r => r.getString(0) ->
        qs.indices.map(i => r.getDouble(i + 1))).toMap
    val expect = df.groupBy(col("k"))
      .agg(expr("percentile(v, 0.25)"), expr("percentile(v, 0.5)"),
        expr("percentile(v, 0.9)"), expr("percentile(v, 0.999)"))
      .collect().map(r => r.getString(0) ->
        qs.indices.map(i => r.getDouble(i + 1))).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (k, vals) =>
      vals.zip(expect(k)).zipWithIndex.foreach { case ((g, e), i) =>
        assert(math.abs(g - e) < 1e-9, s"group $k quantile ${qs(i)._1}: $g vs $e")
      }
    }
  }

  test("jaccard_sorted equals the Set-based definition on 300 random pairs") {
    import spark.implicits._
    val pairs = (0 until 300).map { i =>
      val a = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).distinct.sorted
      val b = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).distinct.sorted
      (i, a, b)
    }
    val df = pairs.toDF("id", "a", "b")
      .select(col("id"), jaccard_sorted(col("a"), col("b")).as("j"))
    val got = df.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    pairs.foreach { case (i, a, b) =>
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.toSet.union(b.toSet).size
      val expect = if (union == 0) 0.0 else inter.toDouble / union
      assert(got(i) === expect, s"pair $i: a=$a b=$b")
    }
  }

  test("simhash32 equals a direct MessageDigest reimplementation on 100 random docs") {
    import spark.implicits._
    def reference(tokens: Seq[String]): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](32)
      tokens.foreach { t =>
        val hex = md.digest(t.getBytes("UTF-8")).take(8)
          .map(b => f"${b & 0xff}%02x").mkString
        (0 until 32).foreach { k =>
          val nibble = Integer.parseInt(hex(k / 4).toString, 16)
          if (((nibble >> (3 - k % 4)) & 1) == 1) votes(k) += 1
        }
        md.reset()
      }
      votes.map(v => if (2 * v > tokens.size) '1' else '0').mkString
    }
    val docs = (0 until 100).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))))
    }
    val got = docs.toDF("id", "toks")
      .select(col("id"), simhash32(col("toks")).as("h"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    docs.foreach { case (i, toks) =>
      assert(got(i) === reference(toks), s"doc $i: $toks")
    }
  }

  test("TopK.perGroup equals sort-and-take on random grouped data") {
    import spark.implicits._
    val rows = (0 until 2000).map { i =>
      (rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(1000).toDouble)
    }
    val df = rows.toDF("grp", "id", "score")
    val got = TopK.perGroup(df, Seq("grp"), Seq(("score", false), ("id", true)), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(5).map(r => (g, r._2))
    }.toSet
    assert(got === expect)
  }
}
