package graft

import org.apache.spark.sql.functions._

import graft.similarity.Pq

class PqSpec extends GraftSpec {

  test("pq codes are in [0, K) and codebook members reconstruct exactly") {
    val r = Pq.annPqCodes(spark, sf).cache()
    (0 until Pq.M).foreach { mi =>
      assert(r.filter(col(s"code_$mi") < 0 || col(s"code_$mi") >= Pq.K).isEmpty)
    }
    assert(r.filter(col("err_u") < 0).isEmpty)
    // the K codebook-source vectors quantize to themselves: zero error
    assert(r.filter(col("vec_id") < Pq.K && col("err_u") =!= 0L).isEmpty)
    r.unpersist()
  }

  test("adc recall is bounded by top_k and covers every probe") {
    val r = Pq.annPqAdc(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val m = row.getAs[Long]("n_matched")
      assert(m >= 0L && m <= row.getAs[Long]("top_k"))
    }
  }

  test("ivf+pq composite: every query answered; probed-cell scan is partition-pruned") {
    val rows = Pq.annIvfPqSearch(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { row =>
      val m = row.getAs[Long]("n_matched")
      assert(m >= 0L && m <= row.getAs[Long]("top_k"))
    }
    // the candidate read goes through the cell-partitioned store with
    // a partition filter (only probed cells are scanned)
    val plan = Pq.annIvfPqSearch(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [assigned_centroid"), plan.take(3000))
  }

  test("pq rerank: exact re-rank never loses recall, gains are the difference, candidates bound it") {
    val rows = Pq.annPqRerank(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (adc, rr, gain, k) = (r.getAs[Long]("n_matched_adc"),
        r.getAs[Long]("n_matched_rerank"), r.getAs[Long]("recall_gain"), r.getAs[Long]("top_k"))
      // quantization can only misorder candidates it retrieved: the
      // exact re-rank of a superset of the ADC cut dominates it
      assert(rr >= adc, s"rerank lost recall on probe ${r.getLong(0)}")
      assert(gain === rr - adc)
      assert(adc >= 0 && rr <= k)
    }
  }
}
