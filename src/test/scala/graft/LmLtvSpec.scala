package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.EventAnalytics
import graft.text.CorpusOps

/** Guards for the bigram-LM scorer and the cohort LTV curve. */
class LmLtvSpec extends AnyFunSuite {
  import TestSession._

  private val sf = "/root/testdata/sf0.001"

  test("corpus_bigram_ppl: covers all multi-word docs; ppl = 2^bits; bigram count recounts") {
    val rows = CorpusOps.corpusBigramPpl.fn(spark, sf).collect()
    val multiWord = Tables.documents(spark, sf)
      .filter(expr("size(split(text, ' ')) >= 2")).count()
    assert(rows.length.toLong === multiWord)
    rows.foreach { r =>
      val bits = r.getAs[Double]("bits_per_bigram")
      val ppl = r.getAs[Double]("ppl")
      assert(bits > 0.0, "negative surprisal")
      val expect = BigDecimal(math.pow(2, bits))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(ppl - expect) < 1e-9)
      // a smoothed bigram model over a ~30-term vocab cannot be more
      // perplexed than the vocabulary size divided by the floor weight
      assert(ppl < 5 * 64, s"ppl $ppl out of range")
    }
    // per-doc bigram counts recount against the raw text
    val direct = Tables.documents(spark, sf)
      .select(col("doc_id"),
        (expr("size(split(text, ' '))") - 1).as("nb"))
      .filter(col("nb") >= 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("n_bigrams") === direct(r.getLong(0))))
  }

  test("event_ltv: cumulative curve is monotone and reconciles with retention cohorts") {
    val rows = EventAnalytics.eventLtv.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // cohort sizes agree with the retention matrix's cohorts
    val retention = EventAnalytics.eventRetention.fn(spark, sf).collect()
      .groupBy(_.getDate(0)).map { case (d, g) =>
        d.toString -> g.head.getAs[Long]("cohort_users") }
    rows.foreach { r =>
      assert(retention(r.getDate(0).toString) === r.getAs[Long]("cohort_users"))
      assert(r.getAs[Int]("week_offset") >= 0)
      assert(r.getAs[Double]("week_revenue") > 0.0)
    }
    // per cohort: cum_revenue strictly increasing, equals running sum of
    // weekly revenue, ltv = cum / users
    rows.groupBy(_.getDate(0).toString).foreach { case (_, g) =>
      val ordered = g.sortBy(_.getAs[Int]("week_offset"))
      var run = BigDecimal(0)
      ordered.foreach { r =>
        run += BigDecimal(r.getAs[Double]("week_revenue"))
        assert(math.abs(r.getAs[Double]("cum_revenue") - run.toDouble) < 1e-6)
        val exp = (run / r.getAs[Long]("cohort_users"))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getAs[Double]("ltv_per_user") - exp) < 1e-9)
      }
    }
  }
}
