package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Semantic replays for the rule-filter quality pair:
  * quality_blocklist (word-list content gate) and doc_readability
  * (Flesch scoring over the vowel-group syllable heuristic). */
class ReadabilitySpec extends AnyFunSuite {
  import TestSession._

  test("quality_blocklist: counts and verdicts match a raw-text replay") {
    val got = TextOps.qualityBlocklist.fn(spark, sfDir).collect()
    val raw = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.length === raw.size)
    val list = TextOps.BlocklistWords.toSet
    got.foreach { r =>
      val words = raw(r.getAs[Long]("doc_id")).split(" ", -1)
      val hits = words.count(list)
      val distinctHits = words.filter(list).distinct.length
      assert(r.getAs[Int]("n_words") === words.length)
      assert(r.getAs[Int]("n_hits") === hits)
      assert(r.getAs[Int]("n_distinct_hits") === distinctHits)
      val rate = r.getAs[Double]("hit_rate")
      assert(rate === BigDecimal(1.0 * hits / words.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val expectVerdict =
        if (rate >= 0.05) "block" else if (rate >= 0.02) "review" else "pass"
      assert(r.getAs[String]("verdict") === expectVerdict)
    }
    // the shipped default list must exercise every verdict on the corpus
    // (the reason the list overlaps the synthetic vocabulary)
    assert(got.map(_.getAs[String]("verdict")).distinct.sorted.toSeq ===
      Seq("block", "pass", "review"))
  }

  test("doc_readability: formulas and guards on a controlled fixture") {
    val dir = java.nio.file.Files.createTempDirectory("graft-read").toString
    import spark.implicits._
    Seq(
      // 4 words, 3 sentences ([.!?]+ splits; trailing split is empty and
      // dropped), 4 single-syllable words
      (0L, "go. go go! go?"),
      // vowel-less word exercises the max(1, ·) syllable guard
      (1L, "tsk tsk"),
      // multi-syllable: banana = 3 vowel groups; idea = i + ea = 2
      (2L, "banana idea")
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextOps.docReadability.fn(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    def flesch(w: Int, s: Int, sy: Int): Double =
      BigDecimal(206.835 - 1.015 * (1.0 * w / s) - 84.6 * (1.0 * sy / w))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0L).getAs[Int]("n_words") === 4)
    assert(r(0L).getAs[Int]("n_sentences") === 3)
    assert(r(0L).getAs[Long]("n_syllables") === 4L)
    assert(r(0L).getAs[Double]("flesch") === flesch(4, 3, 4))
    assert(r(1L).getAs[Int]("n_sentences") === 1)   // no [.!?] → 1 sentence
    assert(r(1L).getAs[Long]("n_syllables") === 2L) // max(1, 0) per word
    assert(r(2L).getAs[Long]("n_syllables") === 5L) // banana 3 + idea 2
    // bucket reads the ROUNDED score — replay the CASE on each row
    r.values.foreach { x =>
      val f = x.getAs[Double]("flesch")
      val expect =
        if (f >= 90) "very_easy" else if (f >= 70) "easy"
        else if (f >= 50) "medium" else if (f >= 30) "hard" else "very_hard"
      assert(x.getAs[String]("bucket") === expect)
    }
  }

  test("doc_readability: corpus rows are punctuation-free (1 sentence) and bucketed consistently") {
    val got = TextOps.docReadability.fn(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { x =>
      assert(x.getAs[Int]("n_sentences") === 1)
      val f = x.getAs[Double]("flesch")
      val expect =
        if (f >= 90) "very_easy" else if (f >= 70) "easy"
        else if (f >= 50) "medium" else if (f >= 30) "hard" else "very_hard"
      assert(x.getAs[String]("bucket") === expect)
      // Flesch-Kincaid grade and reading ease must move in opposite
      // directions as syllable density rises — pin the formula signs
      assert(x.getAs[Double]("fk_grade") ===
        BigDecimal(0.39 * x.getAs[Int]("n_words") / x.getAs[Int]("n_sentences")
          + 11.8 * x.getAs[Long]("n_syllables").toDouble / x.getAs[Int]("n_words")
          - 15.59)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }
}
