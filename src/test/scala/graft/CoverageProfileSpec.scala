package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.CorpusOps
import graft.vector.Similarity

/** Guards for the corpus-profiling batch: matryoshka energy shares,
  * the self-calibrating stopword fingerprint, and the vocabulary
  * coverage curve — each against an independent recount or a structural
  * invariant of the math. */
class CoverageProfileSpec extends AnyFunSuite {
  import TestSession._

  private val sf = "/root/testdata/sf0.001"

  test("emb_matryoshka: full truncation is exactly 1; shares monotone in m; counts constant") {
    val rows = Similarity.embMatryoshka.fn(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(8, 16, 32, 64))
    val nVecs = Tables.embeddings(spark, sf).count()
    rows.foreach(r => assert(r.getAs[Long]("n_vecs") === nVecs))
    val full = rows.last
    assert(full.getAs[Double]("mean_share") === 1.0)
    assert(full.getAs[Double]("min_share") === 1.0)
    assert(full.getAs[Double]("servable_frac") === 1.0)
    // energy shares can only grow with the prefix
    val means = rows.map(_.getAs[Double]("mean_share")).toSeq
    assert(means.sliding(2).forall { case Seq(a, b) => a <= b; case _ => true },
      s"mean_share not monotone: $means")
    val mins = rows.map(_.getAs[Double]("min_share")).toSeq
    assert(mins.sliding(2).forall { case Seq(a, b) => a <= b; case _ => true })
    rows.foreach { r =>
      assert(r.getAs[Double]("min_share") >= 0.0)
      assert(r.getAs[Double]("mean_share") <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_servable") <= nVecs)
    }
  }

  test("stopword_profile: token totals recount; TVD bounded; skew flag consistent") {
    val rows = CorpusOps.stopwordProfile.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val corpusTokens = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .count()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === corpusTokens)
    rows.foreach { r =>
      assert(r.getAs[Long]("stop_tokens") <= r.getAs[Long]("n_tokens"))
      val share = r.getAs[Double]("stop_share")
      assert(share >= 0.0 && share <= 1.0)
      val tvd = r.getAs[Double]("tvd")
      assert(tvd >= 0.0 && tvd <= 1.0)
      assert((r.getAs[Int]("skewed") == 1) === (tvd > 0.02))
    }
    // the head of a frequency curve must carry real mass everywhere
    assert(rows.forall(_.getAs[Long]("stop_tokens") > 0))
  }

  test("vocab_overlap: symmetric-complete matrix; set identities hold; type counts recount") {
    val rows = CorpusOps.vocabOverlap.fn(spark, sf).collect()
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    // one row per unordered pair
    assert(rows.length.toLong === langs * (langs - 1) / 2)
    val types = Tables.documents(spark, sf)
      .select(col("lang"), explode(split(col("text"), " ")).as("t"))
      .distinct().groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getAs[Long]("types_a") === types(r.getString(0)))
      assert(r.getAs[Long]("types_b") === types(r.getString(1)))
      val shared = r.getAs[Long]("shared")
      assert(shared <= math.min(r.getAs[Long]("types_a"), r.getAs[Long]("types_b")))
      val cont = r.getAs[Double]("containment")
      val jac = r.getAs[Double]("jaccard")
      assert(cont >= 0.0 && cont <= 1.0)
      assert(jac <= cont + 1e-9, "jaccard can never exceed containment")
    }
  }

  test("vocab_coverage: curve is monotone and saturates at the type count") {
    val rows = CorpusOps.vocabCoverage.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val covs = Seq("cov10", "cov50", "cov100", "cov500", "cov1000")
        .map(r.getAs[Double])
      assert(covs.sliding(2).forall { case Seq(a, b) => a <= b; case _ => true },
        s"${r.getString(0)}: $covs")
      covs.foreach(c => assert(c > 0.0 && c <= 1.0))
      // top-k at or beyond the whole vocabulary covers everything
      if (r.getAs[Long]("n_types") <= 1000)
        assert(r.getAs[Double]("cov1000") === 1.0)
      if (r.getAs[Long]("n_types") <= 10)
        assert(r.getAs[Double]("cov10") === 1.0)
    }
    // per-lang token totals recount
    val langTokens = Tables.documents(spark, sf)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("n_tokens") === langTokens(r.getString(0))))
  }
}
