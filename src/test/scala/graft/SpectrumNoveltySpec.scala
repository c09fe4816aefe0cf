package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side replicas for the round-12 audit pair: emb_effective_rank
  * (participation-ratio spectrum health from per-dim variances) and
  * corpus_novelty_curve (marginal first-seen-content rate over crawl
  * order). */
class SpectrumNoveltySpec extends AnyFunSuite {
  import TestSession._

  test("emb_effective_rank: spectrum replayed from raw vectors, " +
    "participation-ratio bounds, monotone cumulative curve") {
    val out = graft.vector.Similarity.embEffectiveRank.fn(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("k")).toSeq === Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L))

    // replay per-dim variances from the raw table with the op's own
    // rounding ladder (v rounded at 6, λ at picounits)
    val vecs = Tables.embeddings(spark, sfDir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dims = vecs.head.length
    val lamP = (0 until dims).map { j =>
      val vs = vecs.map(v => BigDecimal(v(j)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      val n = vs.length
      val mean = (vs.sum / n).toDouble
      val ex2 = (vs.map(x => x * x).sum / n).toDouble
      val lam = ex2 - mean * mean
      BigDecimal(lam * 1e12).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val s1 = lamP.sum
    val s2 = lamP.map(p => BigInt(p) * BigInt(p)).sum
    val effRank = BigDecimal(s1.toDouble * s1 / s2.toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val topShare = BigDecimal(1.0 * lamP.max / s1)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { r =>
      assert(r.getAs[Long]("n_dims") === dims.toLong)
      assert(r.getAs[Double]("eff_rank") === effRank)
      assert(r.getAs[Double]("top_share") === topShare)
      // 1 ≤ eff_rank ≤ n_dims — the participation-ratio bounds
      assert(r.getAs[Double]("eff_rank") >= 1.0 &&
        r.getAs[Double]("eff_rank") <= dims.toDouble)
    }
    val sorted = lamP.sorted(Ordering[Long].reverse)
    val byK = out.map(r => r.getAs[Long]("k") -> r.getAs[Double]("cum_var_share")).toMap
    Seq(1, 2, 4, 8, 16, 32, 64).foreach { k =>
      val expect = BigDecimal(1.0 * sorted.take(k).sum / s1)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(byK(k.toLong) === expect, s"cum share at k=$k")
    }
    // the curve is monotone non-decreasing and ends at 1
    val curve = out.sortBy(_.getAs[Long]("k")).map(_.getAs[Double]("cum_var_share"))
    assert(curve.sliding(2).forall { case Array(a, b) => b >= a; case _ => true })
    assert(curve.last === 1.0)
  }

  test("corpus_novelty_curve: buckets, first-occurrence counts and " +
    "cumulative share replayed from raw docs") {
    val out = graft.text.CorpusOps.corpusNoveltyCurve.fn(spark, sfDir).collect()
    assert(out.length === 20)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val hi = docs.map(_._1).max + 1
    def bucket(id: Long): Long = id * 20 / hi
    val nDocs = docs.groupBy(d => bucket(d._1)).view.mapValues(_.length.toLong).toMap
    val firstIds = docs.groupBy(_._2).values.map(_.map(_._1).min)
    val nNew = firstIds.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val nDistinct = firstIds.size.toLong
    var cum = 0L
    out.sortBy(_.getAs[Long]("bucket")).foreach { r =>
      val b = r.getAs[Long]("bucket")
      val nd = nDocs.getOrElse(b, 0L)
      val nn = nNew.getOrElse(b, 0L)
      cum += nn
      assert(r.getAs[Long]("n_docs") === nd, s"n_docs bucket $b")
      assert(r.getAs[Long]("n_new_texts") === nn, s"n_new bucket $b")
      if (nd == 0L) assert(r.isNullAt(r.fieldIndex("novelty_rate")))
      else assert(r.getAs[Double]("novelty_rate") ===
        BigDecimal(1.0 * nn / nd).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getAs[Double]("cum_distinct_share") ===
        BigDecimal(1.0 * cum / nDistinct).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the whole corpus is eventually covered
    assert(out.maxBy(_.getAs[Long]("bucket")).getAs[Double]("cum_distinct_share") === 1.0)
  }

  test("ann_query_skew: storage and probe-traffic counts replayed " +
    "against a brute-force centroid assignment") {
    val out = graft.vector.Similarity.annQuerySkew.fn(spark, sfDir).collect()
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    // per-label centroids (plain double means are exact enough for the
    // ASSIGNMENT replay: argmin gaps are far larger than summation
    // error on this corpus; the op's own decimal lanes are pinned by
    // the cross-engine hash gate)
    val cents = vecs.groupBy(_._2).view.mapValues { vs =>
      val dims = vs.head._3.length
      Array.tabulate(dims)(j => vs.map(_._3(j)).sum / vs.length)
    }.toMap
    def l2sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def ranked(v: Array[Double]): Seq[Int] =
      cents.toSeq.map { case (l, c) => (l2sq(v, c), l) }.sortBy(identity).map(_._2)
    val storage = vecs.groupBy(v => ranked(v._3).head)
      .view.mapValues(_.length.toLong).toMap
    val traffic = vecs.filter(_._1 % 17 == 0)
      .flatMap(v => ranked(v._3).take(2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out.length === cents.size)
    val totQ = traffic.values.sum
    out.foreach { r =>
      val cell = r.getAs[Int]("cell")
      assert(r.getAs[Long]("n_vecs") === storage.getOrElse(cell, 0L), s"cell $cell storage")
      assert(r.getAs[Long]("n_queries") === traffic.getOrElse(cell, 0L), s"cell $cell traffic")
    }
    // traffic shares sum to ~1 and every query contributed nprobe=2 visits
    assert(totQ === 2L * vecs.count(_._1 % 17 == 0))
  }
}
