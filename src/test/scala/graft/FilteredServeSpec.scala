package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{CorpusOps, TextOps}
import graft.vector.Similarity

/** Guards for the filtered-serve batch: fuzzy decontamination, the
  * label-filtered ANN path, and the curriculum order plan. */
class FilteredServeSpec extends AnyFunSuite {
  import TestSession._

  private val sf = "/root/testdata/sf0.001"

  test("decontaminate_fuzzy: flags only corpus docs; banded estimate consistent") {
    val rows = TextOps.decontaminateFuzzy.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // bench docs never flag themselves
      assert(r.getLong(0) % 29 !== 0L)
      assert(r.getLong(1) % 29 === 0L, "best_bench_id must be a bench doc")
      val shared = r.getAs[Long]("max_shared")
      assert(shared >= 1 && shared <= 4)
      assert(r.getAs[Long]("n_bench_hits") >= 1)
      val expect = BigDecimal(shared.toDouble / 4)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("est_jaccard") - expect) < 1e-9)
      assert((r.getAs[Int]("contaminated") == 1) === (shared >= 2))
    }
    // a corpus doc with text identical to a bench doc must collide on
    // all 4 bands (same shingle set ⇒ same signature)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val benchTexts = docs.filter(_._1 % 29 == 0).map(_._2).toSet
    val twins = docs.filter { case (id, t) => id % 29 != 0 && benchTexts(t) }
      .map(_._1).toSet
    if (twins.nonEmpty) {
      val byId = rows.map(r => r.getLong(0) -> r.getAs[Long]("max_shared")).toMap
      twins.foreach(id => assert(byId.get(id).contains(4L),
        s"exact twin $id should share all 4 bands"))
    }
  }

  test("ann_filtered: pre-filter semantics — odd labels only, in-cell, ranked") {
    val rows = Similarity.annFiltered.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    def cellOf(e: Seq[Float]): Int =
      (if (e(0) > 0) 8 else 0) + (if (e(1) > 0) 4 else 0) +
        (if (e(2) > 0) 2 else 0) + (if (e(3) > 0) 1 else 0)
    val embs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Float](1), r.getInt(2))).toMap
    rows.foreach { r =>
      val (qe, _) = embs(r.getAs[Long]("query_id"))
      val (ne, label) = embs(r.getAs[Long]("neighbor_id"))
      assert(label % 2 === 1, "post-filter leak: even label served")
      assert(r.getAs[Int]("label") === label)
      assert(cellOf(ne) === cellOf(qe), "neighbor outside the probed cell")
      assert(r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 3)
      assert(r.getAs[Long]("n_candidates") >= r.getAs[Int]("rank"))
    }
    // per query: similarity non-increasing in rank
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      val byRank = g.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Double]("cos_sim")).toSeq
      assert(byRank.sliding(2).forall {
        case Seq(a, b) => a >= b; case _ => true })
    }
  }

  test("dedup_plane_agreement: reconciles with both live detectors; classes discriminate") {
    val rows = TextOps.dedupPlaneAgreement.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val byV = rows.map(r => r.getString(0) -> r).toMap
    assert(byV.keySet.subsetOf(Set("both", "text_only", "emb_only")))
    def n(v: String): Long =
      byV.get(v).map(_.getAs[Long]("n_pairs")).getOrElse(0L)
    // the embedding arm must reconcile pair-for-pair with the live
    // dedup_embedding operator (same bands, same threshold)
    val direct = graft.vector.Similarity.dedupEmbedding.fn(spark, sf).count()
    assert(n("both") + n("emb_only") === direct,
      s"embedding arm ${n("both") + n("emb_only")} vs dedup_embedding $direct")
    // shares partition the union
    assert(math.abs(rows.map(_.getAs[Double]("pair_share")).sum - 1.0) < 0.01)
    rows.foreach { r =>
      val mc = r.getAs[Double]("mean_cos")
      assert(mc >= -1.0 - 1e-9 && mc <= 1.0 + 1e-9)
    }
    // emb-flagged classes sit at/above the cosine threshold on average
    byV.get("emb_only").foreach(r =>
      assert(r.getAs[Double]("mean_cos") >= 0.35 - 1e-9))
  }

  test("emb_label_vote: partitions the corpus; accuracy = agree/voted; votes come from real labels") {
    val rows = Similarity.embLabelVote.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_voted") <= r.getAs[Long]("n_vecs"))
      assert(r.getAs[Long]("n_agree") <= r.getAs[Long]("n_voted"))
      assert(r.getAs[Long]("n_flagged")
        === r.getAs[Long]("n_voted") - r.getAs[Long]("n_agree"))
      if (r.getAs[Long]("n_voted") > 0) {
        val exp = BigDecimal(r.getAs[Long]("n_agree").toDouble
          / r.getAs[Long]("n_voted"))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getAs[Double]("accuracy") - exp) < 1e-9)
      }
    }
    // random labels ⇒ the audit must report ~chance accuracy, not a
    // flattering number: global accuracy stays below 3× chance
    val voted = rows.map(_.getAs[Long]("n_voted")).sum
    val agree = rows.map(_.getAs[Long]("n_agree")).sum
    assert(voted > 0)
    assert(agree.toDouble / voted < 3.0 / rows.length,
      s"accuracy ${agree.toDouble / voted} suspiciously high for random labels")
  }

  test("curriculum_order: one row per doc; bands consistent; score replays") {
    val rows = CorpusOps.curriculumOrder.fn(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length.toLong === nDocs)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.foreach { r =>
      val d = r.getAs[Double]("difficulty")
      val phase = r.getAs[Int]("phase")
      assert(d >= 0.0 && d <= 1.0 + 1e-9)
      assert(phase === (if (d < 0.4) 1 else if (d < 0.7) 2 else 3))
      assert(r.getString(5).matches("[0-9a-f]{8}"), "order_key not a hash prefix")
    }
    // all three phases should be populated on real data; at minimum the
    // plan must not collapse into a single band
    assert(rows.map(_.getAs[Int]("phase")).distinct.length >= 2,
      "curriculum collapsed to one phase")
  }
}
