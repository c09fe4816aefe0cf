package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Semantics guards for the multimodal gate/framing operators (the
  * binary-column ingest path itself is oracle-gated via check.py). */
class MultimodalSpec extends AnyFunSuite {
  import TestSession._

  private val sf = "/root/testdata/sf0.001"

  test("multimodal_quality_gate: totals conserve and flags reconcile") {
    val rows = Multimodal.multimodalQualityGate.fn(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("audio", "image", "video"))
    val corpus = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_objects")).sum === corpus)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_objects")
      val pass = r.getAs[Long]("n_pass")
      assert(pass <= n)
      assert(r.getAs[Double]("pass_rate") ===
        BigDecimal(1.0 * pass / n).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // a clip passing has no flag counted against it: flags can overlap,
      // so n - pass <= sum of flag counts
      val flags = Seq("n_undersize", "n_oversize", "n_aspect", "n_frames_over")
        .map(r.getAs[Long])
      assert(n - pass <= flags.sum)
    }
    // direct recomputation of the aspect flag across the corpus
    val directAspect = Tables.documents(spark, sf)
      .select((lit(64) + col("n_chars") % 512).as("w"),
        (lit(64) + col("doc_id") % 512).as("h"))
      .filter(col("w") > lit(4) * col("h") || col("h") > lit(4) * col("w"))
      .count()
    assert(rows.map(_.getAs[Long]("n_aspect")).sum === directAspect)
  }

  test("multimodal_audio_windows: framing identity holds per clip") {
    val rows = Multimodal.multimodalAudioWindows.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 3 === 1L, "audio = doc_id % 3 == 1")
      val n = r.getAs[Int]("n_samples")
      val w = r.getAs[Int]("n_windows")
      val tail = r.getAs[Int]("tail_samples")
      assert(r.getAs[Int]("duration_ms") === n * 1000 / 16000)
      if (w > 0) {
        // windows cover exactly the non-tail prefix: 400 + (w-1)*160 + tail = n
        assert(400 + (w - 1) * 160 + tail === n, s"doc ${r.getLong(0)}")
        assert(tail >= 0 && tail < 160)
      } else assert(tail === n && n < 400)
    }
    // one row per audio object — nothing dropped by the decode path
    val nAudio = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 1).count()
    assert(rows.length.toLong === nAudio)
  }

  test("multimodal_shards: greedy shard assignment replayed; conservation holds") {
    val rows = Multimodal.multimodalShards.fn(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val mt = Array("image", "audio", "video")
    // replay the start-offset sharding rule per (modality, source) lane
    val want = docs.groupBy(d => (mt((d._1 % 3).toInt), d._2)).toSeq.flatMap {
      case ((m, src), ds) =>
        var off = 0L
        ds.sortBy(_._1).map { d =>
          val shard = off / 4096
          off += d._3
          (m, src, shard, d._1, d._3)
        }
    }
    val wantShards = want.groupBy(x => (x._1, x._2, x._3)).map { case (k, xs) =>
      k -> (xs.length.toLong, xs.map(_._5).sum, xs.map(_._4).min, xs.map(_._4).max)
    }
    assert(rows.length === wantShards.size)
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1), r.getLong(2))
      val (n, bytes, first, last) = wantShards(k)
      assert(r.getLong(3) === n, s"$k n_items")
      assert(r.getLong(4) === bytes, s"$k bytes")
      assert(r.getLong(5) === first && r.getLong(6) === last, s"$k id range")
    }
    // conservation: every media object lands in exactly one shard
    assert(rows.map(_.getLong(3)).sum === docs.length.toLong)
    // a shard overshoots 4096 by at most its last item (never splits one)
    rows.groupBy(r => (r.getString(0), r.getString(1))).foreach { case (_, rs) =>
      val byShard = rs.sortBy(_.getLong(2))
      // shard ids are the distinct start-offset buckets, strictly increasing
      assert(byShard.map(_.getLong(2)).distinct.length === byShard.length)
      byShard.dropRight(1).foreach { r =>
        assert(r.getLong(4) >= 4096 - 557,
          "a closed shard is within one max-item of target")
      }
    }
  }

  test("multimodal_token_budget: covers the corpus; budget arithmetic replays; frames match the sampler") {
    val rows = Multimodal.multimodalTokenBudget.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val corpus = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === corpus)
    // media token total prices exactly what multimodal_frames emits:
    // Σ sampled frames × 64
    val sampledFrames = Multimodal.multimodalFrames.fn(spark, sf).count()
    assert(rows.map(_.getAs[Long]("media_tokens")).sum === sampledFrames * 64)
    val total = rows.map(r =>
      r.getAs[Long]("media_tokens") + r.getAs[Long]("caption_tokens")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("cell_tokens")
        === r.getAs[Long]("media_tokens") + r.getAs[Long]("caption_tokens"))
      val expShare = BigDecimal(r.getAs[Long]("cell_tokens").toDouble / total)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("budget_share") - expShare) < 1e-9)
      assert(r.getAs[Double]("media_text_ratio") > 0.0)
    }
    // shares partition the budget
    assert(math.abs(rows.map(_.getAs[Double]("budget_share")).sum - 1.0) < 0.01)
  }

  test("multimodal_interleave: shard-local streams are contiguous; spans and " +
    "straddle flags replay") {
    val rows = Multimodal.multimodalInterleave.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getString(1), r.getAs[Long]("shard"))).foreach {
      case ((mt, shard), g) =>
        var off = 0L
        g.sortBy(_.getLong(0)).foreach { r =>
          val media = r.getAs[Long]("media_tokens")
          val cap = r.getAs[Long]("caption_tokens")
          assert(r.getAs[Long]("start_off") === off, s"$mt/$shard doc ${r.getLong(0)}")
          assert(r.getAs[Long]("caption_off") === off + media)
          val last = off + media + cap - 1
          assert(r.getAs[Long]("seq_first") === off / 2048)
          assert(r.getAs[Long]("seq_last") === last / 2048)
          assert((r.getAs[Int]("straddles") == 1) === (off / 2048 != last / 2048))
          off = last + 1
        }
    }
    // media tokens are frame-quantized; captions never empty
    rows.foreach { r =>
      assert(r.getAs[Long]("media_tokens") % 64 === 0L)
      assert(r.getAs[Long]("caption_tokens") > 0)
    }
    // positive control: the packing genuinely crosses sequence boundaries
    assert(rows.exists(_.getAs[Int]("straddles") == 1))
  }
}
