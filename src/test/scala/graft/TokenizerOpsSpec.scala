package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.{SpanDedup, TokenizerOps}

/** Guards for the tokenizer-design and span-dedup analytics: each report
  * must reconcile with an independent Scala recomputation on the sf0.001
  * corpus (the specs are the oracle for invariants the DuckDB gate can't
  * see, e.g. the guarantee that the rank is contiguous or that the span
  * verdicts match a brute-force substring scan). */
class TokenizerOpsSpec extends AnyFunSuite {
  import TestSession._

  test("bpe_pair_stats: ranks contiguous, counts ranked, one lang brute-forced") {
    val rows = TokenizerOps.bpePairStats.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val byRk = rs.sortBy(_.getInt(1))
      assert(byRk.map(_.getInt(1)).toSeq === (1 to byRk.length),
        s"$lang ranks contiguous")
      assert(byRk.length <= 20, s"$lang capped at 20")
      // counts non-increasing; ties broken by pair string ascending
      byRk.sliding(2).foreach {
        case Array(a, b) =>
          val (ca, cb) = (a.getLong(3), b.getLong(3))
          assert(ca > cb || (ca == cb && a.getString(2) < b.getString(2)),
            s"$lang rank order at ${b.getInt(1)}")
        case _ => ()
      }
    }
    // brute-force recount for one (lang, pair) cell
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val lang = rows.head.getString(0)
    val expected = docs.filter(_._1 == lang).map { case (_, text) =>
      text.toLowerCase.split("[^a-z]+").filter(_.length >= 2)
        .map(w => w.sliding(2).count(_ == rows.head.getString(2))).sum
    }.sum
    assert(rows.head.getLong(3) === expected.toLong,
      s"$lang top pair '${rows.head.getString(2)}' brute-force count")
  }

  test("tok_fertility reconciles with a per-doc Scala recount") {
    val rows = TokenizerOps.tokFertility.fn(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "source", "text", "n_chars").collect()
    val tokenRe = "[a-z]+|[0-9]+|[^a-z0-9 ]".r
    val expected = docs.groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (k, rs) =>
        k -> (rs.length,
          rs.map(_.getString(2).split(" ", -1).length.toLong).sum,
          rs.map(r => tokenRe.findAllIn(r.getString(2)).length.toLong).sum,
          rs.map(_.getLong(3)).sum)
      }
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val (nd, nw, nt, nc) = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === nd.toLong, "n_docs")
      assert(r.getLong(3) === nw, "n_words")
      assert(r.getLong(4) === nt, "n_tokens")
      assert(r.getLong(5) === nc, "n_chars")
      assert(math.abs(r.getDouble(6) - nt.toDouble / nw) < 1e-3, "tokens_per_word")
    }
    // fertility is a ratio ≥ 1: the regex split never merges two words
    assert(rows.forall(_.getDouble(6) >= 1.0))
  }

  test("span_dedup matches a brute-force substring scan at sf0.001") {
    val rows = SpanDedup.spanDedup.fn(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val k = 40; val stride = 20
    val spans = docs.flatMap { case (id, lang, src, text) =>
      (0 to text.length - k by stride).map(i =>
        (id, lang, src, text.substring(i, i + k)))
    }
    val crossDup = spans.groupBy(_._4)
      .filter { case (_, ss) => ss.map(_._1).distinct.length > 1 }
      .keySet
    val perGroup = spans.groupBy(s => (s._2, s._3)).map { case (g, ss) =>
      val perDoc = ss.groupBy(_._1).values.toSeq.map { ds =>
        (ds.length, ds.count(s => crossDup(s._4)))
      }
      g -> (perDoc.size, perDoc.count(_._2 > 0),
        perDoc.map(_._1.toLong).sum, perDoc.map(_._2.toLong).sum)
    }
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      perGroup.get(key) match {
        case Some((scanned, withDup, nSpans, nDup)) =>
          assert(r.getLong(3) === scanned.toLong, s"$key docs_scanned")
          assert(r.getLong(4) === withDup.toLong, s"$key docs_with_dup")
          assert(r.getLong(5) === nSpans, s"$key n_spans")
          assert(r.getLong(6) === nDup, s"$key n_dup_spans")
        case None => // group below k chars everywhere: zeros expected
          assert(r.getLong(5) === 0L, s"$key spanless group")
      }
    }
    // the corpus genuinely carries cross-doc spans (positive control)
    assert(rows.map(_.getLong(6)).sum > 0, "some duplicated spans exist")
  }

  test("dedup_span_topk: top-20 facts match the brute-force span index") {
    val rows = SpanDedup.dedupSpanTopk.fn(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val k = 40; val stride = 20
    val occ = docs.flatMap { case (id, text) =>
      (0 to text.length - k by stride).map(i => (text.substring(i, i + k), id))
    }
    val facts = occ.groupBy(_._1).toSeq.map { case (span, os) =>
      (span, os.length.toLong, os.map(_._2).distinct.length.toLong, os.map(_._2).min)
    }.filter(_._3 >= 2)
    def md5hex16(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val want = facts.sortBy(f => (-f._3, -f._2, md5hex16(f._1))).take(20)
    assert(rows.length === math.min(20, facts.length))
    rows.zip(want).foreach { case (r, (span, nOcc, df, firstDoc)) =>
      assert(r.getString(1) === span, s"rank ${r.getInt(0)} span")
      assert(r.getLong(2) === df, s"rank ${r.getInt(0)} df")
      assert(r.getLong(3) === nOcc, s"rank ${r.getInt(0)} n_occ")
      assert(r.getLong(4) === firstDoc, s"rank ${r.getInt(0)} first_doc")
    }
    assert(rows.map(_.getInt(0)).toSeq === (1 to rows.length))
  }

  test("tok_wordpiece: segmentations reconstruct, greedy law replayed against an independent vocab") {
    val rows = SparkEntry.queries("tok_wordpiece")(spark, sfDir).collect()
    // one row per distinct word; frequencies total the token count
    val toks = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("w"))
      .filter("length(w) > 0")
      .collect().map(_.getString(0))
    assert(rows.length === toks.distinct.length)
    assert(rows.map(_.getAs[Long]("freq")).sum === toks.length.toLong)
    // independent vocab rebuild: top-64 substrings (len 2-4) by weighted count
    val freq = toks.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val cnt = collection.mutable.Map.empty[String, Long]
    freq.foreach { case (w, f) =>
      for (l <- 2 to 4; i <- 0 to w.length - l)
        cnt.updateWith(w.substring(i, i + l))(c => Some(c.getOrElse(0L) + f))
    }
    val voc = cnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(64).map(_._1).toSet
    rows.foreach { r =>
      val (w, pieces) = (r.getAs[String]("word"), r.getAs[String]("pieces").split('|'))
      // reconstruction law: pieces concatenate back to the word
      assert(pieces.mkString === w, s"$w reconstruction")
      assert(r.getAs[Long]("n_pieces") === pieces.length.toLong)
      assert(r.getAs[Long]("n_chars") === w.length.toLong)
      // greedy longest-match replay against the independent vocabulary
      var pos = 0; val out = collection.mutable.Buffer.empty[String]
      while (pos < w.length) {
        val l = (4 to 2 by -1).find(l => pos + l <= w.length
          && voc(w.substring(pos, pos + l))).getOrElse(1)
        out += w.substring(pos, pos + l); pos += l
      }
      assert(out.toSeq === pieces.toSeq, s"$w greedy walk")
    }
    // the vocabulary is actually used: some multi-char piece appears
    assert(rows.exists(_.getAs[String]("pieces").split('|').exists(_.length > 1)))
  }

  test("tok_unigram: full EM round replayed independently " +
    "(seed vocab, Viterbi optimality, M-step counts, loss monotonicity)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    type St = (java.math.BigDecimal, Int, String)
    val out = TokenizerOps.tokUnigram.fn(spark, sfDir).collect()
    assert(out.length === 32)

    // ---- corpus replay: distinct-word table -----------------------------
    val words = scala.collection.mutable.HashMap.empty[String, Long]
    Tables.documents(spark, sfDir).select("text").collect().foreach { r =>
      r.getString(0).toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        .foreach(w => words(w) = words.getOrElse(w, 0L) + 1L)
    }
    // ---- seed vocabulary --------------------------------------------------
    val chars = scala.collection.mutable.HashMap.empty[String, Long]
    val subs = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, c) <- words) {
      for (i <- 0 until w.length)
        chars(w.substring(i, i + 1)) = chars.getOrElse(w.substring(i, i + 1), 0L) + c
      for (l <- 2 to 4; i <- 0 to w.length - l)
        subs(w.substring(i, i + l)) = subs.getOrElse(w.substring(i, i + l), 0L) + c
    }
    val top64 = subs.toSeq.sortBy { case (p, c) => (-c, p) }.take(64)
    val voc = chars.toSeq ++ top64
    val tot = voc.map(_._2).sum
    // the one float op goes through Spark's own expression (the op's
    // round-once discipline; the DuckDB gate already cross-checks it) —
    // the replay independently verifies everything STRUCTURAL
    def sparkCosts(counts: Seq[(String, Long)], total: Long): Map[String, java.math.BigDecimal] =
      counts.toDF("piece", "cnt").withColumn("nt", lit(total))
        .withColumn("cost",
          expr("cast(round(-log2((1.0 * cnt) / nt), 6) as decimal(18,6))"))
        .collect().map(r => r.getString(0) -> r.getDecimal(3)).toMap
    val cost = sparkCosts(voc, tot)

    // ---- E-step: Viterbi with the (cost, n, seg) total order -------------
    def lt(a: St, b: St): Boolean = {
      val c = a._1.compareTo(b._1)
      if (c != 0) c < 0
      else if (a._2 != b._2) a._2 < b._2
      else a._3 < b._3
    }
    def segment(w: String): St = {
      val dp = new Array[St](w.length + 1)
      dp(0) = (java.math.BigDecimal.ZERO.setScale(6), 0, "")
      for (j <- 1 to w.length) {
        var best: St = null
        for (l <- 1 to math.min(4, j)) {
          val piece = w.substring(j - l, j)
          cost.get(piece).foreach { pc =>
            val cand = (dp(j - l)._1.add(pc), dp(j - l)._2 + 1,
              dp(j - l)._3 + " " + piece)
            if (best == null || lt(cand, best)) best = cand
          }
        }
        dp(j) = best
      }
      dp(w.length)
    }
    val segs = words.map { case (w, c) => (w, c, segment(w)) }.toSeq
    // every segmentation rebuilds its word exactly
    segs.foreach { case (w, _, st) =>
      assert(st._3.split(' ').filter(_.nonEmpty).mkString === w, w) }
    // DP optimality against brute-force enumeration on short words
    def allSegs(w: String): Seq[St] =
      if (w.isEmpty) Seq((java.math.BigDecimal.ZERO.setScale(6), 0, ""))
      else (1 to math.min(4, w.length)).flatMap { l =>
        val piece = w.substring(0, l)
        cost.get(piece).toSeq.flatMap { pc =>
          allSegs(w.substring(l)).map(t =>
            (pc.add(t._1), t._2 + 1, " " + piece + t._3))
        }
      }
    words.keys.filter(_.length <= 6).take(50).foreach { w =>
      val brute = allSegs(w).reduceLeft((a, b) => if (lt(b, a)) b else a)
      assert(segment(w) === brute, s"viterbi not optimal for '$w'")
    }

    // ---- M-step + losses --------------------------------------------------
    val emc = scala.collection.mutable.HashMap.empty[String, Long]
    segs.foreach { case (_, c, st) =>
      st._3.split(' ').filter(_.nonEmpty).foreach(p =>
        emc(p) = emc.getOrElse(p, 0L) + c) }
    val emTot = emc.values.sum
    val emCost = sparkCosts(emc.toSeq, emTot)
    val lossBefore = segs.map { case (_, c, st) =>
      st._1.movePointRight(6).longValueExact() * c }.sum
    val lossAfter = emc.map { case (p, c) =>
      emCost(p).movePointRight(6).longValueExact() * c }.sum
    assert(lossAfter <= lossBefore, "EM must not increase the loss")
    assert(out.forall(_.getAs[Long]("loss_before_micro") === lossBefore))
    assert(out.forall(_.getAs[Long]("loss_after_micro") === lossAfter))

    // ---- the published piece table row-for-row ---------------------------
    val vocCnt = voc.toMap
    val expected = emc.toSeq.sortBy { case (p, c) => (-c, p) }.take(32)
    out.zip(expected).foreach { case (r, (p, c)) =>
      assert(r.getAs[String]("piece") === p)
      assert(r.getAs[Long]("plen") === p.length.toLong)
      assert(r.getAs[Long]("seed_cnt") === vocCnt(p))
      assert(r.getAs[Long]("em_cnt") === c)
      assert(r.getAs[Double]("seed_cost_bits") ===
        cost(p).movePointRight(6).longValueExact().toDouble / 1000000)
      assert(r.getAs[Double]("em_cost_bits") ===
        emCost(p).movePointRight(6).longValueExact().toDouble / 1000000)
    }
  }

  test("tok_unigram_prune: contribution ranking, protected chars, " +
    "renormalized re-segmentation and loss accounting replayed independently") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    type St = (java.math.BigDecimal, Int, String)
    val out = TokenizerOps.tokUnigramPrune.fn(spark, sfDir).collect()
    assert(out.length === 32)

    // ---- replay the seed + EM half (the tok_unigram replica) -------------
    val words = scala.collection.mutable.HashMap.empty[String, Long]
    Tables.documents(spark, sfDir).select("text").collect().foreach { r =>
      r.getString(0).toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        .foreach(w => words(w) = words.getOrElse(w, 0L) + 1L)
    }
    val chars = scala.collection.mutable.HashMap.empty[String, Long]
    val subs = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, c) <- words) {
      for (i <- 0 until w.length)
        chars(w.substring(i, i + 1)) = chars.getOrElse(w.substring(i, i + 1), 0L) + c
      for (l <- 2 to 4; i <- 0 to w.length - l)
        subs(w.substring(i, i + l)) = subs.getOrElse(w.substring(i, i + l), 0L) + c
    }
    val top64 = subs.toSeq.sortBy { case (p, c) => (-c, p) }.take(64)
    val voc = chars.toSeq ++ top64
    def sparkCosts(counts: Seq[(String, Long)], total: Long): Map[String, java.math.BigDecimal] =
      counts.toDF("piece", "cnt").withColumn("nt", lit(total))
        .withColumn("cost",
          expr("cast(round(-log2((1.0 * cnt) / nt), 6) as decimal(18,6))"))
        .collect().map(r => r.getString(0) -> r.getDecimal(3)).toMap
    def lt(a: St, b: St): Boolean = {
      val c = a._1.compareTo(b._1)
      if (c != 0) c < 0
      else if (a._2 != b._2) a._2 < b._2
      else a._3 < b._3
    }
    def segmentUnder(cost: Map[String, java.math.BigDecimal])(w: String): St = {
      val dp = new Array[St](w.length + 1)
      dp(0) = (java.math.BigDecimal.ZERO.setScale(6), 0, "")
      for (j <- 1 to w.length) {
        var best: St = null
        for (l <- 1 to math.min(4, j)) {
          val piece = w.substring(j - l, j)
          cost.get(piece).foreach { pc =>
            val cand = (dp(j - l)._1.add(pc), dp(j - l)._2 + 1,
              dp(j - l)._3 + " " + piece)
            if (best == null || lt(cand, best)) best = cand
          }
        }
        dp(j) = best
      }
      dp(w.length)
    }
    val seedCost = sparkCosts(voc, voc.map(_._2).sum)
    val segs1 = words.map { case (w, c) => (w, c, segmentUnder(seedCost)(w)) }.toSeq
    val emc = scala.collection.mutable.HashMap.empty[String, Long]
    segs1.foreach { case (_, c, st) =>
      st._3.split(' ').filter(_.nonEmpty).foreach(p =>
        emc(p) = emc.getOrElse(p, 0L) + c) }
    val emCost = sparkCosts(emc.toSeq, emc.values.sum)

    // ---- the prune decision ----------------------------------------------
    val contrib = voc.map { case (p, cnt) =>
      val ec = emc.getOrElse(p, 0L)
      val micro = if (ec == 0L) 0L
        else ec * emCost(p).movePointRight(6).longValueExact()
      (p, cnt, ec, micro)
    }
    val multi = contrib.filter(_._1.length >= 2)
      .sortBy { case (p, _, _, micro) => (micro, p) }
    val nPruned = multi.length / 2
    val prunedSet = multi.take(nPruned).map(_._1).toSet
    val kept = contrib.filterNot(t => prunedSet(t._1))
    // every single character survives
    assert(kept.count(_._1.length == 1) === chars.size)
    assert(out.forall(_.getAs[Long]("n_seed_pieces") === voc.length.toLong))
    assert(out.forall(_.getAs[Long]("n_kept") === kept.length.toLong))
    assert(out.forall(_.getAs[Long]("n_pruned") === nPruned.toLong))

    // ---- re-cost over survivors, re-segment, recount ----------------------
    val keptCost = sparkCosts(kept.map(t => (t._1, t._2)),
      kept.map(_._2).sum)
    val segs2 = words.map { case (w, c) => (w, c, segmentUnder(keptCost)(w)) }.toSeq
    segs2.foreach { case (w, _, st) =>
      assert(st ne null, s"word '$w' unsegmentable after prune")
      val pieces = st._3.split(' ').filter(_.nonEmpty)
      assert(pieces.mkString === w)
      assert(pieces.forall(p => !prunedSet(p)), s"pruned piece used for '$w'")
    }
    val c2 = scala.collection.mutable.HashMap.empty[String, Long]
    segs2.foreach { case (_, c, st) =>
      st._3.split(' ').filter(_.nonEmpty).foreach(p =>
        c2(p) = c2.getOrElse(p, 0L) + c) }
    val lossSeed = segs1.map { case (_, c, st) =>
      st._1.movePointRight(6).longValueExact() * c }.sum
    val lossPruned = segs2.map { case (_, c, st) =>
      st._1.movePointRight(6).longValueExact() * c }.sum
    assert(out.forall(_.getAs[Long]("loss_seed_micro") === lossSeed))
    assert(out.forall(_.getAs[Long]("loss_pruned_micro") === lossPruned))

    // ---- the published piece table row-for-row ---------------------------
    val keptMeta = kept.map(t => t._1 -> t).toMap
    val expected = kept
      .map(t => (t._1, c2.getOrElse(t._1, 0L)))
      .sortBy { case (p, c) => (-c, p) }.take(32)
    out.zip(expected).foreach { case (r, (p, c)) =>
      assert(r.getAs[String]("piece") === p)
      assert(r.getAs[Long]("plen") === p.length.toLong)
      assert(r.getAs[Long]("seed_cnt") === keptMeta(p)._2)
      assert(r.getAs[Long]("em_cnt") === keptMeta(p)._3)
      assert(r.getAs[Long]("pruned_cnt") === c)
      assert(r.getAs[Double]("pruned_cost_bits") ===
        keptCost(p).movePointRight(6).longValueExact().toDouble / 1000000)
    }
  }
}
