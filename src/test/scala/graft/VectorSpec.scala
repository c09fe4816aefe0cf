package graft

import graft.vector.CosineSimilarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the native cosine expression (interpreted and codegen paths
  * agree, zero-norm → NULL, orthogonal/identical vectors). */
class VectorSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def cos(a: Seq[Float], b: Seq[Float]): Option[Double] = {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((a, b)).toDF("a", "b")
      .select(call_function("graft_cosine", col("a"), col("b")).as("c"))
    Option(df.head().get(0)).map(_.asInstanceOf[Double])
  }

  test("identical unit vectors → 1.0") {
    assert(cos(Seq(1f, 0f, 0f), Seq(1f, 0f, 0f)).get === 1.0)
  }

  test("orthogonal vectors → 0.0") {
    assert(cos(Seq(1f, 0f), Seq(0f, 1f)).get === 0.0)
  }

  test("opposite vectors → -1.0") {
    assert(cos(Seq(1f, 2f), Seq(-1f, -2f)).get === -1.0)
  }

  test("zero-norm input → NULL") {
    assert(cos(Seq(0f, 0f), Seq(1f, 2f)).isEmpty)
  }

  test("matches a reference computation on real embeddings") {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, TestSession.sfDir).limit(2)
      .collect().map(_.getSeq[Float](1))
    val expected = {
      val (x, y) = (e(0).map(_.toDouble), e(1).map(_.toDouble))
      val dot = x.zip(y).map { case (a, b) => a * b }.sum
      dot / math.sqrt(x.map(v => v * v).sum * y.map(v => v * v).sum)
    }
    val got = cos(e(0), e(1)).get
    assert(math.abs(got - expected) < 1e-12)
  }

  test("expression survives codegen (no fallback in the plan)") {
    GraftFunctions.ensureRegistered(spark)
    val df = Tables.embeddings(spark, TestSession.sfDir)
      .select(call_function("graft_cosine", col("embedding"), col("embedding")).as("c"))
    // all self-similarities are 1.0 (unit-norm data)
    val n = df.filter(abs(col("c") - 1.0) > 1e-6).count()
    assert(n === 0)
    // the "*(n)" prefix marks a WholeStageCodegen span containing the op
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project [graft_cosine"))
  }

  test("CosineSimilarity rejects non-float-array inputs at analysis") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val bad = CosineSimilarity(Literal(1), Literal(2))
    assert(bad.checkInputDataTypes().isFailure)
  }

  test("k-means IVF (k=64, nprobe=2) recall@3 dominates the sign-bit index per query") {
    // the parameterized trained quantizer must be worth its training cost:
    // recall at least matches the untrained 16-cell sign-bit index on
    // EVERY query, and strictly beats it in aggregate
    def recalls(q: graft.Q): Map[Long, Double] =
      q.fn(spark, TestSession.sfDir)
        .select(col("query_id").cast("long"), col("recall_at_3").cast("double"))
        .as[(Long, Double)].collect().toMap
    val signBit = recalls(graft.vector.Similarity.annRecall)
    val kmeans = recalls(graft.vector.Similarity.annRecallKmeans)
    assert(kmeans.keySet === signBit.keySet)
    signBit.foreach { case (q, r) =>
      assert(kmeans(q) >= r, s"query $q: kmeans ${kmeans(q)} < sign-bit $r")
    }
    assert(kmeans.values.sum > signBit.values.sum)
  }

  test("seeding knob: id recall holds ≥ 0.73 and maximin wins the k-means objective (sf0.01)") {
    // at sf0.01 — the correctness-gate SF, where the measured claims in
    // the Similarity scaladocs were made; sf0.001 has only ~50 vectors
    // for k = 64 so seeding comparisons degenerate there
    val sf = "/root/testdata/sf0.01"
    val meanRecall = graft.vector.Similarity.annRecallKmeans.fn(spark, sf)
      .agg(avg(col("recall_at_3"))).as[Double].collect().head
    assert(meanRecall >= 0.73, s"id-seeded mean recall@3 fell to $meanRecall")
    val conv = graft.vector.Similarity.annKmeansConvergence.fn(spark, sf)
      .select(col("seeding"), col("round").cast("int"), col("n_cells").cast("long"),
        col("total_shift").cast("double"), col("total_sse").cast("double"))
      .as[(String, Int, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(conv.size === 4)
    for (s <- Seq("id", "maximin")) {
      assert(conv((s, 1))._3 === 64L, s"$s lost cells in round 1")
      // Lloyd converges: round-2 movement is a small fraction of round 1
      assert(conv((s, 2))._4 < conv((s, 1))._4 / 10, s"$s did not converge")
      // each round improves the objective
      assert(conv((s, 2))._5 < conv((s, 1))._5, s"$s sse did not improve")
    }
    // the knob's point: farthest-point seeding reaches lower quantization
    // error than id-order seeding at every round
    for (r <- 1 to 2)
      assert(conv(("maximin", r))._5 < conv(("id", r))._5,
        s"maximin sse did not beat id at round $r")
  }

  test("ann_pq: 4 codes per vector from the label domain, codebook broadcast") {
    val df = graft.vector.Similarity.annPq.fn(spark, TestSession.sfDir)
    df.collect() // force execution so AQE finalizes the plan
    val labels = Tables.embeddings(spark, TestSession.sfDir)
      .select("label").distinct().as[Int].collect().toSet
    val bad = df.filter(size(split(col("codes"), ",")) =!= 4 || col("recon_err") < 0)
    assert(bad.count() === 0)
    val codes = df.select(explode(split(col("codes"), ",")).as("c"))
      .select(col("c").cast("int").as("c"))
      .distinct().as[Int].collect().toSet
    assert(codes.subsetOf(labels), s"codes $codes outside label domain $labels")
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastExchange"),
      "expected the PQ codebook on a BroadcastExchange")
  }

  test("ann_ivf_pq: cell-pruned ADC is dominated by the full-corpus ADC scan") {
    // the full scan (ann_pq_search, hash-verified vs DuckDB) is ground
    // truth for the same ADC metric: the pruned index can only lose
    // candidates, so per query its rank-r distance is >= the full scan's,
    // and any shared neighbor carries the identical adc_dist
    val full = graft.vector.Similarity.annPqSearch.fn(spark, TestSession.sfDir)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist"))).toMap
    val pruned = graft.vector.Similarity.annIvfPq.fn(spark, TestSession.sfDir)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist"),
        r.getAs[Int]("probe")))
    assert(pruned.nonEmpty)
    assert(pruned.forall(t => t._5 == 1 || t._5 == 2))
    pruned.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.length), s"query $q ranks")
    }
    val fullDist = full.map { case ((q, _), (n, dst)) => (q, n) -> dst }
    pruned.foreach { case (q, rank, n, dst, _) =>
      // shared neighbors score identically (same codebook, same math)
      fullDist.get((q, n)).foreach(fd => assert(fd === dst, s"($q,$n) adc drift"))
      // pruning can only push distances up at a given rank
      full.get((q, rank)).foreach { case (_, fd) =>
        assert(dst >= fd, s"query $q rank $rank: pruned $dst < full $fd")
      }
    }
    // the index is not vacuously the full scan: some query must have lost
    // its exact rank-list to pruning OR every list matches (tiny corpus);
    // either way at least one probe-2 hit shows the multiprobe is live
    assert(pruned.exists(_._5 == 2), "no probe-2 candidate — multiprobe vacuous")
  }

  test("emb_outliers: flagged set matches a local z-score replica") {
    val rows = Tables.embeddings(spark, TestSession.sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val byLabel = rows.groupBy(_._2)
    val expected = byLabel.toSeq.flatMap { case (_, vs) =>
      val dim = vs.head._3.length
      // decimal-exact per-dim mean (the centroid both engines derive)
      val cent = (0 until dim).map { i =>
        (vs.map(v => BigDecimal(v._3(i)).setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
          / vs.length).toDouble
      }.toArray
      val dists = vs.map { case (id, _, e) =>
        var acc = 0.0
        var i = 0
        while (i < dim) { val t = e(i) - cent(i); acc += t * t; i += 1 }
        (id, BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val n = dists.length
      val mean = dists.map(d => BigDecimal(d._2)).sum.toDouble / n
      val ex2 = dists.map(d => BigDecimal(d._2) * BigDecimal(d._2)).sum.toDouble / n
      val std = math.sqrt(ex2 - mean * mean)
      dists.map { case (id, dd) =>
        (id, BigDecimal((dd - mean) / std).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.filter(_._2 >= 2.0)
    }.sortBy(_._1)
    val got = graft.vector.Similarity.embOutliers.fn(spark, TestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.map(_._1).toSeq === expected.map(_._1))
    got.zip(expected).foreach { case ((_, g), (_, e)) =>
      assert(math.abs(g - e) <= 1e-3, s"z drift: $g vs $e")
    }
  }

  test("emb_pca_power: unit direction near a covariance fixed point, coherent shares") {
    val rows = graft.vector.Pca.embPcaPower.fn(spark, TestSession.sfDir).collect()
    assert(rows.length === 64)
    val sorted = rows.sortBy(_.getLong(0))
    val loading = sorted.map(_.getDouble(2))
    val lambda1 = sorted.head.getDouble(3)
    val share = sorted.head.getDouble(4)
    assert(sorted.forall(r => r.getDouble(3) == lambda1 && r.getDouble(4) == share))
    assert(math.abs(loading.map(x => x * x).sum - 1.0) < 1e-3, "direction not unit")
    assert(lambda1 > 0 && share > 0 && share <= 1.0)

    // independent covariance action on the RAW floats (no rounding, no
    // decimals): the returned direction must be near a fixed point of C,
    // and the reported eigenvalue/share must match C's action on it
    val emb = Tables.embeddings(spark, TestSession.sfDir).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = emb.length
    val d = loading.length
    val mu = Array.tabulate(d)(j => emb.map(_(j)).sum / n)
    val cent = emb.map(v => Array.tabulate(d)(j => v(j) - mu(j)))
    val y = Array.fill(d)(0.0)
    var sumS2 = 0.0
    cent.foreach { c =>
      var s = 0.0
      var j = 0
      while (j < d) { s += c(j) * loading(j); j += 1 }
      sumS2 += s * s
      j = 0
      while (j < d) { y(j) += c(j) * s; j += 1 }
    }
    val ny = math.sqrt(y.map(x => x * x).sum)
    val cos = (0 until d).map(j => y(j) / ny * loading(j)).sum
    assert(cos > 0.98, s"loading is not near an eigendirection: cos(v, Cv) = $cos")
    // lambda1 is the Rayleigh quotient of the published loading — the
    // raw-float replica must agree to ~rounding noise
    assert(math.abs(sumS2 / n - lambda1) / lambda1 < 0.01,
      s"lambda1 drift: replica ${sumS2 / n} vs reported $lambda1")
    val tot = cent.map(_.map(x => x * x).sum).sum
    assert(math.abs(sumS2 / tot - share) / share < 0.01,
      s"explained_share drift: replica ${sumS2 / tot} vs reported $share")
  }

  test("emb_pca2: orthogonal unit components, lambda2 is the deflated Rayleigh quotient") {
    val rows = graft.vector.Pca.embPca2.fn(spark, TestSession.sfDir).collect()
      .sortBy(_.getLong(0))
    assert(rows.length === 64)
    val l1 = rows.map(_.getDouble(1))
    val l2 = rows.map(_.getDouble(2))
    val (lam1, lam2) = (rows.head.getDouble(3), rows.head.getDouble(4))
    val aniso = rows.head.getDouble(5)
    val orthoErr = rows.head.getDouble(6)
    assert(math.abs(l1.map(x => x * x).sum - 1.0) < 1e-3)
    assert(math.abs(l2.map(x => x * x).sum - 1.0) < 1e-3)
    assert(math.abs(orthoErr) < 1e-3, s"components not orthogonal: $orthoErr")
    assert(lam1 >= lam2 * 0.999, s"power iteration inverted the spectrum: $lam1 < $lam2")
    assert(math.abs(aniso - lam1 / lam2) < 1e-3)
    // raw-float replica: deflate by the published v1, then lambda2 must be
    // the Rayleigh quotient of the published v2 on that deflated cloud
    val emb = Tables.embeddings(spark, TestSession.sfDir).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = emb.length
    val d = l1.length
    val mu = Array.tabulate(d)(j => emb.map(_(j)).sum / n)
    var sumS2 = 0.0
    emb.foreach { v =>
      val c = Array.tabulate(d)(j => v(j) - mu(j))
      val s1 = (0 until d).map(j => c(j) * l1(j)).sum
      val c2 = Array.tabulate(d)(j => c(j) - s1 * l1(j))
      val s2 = (0 until d).map(j => c2(j) * l2(j)).sum
      sumS2 += s2 * s2
    }
    assert(math.abs(sumS2 / n - lam2) / lam2 < 0.01,
      s"lambda2 drift: replica ${sumS2 / n} vs reported $lam2")
  }

  test("emb_drift: per-label shift/cos match a local replica of the hash split") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Tables.embeddings(spark, TestSession.sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def batch(id: Long): String =
      if (java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 2 == 0) "old"
      else "new"
    val expected = rows.groupBy(_._2).toSeq.map { case (label, vs) =>
      val dim = vs.head._3.length
      def centroid(b: String): (Array[Double], Int) = {
        val sel = vs.filter(v => batch(v._1) == b)
        (Array.tabulate(dim) { j =>
          BigDecimal((sel.map(v => BigDecimal(v._3(j))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum / sel.length).toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }, sel.length)
      }
      val (co, nOld) = centroid("old")
      val (cn, nNew) = centroid("new")
      val d2 = (0 until dim).map(j => (co(j) - cn(j)) * (co(j) - cn(j))).sum
      val dot = (0 until dim).map(j => co(j) * cn(j)).sum
      val cos = dot / (math.sqrt(co.map(x => x * x).sum) * math.sqrt(cn.map(x => x * x).sum))
      (label.toLong, nOld.toLong, nNew.toLong, math.sqrt(d2), cos)
    }.sortBy(_._1)
    val got = graft.vector.Similarity.embDrift.fn(spark, TestSession.sfDir)
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got.map(t => (t._1, t._2, t._3)) === expected.map(t => (t._1, t._2, t._3)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 1e-4, s"shift drift at label ${g._1}: ${g._4} vs ${e._4}")
      assert(math.abs(g._5 - e._5) < 1e-4, s"cos drift at label ${g._1}: ${g._5} vs ${e._5}")
    }
    // these label centroids sit near the origin, so half-sample cosine is
    // legitimately noisy — only bound it to the valid range; the shift
    // column must still be non-vacuous
    assert(got.forall(t => t._5 >= -1.0001 && t._5 <= 1.0001))
    assert(got.exists(_._4 > 0), "zero shift everywhere — vacuous")
    assert(got.forall(t => t._2 > 0 && t._3 > 0), "a split side is empty")
  }

  test("emb_dim_stats: one row per dimension with coherent moments") {
    val sf = "/root/testdata/sf0.001"
    val stats = graft.vector.Similarity.embDimStats.fn(spark, sf).collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    val dims = Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.size(col("embedding")).as("d"))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(dims === Seq(stats.length), "one output row per vector dimension")
    stats.foreach { r =>
      assert(r.getAs[Long]("n_vecs") === nVecs)
      val (mean, std) = (r.getAs[Double]("mean"), r.getAs[Double]("std"))
      val (mn, mx) = (r.getAs[Double]("vmin"), r.getAs[Double]("vmax"))
      assert(mn <= mean && mean <= mx, s"mean outside [min,max] at dim ${r.get(0)}")
      assert(std >= 0 && std <= (mx - mn), s"std out of range at dim ${r.get(0)}")
    }
  }

  test("ann_knn_graph: duplicate-collapsed graph equals the naive all-candidate ranking") {
    // the oracle SFs carry no duplicate vectors, so the collapse's group
    // machinery (twin edges, the 4-smallest-ids pool bound, id tie-breaks
    // across equal cosines) must be pinned on a corpus that HAS them: the
    // sf0.001 vectors replicated 3x, with a 5-deep cluster on a subset —
    // m > 4 exercises the pool truncation
    GraftFunctions.ensureRegistered(spark)
    val src = Tables.embeddings(spark, TestSession.sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-knn-dup-").toString
    src
      .unionByName(src.withColumn("vec_id", col("vec_id") + 10000L))
      .unionByName(src.withColumn("vec_id", col("vec_id") + 20000L))
      .unionByName(src.filter(col("vec_id") < 50)
        .withColumn("vec_id", col("vec_id") + 30000L))
      .unionByName(src.filter(col("vec_id") < 50)
        .withColumn("vec_id", col("vec_id") + 40000L))
      .write.parquet(s"$tmp/embeddings.parquet")
    val got = graft.vector.Similarity.annKnnGraph.fn(spark, tmp).collect().toSeq
      .map(_.toString)
    // naive formulation — the oracle's doc-level shape, verbatim
    val e = Tables.embeddings(spark, tmp)
    val bands = graft.vector.Similarity.signBands(e)
    val cand = bands.select(col("vec_id").as("src"), col("band"), col("bucket"))
      .join(bands.select(col("vec_id").as("dst"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("cos_sim").desc, col("dst"))
    val knn = cand
      .join(e.select(col("vec_id").as("src"), col("embedding").as("se")), Seq("src"))
      .join(e.select(col("vec_id").as("dst"), col("embedding").as("de")), Seq("dst"))
      .select(col("src"), col("dst"),
        round(call_function("graft_cosine", col("se"), col("de")), 4).as("cos_sim"))
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= 3)
      .select("src", "dst", "cos_sim")
      .cache()
    val mutual = knn
      .join(knn.select(col("src").as("r_src"), col("dst").as("r_dst")),
        col("r_src") === col("dst") && col("r_dst") === col("src"), "left")
      .select(col("src"), col("cos_sim"),
        when(col("r_src").isNotNull, 1).otherwise(0).as("mutual"))
    val deg = mutual.groupBy("src")
      .agg(count(lit(1)).as("degree"),
        sum("mutual").cast("long").as("n_mut"),
        sum(col("cos_sim").cast("decimal(18,4)")).as("sum_cos"))
    val dd = deg.groupBy(col("degree").cast("int").as("degree"))
      .agg(count(lit(1)).as("n_vectors"),
        sum("degree").cast("long").as("n_edges"),
        sum("n_mut").cast("long").as("n_mutual"),
        round(sum("sum_cos").cast("double") / sum("degree"), 4).as("avg_cos"))
    val nDeg = deg.agg(count(lit(1)).as("n_with_edges"))
    val d0 = e.agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(nDeg))
      .select(lit(0).cast("int").as("degree"),
        (col("n") - col("n_with_edges")).as("n_vectors"),
        lit(0L).as("n_edges"), lit(0L).as("n_mutual"),
        lit(null).cast("double").as("avg_cos"))
      .filter(col("n_vectors") > 0)
    val want = d0.unionByName(dd).orderBy("degree").collect().toSeq.map(_.toString)
    assert(got === want)
    // non-vacuous: twin edges force full degree somewhere
    assert(got.nonEmpty)
  }

  test("ann_knn_graph: degree profile conserves vectors; mutuality symmetric") {
    val rows = graft.vector.Similarity.annKnnGraph.fn(spark, TestSession.sfDir)
      .collect()
    assert(rows.nonEmpty)
    val corpus = Tables.embeddings(spark, TestSession.sfDir).count()
    // one row per realized degree (0..3), every vector in exactly one
    assert(rows.map(_.getAs[Int]("degree")).toSeq ===
      rows.map(_.getAs[Int]("degree")).sorted.toSeq)
    assert(rows.map(_.getAs[Int]("degree")).forall(d => d >= 0 && d <= 3))
    assert(rows.map(_.getAs[Long]("n_vectors")).sum === corpus)
    rows.foreach { r =>
      val d = r.getAs[Int]("degree")
      val nv = r.getAs[Long]("n_vectors")
      assert(r.getAs[Long]("n_edges") === d.toLong * nv)
      assert(r.getAs[Long]("n_mutual") <= r.getAs[Long]("n_edges"))
      if (d == 0) assert(r.isNullAt(4) || r.getAs[Long]("n_mutual") == 0L)
      else assert(r.getAs[Double]("avg_cos") <= 1.0)
    }
    // a mutual edge is counted once from each end: the GLOBAL count is even
    assert(rows.map(_.getAs[Long]("n_mutual")).sum % 2 === 0)
    // the graph is non-degenerate on this corpus: someone has full degree
    assert(rows.exists(r => r.getAs[Int]("degree") === 3 &&
      r.getAs[Long]("n_vectors") > 0))
  }

  test("emb_hubness reconciles with ann_knn_graph: edge mass, vector count, cum_share") {
    val hub = graft.vector.Similarity.embHubness.fn(spark, TestSession.sfDir)
      .collect()
    val deg = graft.vector.Similarity.annKnnGraph.fn(spark, TestSession.sfDir)
      .collect()
    val corpus = Tables.embeddings(spark, TestSession.sfDir).count()
    // every vector lands in exactly one in-degree bucket
    assert(hub.map(_.getAs[Long]("n_vectors")).sum === corpus)
    // total in-edge mass == total out-edge mass (same ≤3n edge list)
    assert(hub.map(_.getAs[Long]("n_in_edges")).sum ===
      deg.map(_.getAs[Long]("n_edges")).sum)
    // buckets ascend, clamp at 10, and cum_share reaches exactly 1.0
    val buckets = hub.map(_.getAs[Int]("indeg_bucket")).toSeq
    assert(buckets === buckets.sorted && buckets.forall(b => b >= 0 && b <= 10))
    assert(hub.last.getAs[Double]("cum_share") === 1.0)
    hub.foreach { r =>
      val b = r.getAs[Int]("indeg_bucket")
      val nv = r.getAs[Long]("n_vectors")
      val ne = r.getAs[Long]("n_in_edges")
      // bucket b < 10 holds exactly b in-edges per vector; 10+ at least 10
      if (b < 10) assert(ne === b.toLong * nv, s"bucket $b")
      else assert(ne >= 10L * nv)
    }
  }

  test("emb_whiten reconciles with emb_dim_stats and its own z bounds") {
    val wh = graft.vector.Similarity.embWhiten.fn(spark, TestSession.sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val ds = graft.vector.Similarity.embDimStats.fn(spark, TestSession.sfDir)
      .collect()
    assert(wh.size === ds.length)
    ds.foreach { r =>
      val dim = r.getLong(0)
      val w = wh(dim)
      // same moment pass: mean/std agree exactly with the dim-stats op
      assert(w.getAs[Double]("mean") === r.getAs[Double]("mean"), s"dim $dim mean")
      assert(w.getAs[Double]("std") === r.getAs[Double]("std"), s"dim $dim std")
      val (mean, std) = (w.getAs[Double]("mean"), w.getAs[Double]("std"))
      val (vmin, vmax) = (r.getAs[Double]("vmin"), r.getAs[Double]("vmax"))
      // whitened extremes are the whitened raw extremes (std > 0 here);
      // both sides were rounded independently (mean/std to 6, z to 4)
      assert(math.abs(w.getAs[Double]("min_z") - (vmin - mean) / std) < 1e-2,
        s"dim $dim min_z")
      assert(math.abs(w.getAs[Double]("max_z") - (vmax - mean) / std) < 1e-2,
        s"dim $dim max_z")
      assert(w.getAs[Long]("n_clipped") >= 0 &&
        w.getAs[Long]("n_clipped") < w.getAs[Long]("n_vecs"))
    }
  }

  test("lsh_bucket_stats matches a Scala recount of the sign-LSH banding") {
    val rows = graft.vector.Similarity.lshBucketStats.fn(spark, TestSession.sfDir)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2))
    val vecs = Tables.embeddings(spark, TestSession.sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val n = vecs.length
    val b = (4 to 15).find(bb => n <= 32L * (1L << bb)).getOrElse(16)
    rows.foreach { r =>
      val band = r.getInt(0)
      val buckets = vecs.map { case (_, e) =>
        (1 to b).map(i => if (e((band - 1) * b + i - 1) > 0f) 1L << (b - i) else 0L).sum
      }
      val sizes = buckets.groupBy(identity).values.map(_.length.toLong).toSeq
      assert(r.getAs[Long]("n_vecs") === n.toLong, s"band $band n_vecs")
      assert(r.getAs[Long]("n_buckets") === sizes.length.toLong, s"band $band buckets")
      assert(r.getAs[Long]("max_sz") === sizes.max, s"band $band max")
      assert(r.getAs[Long]("cand_pairs") === sizes.map(s => s * (s - 1) / 2).sum,
        s"band $band pairs")
      assert(math.abs(r.getAs[Double]("mean_sz") - n.toDouble / sizes.length) < 1e-3)
    }
  }

  test("ann_hamming: hamming replays from raw sign bits; audit column " +
    "reconciles with ann_topk's exact top-5") {
    val sf = "/root/testdata/sf0.001"
    val served = graft.vector.Similarity.annHamming.fn(spark, sf).collect()
    assert(served.length === 50) // 10 queries × top-5
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def sig(v: Array[Float]): Array[Boolean] = v.map(_ > 0f)
    served.foreach { r =>
      val q = sig(vecs(r.getLong(0))); val c = sig(vecs(r.getLong(1)))
      val ham = q.zip(c).count { case (a, b) => a != b }
      assert(r.getAs[Int]("hamming") === ham,
        s"q=${r.getLong(0)} n=${r.getLong(1)}")
    }
    val exactTop = graft.vector.Similarity.annTopk.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    served.foreach { r =>
      assert((r.getAs[Int]("in_exact_top5") == 1)
        === exactTop((r.getLong(0), r.getLong(1))))
    }
    // honest-quality control: the 1-bit tier finds SOME true neighbors
    // but is not magically exact on near-orthogonal vectors
    val overlap = served.map(_.getAs[Int]("in_exact_top5")).sum
    assert(overlap > 0 && overlap < 50)
  }

  test("ann_nprobe_curve: recall and scan share monotone in nprobe; " +
    "nprobe=2 leg reconciles with the live multiprobe serve path") {
    val sf = "/root/testdata/sf0.001"
    val curve = graft.vector.Similarity.annNprobeCurve.fn(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(curve.map(_.getInt(0)).toSeq === Seq(1, 2, 4))
    curve.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("mean_recall_at_3") <= b.getAs[Double]("mean_recall_at_3"))
      assert(a.getAs[Double]("mean_cand_share") < b.getAs[Double]("mean_cand_share"))
    }
    curve.foreach { r =>
      assert(r.getAs[Long]("n_hits") <= 3 * r.getAs[Long]("n_queries"))
      val sh = r.getAs[Double]("mean_cand_share")
      assert(sh > 0 && sh <= 1)
    }
    // cross-op consistency: the curve's nprobe=2 hit count must equal the
    // overlap of ann_ivf_multiprobe's served top-3 with the exact top-3
    val mp = graft.vector.Similarity.annIvfMultiprobe.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf3 = graft.vector.Similarity.annTopk.fn(spark, sf).collect()
      .filter(_.getAs[Int]("rank") <= 3)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val np2 = curve.find(_.getInt(0) == 2).get.getAs[Long]("n_hits")
    assert(np2 === (mp & bf3).size.toLong)
  }

  test("emb_cluster_purity: members conserved, purity well-formed and above label prior") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.vector.Similarity.embClusterPurity.fn(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 64)
    val embDf = spark.read.parquet(s"$sf/embeddings.parquet")
    val n = embDf.count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === n, "every vector in exactly one cell")
    rows.foreach { r =>
      val topN = r.getAs[Long]("top_n"); val nv = r.getAs[Long]("n_vecs")
      assert(topN >= 1 && topN <= nv)
      val p = r.getAs[Double]("purity")
      assert(p > 0 && p <= 1)
      assert(math.abs(p - topN.toDouble / nv) < 1e-3)
    }
    // positive control: clustering beats the majority-label prior — the
    // cells carry real label signal, not a relabeled random partition
    val prior = embDf.groupBy("label").count().collect().map(_.getLong(1)).max.toDouble / n
    val weighted = rows.map(_.getAs[Long]("top_n")).sum.toDouble / n
    assert(weighted > prior + 0.05, s"weighted purity $weighted vs prior $prior")
  }

  test("ann_pq_distortion: totals reconcile with ann_pq's per-vector recon errors") {
    val sf = "/root/testdata/sf0.001"
    val dist = graft.vector.Similarity.annPqDistortion.fn(spark, sf).collect()
    assert(dist.map(_.getInt(0)).sorted.toSeq === Seq(1, 2, 3, 4))
    val pq = graft.vector.Similarity.annPq.fn(spark, sf).collect()
    val totalRecon = pq.map(_.getAs[Double]("recon_err")).sum
    val totalFromSubspaces = dist
      .map(r => r.getAs[Double]("mean_err") * r.getAs[Long]("n_vecs")).sum
    assert(math.abs(totalRecon - totalFromSubspaces) < 0.01 * totalRecon)
    dist.foreach { r =>
      val share = r.getAs[Double]("distortion_share")
      assert(share > 0 && share < 1, s"m=${r.getInt(0)} share $share")
      // share is exactly quantization SSE over centered SSE
      val exp = r.getAs[Double]("mean_err") * r.getAs[Long]("n_vecs") /
        r.getAs[Double]("subspace_sse")
      assert(math.abs(share - exp) < 0.01)
      // honest reading pinned: a 10-word codebook on near-random vectors
      // leaves most subspace variance unexplained
      assert(share > 0.5)
    }
  }

  test("emb_triplet_audit: legs replay from raw distances; the order-statistics " +
    "verdict is pinned") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.vector.Similarity.embTripletAudit.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getSeq[Float](1).map(_.toDouble).toArray))
    def l2(a: Array[Double], b: Array[Double]) =
      BigDecimal(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val anchors = vecs.filter(_._1 < 30)
    val exp = anchors.map { case (aid, al, ae) =>
      val ds = vecs.filter(_._1 != aid)
        .map { case (_, l, v) => (l == al, l2(ae, v)) }
      (al, ds.filter(_._1).map(_._2).min, ds.filterNot(_._1).map(_._2).min)
    }
    val byLabel = exp.groupBy(_._1)
    rows.foreach { r =>
      val g = byLabel(r.getInt(0))
      assert(r.getAs[Long]("n_anchors") === g.length.toLong)
      val expViol = g.count { case (_, p, n) => p > n }
      assert(r.getAs[Long]("violations") === expViol.toLong, s"label ${r.getInt(0)}")
      val expMargin = g.map { case (_, p, n) => BigDecimal(n - p)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) }.sum / g.length
      assert(math.abs(r.getAs[Double]("mean_margin") - expMargin.toDouble) < 1e-4)
    }
    // pinned honest verdict: with 10 labels the impostor min wins almost
    // always (9× more draws) even though centroids separate — local kNN
    // labels are unreliable here, which is WHY emb_label_vote is at chance
    val totalViol = rows.map(_.getAs[Long]("violations")).sum.toDouble
    val totalAnchors = rows.map(_.getAs[Long]("n_anchors")).sum.toDouble
    assert(totalViol / totalAnchors > 0.8)
  }

  test("ann_ivf_balance: cells cover the corpus; ranks and imbalance are consistent") {
    val sf = "/root/testdata/sf0.001"
    val rows = vector.Similarity.all.find(_.name == "ann_ivf_balance").get
      .fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val corpus = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === corpus,
      "every vector lands in exactly one cell")
    val nCells = rows.head.getAs[Long]("n_cells")
    assert(rows.length.toLong === nCells)
    // scan_rank is a permutation ordered by size desc; cum_share ends at 1
    val byRank = rows.sortBy(_.getAs[Long]("scan_rank"))
    assert(byRank.map(_.getAs[Long]("scan_rank")).toSeq === (1L to nCells).toSeq)
    assert(byRank.sliding(2).forall {
      case Array(a, b) => a.getAs[Long]("n_vecs") >= b.getAs[Long]("n_vecs")
      case _ => true
    })
    assert(math.abs(byRank.last.getAs[Double]("cum_share") - 1.0) < 1e-9)
    // imbalance = max/mean, identical on every row, and ≥ 1 by definition
    val imb = rows.map(_.getAs[Double]("imbalance")).distinct
    assert(imb.length === 1 && imb.head >= 1.0)
    val maxN = rows.map(_.getAs[Long]("n_vecs")).max.toDouble
    assert(math.abs(imb.head - maxN * nCells / corpus) < 1e-3)
  }

  test("graft_cosine double overload agrees with the float path on float-exact input") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((Seq(1.5f, -2.0f, 0.25f), Seq(0.5f, 1.0f, -4.0f))).toDF("a", "b")
      .select(
        call_function("graft_cosine", col("a"), col("b")).as("f"),
        call_function("graft_cosine",
          expr("transform(a, x -> cast(x as double))"),
          expr("transform(b, x -> cast(x as double))")).as("d"))
    val r = df.head()
    assert(r.getDouble(0) === r.getDouble(1))
  }

  test("emb_label_sim: symmetric matrix, valid ranks, one nearest per class") {
    val sf = "/root/testdata/sf0.001"
    val rows = vector.Similarity.all.find(_.name == "emb_label_sim").get
      .fn(spark, sf).collect()
    val labels = rows.map(_.getInt(0)).distinct
    assert(rows.length === labels.length * (labels.length - 1))
    val m = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Double]("cos_sim")).toMap
    m.foreach { case ((a, b), c) => assert(m((b, a)) === c, s"symmetry $a,$b") }
    rows.groupBy(_.getInt(0)).foreach { case (a, grp) =>
      val byRank = grp.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq === (1L to grp.length).toSeq)
      // ranks order by cosine descending
      assert(byRank.sliding(2).forall {
        case Array(x, y) => x.getAs[Double]("cos_sim") >= y.getAs[Double]("cos_sim")
        case _ => true
      })
      assert(grp.count(_.getAs[Int]("is_nearest") == 1) === 1, s"label $a")
    }
    rows.foreach(r => assert(math.abs(r.getAs[Double]("cos_sim")) <= 1.0))
  }

  test("ann_ndcg: bounded, consistent with ann_recall, perfect order -> 1.0") {
    val sf = "/root/testdata/sf0.001"
    val ndcg = graft.vector.Similarity.annNdcg.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getAs[Double]("dcg"), r.getAs[Double]("ndcg_at_3")))
      .toMap
    val recall = graft.vector.Similarity.annRecall.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("recall_at_3")).toMap
    assert(ndcg.keySet === recall.keySet)
    ndcg.foreach { case (q, (dcg, n)) =>
      assert(n >= 0.0 && n <= 1.0, s"query $q ndcg $n out of range")
      // dcg/IDCG identity with the published 3-decimal discounts
      assert(math.abs(n - dcg / 4.762) < 5e-4, s"query $q dcg $dcg vs ndcg $n")
      // position-awareness never EXCEEDS set-recall's ceiling: missing a
      // true neighbor caps ndcg strictly below perfect
      if (recall(q) < 1.0) assert(n < 1.0, s"query $q recall ${recall(q)} but ndcg 1")
    }
    // the two audits must agree on which queries the index served perfectly
    // ordered: ndcg 1 requires recall 1
    ndcg.filter(_._2._2 >= 0.9999).keys.foreach { q =>
      assert(recall(q) === 1.0, s"query $q ndcg 1 but recall ${recall(q)}")
    }
  }
  test("dedup_semantic: conservation, and tripling every vector leaves kept counts invariant") {
    val sf = "/root/testdata/sf0.001"
    val base = SparkEntry.queries("dedup_semantic")(spark, sf).collect()
    val nVecs = graft.Tables.embeddings(spark, sf).count()
    assert(base.map(_.getAs[Long]("n_vecs")).sum === nVecs)
    base.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_pruned") === r.getAs[Long]("n_vecs"))
      assert(r.getAs[Long]("n_groups") <= r.getAs[Long]("n_vecs"))
    }
    // the threshold is interior at sf0.001: something prunes, something survives
    assert(base.map(_.getAs[Long]("n_pruned")).sum > 0)
    assert(base.map(_.getAs[Long]("n_kept")).sum > 0)
    // Twin algebra: replicate every vector 3x (fresh ids). Seeds (the 64
    // smallest ids) and the multiplicity-weighted centroid means are
    // unchanged, so cells and centroid cosines are identical - every twin
    // must be pruned by its own representative and per-cell KEPT counts
    // must match the original exactly: kept(3x) = kept(1x),
    // pruned(3x) = 3*n(1x) - kept(1x).
    val tmp = java.nio.file.Files.createTempDirectory("graft-semdedup-3x-").toString
    val e = graft.Tables.embeddings(spark, sf).select("vec_id", "embedding", "label")
    val off = 100000L
    e.union(e.withColumn("vec_id", col("vec_id") + off))
      .union(e.withColumn("vec_id", col("vec_id") + 2 * off))
      .write.parquet(s"$tmp/embeddings.parquet")
    val tripled = SparkEntry.queries("dedup_semantic")(spark, tmp).collect()
    val keptBase = base.map(r => r.getAs[Long]("cell") -> r.getAs[Long]("n_kept")).toMap
    val nBase = base.map(r => r.getAs[Long]("cell") -> r.getAs[Long]("n_vecs")).toMap
    assert(tripled.length === base.length)
    tripled.foreach { r =>
      val cell = r.getAs[Long]("cell")
      assert(r.getAs[Long]("n_vecs") === 3 * nBase(cell), s"cell $cell")
      assert(r.getAs[Long]("n_kept") === keptBase(cell), s"cell $cell")
      assert(r.getAs[Long]("n_groups") <= nBase(cell), s"cell $cell")
    }
  }

  test("ann_graph_search: regret law, exact ground truth, beam mostly converges") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("ann_graph_search")(spark, sf).collect()
    // every query (vec_id < 10) reports exactly once
    assert(rows.map(_.getAs[Long]("query_id")).sorted === (0L until 10L).toArray)
    // brute-force ground truth recomputed independently over the same
    // deduplicated index (min-id representative per distinct embedding)
    val e = graft.Tables.embeddings(spark, sf)
    GraftFunctions.ensureRegistered(spark)
    val reps = e.filter(col("vec_id") >= 10)
      .groupBy("embedding").agg(min("vec_id").as("vec_id"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val bf = reps.crossJoin(q)
      .select(col("qid"), col("vec_id"),
        round(call_function("graft_cosine", col("qe"), col("embedding")), 4).as("c"))
      .collect().groupBy(_.getAs[Long]("qid"))
      .map { case (qid, rs) =>
        qid -> rs.minBy(r => (-r.getAs[Double]("c"), r.getAs[Long]("vec_id")))
      }
    rows.foreach { r =>
      val qid = r.getAs[Long]("query_id")
      val want = bf(qid)
      assert(r.getAs[Long]("bf_id") === want.getAs[Long]("vec_id"), s"q$qid bf id")
      assert(r.getAs[Double]("bf_cos") === want.getAs[Double]("c"), s"q$qid bf cos")
      // the beam can never beat brute force; regret is the rounded gap
      val (fc, bc) = (r.getAs[Double]("found_cos"), r.getAs[Double]("bf_cos"))
      assert(fc <= bc + 1e-9, s"q$qid found beats brute force")
      assert(r.getAs[Double]("regret") ===
        BigDecimal(bc - fc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert((r.getAs[Long]("converged") == 1L) === (fc >= bc))
      // found ids come from the index side, never from the query slice
      assert(r.getAs[Long]("found_id") >= 10)
    }
    // the multi-entry beam actually navigates: most queries converge to
    // the true top-1 (7/10 at sf0.001) and no regret exceeds 0.06
    assert(rows.count(_.getAs[Long]("converged") == 1L) >= 5)
    assert(rows.map(_.getAs[Double]("regret")).max <= 0.06)
  }

  test("ann_pq_dim_alloc: dims partition, variance mass conserved, balancing never hurts") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("ann_pq_dim_alloc")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("m")).sorted === Array(1L, 2L, 3L, 4L))
    // both layouts hand each subquantizer exactly 16 of the 64 dims
    assert(rows.map(_.getAs[Long]("n_dims")).toSet === Set(16L))
    // total variance mass is layout-invariant (it is a permutation)
    val totNat = rows.map(_.getAs[Double]("var_nat")).sum
    val totBal = rows.map(_.getAs[Double]("var_bal")).sum
    assert(math.abs(totNat - totBal) < 1e-4, s"$totNat vs $totBal")
    assert(math.abs(rows.map(_.getAs[Double]("share_nat")).sum - 1.0) < 5e-4)
    assert(math.abs(rows.map(_.getAs[Double]("share_bal")).sum - 1.0) < 5e-4)
    // serpentine-LPT on variance-ranked dims never balances WORSE than
    // whatever the encoder's contiguous layout happened to be
    val (imbN, imbB) = (rows.head.getAs[Double]("imb_nat"),
      rows.head.getAs[Double]("imb_bal"))
    assert(imbB <= imbN + 1e-9, s"balanced $imbB vs natural $imbN")
    assert(imbN >= 1.0 && imbB >= 1.0)
    // the published ratios replay from the published subspace sums
    val replayed = rows.map(_.getAs[Double]("var_nat")).max /
      rows.map(_.getAs[Double]("var_nat")).min
    assert(math.abs(imbN - replayed) < 1e-4, s"imb_nat $imbN vs $replayed")
  }

  test("emb_rvq: vector mass conserved, residual stage strictly helps, reduction replays") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("emb_rvq")(spark, sf).collect()
    // every vector lands in exactly one level-1 cell
    assert(rows.map(_.getAs[Long]("n_vecs")).sum ===
      graft.Tables.embeddings(spark, sf).count())
    // cells are the label codebook: ids match the label space
    val labels = graft.Tables.embeddings(spark, sf)
      .select("label").distinct().count()
    assert(rows.length === labels)
    rows.foreach { r =>
      val (s1, s2) = (r.getAs[Double]("sse1"), r.getAs[Double]("sse2"))
      // a second additive stage can only remove error (argmin over a
      // codebook that k-means fit to these very residuals)
      assert(s2 < s1, s"cell ${r.getLong(0)}: residual stage did not help")
      assert(s1 > 0 && s2 > 0)
      val replayed = BigDecimal(1.0 - s2 / s1)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("reduction") - replayed) < 2e-4,
        s"cell ${r.getLong(0)} reduction")
    }
  }

  test("emb_mmd_sources: pair matrix shape, cos bounds, and a local replay of one pair") {
    val rows = graft.vector.Similarity.embMmdSources.fn(spark, TestSession.sfDir)
      .collect()
    val srcs = Tables.documents(spark, TestSession.sfDir)
      .join(Tables.embeddings(spark, TestSession.sfDir),
        col("doc_id") === col("vec_id"))
      .groupBy("source").count().filter(col("count") >= 2)
      .collect().map(_.getString(0)).sorted
    // all unordered pairs of eligible sources, each exactly once, a < b
    assert(rows.length === srcs.length * (srcs.length - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      val c = r.getAs[Double]("centroid_cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_a") >= 2 && r.getAs[Long]("n_b") >= 2)
    }
    // local unbiased-MMD replay of the first pair from raw embeddings
    val h = rows.head
    val (sa, sb) = (h.getAs[String]("src_a"), h.getAs[String]("src_b"))
    def vecs(src: String): Array[Array[Double]] =
      Tables.documents(spark, TestSession.sfDir).filter(col("source") === src)
        .join(Tables.embeddings(spark, TestSession.sfDir),
          col("doc_id") === col("vec_id"))
        .select("embedding").collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val (va, vb) = (vecs(sa), vecs(sb))
    def dot(x: Array[Double], y: Array[Double]): Double =
      x.indices.map(i => x(i) * y(i)).sum
    val (na, nb) = (va.length.toDouble, vb.length.toDouble)
    val saa = (for { i <- va.indices; j <- va.indices if i != j }
      yield dot(va(i), va(j))).sum / (na * (na - 1))
    val sbb = (for { i <- vb.indices; j <- vb.indices if i != j }
      yield dot(vb(i), vb(j))).sum / (nb * (nb - 1))
    val sab = (for { i <- va.indices; j <- vb.indices }
      yield dot(va(i), vb(j))).sum / (na * nb)
    assert(math.abs(h.getAs[Double]("mmd2") - (saa + sbb - 2 * sab)) < 1e-3,
      s"pair ($sa,$sb)")
  }

  test("emb_cluster_sample: quotas, totals, and the deterministic prefix checksum") {
    val rows = graft.vector.Similarity.embClusterSample.fn(spark, TestSession.sfDir)
      .collect()
    val n = Tables.embeddings(spark, TestSession.sfDir).count()
    val k = rows.length.toLong
    val quota = (n + k - 1) / k
    assert(rows.map(_.getAs[Long]("n_raw")).sum === n)
    rows.foreach { r =>
      assert(r.getAs[Long]("quota") === quota)
      val (raw, kept) = (r.getAs[Long]("n_raw"), r.getAs[Long]("n_kept"))
      // the kept count IS min(raw, quota) — the window only picks WHICH ids
      assert(kept === math.min(raw, quota))
      val replayed = BigDecimal(kept.toDouble / raw)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("retention") === replayed)
      // checksum sanity: the kept set has kept members bounded by its max
      assert(r.getAs[Long]("kept_id_sum") <= kept * r.getAs[Long]("kept_id_max"))
    }
    // full independent replay: per-label centroids → L2² argmin assignment
    // (ties by label, the ann_ivf_trained quantizer) → ascending-id prefix
    // per cell — the checksums must pin the EXACT kept set
    val raw = Tables.embeddings(spark, TestSession.sfDir)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2)))
    val cents = raw.groupBy(_._3).map { case (l, vs) =>
      val d = vs.head._2.length
      l -> Array.tabulate(d)(i => vs.map(_._2(i)).sum / vs.length)
    }
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val assign = raw.map { case (id, v, _) =>
      id -> cents.toSeq.map { case (l, c) => (l2(v, c), l) }.min._2
    }
    val byCell = assign.groupBy(_._2)
    rows.foreach { r =>
      val cell = r.getInt(0)
      val kept = byCell(cell).map(_._1).sorted.take(quota.toInt)
      assert(r.getAs[Long]("n_kept") === kept.length.toLong, s"cell $cell")
      assert(r.getAs[Long]("kept_id_sum") === kept.sum, s"cell $cell sum")
      assert(r.getAs[Long]("kept_id_max") === kept.max, s"cell $cell max")
    }
  }

  test("dedup_semantic_curve: the 0.35 row IS dedup_semantic's total; monotone in t") {
    val curve = graft.vector.Similarity.dedupSemanticCurve.fn(spark, TestSession.sfDir)
      .collect().sortBy(_.getAs[Double]("threshold"))
    assert(curve.map(_.getAs[Double]("threshold")).toSeq === Seq(0.35, 0.55, 0.75))
    val sem = graft.vector.Similarity.dedupSemantic.fn(spark, TestSession.sfDir)
      .collect()
    val semPruned = sem.map(_.getAs[Long]("n_pruned")).sum
    val semVecs = sem.map(_.getAs[Long]("n_vecs")).sum
    val h = curve.head
    // same quantizer, same greedy rule, same 0.35 gate -> identical totals
    assert(h.getAs[Long]("n_pruned") === semPruned)
    assert(h.getAs[Long]("n_vecs") === semVecs)
    curve.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_pruned") ===
        r.getAs[Long]("n_vecs"))
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_groups"))
    }
    // raising the threshold can only RETAIN more representatives
    assert(curve.map(_.getAs[Long]("n_kept")).toSeq ===
      curve.map(_.getAs[Long]("n_kept")).sorted.toSeq)
  }
}
