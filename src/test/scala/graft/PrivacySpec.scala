package graft

import graft.text.Privacy
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The privacy-gate invariants that make the de-identified export
  * releasable: pseudonyms are injective (joins survive) yet contain no
  * raw identifier, generalization is lossy in the released direction,
  * and the k-anonymity audit accounts for every released row. */
class PrivacySpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}

  private lazy val scrub = Privacy.piiScrub.fn(spark, sfDir).cache()
  private lazy val kanon = Privacy.piiKanon.fn(spark, sfDir).collect()

  test("pseudonymization is injective: one pseudonym per customer, no collisions") {
    val customers = Tables.customer(spark, sfDir).count()
    assert(scrub.count() === customers)
    assert(scrub.select("pseudo_id").distinct().count() === customers)
  }

  test("no direct identifier survives: schema drops c_name, values carry no raw key") {
    assert(!scrub.columns.contains("c_name") && !scrub.columns.contains("c_custkey"))
    // the pseudonym is hex — it cannot textually embed 'Customer#...' names
    assert(scrub.filter(!col("pseudo_id").rlike("^[0-9a-f]{16}$")).count() === 0)
  }

  test("referential integrity survives the scrub: n_orders totals the fact table") {
    val totalOrders = Tables.orders(spark, sfDir).count()
    val viaScrub = scrub.agg(sum("n_orders")).collect()(0).getLong(0)
    assert(viaScrub === totalOrders, "orders lost or duplicated through the pseudonym join")
  }

  test("generalization is lossy: banded balances take far fewer values than raw") {
    val raw = Tables.customer(spark, sfDir).select("c_acctbal").distinct().count()
    val banded = scrub.select("acctbal_band").distinct().count()
    assert(banded < raw / 10, s"banding barely generalized: $banded of $raw")
  }

  test("k-anonymity histogram accounts for every released row exactly once") {
    val released = kanon.map(r => r.getAs[Long]("n_rows")).sum
    assert(released === scrub.count())
    // class arithmetic holds: n_rows = k_size * n_classes on every row
    kanon.foreach { r =>
      assert(r.getAs[Long]("n_rows") ===
        r.getAs[Long]("k_size") * r.getAs[Long]("n_classes"))
      assert(r.getAs[Boolean]("below_threshold") === (r.getAs[Long]("k_size") < 5))
    }
  }

  test("audit and export share the generalization: kanon classes partition the scrub") {
    // regroup the RELEASED export by its quasi-identifier and rebuild the
    // histogram — it must equal the audit op bit-for-bit (the audit is a
    // measurement of the released table, not of a parallel definition)
    val rebuilt = scrub
      .groupBy("nation_id", "acctbal_band", "mktsegment")
      .agg(count(lit(1)).as("k"))
      .groupBy(col("k").as("k_size")).agg(count(lit(1)).as("n_classes"))
      .select(col("k_size"), col("n_classes"),
        (col("k_size") * col("n_classes")).as("n_rows"),
        (col("k_size") < 5).as("below_threshold"))
      .orderBy("k_size").collect()
    assert(rebuilt.toSeq === kanon.toSeq)
  }

  test("l-diversity: classes partition the table; l and top_share replay from raw rows") {
    val rows = Privacy.piiLdiversity.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val raw = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("int"), col("c_mktsegment"),
        (floor(col("c_acctbal") / 1000) * 1000).cast("long"))
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getLong(2)))
    assert(rows.map(_.getAs[Long]("k")).sum === raw.length.toLong)
    val byClass = raw.groupBy(_._1)
    rows.foreach { r =>
      val key = (r.getInt(0), r.getString(1))
      val vals = byClass(key).map(_._2)
      assert(r.getAs[Long]("k") === vals.length.toLong)
      assert(r.getAs[Long]("l_distinct") === vals.distinct.length.toLong)
      val topN = vals.groupBy(identity).values.map(_.size).max
      assert(math.abs(r.getAs[Double]("top_share") - topN.toDouble / vals.length) < 1e-3)
      assert(r.getAs[Boolean]("below_l3") === (vals.distinct.length < 3))
      // l can never exceed k; a homogeneous class has top_share 1
      assert(r.getAs[Long]("l_distinct") <= r.getAs[Long]("k"))
      if (r.getAs[Long]("l_distinct") == 1L)
        assert(r.getAs[Double]("top_share") === 1.0)
    }
  }

  test("pii_dp_histogram: true counts reconcile, noise is the seeded Laplace draw, utility columns derive") {
    val rows = SparkEntry.queries("pii_dp_histogram")(spark, sfDir).collect()
    // the released grid is exactly the quasi-identifier histogram
    val truth = Tables.customer(spark, sfDir)
      .groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Number]("c_nationkey").intValue,
        r.getString(1)) -> r.getAs[Long]("n")).toMap
    assert(rows.length === truth.size)
    rows.foreach { r =>
      val key = (r.getAs[Int]("nation_id"), r.getAs[String]("mktsegment"))
      assert(r.getAs[Long]("n_true") === truth(key), s"$key true count")
      val noise = r.getAs[Double]("noise")
      // derived columns are exact functions of the published noise
      assert(r.getAs[Double]("n_noisy") === r.getAs[Long]("n_true") + noise)
      assert(r.getAs[Double]("abs_err") === math.abs(noise))
      assert(r.getAs[Double]("rel_err") ===
        math.abs(noise) / r.getAs[Long]("n_true"))
      assert(r.getAs[Double]("epsilon") === 0.5)
    }
    // the draw is a real two-sided Laplace: both signs occur, and the
    // mean |noise| sits in a loose band around the scale b = 1/eps = 2
    val noises = rows.map(_.getAs[Double]("noise"))
    assert(noises.exists(_ > 0) && noises.exists(_ < 0))
    val meanAbs = noises.map(math.abs).sum / noises.length
    assert(meanAbs > 0.8 && meanAbs < 5.0, s"mean |noise| $meanAbs")
    // deterministic: a second run draws the identical noise vector
    val again = SparkEntry.queries("pii_dp_histogram")(spark, sfDir).collect()
      .map(_.getAs[Double]("noise"))
    assert(again === noises)
  }

  // ------------------------------------------------------- text PII --

  test("pii_text_detect: the corpus side proves clean; every CRM row is caught " +
      "with the expected class counts") {
    val det = SparkEntry.queries("pii_text_detect")(spark, sfDir).cache()
    try {
      // the synthetic corpus carries no PII — a flagged doc_id below the
      // CRM offset would mean the detector fires on noise
      assert(det.filter(col("doc_id") < 1000000000L).count() === 0)
      assert(det.filter(col("source") =!= "crm_dump").count() === 0)
      // every CRM pseudo-doc is flagged (each carries a phone + account
      // name + 9-digit ref by construction)
      val customers = Tables.customer(spark, sfDir).count()
      assert(det.count() === customers)
      assert(det.filter(col("n_phone") =!= 1).count() === 0)
      assert(det.filter(col("n_account") =!= 1).count() === 0)
      assert(det.filter(col("n_longnum") < 1).count() === 0)
      // email fires on exactly the every-third-customer rows
      val withEmail = det.filter(col("n_email") === 1)
      assert(withEmail.count() ===
        Tables.customer(spark, sfDir).filter(col("c_custkey") % 3 === 0).count())
      assert(det.filter(col("n_email") > 1).count() === 0)
      // ipv4 is the negative control — nothing in the release looks like one
      assert(det.filter(col("n_ipv4") =!= 0).count() === 0)
      // the sample is a real match from the text (highest-priority class)
      assert(det.filter(col("sample").isNull).count() === 0)
    } finally det.unpersist()
  }

  test("pii_redact: zero residual matches on every row; masks actually land") {
    val red = SparkEntry.queries("pii_redact")(spark, sfDir).cache()
    try {
      // the release-gate contract: the published residual re-scan is 0
      assert(red.filter(col("n_residual") =!= 0).count() === 0)
      // and an independent re-scan of the redacted text agrees
      for (pat <- Privacy.piiClasses.map(_._2))
        assert(red.filter(size(regexp_extract_all(col("redacted"),
          lit(pat), lit(0))) > 0).count() === 0, s"residual $pat")
      // every flagged row was actually rewritten: masks present, and the
      // mask count equals the pre-redaction match count
      assert(red.filter(!col("redacted").contains("[PHONE]")).count() === 0)
      assert(red.filter(!col("redacted").contains("[ACCT]")).count() === 0)
      assert(red.filter(col("n_masked") < 3).count() === 0)
      // detect and redact agree on the flagged universe
      val det = SparkEntry.queries("pii_text_detect")(spark, sfDir)
      assert(red.count() === det.count())
    } finally red.unpersist()
  }

  test("pii_secrets: corpus proves clean; every config row caught with disjoint counts") {
    val sec = SparkEntry.queries("pii_secrets")(spark, sfDir).cache()
    try {
      // negative control: no corpus document carries a credential
      assert(sec.filter(col("source") =!= "config_dump").count() === 0)
      // every synthesized config row is flagged
      val suppliers = Tables.supplier(spark, sfDir).count()
      assert(sec.count() === suppliers)
      // per-class counts are exact and DISJOINT: one access key + one
      // 32-hex secret per row, a bearer token on every third supplier —
      // and the bearer's own 16-hex tail never double-reports as hex32
      assert(sec.filter(col("n_awskey") =!= 1).count() === 0)
      assert(sec.filter(col("n_hex32") =!= 1).count() === 0)
      val withBearer = Tables.supplier(spark, sfDir)
        .filter(col("s_suppkey") % 3 === 0).count()
      assert(sec.filter(col("n_bearer") === 1).count() === withBearer)
      assert(sec.filter(col("n_bearer") > 1).count() === 0)
      assert(sec.filter(col("n_secrets") =!=
        col("n_awskey") + col("n_bearer") + col("n_hex32")).count() === 0)
      // the sample is a real highest-priority match
      assert(sec.filter(!col("sample").startsWith("AKIA")).count() === 0)
    } finally sec.unpersist()
  }

  test("pii_pseudonymize: stable join-preserving surrogates, collision audit clean") {
    val out = Privacy.piiPseudonymize.fn(spark, sfDir).cache()
    try {
      // every class present, at most 20 rows per class
      val perClass = out.groupBy("class").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(perClass.keySet === Set("email", "account", "ref"))
      assert(perClass.values.forall(_ <= 20))
      // the collision audit must be clean on the generated release: one
      // raw identity per pseudonym (join-preserving by construction)
      assert(out.filter(col("n_identities") =!= 1L).count() === 0)
      // pseudonyms are the stable keyed surrogate shape
      assert(out.filter(!col("pseudonym").rlike("^p_[0-9a-f]{16}$")).count() === 0)
      // determinism of the map: a second run yields the identical table
      val again = Privacy.piiPseudonymize.fn(spark, sfDir)
      assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
      // doc spread can never exceed occurrences
      assert(out.filter(col("n_docs") > col("n_occurrences")).count() === 0)
    } finally out.unpersist()
  }
}
