package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{EventAnalytics, Relational}
import graft.audit.AuditQueries

/** Semantic guards for the round-7 batch-1 ops: the CDC MERGE verdict,
  * lifecycle fingerprints, last-touch attribution, and the Q12-flavor
  * priority split — each reconciled against an independent recount. */
class MergeAttributionSpec extends AnyFunSuite {
  import TestSession._

  private val sf = "/root/testdata/sf0.001"

  test("audit_merge_upsert: every entity reconciles with full replay; actions partition the entity set") {
    val rows = AuditQueries.auditMergeUpsert.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // the associativity invariant: MERGE-applied state ≡ full replay
    rows.foreach(r => assert(r.getAs[Boolean]("reconciled"),
      s"entity ${r.getLong(0)} diverged from full replay"))
    // one verdict per entity, covering exactly the feed's entity set
    val entities = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.length.toLong === entities)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    val actions = rows.map(_.getAs[String]("merge_action")).toSet
    assert(actions.subsetOf(Set(
      "insert", "update", "delete", "insert_then_delete", "unchanged")))
    // 'unchanged' entities must have no post-midpoint changes
    val lg = AuditQueries.log(spark, sf).select("audit_id", "entity_id")
    val mid = lg.agg(floor(max("audit_id") / 2).cast("long")).head.getLong(0)
    val touchedPost = lg.filter(col("audit_id") > mid)
      .select("entity_id").distinct().collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val unchanged = r.getAs[String]("merge_action") == "unchanged"
      assert(unchanged === !touchedPost(r.getLong(0)),
        s"entity ${r.getLong(0)}: action=${r.getAs[String]("merge_action")}")
    }
  }

  test("audit_lifecycle_paths: paths are ≤5 ops over the I/U/D/T domain; shares from one total") {
    val rows = AuditQueries.auditLifecyclePaths.fn(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val entities = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    rows.foreach { r =>
      val steps = r.getString(0).split(">")
      assert(steps.nonEmpty && steps.length <= 5, r.getString(0))
      steps.foreach(op => assert(Set("I", "U", "D", "T")(op), r.getString(0)))
      val expect = BigDecimal(r.getAs[Long]("n_entities").toDouble / entities)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("entity_share") - expect) < 1e-9)
    }
    // top-20 mass cannot exceed the entity total
    assert(rows.map(_.getAs[Long]("n_entities")).sum <= entities)
    // descending with path tiebreak
    val ns = rows.map(_.getAs[Long]("n_entities")).toSeq
    assert(ns === ns.sortBy(-_))
  }

  test("event_attribution: conversions and revenue cover exactly the purchase set") {
    val rows = EventAnalytics.eventAttribution.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
    assert(rows.map(_.getAs[Long]("conversions")).sum === purchases.count())
    // channels come from the non-purchase event domain plus 'direct'
    val evTypes = Tables.events(spark, sf).select("event_type")
      .distinct().collect().map(_.getString(0)).toSet - "purchase"
    rows.foreach(r =>
      assert((evTypes + "direct")(r.getString(0)), r.getString(0)))
    // attributed revenue sums to total purchase revenue (both sides ride
    // the same exact-decimal sum, so compare at the rounded grid)
    val total = purchases
      .agg(Det.dsumRound(col("value"), 2)).head.getDouble(0)
    val attributed = BigDecimal(rows.map(r =>
      BigDecimal(r.getAs[Double]("revenue"))).sum.toDouble)
    assert((attributed - BigDecimal(total)).abs.toDouble < 0.05,
      s"attributed $attributed vs total $total")
    rows.foreach { r =>
      val share = r.getAs[Double]("rev_share")
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("q_ship_priority: split recounts the joined window; share consistent") {
    val rows = Relational.qShipPriority.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val joined = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(Tables.orders(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
    assert(rows.map(r => r.getAs[Long]("high_lines") + r.getAs[Long]("low_lines")).sum
      === joined.count())
    val high = joined
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count()
    assert(rows.map(_.getAs[Long]("high_lines")).sum === high)
    rows.foreach { r =>
      val n = r.getAs[Long]("high_lines") + r.getAs[Long]("low_lines")
      val expect = BigDecimal(r.getAs[Long]("high_lines").toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("high_share") - expect) < 1e-9)
    }
  }
}
