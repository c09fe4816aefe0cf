package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.EventAnalytics
import graft.audit.AuditQueries

/** Guards for the product-analytics ops over the raw events feed and the
  * per-entity lifetime card: each report must reconcile with an
  * independent recount of the feed it summarizes. */
class EventAnalyticsSpec extends AnyFunSuite {
  import TestSession._

  private val sf = "/root/testdata/sf0.001"

  test("event_retention: offset-0 is total; cells bounded by their cohort") {
    val rows = EventAnalytics.eventRetention.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getDate(0))
    byCohort.foreach { case (day, grp) =>
      // the first-purchase day itself is purchase activity, so the
      // offset-0 cell must exist and retain the whole cohort
      val zero = grp.find(_.getInt(1) == 0)
      assert(zero.isDefined, s"cohort $day missing offset 0")
      assert(zero.get.getAs[Long]("active_users")
        === zero.get.getAs[Long]("cohort_users"), s"cohort $day offset 0")
      assert(zero.get.getAs[Double]("retention") === 1.0)
      grp.foreach { r =>
        assert(r.getAs[Long]("active_users") <= r.getAs[Long]("cohort_users"))
        assert(r.getAs[Double]("retention") <= 1.0 &&
          r.getAs[Double]("retention") > 0.0)
        assert(r.getInt(1) >= 0)
      }
    }
    // cohort sizes sum to the number of distinct purchasing users
    val purchasers = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    val cohortTotal = byCohort.values
      .map(_.head.getAs[Long]("cohort_users")).sum
    assert(cohortTotal === purchasers)
  }

  test("event_funnel: frontier only shrinks; ratios reconcile; stage 2 honors its window") {
    val rows = EventAnalytics.eventFunnel.fn(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
    assert(rows.map(_.getString(1)).toSeq
      === Seq("signup", "view", "click", "purchase"))
    val n = rows.map(_.getAs[Long]("n_users"))
    assert(n.sliding(2).forall { case Array(a, b) => b <= a; case _ => true },
      s"funnel widened: ${n.toSeq}")
    assert(rows.head.isNullAt(rows.head.fieldIndex("conv_prev")))
    rows.tail.zip(n).foreach { case (r, prev) =>
      val expect =
        if (prev == 0) Double.NaN
        else BigDecimal(r.getAs[Long]("n_users").toDouble / prev)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (!expect.isNaN)
        assert(math.abs(r.getAs[Double]("conv_prev") - expect) < 1e-9)
      assert(math.abs(r.getAs[Double]("conv_total")
        - BigDecimal(r.getAs[Long]("n_users").toDouble / n.head)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // independent recount of stage 2: first view within 24 h AFTER the
    // user's first signup — the sequential window is the op's whole point
    val ev = Tables.events(spark, sf)
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val expect2 = ev.filter(col("event_type") === "view")
      .join(s1, "user_id")
      .filter(col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
      .select("user_id").distinct().count()
    assert(n(1) === expect2)
  }

  test("audit_entity_lifetime: card reconciles with the raw feed per entity") {
    val rows = AuditQueries.auditEntityLifetime.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val feed = AuditQueries.log(spark, sf)
      .select("entity_id", "audit_id", "operation", "ts").collect()
      .groupBy(_.getLong(0))
    assert(rows.length === feed.size)
    rows.foreach { r =>
      val hist = feed(r.getLong(0)).sortBy(_.getLong(1))
      assert(r.getString(r.fieldIndex("first_op"))
        === hist.head.getString(2), s"entity ${r.getLong(0)} first_op")
      assert(r.getString(r.fieldIndex("last_op"))
        === hist.last.getString(2), s"entity ${r.getLong(0)} last_op")
      assert(r.getAs[Long]("n_changes") === hist.length.toLong)
      assert(r.getAs[Long]("lifetime_us") >= 0)
      val expectStatus =
        if (Seq("D", "T").contains(hist.last.getString(2))) "deleted" else "live"
      assert(r.getString(r.fieldIndex("status")) === expectStatus)
    }
    // both verdicts occur on this feed — a one-sided detector is untested
    assert(rows.exists(_.getString(rows.head.fieldIndex("status")) == "live"))
    assert(rows.exists(_.getString(rows.head.fieldIndex("status")) == "deleted"))
  }
}
