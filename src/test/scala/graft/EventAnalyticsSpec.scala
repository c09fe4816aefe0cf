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

  test("audit_op_pivot: wide rows reconcile with the long-format daily counts") {
    val wide = AuditQueries.auditOpPivot.fn(spark, sf).collect()
    assert(wide.nonEmpty)
    val long = AuditQueries.log(spark, sf)
      .groupBy(to_date(col("ts")).as("day"), col("operation")).count()
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    wide.foreach { r =>
      val day = r.getDate(0).toString
      def n(op: String) = long.getOrElse((day, op), 0L)
      assert(r.getAs[Long]("n_ins") === n("I"), s"$day I")
      assert(r.getAs[Long]("n_upd") === n("U"), s"$day U")
      assert(r.getAs[Long]("n_del") === n("D"), s"$day D")
      assert(r.getAs[Long]("n_trunc") === n("T"), s"$day T")
      assert(r.getAs[Long]("n_total") === r.getAs[Long]("n_ins")
        + r.getAs[Long]("n_upd") + r.getAs[Long]("n_del")
        + r.getAs[Long]("n_trunc"))
    }
    // a day with zero truncates exists — the coalesce-to-0 path is live
    assert(wide.exists(_.getAs[Long]("n_trunc") == 0L))
  }

  test("audit_rolling_volume: RANGE frame sums exactly the trailing 7 days") {
    val rows = AuditQueries.auditRollingVolume.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (op, grp) =>
      val byDay = grp.map(r => r.getDate(1).toLocalDate.toEpochDay
        -> r.getAs[Long]("n_changes")).toMap
      grp.foreach { r =>
        val d = r.getDate(1).toLocalDate.toEpochDay
        val expect = (d - 6 to d).flatMap(byDay.get).sum
        assert(r.getAs[Long]("sum_7d") === expect, s"$op day $d")
        val present = (d - 6 to d).count(byDay.contains)
        val expectAvg = BigDecimal(expect.toDouble / present)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getAs[Double]("avg_7d") - expectAvg) < 1e-9,
          s"$op day $d avg")
      }
    }
    // the T class is sparse at sf0.001 — gap days must THIN the frame
    // (present < 7), which only the RANGE frame does correctly
    assert(rows.filter(_.getString(0) == "T").length <
      rows.filter(_.getString(0) == "U").length)
  }

  test("split_leakage: semi-join verdicts reconcile with a direct shingle probe") {
    val rows = graft.text.CorpusOps.splitLeakage.fn(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("test", "val"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_leaked") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("leak_share") >= 0.0 &&
        r.getAs[Double]("leak_share") <= 1.0)
    }
    // non-degenerate on this corpus: leakage exists but is not total
    assert(rows.exists(_.getAs[Long]("n_leaked") > 0))
  }
}
