package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.audit.AuditQueries

/** Guard for the robust (median/MAD) volume monitor: the order
  * statistics must replay against a driver-side recount, and the flag
  * must follow the modified-z rule exactly. */
class RobustAnomalySpec extends AnyFunSuite {
  import TestSession._

  private val sf = "/root/testdata/sf0.001"

  test("audit_volume_mad: medians replay; flags follow the 3.5 rule; calendar is dense") {
    val rows = AuditQueries.auditVolumeMad.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val byOp = rows.groupBy(_.getString(1))
    // dense calendar: every op carries the same day set
    val daySets = byOp.view.mapValues(_.map(_.getDate(0).toString).toSet).toMap
    assert(daySets.values.toSet.size === 1, "ops disagree on the calendar")
    val nDays = daySets.values.head.size
    byOp.foreach { case (op, g) =>
      assert(g.length === nDays)
      val ns = g.map(_.getAs[Long]("n")).sorted
      val expMed = ns((ns.length + 1) / 2 - 1) // lower median
      assert(g.head.getAs[Long]("med") === expMed, s"$op median")
      val ads = g.map(r => math.abs(r.getAs[Long]("n") - expMed)).sorted
      val expMad = ads((ads.length + 1) / 2 - 1)
      assert(g.head.getAs[Long]("mad") === expMad, s"$op MAD")
      g.foreach { r =>
        val mad = r.getAs[Long]("mad")
        if (mad > 0) {
          val z = r.getAs[Double]("robust_z")
          val exp = BigDecimal(
            0.6745 * (r.getAs[Long]("n") - r.getAs[Long]("med")) / mad)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(math.abs(z - exp) < 1e-9)
          assert((r.getAs[Int]("anomaly") == 1) === (math.abs(z) > 3.5))
        } else {
          assert(r.isNullAt(r.fieldIndex("robust_z")))
          assert((r.getAs[Int]("anomaly") == 1)
            === (r.getAs[Long]("n") != r.getAs[Long]("med")))
        }
      }
    }
  }

  test("audit_cusum: closed form equals the max(0, C+y) recursion; alarms follow h") {
    val rows = AuditQueries.auditCusum.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (op, g) =>
      val days = g.sortBy(_.getDate(0).toString)
      val s7 = days.head.getAs[Long]("base7_total")
      assert(days.forall(_.getAs[Long]("base7_total") == s7), s"$op baseline varies")
      var cUp = 0L; var cDn = 0L
      days.foreach { r =>
        val n = r.getAs[Long]("n")
        cUp = math.max(0L, cUp + (28 * n - 5 * s7))
        cDn = math.max(0L, cDn + (3 * s7 - 28 * n))
        assert(r.getAs[Long]("cusum_up_x28") === cUp, s"$op up ${r.getDate(0)}")
        assert(r.getAs[Long]("cusum_dn_x28") === cDn, s"$op dn ${r.getDate(0)}")
        assert((r.getAs[Int]("alarm_up") == 1) === (cUp > 8 * s7))
        assert((r.getAs[Int]("alarm_dn") == 1) === (cDn > 8 * s7))
      }
    }
    // positive control on this feed: the truncate class trends above its
    // first-week baseline and must fire at least one upward alarm
    assert(rows.exists(r => r.getString(1) == "T" && r.getAs[Int]("alarm_up") == 1))
  }

  test("audit_actor_profile: TVD and dominant op replay from a driver-side recount") {
    val rows = AuditQueries.auditActorProfile.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("vol_share")).sum - 1.0) < 0.01)
    val feed = AuditQueries.log(spark, sf)
      .select("changed_by", "operation", "entity_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val global = feed.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val gn = feed.length.toLong
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    rows.foreach { r =>
      val actor = r.getString(0)
      val mine = feed.filter(_._1 == actor)
      assert(r.getAs[Long]("n_changes") === mine.length.toLong)
      assert(r.getAs[Long]("n_entities") === mine.map(_._3).distinct.length.toLong)
      assert(r.getAs[Long]("n_entities") <= r.getAs[Long]("n_changes"))
      val mix = mine.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val tvd = global.keys.map { op =>
        (r6(mix.getOrElse(op, 0L).toDouble / mine.length)
          - r6(global(op).toDouble / gn)).abs
      }.sum / 2
      // full-grid TVD: ops the actor never issued contribute their global
      // share (the recount's getOrElse(0) mirrors the op's dense grid)
      assert(math.abs(r.getAs[Double]("tvd") - tvd.toDouble) < 1e-6, actor)
      val dom = mix.toSeq.sortBy { case (op, c) => (-c, op) }.head
      assert(r.getString(r.fieldIndex("dominant_op")) === dom._1)
      assert((r.getAs[Int]("flagged") == 1) === (r.getAs[Double]("tvd") > 0.03))
    }
    // positive control: one actor on this feed genuinely skews
    assert(rows.exists(_.getAs[Int]("flagged") == 1))
  }

  test("audit_seasonal_adjust: factors mean to ~1 per op and adjustment replays") {
    val rows = AuditQueries.auditSeasonalAdjust.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (op, g) =>
      // ratio-to-mean conservation: Σ n/factor over covered days equals
      // the op mean × covered-day count (dows with zero volume are
      // excluded — they publish NULL, no fictional division)
      val covered = g.filter(r => !r.isNullAt(r.fieldIndex("factor")))
      assert(covered.forall(_.getAs[Double]("factor") > 0))
      val mean = g.map(_.getAs[Long]("n")).sum.toDouble / g.length
      val adjSum = covered.map(_.getAs[Double]("adjusted")).sum
      assert(math.abs(adjSum / (mean * covered.length) - 1.0) < 0.01,
        s"$op conservation")
      g.foreach { r =>
        if (!r.isNullAt(r.fieldIndex("factor"))) {
          val exp = BigDecimal(r.getAs[Long]("n") / r.getAs[Double]("factor"))
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(math.abs(r.getAs[Double]("adjusted") - exp) < 1e-9, s"$op ${r.getDate(0)}")
          val dev = r.getAs[Double]("adjusted") / mean - 1.0
          assert(math.abs(r.getAs[Double]("adj_dev_share") - dev) < 1e-3)
        }
      }
      // the adjustment genuinely flattens the weekly pattern: adjusted
      // dow means are closer to the overall mean than raw dow means
      val byDow = covered.groupBy(_.getAs[Long]("dow"))
      if (byDow.nonEmpty) {
        val rawSpread = byDow.values.map(d =>
          math.abs(d.map(_.getAs[Long]("n")).sum.toDouble / d.length - mean)).max
        val adjSpread = byDow.values.map(d =>
          math.abs(d.map(_.getAs[Double]("adjusted")).sum / d.length - mean)).max
        assert(adjSpread <= rawSpread + 1e-6, s"$op spread")
      }
    }
  }

  test("audit_entity_churn: ledger identities hold and reconcile with the raw feed") {
    val rows = AuditQueries.auditEntityChurn.fn(spark, sf).collect()
      .sortBy(_.getString(0))
    assert(rows.nonEmpty)
    val feed = AuditQueries.log(spark, sf)
      .select("entity_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toLocalDateTime.toLocalDate))
    val perEntity = feed.groupBy(_._1).view
      .mapValues(ds => (ds.map(_._2).min, ds.map(_._2).max)).toMap
    def wk(d: java.time.LocalDate) = (d.toEpochDay + 3) / 7
    val newByWk = perEntity.values.groupBy(v => wk(v._1)).view.mapValues(_.size).toMap
    val goneByWk = perEntity.values.groupBy(v => wk(v._2)).view.mapValues(_.size).toMap
    var cumNew = 0L; var cumGone = 0L
    rows.foreach { r =>
      val monday = java.time.LocalDate.parse(r.getString(0))
      assert(monday.getDayOfWeek === java.time.DayOfWeek.MONDAY)
      val w = wk(monday)
      assert(r.getAs[Long]("new_entities") === newByWk.getOrElse(w, 0).toLong)
      assert(r.getAs[Long]("churned_entities") === goneByWk.getOrElse(w, 0).toLong)
      cumNew += r.getAs[Long]("new_entities")
      cumGone += r.getAs[Long]("churned_entities")
      assert(r.getAs[Long]("cum_seen") === cumNew)
      assert(r.getAs[Long]("active_eow") === cumNew - cumGone)
      assert(r.getAs[Long]("active_eow") >= 0)
    }
    assert(cumNew === perEntity.size.toLong, "every entity appears exactly once as new")
    assert(cumGone === perEntity.size.toLong, "every entity churns exactly once")
    // the ledger drains: by the horizon every entity's history has ended
    assert(rows.last.getAs[Long]("active_eow") === 0L)
  }

  test("audit_value_benford: shares and z replay; this organic feed conforms") {
    val rows = AuditQueries.auditValueBenford.fn(spark, sf).collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq === (1 to 9).toSeq)
    val nTotal = rows.head.getAs[Long]("n_total")
    assert(rows.map(_.getAs[Long]("n")).sum === nTotal, "digit histogram partitions")
    // Benford reference mass sums to 1 (log10 telescoping)
    assert(math.abs(rows.map(_.getAs[Double]("benford_share")).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      val obs = r.getAs[Double]("obs_share")
      assert(math.abs(obs - r.getAs[Long]("n").toDouble / nTotal) < 1e-5)
      val bs = r.getAs[Double]("benford_share")
      val z = (obs - bs) * math.sqrt(nTotal.toDouble) / math.sqrt(bs * (1 - bs))
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-3)
      assert((r.getAs[Int]("flagged") == 1) === (math.abs(r.getAs[Double]("z")) > 3))
    }
    // pinned honest verdict: the synthetic purchase amounts are
    // log-spread enough to CONFORM — the clean baseline a fraud monitor
    // alarms against
    assert(rows.forall(_.getAs[Int]("flagged") == 0))
  }

  test("audit_session_quantiles: reconciles with audit_sessionize's sessions") {
    val rows = AuditQueries.auditSessionQuantiles.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val sessions = AuditQueries.auditSessionize.fn(spark, sf).collect()
    assert(rows("n_events").getAs[Long]("n_sessions") === sessions.length.toLong)
    assert(rows("duration_s").getAs[Long]("n_sessions") === sessions.length.toLong)
    // exact quantile replay on the events-per-session metric
    val counts = sessions.map(_.getAs[Long]("n_events")).sorted
    def q(p: Double) = counts(math.ceil(p * counts.length).toInt - 1)
    assert(rows("n_events").getAs[Long]("p50") === q(0.5))
    assert(rows("n_events").getAs[Long]("p90") === q(0.9))
    assert(rows("n_events").getAs[Long]("p99") === q(0.99))
    assert(rows("n_events").getAs[Long]("max_v") === counts.max)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("p50") <= r.getAs[Long]("p90"))
      assert(r.getAs[Long]("p90") <= r.getAs[Long]("p99"))
      assert(r.getAs[Long]("p99") <= r.getAs[Long]("max_v"))
    }
  }
}
