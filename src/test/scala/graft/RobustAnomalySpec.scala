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
}
