package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{EventAnalytics, Layout, Relational}

/** Guards for the physical-planning batch: the zone-map pruning
  * simulator must reproduce the textbook layout trade-off, the skew
  * probe must recount the histogram it summarizes, and the
  * co-occurrence matrix must stay within its session universe. */
class LayoutSkewSpec extends AnyFunSuite {
  import TestSession._

  private val sf = "/root/testdata/sf0.001"

  test("layout_prune_sim: own-dim sorts prune best, z-order prunes both, conjunction never scans more") {
    val rows = Layout.layoutPruneSim.fn(spark, sf).collect()
    assert(rows.length === 9)
    val m = rows.map(r => (r.getString(0), r.getString(1)) ->
      r.getAs[Double]("scan_ratio")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("files_scanned") <= r.getAs[Long]("n_files"))
      val ratio = r.getAs[Double]("scan_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
    // a sort key prunes its own dimension at least as well as any other
    // layout prunes that dimension
    assert(m(("date_sorted", "date_week")) <= m(("zorder", "date_week")))
    assert(m(("zorder", "date_week")) <= m(("part_sorted", "date_week")))
    assert(m(("part_sorted", "part_band")) <= m(("zorder", "part_band")))
    assert(m(("zorder", "part_band")) <= m(("date_sorted", "part_band")))
    // the conjunction can never scan more files than either conjunct
    Seq("date_sorted", "part_sorted", "zorder").foreach { l =>
      assert(m((l, "date_and_part")) <= m((l, "date_week")) + 1e-9)
      assert(m((l, "date_and_part")) <= m((l, "part_band")) + 1e-9)
    }
    // z-order must actually help the cross dimension vs the wrong sort
    assert(m(("zorder", "date_week")) < m(("part_sorted", "date_week")))
    assert(m(("zorder", "part_band")) < m(("date_sorted", "part_band")))
  }

  test("q_skew_probe: histogram recount; ranks ordered; salt recommendation consistent") {
    val rows = Relational.qSkewProbe.fn(spark, sf).collect()
    assert(rows.length === 10)
    assert(rows.map(_.getAs[Long]("rnk")).toSeq === (1L to 10L))
    val kr = rows.map(_.getAs[Long]("key_rows")).toSeq
    assert(kr.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
    val li = Tables.lineitem(spark, sf)
    assert(rows.head.getAs[Long]("n_rows") === li.count())
    assert(rows.head.getAs[Long]("n_keys")
      === li.select("l_partkey").distinct().count())
    // the reported top key really is the heaviest
    val top = rows.head
    val directTop = li.groupBy("l_partkey").count()
      .orderBy(col("count").desc, col("l_partkey")).limit(1).head
    assert(top.getAs[Long]("key") === directTop.getLong(0))
    assert(top.getAs[Long]("key_rows") === directTop.getLong(1))
    // rec_salt = ceil(max/avg), identical across rows, ≥ 1
    val expSalt = math.ceil(top.getAs[Long]("key_rows").toDouble *
      top.getAs[Long]("n_keys") / top.getAs[Long]("n_rows")).toLong
    rows.foreach(r => assert(r.getAs[Long]("rec_salt") === expSalt))
    assert(expSalt >= 1)
    assert(top.getAs[Double]("skew_vs_avg") >= 1.0)
  }

  test("event_cooccurrence: pairs ordered, support within the session universe, lift replays") {
    val rows = EventAnalytics.eventCooccurrence.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1) < r.getString(0) === false) // type_a < type_b
      assert(r.getString(0) < r.getString(1))
      assert(r.getAs[Double]("support") > 0.0 && r.getAs[Double]("support") <= 1.0)
      assert(r.getAs[Double]("lift") > 0.0)
    }
    // support denominators agree with an independent session count: a
    // pair's session count can never exceed the total session universe
    val sessions = graft.audit.AuditQueries.auditSessionize.fn(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_both") <= sessions)
      val support = r.getAs[Double]("support")
      val implied = math.round(r.getAs[Long]("n_both") / support)
      // recovered denominator is the same for every pair (one universe)
      assert(math.abs(implied - sessions) <= sessions / 100 + 1,
        s"implied sessions $implied vs $sessions")
    }
  }
}
