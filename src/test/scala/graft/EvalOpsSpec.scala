package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Relational
import graft.text.TextOps

/** Guards for the evaluation/report operators: the classifier-metrics
  * readout must reconcile with the confusion matrix it summarizes, and
  * the YoY report must reconcile with its own yearly aggregate. */
class EvalOpsSpec extends AnyFunSuite {
  import TestSession._

  private val sf = "/root/testdata/sf0.001"

  test("lang_id_metrics reconciles with the lang_id confusion matrix") {
    val matrix = TextOps.langId.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val metrics = TextOps.langIdMetrics.fn(spark, sf).collect()
    assert(metrics.map(_.getString(0)).toSet === matrix.map(_._1).toSet,
      "one metrics row per true language")
    metrics.foreach { r =>
      val lang = r.getString(0)
      val nTrue = matrix.filter(_._1 == lang).map(_._3).sum
      val nPred = matrix.filter(_._2 == lang).map(_._3).sum
      val tp = matrix.filter(m => m._1 == lang && m._2 == lang).map(_._3).sum
      assert(r.getAs[Long]("n_true") === nTrue, s"$lang n_true")
      assert(r.getAs[Long]("n_pred") === nPred, s"$lang n_pred")
      assert(r.getAs[Long]("tp") === tp, s"$lang tp")
      if (nPred == 0) assert(r.isNullAt(r.fieldIndex("prec")), s"$lang prec")
      else assert(math.abs(r.getAs[Double]("prec") - 1.0 * tp / nPred) < 1e-4)
      assert(math.abs(r.getAs[Double]("rec") - 1.0 * tp / nTrue) < 1e-4)
    }
    // the readout is non-degenerate on this corpus: some language scores,
    // and the never-predicted case (NULL precision, not 0/0 fiction) occurs
    assert(metrics.exists(r => !r.isNullAt(r.fieldIndex("f1")) &&
      r.getAs[Double]("f1") > 0))
    assert(metrics.exists(r => r.isNullAt(r.fieldIndex("prec"))))
  }

  test("q_order_gap matches a brute-force cadence recount") {
    val rows = Relational.qOrderGap.fn(spark, sf).collect()
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"),
        col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val seg = Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perCust = orders.groupBy(_._1).toSeq.collect {
      case (ck, os) if os.length >= 2 =>
        val sorted = os.sortBy(o => (o._2.toEpochDay, o._3))
        val gaps = sorted.sliding(2).collect {
          case Array(a, b) => b._2.toEpochDay - a._2.toEpochDay
        }.toSeq
        (seg(ck), gaps)
    }.toSeq
    val want = perCust.groupBy(_._1).map { case (sg, cs) =>
      val allGaps = cs.flatMap(_._2)
      sg -> (cs.length.toLong, allGaps.length.toLong, allGaps.max)
    }
    assert(rows.length === want.size)
    rows.foreach { r =>
      val (nc, ng, mx) = want(r.getString(0))
      assert(r.getLong(1) === nc, s"${r.getString(0)} n_customers")
      assert(r.getLong(2) === ng, s"${r.getString(0)} n_gaps")
      assert(r.getLong(4) === mx, s"${r.getString(0)} max_gap_days")
      val avg = perCust.filter(_._1 == r.getString(0)).flatMap(_._2)
      assert(math.abs(r.getDouble(3) - avg.sum.toDouble / avg.length) < 5e-3)
    }
  }

  test("q_yearly_growth: growth_pct matches the revenue lag per nation") {
    val g = Relational.qYearlyGrowth.fn(spark, sf).collect()
    // first year per nation carries NULL growth; later years match the lag
    g.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val byYear = rows.sortBy(_.getLong(1))
      assert(byYear.head.isNullAt(byYear.head.fieldIndex("growth_pct")))
      byYear.sliding(2).foreach {
        case Array(prev, cur) =>
          val expect = BigDecimal(
            100 * (cur.getAs[Double]("revenue") - prev.getAs[Double]("revenue"))
              / prev.getAs[Double]("revenue"))
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(cur.getAs[Double]("prev_revenue") === prev.getAs[Double]("revenue"))
          assert(math.abs(cur.getAs[Double]("growth_pct") - expect) < 1e-9,
            s"${cur.getString(0)} ${cur.getLong(1)}")
        case _ => ()
      }
    }
    assert(g.nonEmpty)
  }

  test("q_market_share: shares sum to 1 per (region, yr) and match the revenue ratio") {
    val rows = Relational.qMarketShare.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getString(0), r.getInt(2))).foreach { case (key, grp) =>
      val total = grp.map(r => BigDecimal(r.getAs[Double]("revenue"))).sum
      val shareSum = grp.map(_.getAs[Double]("share")).sum
      assert(math.abs(shareSum - 1.0) < 1e-4, s"$key shares sum to $shareSum")
      grp.foreach { r =>
        val expect = BigDecimal(r.getAs[Double]("revenue") / total.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getAs[Double]("share") - expect) < 1e-9, s"$key")
      }
    }
    // every region-year slice holds all and only its nations (5 per region
    // in the TPC-H layout) — a missing nation would silently inflate shares
    assert(rows.groupBy(r => (r.getString(0), r.getInt(2))).values
      .forall(g => g.map(_.getString(1)).distinct.length == g.length))
  }

  test("q_promo_share: pct matches the conditional split; promo never exceeds total") {
    val rows = Relational.qPromoShare.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val promo = r.getAs[Double]("promo_revenue")
      val total = r.getAs[Double]("revenue")
      assert(promo >= 0 && promo <= total, s"${r.getInt(0)}-${r.getInt(1)}")
      val expect = BigDecimal(100 * promo / total)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("promo_pct") - expect) < 1e-9)
    }
    // PROMO is one of six uniform type values — the share must be material
    // in some month, or the conditional aggregation silently dropped rows
    assert(rows.exists(_.getAs[Double]("promo_pct") > 5.0))
  }

  test("q_small_quantity: the threshold cut reconciles with a direct recount") {
    val rows = Relational.qSmallQuantity.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_small") > 0 &&
      r.getAs[Double]("avg_yearly") > 0))
    // recount below-threshold items from the raw tables with independent
    // (plain-double) math; Det's decimal path must agree on the count
    val li = Tables.lineitem(spark, sf)
    val thresh = li.groupBy(col("l_partkey").as("pk"))
      .agg((lit(0.2) * sum(col("l_quantity").cast("decimal(28,6)")).cast("double")
        / count(lit(1))).as("th"))
    val expect = li.join(thresh, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("th"))
      .join(Tables.part(spark, sf), col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getAs[Long]("n_small")).toMap
      === expect)
  }

  test("q_disjunctive: exactly the three predicate arms' brands survive") {
    val rows = Relational.qDisjunctive.fn(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq
      === Seq("Brand#14", "Brand#23", "Brand#5"))
    rows.foreach(r => assert(r.getAs[Long]("n_items") > 0 &&
      r.getAs[Double]("revenue") > 0))
  }

  test("q_top_supplier: exactly the argmax suppliers, ties kept") {
    val rows = Relational.qTopSupplier.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val byRev = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
      .groupBy("l_suppkey")
      .agg(Det.dsumRound(col("l_extendedprice") * (lit(1) - col("l_discount")), 2)
        .as("rev"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val top = byRev.values.max
    assert(rows.map(_.getAs[Double]("total_revenue")).forall(_ == top))
    assert(rows.map(_.getLong(0)).toSet
      === byRev.filter(_._2 == top).keySet)
  }

  test("q_cube_volume: every margin reconciles with its cells; flags never lie") {
    val rows = Relational.qCubeVolume.fn(spark, sf).collect()
    val cells = rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 0)
    val yrMargins = rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 1)
    val priMargins = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 0)
    val grand = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(grand.length === 1 && cells.nonEmpty)
    // a flag of 1 means that column is aggregated out (NULL), and only then
    rows.foreach { r =>
      assert(r.isNullAt(0) === (r.getInt(2) == 1), "yr flag")
      assert(r.isNullAt(1) === (r.getInt(3) == 1), "priority flag")
    }
    assert(grand.head.getAs[Long]("n_orders")
      === Tables.orders(spark, sf).count())
    yrMargins.foreach { m =>
      val mine = cells.filter(_.getInt(0) == m.getInt(0))
      assert(mine.map(_.getAs[Long]("n_orders")).sum
        === m.getAs[Long]("n_orders"), s"yr ${m.getInt(0)} margin")
    }
    priMargins.foreach { m =>
      val mine = cells.filter(_.getString(1) == m.getString(1))
      assert(mine.map(_.getAs[Long]("n_orders")).sum
        === m.getAs[Long]("n_orders"), s"priority ${m.getString(1)} margin")
    }
  }

  test("q_supplier_wait: numwait total = orders with >=2 suppliers and exactly 1 late") {
    val rows = Relational.qSupplierWait.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // no supplier appears twice; counts are positive and ordered
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    assert(rows.map(_.getAs[Long]("numwait")).forall(_ > 0))
    assert(rows.map(_.getAs[Long]("numwait")).toSeq
      === rows.map(_.getAs[Long]("numwait")).sortBy(-_).toSeq)
    // direct recomputation of the blamable-order count
    val perOrder = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .as("late"))
      .collect()
      .groupBy(_.getLong(0))
    val blamable = perOrder.values.count { ls =>
      val supps = ls.map(_.getLong(1)).distinct
      val lateSupps = ls.filter(_.getBoolean(2)).map(_.getLong(1)).distinct
      supps.length >= 2 && lateSupps.length == 1
    }
    assert(rows.map(_.getAs[Long]("numwait")).sum === blamable.toLong)
  }

  test("audit_volume_autocorr: Pearson reconciles with a direct recomputation") {
    val rows = graft.audit.AuditQueries.auditVolumeAutocorr.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.audit.AuditQueries.log(spark, sf)
      .groupBy(col("operation"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val op = r.getString(0); val lag = r.getInt(1)
      val byDay = daily(op).map(t => t._2 -> t._3).toMap
      val pairs = byDay.keys.toSeq.sorted
        .flatMap(d => byDay.get(d - lag).map(y => (byDay(d).toDouble, y.toDouble)))
      assert(r.getAs[Long]("n_pairs") === pairs.length.toLong, s"$op lag $lag pairs")
      if (!r.isNullAt(3)) {
        val k = pairs.length
        val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val direct = (k * sxy - sx * sy) /
          math.sqrt((k * sxx - sx * sx) * (k * syy - sy * sy))
        val got = r.getAs[Double]("autocorr")
        assert(math.abs(got - direct) < 1e-3, s"$op lag $lag: $got vs $direct")
        assert(math.abs(got) <= 1.0)
      }
    }
    // both lags published for every op present
    assert(rows.groupBy(_.getString(0)).values.forall(_.length == 2))
  }

  test("q_revenue_ma7: RANGE frame thins on calendar gaps and the mean replays") {
    val rows = Relational.qRevenueMa7.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    // brute-force: trailing 7 calendar days over the per-day revenues
    val byFlag = rows.groupBy(_._1)
    byFlag.foreach { case (_, rs) =>
      val days = rs.map(r => (java.time.LocalDate.parse(r._2).toEpochDay, r._3)).toMap
      rs.foreach { case (flag, dStr, _, ma7, nWin) =>
        val d = java.time.LocalDate.parse(dStr).toEpochDay
        val window = (d - 6 to d).flatMap(days.get)
        assert(nWin === window.length.toLong, s"$flag $dStr window width")
        val cents = window.map(v => math.round(v * 100)).sum
        val expect = ((2 * cents + nWin) / (2 * nWin)).toDouble / 100
        assert(math.abs(ma7 - expect) < 1e-9, s"$flag $dStr ma7")
      }
    }
    // the RANGE (not ROWS) semantics genuinely bites: some window spans < 7 days
    assert(rows.exists(_._5 < 7) && rows.exists(_._5 == 7L))
  }

  test("q_orders_backlog: sweep-line conserves orders; backlog never negative, drains to 0") {
    val rows = Relational.qOrdersBacklog.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("opened"),
        r.getAs[Long]("closed"), r.getAs[Long]("backlog_eom")))
    assert(rows.nonEmpty)
    // dense month grid, ordered
    assert(rows.map(_._1).sorted.toSeq === rows.map(_._1).toSeq)
    var bl = 0L
    rows.foreach { case (m, op, cl, eom) =>
      bl += op - cl
      assert(eom === bl, s"month $m")
      assert(eom >= 0, s"negative backlog at $m")
    }
    assert(bl === 0L, "every order must eventually ship")
    val nOrders = TestSession.spark.read
      .parquet(s"$sf/orders.parquet").count()
    assert(rows.map(_._2).sum === nOrders, "opened total = order count")
    // positive control: backlog is a real queue on this data, not always 0
    assert(rows.exists(_._4 > 0))
  }

  test("q_supplier_hhi: index bounded by its own algebra; effective count consistent") {
    val rows = Relational.qSupplierHhi.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_suppliers")
      val hhi = r.getAs[Double]("hhi")
      val top = r.getAs[Double]("top_share")
      // Σs² sits between the uniform floor 1/n and the monopoly cap 1,
      // and between top² (one term alone) and top (top·Σs)
      assert(hhi >= 1.0 / n - 1e-3 && hhi <= 1.0 + 1e-9, s"${r.getString(0)} hhi $hhi")
      assert(hhi >= top * top - 1e-3 && hhi <= top + 1e-3)
      val eff = r.getAs[Double]("eff_suppliers")
      assert(math.abs(eff - 1.0 / hhi) < 0.01)
      assert(eff <= n + 1e-6, "effective count never exceeds the real count")
    }
    // positive control: wherever a nation has >1 supplier, the index must
    // actually move off the monopoly value
    rows.filter(_.getAs[Long]("n_suppliers") > 1).foreach { r =>
      assert(r.getAs[Double]("hhi") < 1.0 - 1e-6, s"${r.getString(0)}")
    }
  }

  test("q_brand_rank_shift: ranks are a permutation per year; deltas replay; " +
    "no cross-gap comparison") {
    val rows = Relational.qBrandRankShift.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val byYear = rows.groupBy(_.getInt(0))
    byYear.foreach { case (yr, g) =>
      assert(g.map(_.getAs[Int]("rnk")).sorted.toSeq === (1 to g.length).toSeq, s"$yr")
      // rank order follows revenue desc (brand tiebreak)
      val sorted = g.sortBy(_.getAs[Int]("rnk"))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getAs[Double]("revenue") >= b.getAs[Double]("revenue"), s"$yr")
      }
    }
    val rankOf = rows.map(r => (r.getInt(0), r.getString(1)) -> r.getAs[Int]("rnk")).toMap
    rows.foreach { r =>
      val prev = rankOf.get((r.getInt(0) - 1, r.getString(1)))
      if (r.isNullAt(r.fieldIndex("prev_rnk"))) {
        assert(prev.isEmpty || !byYear.contains(r.getInt(0) - 1)
          || !rankOf.contains((r.getInt(0) - 1, r.getString(1))))
        assert(r.isNullAt(r.fieldIndex("rank_delta")))
        assert(r.getAs[Int]("mover") === 0)
      } else {
        assert(prev.contains(r.getAs[Int]("prev_rnk")))
        assert(r.getAs[Int]("rank_delta")
          === r.getAs[Int]("prev_rnk") - r.getAs[Int]("rnk"))
        assert((r.getAs[Int]("mover") == 1) === (math.abs(r.getAs[Int]("rank_delta")) >= 5))
      }
    }
    // positive control: the market genuinely reshuffles year to year
    assert(rows.exists(_.getAs[Int]("mover") == 1))
  }

  test("q_customer_migration: flows conserve the active populations on both ends") {
    val rows = Relational.qCustomerMigration.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val cy = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr")).count()
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val activeByYear = cy.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val years = rows.map(_.getInt(0)).distinct.sorted
    assert(years.last === activeByYear.keys.max - 1, "matrix stops before the last year")
    years.foreach { y =>
      val g = rows.filter(_.getInt(0) == y)
      val fromMass = g.filter(_.getString(1) != "none").map(_.getAs[Long]("n_customers")).sum
      assert(fromMass === activeByYear(y), s"$y outflow")
      val toMass = g.filter(_.getString(2) != "none").map(_.getAs[Long]("n_customers")).sum
      assert(toMass === activeByYear(y + 1), s"$y inflow")
      // no none->none cell: customers inactive on both ends are not a flow
      assert(!g.exists(r => r.getString(1) == "none" && r.getString(2) == "none"))
    }
    // positive control: churn and reactivation both genuinely occur
    assert(rows.exists(r => r.getString(1) != "none" && r.getString(2) == "none"))
    assert(rows.exists(r => r.getString(1) == "none" && r.getString(2) != "none"))
  }

  test("q_discount_impact: means and lifts replay from a direct recount") {
    val rows = Relational.qDiscountImpact.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(round(col("l_discount"), 2).as("d"), col("l_quantity"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val base = rows.find(_.getDouble(0) == 0.0).get.getAs[Double]("avg_qty")
    rows.foreach { r =>
      val g = li.filter(_._1 == r.getDouble(0))
      assert(r.getAs[Long]("n_lines") === g.length.toLong)
      val mean = (g.map(x => BigDecimal(x._2)).sum / g.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("avg_qty") - mean) < 1e-3)
      assert(math.abs(r.getAs[Double]("qty_lift") - r.getAs[Double]("avg_qty") / base) < 1e-3)
    }
    // totals partition the fact table
    assert(rows.map(_.getAs[Long]("n_lines")).sum === li.length.toLong)
  }

  test("doc_mixed_lang: doc mass conserved, mixed flag is the disagreement, synthetic switch detected") {
    val rows = SparkEntry.queries("doc_mixed_lang")(spark, sf).collect()
    // every document lands in exactly one (lang, head, tail) cell
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val mixed = r.getAs[String]("pred_head") != r.getAs[String]("pred_tail")
      assert(r.getAs[Long]("mixed") === (if (mixed) 1L else 0L))
    }
    assert(rows.exists(_.getAs[Long]("mixed") == 1L))
    assert(rows.exists(_.getAs[Long]("mixed") == 0L))
    // constructed code-switch: a doc whose halves are unambiguous en/es
    // text must land in the (en, es) cell; its pure twins on the diagonal
    val tmp = java.nio.file.Files.createTempDirectory("graft-mixed-lang-").toString
    import spark.implicits._
    Seq(
      (0L, "the the the the", "en", "s", 15L),
      (1L, "the the data data", "en", "s", 17L),
      (2L, "data data data data", "es", "s", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val syn = SparkEntry.queries("doc_mixed_lang")(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("mixed"))).toMap
    assert(syn(("en", "en", "en")) === ((1L, 0L)))
    assert(syn(("en", "en", "es")) === ((1L, 1L)))
    assert(syn(("es", "es", "es")) === ((1L, 0L)))
  }

  test("q_part_skyline: exactly the non-dominated set under brute-force dominance") {
    val rows = SparkEntry.queries("q_part_skyline")(spark, sf).collect()
    val got = rows.map(_.getAs[Long]("p_partkey")).toSet
    val parts = Tables.part(spark, sf)
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getAs[Int](2)))
    def dominated(a: (Long, Double, Int)) = parts.exists { b =>
      b._2 <= a._2 && b._3 >= a._3 && (b._2 < a._2 || b._3 > a._3)
    }
    // soundness: every published row is Pareto-optimal
    parts.filter(p => got(p._1)).foreach(p =>
      assert(!dominated(p), s"part ${p._1} is dominated"))
    // completeness: every non-published part is dominated by someone
    parts.filterNot(p => got(p._1)).foreach(p =>
      assert(dominated(p), s"part ${p._1} missing from skyline"))
    assert(rows.nonEmpty && rows.length < parts.length)
    // the frontier is strictly decreasing in size as price rises
    val sorted = rows.sortBy(_.getAs[Double]("p_retailprice"))
    val sizes = sorted.map(_.getAs[Long]("p_size"))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => b > a },
      "frontier sizes not strictly increasing with price")
  }
}
