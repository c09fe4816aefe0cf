package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"/tmp/graft-warehouse-${sys.props("user.name")}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

/** Every registered operator must build a plan and execute at sf0.001.
  * (Value-level correctness is gated by the DuckDB oracle compare —
  * tools/check.py — which hash-matches each query at sf0.01.) */
class QueriesSmokeSpec extends AnyFunSuite {
  import TestSession._

  test("registry is consistent: every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001 and returns rows") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  // Contract: no operator's physical plan may contain a CartesianProduct —
  // the shape that turns a 100 TB input into an unbounded pair space. The
  // deliberate small-side products (1-row broadcast of a midpoint/T-set,
  // broadcast codebooks/query sets) plan as BroadcastNestedLoopJoin over a
  // bounded build side, never CartesianProduct.
  SparkEntry.oracleSql.keySet.toSeq.sorted.foreach { name =>
    test(s"$name plans without a CartesianProduct") {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plan:\n$plan")
    }
  }

  // Contract: oracled queries never emit complex-typed output columns —
  // the downstream pandas-based hash compare cannot hash ndarray cells
  // (the r02 emb_quantize crash). Serialize arrays before the final select.
  SparkEntry.oracleSql.keySet.toSeq.sorted.foreach { name =>
    test(s"$name emits only scalar output columns") {
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      val schema = SparkEntry.queries(name)(spark, sfDir).schema
      val complex = schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType]
          || f.dataType.isInstanceOf[MapType]
          || f.dataType.isInstanceOf[StructType] => f.name
      }
      assert(complex.isEmpty, s"$name emits complex columns: ${complex.mkString(",")}")
    }
  }
}
