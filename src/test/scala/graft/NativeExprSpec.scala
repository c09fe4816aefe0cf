package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-4 native expressions: graft_floor_search (sorted-array
  * binary search — the truncate-boundary lookup) and graft_l2sq
  * (left-to-right squared-L2 loop — the k-means/PQ distance kernel).
  * Each is pinned for (a) semantics against the declarative form it
  * replaced — which must be EXACTLY equal, the swap is supposed to be
  * invisible — and (b) codegen path coverage. */
class NativeExprSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def registered() = GraftFunctions.ensureRegistered(spark)

  test("floor_search matches array_max(filter(...)) on driven cases") {
    registered()
    val arr = Seq(10L, 20L, 30L, 40L)
    val probes = Seq(5L, 10L, 15L, 39L, 40L, 99L)
    val df = probes.toDF("v")
      .withColumn("ts", typedLit(arr))
      .withColumn("fast", expr("graft_floor_search(ts, v)"))
      .withColumn("slow", expr("array_max(filter(ts, t -> t <= v))"))
    assert(df.filter(!(col("fast") <=> col("slow"))).count() === 0)
    // explicit edge values
    val got = df.select("v", "fast").as[(Long, Option[Long])].collect().toMap
    assert(got(5L).isEmpty && got(10L).contains(10L) && got(15L).contains(10L)
      && got(39L).contains(30L) && got(40L).contains(40L) && got(99L).contains(40L))
  }

  test("floor_search: empty array returns NULL; interpreted eval agrees") {
    registered()
    val r = Seq(7L).toDF("v")
      .withColumn("ts", typedLit(Seq.empty[Long]))
      .selectExpr("graft_floor_search(ts, v)").head()
    assert(r.isNullAt(0))
    // interpreted path (direct eval, outside codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val e = graft.audit.ArrayFloorSearch(
      Literal.create(ArrayData.toArrayData(Array(10L, 20L)), ArrayType(LongType)),
      Literal(15L))
    assert(e.eval(null) === 10L)
    val none = graft.audit.ArrayFloorSearch(
      Literal.create(ArrayData.toArrayData(Array(10L, 20L)), ArrayType(LongType)),
      Literal(9L))
    assert(none.eval(null) === null)
  }

  test("l2sq is bit-identical to the zip_with/aggregate HOF on real embeddings") {
    registered()
    val e = Tables.embeddings(spark, sfDir)
      .select(expr("transform(embedding, x -> cast(x as double))").as("a"))
    val pairs = e.limit(50).crossJoin(
      e.limit(50).select(col("a").as("b")))
    val diff = pairs
      .withColumn("fast", expr("graft_l2sq(a, b)"))
      .withColumn("slow", expr(
        "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D, (p, q) -> p + q)"))
      .filter(col("fast") =!= col("slow")) // EXACT equality: same fold order
    assert(diff.count() === 0)
  }

  test("both expressions survive codegen (no interpreted fallback in plan)") {
    registered()
    // spark.range + id-dependent inputs: a plain local Seq would be
    // constant-folded into a LocalTableScan and never exercise codegen
    val df = spark.range(1)
      .selectExpr("array(1L + id, 5L + id) AS ts", "3L + id AS v",
        "array(1D + id, 2D) AS a", "array(3D, 4D + id) AS b")
      .selectExpr("graft_floor_search(ts, v) AS f", "graft_l2sq(a, b) AS l")
    df.collect()
    // `*(n)` prefixes mark WholeStageCodegen stages in the compact plan
    // string; both expressions must sit inside the starred Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_floor_search"), plan)
    assert(plan.contains("graft_l2sq"), plan)
    assert(df.head().getLong(0) === 1L && df.head().getDouble(1) === 8.0)
  }
}
