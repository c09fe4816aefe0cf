package graft

import graft.analytics.Bands
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketized range join must equal the naive range join exactly,
  * including values on band edges and bands not aligned to buckets. */
class BandsSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("banded range join equals naive range join") {
    val fact = Tables.lineitem(spark, TestSession.sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    // deliberately bucket-unaligned bands, overlapping a bucket boundary
    val bands = Seq(("lo", 900.0, 33333.0), ("hi", 33333.0, 120000.0))
      .toDF("band", "lo", "hi")
    val naive = fact.join(broadcast(bands),
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .select("l_orderkey", "l_linenumber", "band")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val banded = Bands.rangeJoin(fact, bands, "l_extendedprice", "lo", "hi", 10000.0)
      .select("l_orderkey", "l_linenumber", "band")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    assert(banded.toSeq === naive.toSeq)
  }

  test("edge values land in the [lo, hi) band only") {
    val fact = Seq(0.0, 10.0, 19.999999, 20.0).toDF("v")
    val bands = Seq(("a", 0.0, 20.0), ("b", 20.0, 40.0)).toDF("band", "lo", "hi")
    val got = Bands.rangeJoin(fact, bands, "v", "lo", "hi", 7.0)
      .select("v", "band").collect().map(r => (r.getDouble(0), r.getString(1))).sorted
    assert(got.toSeq === Seq((0.0, "a"), (10.0, "a"), (19.999999, "a"), (20.0, "b")))
  }
}
