package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TokenizerOps

/** Guards for the iterative BPE trainer: the merge choice must replay
  * against an independent pair recount, and the token-count trajectory
  * must obey the BPE accounting identities. */
class BpeIterateSpec extends AnyFunSuite {
  import TestSession._

  private val sf = "/root/testdata/sf0.001"

  test("bpe_merge_iterate: argmax replays; token accounting holds; max is non-increasing") {
    val rows = TokenizerOps.bpeMergeIterate.fn(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3))

    // round-1 merge must be the true corpus argmax pair (independent recount)
    val top = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .filter(length(col("word")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(1).head
    assert(rows.head.getAs[String]("merged") === top.getString(0))
    assert(rows.head.getAs[Long]("pair_count") === top.getLong(1))

    // chaining: each round starts where the previous ended
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("tokens_after") === b.getAs[Long]("tokens_before"))
      case _ =>
    }
    rows.foreach { r =>
      val before = r.getAs[Long]("tokens_before")
      val after = r.getAs[Long]("tokens_after")
      val cnt = r.getAs[Long]("pair_count")
      // each realized merge removes exactly one symbol; overlapping
      // occurrences are counted in pair_count but not all merge, so
      // the reduction is bounded by the count and must be positive
      assert(after < before, s"round ${r.getInt(0)} merged nothing")
      assert(before - after <= cnt)
      assert(r.getAs[String]("merged")
        === r.getAs[String]("merge_left") + r.getAs[String]("merge_right"))
    }
    // BPE invariant: merging cannot create a pair heavier than the one
    // just merged, so the chosen max is non-increasing
    val cnts = rows.map(_.getAs[Long]("pair_count")).toSeq
    assert(cnts.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true },
      s"argmax grew: $cnts")
  }
}
