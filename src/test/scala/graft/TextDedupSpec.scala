package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Scale-shape guards for the dedup pipeline. */
class TextDedupSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("bowStarEdges is linear in group size (k-1 edges, not k²/2)") {
    // one 100-member duplicate group + one 3-member group + 5 singletons
    val rows =
      (1 to 100).map(i => (i.toLong, "g1")) ++
        (101 to 103).map(i => (i.toLong, "g2")) ++
        (104 to 108).map(i => (i.toLong, s"solo$i"))
    val bow = rows.toDF("doc_id", "fp")
    val edges = TextOps.bowStarEdges(bow)
    assert(edges.count() === 99L + 2L) // (k-1) per group, 0 per singleton
    // all edges go to the group min — the star root
    val roots = edges.select("a").distinct().as[Long].collect().sorted
    assert(roots.sameElements(Array(1L, 101L)))
  }

  test("star edges yield the same components as the all-pairs closure") {
    // star edges (1,2),(1,3) must connect {1,2,3} exactly like pair edges
    val bow = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y")).toDF("doc_id", "fp")
    val edges = TextOps.bowStarEdges(bow).as[(Long, Long)].collect().toSet
    assert(edges === Set((1L, 2L), (1L, 3L)))
    // reachability of every member from the root = one component
    val members = edges.flatMap { case (a, b) => Set(a, b) }
    assert(members === Set(1L, 2L, 3L))
  }
}
