package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HierarchyOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  //      root
  //     /    \
  //    a      b
  //   / \      \
  //  c   d      e
  //      |
  //      f
  private lazy val edges = Seq(
    ("a", "root"), ("b", "root"), ("c", "a"), ("d", "a"), ("e", "b"), ("f", "d")
  ).toDF("child", "parent")

  test("ancestors walks to the root with nearest-first ordering") {
    val got = HierarchyOps.ancestors(edges, "child", "parent", maxDepth = 6)
      .collect().map(r => r.getString(0) ->
        (r.getSeq[String](1), r.getString(2), r.getInt(3))).toMap
    assert(got("f") == (Seq("d", "a", "root"), "root", 3))
    assert(got("c") == (Seq("a", "root"), "root", 2))
    assert(got("a") == (Seq("root"), "root", 1))
  }

  test("leafNodesByRoot collects exactly the leaves (reference getLeafNodes)") {
    val got = HierarchyOps.leafNodesByRoot(edges, "child", "parent")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got == Map("root" -> Seq("c", "e", "f")))
  }
}
