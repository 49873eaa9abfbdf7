package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pointer-doubling reachability: agrees with a naive walk, converges in
  * O(log depth) iterations, and refuses to invent roots for cycles. */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naiveRootDepth(parent: Map[Long, Long], node: Long): (Long, Long) = {
    var cur = node; var d = 0L
    while (parent.contains(cur)) { cur = parent(cur); d += 1 }
    (cur, d)
  }

  test("matches a naive ancestor walk on a two-tree random forest") {
    // tree A rooted at 1 (the q50 construction), tree B rooted at 1001
    val parent: Map[Long, Long] =
      ((2L to 400L).map(i => i -> ((i * 48271) % (i - 1) + 1)) ++
        (1002L to 1200L).map(i => i -> ((i * 37) % (i - 1001) + 1001))).toMap
    val edges = parent.toSeq.toDF("child", "parent")
    val got = GraphOps.rootAndDepth(edges, "child", "parent").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == parent.keySet)
    parent.keys.foreach { n =>
      assert(got(n) == naiveRootDepth(parent, n), s"node $n")
    }
    assert(got.filter(_._1 > 1000).values.forall(_._1 == 1001L))
  }

  test("a 200-deep chain converges within 10 doubling iterations") {
    // linear chaining would need 199 joins; 2^8 = 256 > 200 covers it —
    // maxIters = 10 FAILS unless the doubling recurrence is real
    val edges = (2L to 201L).map(i => (i, i - 1)).toDF("child", "parent")
    val got = GraphOps.rootAndDepth(edges, "child", "parent", maxIters = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == 200)
    assert(got(201L) == (1L, 200L) && got(2L) == (1L, 1L) &&
      got(101L) == (1L, 100L))
  }

  test("cycle members are dropped, chain members survive") {
    val edges = Seq((2L, 1L), (3L, 2L), // chain -> root 1
      (10L, 11L), (11L, 10L)) // 2-cycle: no root exists
      .toDF("child", "parent")
    val got = GraphOps.rootAndDepth(edges, "child", "parent", maxIters = 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(2L -> (1L, 1L), 3L -> (1L, 2L)))
  }
}
