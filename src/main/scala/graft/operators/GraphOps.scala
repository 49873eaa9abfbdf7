package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Unbounded-depth graph reachability by pointer doubling — the general form
 * of the reference's graph-store traversals (Neo4j node/relation walks,
 * jobs-core Neo4JUtil.scala:34-94; relation-cache ancestor chains,
 * RelationCacheUpdater.scala:100-185). [[HierarchyOps]] covers the
 * reference's BOUNDED hierarchies (2-4 fixed join steps); this operator is
 * the scale path when depth is unknown or large.
 *
 * Scale design: each iteration jumps every node to its 2^k-step ancestor by
 * self-joining the pointer table with itself, so a depth-D chain converges
 * in ceil(log2 D) shuffles instead of D — the textbook path-doubling
 * recurrence, and the reason a 100-deep chain costs 7 joins, not 100.
 * Lineage is truncated per iteration with `localCheckpoint` (as in
 * [[graft.operators.DedupOps.connectedComponents]]); the convergence count
 * rides the same materialization. Cycles never converge by construction —
 * `maxIters` bounds them and the unfinished rows are dropped with a logged
 * count (a root pointer for a cycle member would be arbitrary, not wrong in
 * a benign way).
 */
object GraphOps {

  /** For every non-root node of a forest `edges(child -> parent)`: its
    * terminal ancestor (`root` — a node that never appears as a child) and
    * the exact path length to it (`depth`). Output: (node, root, depth). */
  def rootAndDepth(
      edges: DataFrame, childCol: String, parentCol: String,
      maxIters: Int = 40): DataFrame = {
    // Each iteration eagerly checkpoints E rows; without releasing the
    // previous generation, ceil(log2 D) full copies of the pointer table
    // would pile up in the block manager. localCheckpoint's storage is not
    // reachable through Dataset.unpersist, so each generation's backing RDD
    // is taken straight off the checkpointed plan (GraftBridge) and released
    // once the next one is materialized — never a getPersistentRDDs keyset
    // diff, which would capture (and later kill) checkpoints persisted
    // concurrently by other threads on the shared context.
    def checkpointEager(df: DataFrame)
        : (DataFrame, Option[org.apache.spark.rdd.RDD[_]]) = {
      val d = df.localCheckpoint(true)
      (d, org.apache.spark.sql.graft.GraftBridge.checkpointedRdd(d))
    }
    def release(r: Option[org.apache.spark.rdd.RDD[_]]): Unit =
      r.foreach(_.unpersist(blocking = false))
    // ptr(node, anc, d): anc is node's 2^k-step ancestor — or its root, if
    // the root is nearer; d = the true number of steps anc is away.
    var (ptr, ptrIds) = checkpointEager(edges
      .select(col(childCol).as("node"), col(parentCol).as("anc"))
      .withColumn("d", lit(1L)))
    var iter = 0
    var moved = 1L
    while (moved > 0 && iter < maxIters) {
      val hop = ptr.select(
        col("node").as("anc"), col("anc").as("_anc2"), col("d").as("_d2"))
      // A miss on the join means `anc` has no outgoing pointer: it IS the
      // root, and the row stops advancing (coalesce keeps it fixed).
      val (next, nextIds) = checkpointEager(ptr.join(hop, Seq("anc"), "left")
        .select(col("node"),
          coalesce(col("_anc2"), col("anc")).as("anc"),
          (col("d") + coalesce(col("_d2"), lit(0L))).as("d"),
          col("_anc2").isNotNull.as("_moved")))
      moved = next.filter(col("_moved")).count()
      release(ptrIds)
      ptr = next.drop("_moved")
      ptrIds = nextIds
      iter += 1
    }
    if (moved > 0)
      System.err.println(s"[GraphOps] $moved pointer(s) still moving after " +
        s"$maxIters doubling iterations (cycle or >2^$maxIters depth) — " +
        "dropping them from the result")
    // rows still moving at the cap sit on a cycle (or an absurd depth):
    // exclude them rather than reporting a non-terminal "root"
    val done = if (moved == 0) ptr
      else {
        val children = edges.select(col(childCol).as("anc")).distinct()
        ptr.join(children, Seq("anc"), "left_anti")
      }
    done.select(col("node"), col("anc").as("root"), col("d").as("depth"))
  }
}
