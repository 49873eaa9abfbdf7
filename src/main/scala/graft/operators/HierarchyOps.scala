package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bounded-depth hierarchy flattening: the reference's one non-relational
 * operator (RelationCacheUpdater.scala:100-185 — recursive JSON hierarchy
 * walk producing leaf-node and ancestor sets, cached as Redis sets) restated
 * as an iterative DataFrame self-join over an edge table.
 *
 * Scale design: depth iterations are a driver-side loop over DataFrame ops
 * (no driver data); each step is one equi-join on the child key. For the
 * bounded depths the reference handles (course hierarchies, conversation →
 * turn rollups) this is 2-4 joins; the result is a broadcastable dimension.
 */
object HierarchyOps {

  /** Transitive ancestors: edges(child, parent) → (node, ancestors array
    * ordered nearest-first, root, depth). Performs exactly `maxDepth - 1`
    * bounded join steps (no mid-plan actions; bounded depth also makes
    * accidental cycles terminate). */
  def ancestors(edges: DataFrame, childCol: String, parentCol: String,
                maxDepth: Int = 10): DataFrame = {
    val parentOf = edges.select(col(childCol).as("_tip"), col(parentCol).as("_gp"))
    var cur = edges.select(col(childCol).as("node"), col(parentCol).as("_tip"))
      .withColumn("ancestors", array(col("_tip")))
    for (_ <- 1 until maxDepth) {
      cur = cur.join(parentOf, Seq("_tip"), "left")
        .select(col("node"),
          coalesce(col("_gp"), lit(null)).as("_tip"),
          when(col("_gp").isNotNull, concat(col("ancestors"), array(col("_gp"))))
            .otherwise(col("ancestors")).as("ancestors"))
    }
    cur.select(col("node"), col("ancestors"),
      element_at(col("ancestors"), -1).as("root"),
      size(col("ancestors")).as("depth"))
  }

  /** Leaf nodes per root: nodes that never appear as a parent, grouped by
    * their transitive root (reference: getLeafNodes,
    * RelationCacheUpdater.scala:100-127). */
  def leafNodesByRoot(edges: DataFrame, childCol: String, parentCol: String): DataFrame = {
    val anc = ancestors(edges, childCol, parentCol)
    val parents = edges.select(col(parentCol).as("node")).distinct()
    anc.join(parents, Seq("node"), "left_anti")
      .groupBy("root")
      .agg(sort_array(collect_set("node")).as("leaf_nodes"))
  }
}
