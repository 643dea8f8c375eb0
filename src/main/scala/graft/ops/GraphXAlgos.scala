package graft.ops

import graft.{GraphModel, Tables}
import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.graphx.lib.{LabelPropagation, ShortestPaths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.9 iterative graph analytics via GraphX (SURVEY.md §4.3: the one
  * genuinely non-Catalyst execution path — Pregel supersteps).
  *
  * All entries here are oracle=no (iterative float math / algorithmic
  * nondeterminism is not SQL-expressible); the scalatest suite asserts
  * invariants instead (rank mass conservation, known component
  * structure, triangle symmetry). Determinism measures: fixed iteration
  * counts (never tolerance-convergence), canonical edge direction before
  * triangle counting, rounded rank output.
  *
  * The DataFrame→RDD conversion happens only here, at the GraphX
  * boundary; results come back via createDataFrame so downstream stays
  * in Catalyst.
  */
object GraphXAlgos {

  /** PageRank, 10 fixed iterations, on the deduplicated directed graph.
    * Output: top-50 vertices by rounded rank (ties broken by id). */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = GraphModel.edgesCached(spark, dir)
      .select(col("src"), col("dst")).distinct().rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val g = Graph.fromEdges(edges, 0)
    val ranks = g.staticPageRank(10, 0.15).vertices
      .map { case (id, rank) => (id, math.rint(rank * 1e6) / 1e6) }
    ranks.toDF("id", "rank")
      .orderBy(col("rank").desc, col("id"))
      .limit(50)
  }

  /** Connected components (undirected semantics — GraphX CC ignores
    * direction): component label = min vertex id, deterministic.
    * Output: component sizes. */
  def connectedComponents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = GraphModel.graphx(spark, dir)
    g.connectedComponents().vertices
      .map { case (_, comp) => comp }
      .toDF("component")
      .groupBy(col("component")).agg(count(lit(1)).as("size"))
      .orderBy(col("size").desc, col("component"))
  }

  /** Triangle count over the part co-purchase projection: parts are
    * linked when they appear in the same order. Edges are canonicalized
    * (src < dst, deduplicated) as TriangleCount requires. Output:
    * per-triangle-count histogram (deterministic; per-vertex counts are
    * asserted in tests). */
  def triangleCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir).lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val copurchase = li.as("a")
      .join(li.as("b"), col("a.ok") === col("b.ok") &&
        col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .distinct()
    val edges = copurchase.rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val g = Graph.fromEdges(edges, 0)
    g.triangleCount().vertices
      .map { case (_, n) => n }
      .toDF("n_triangles")
      .groupBy(col("n_triangles")).agg(count(lit(1)).as("n_vertices"))
      .orderBy(col("n_triangles"))
  }

  /** Hop distance from the region-0 landmark (ShortestPaths follows
    * edge direction; our edges point child→parent, so this is the
    * distance from every vertex up to its region root). Single
    * landmark on purpose: ShortestPaths propagates a Map[landmark →
    * dist] per vertex, so message size — and Pregel wall-clock —
    * scales linearly with landmark count, and only region-0 distance
    * is consumed. */
  def shortestPaths(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = GraphModel.graphx(spark, dir)
    val landmarks = Seq(GraphModel.RegionOff)
    ShortestPaths.run(g, landmarks).vertices
      .flatMap { case (id, spmap) =>
        spmap.get(GraphModel.RegionOff).map(d => (id, d))
      }
      .toDF("id", "dist_to_region0")
      .orderBy(col("dist_to_region0"), col("id"))
  }

  /** Label propagation (5 fixed supersteps) on the membership
    * projection (IN edges: customer/supplier→nation→region) — the
    * subgraph with actual community structure. The full graph's
    * lineitem multi-edges blow up LPA's per-superstep label-map
    * shuffles for no analytical gain (measured 234 s vs ~1 s at sf0.1),
    * and LPA over degree-1 order chains is meaningless anyway.
    * Inherently unstable under parallelism — output reduced to the
    * community-size histogram; tests assert only invariants. */
  def labelPropagation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = GraphModel.edgesCached(spark, dir)
      .filter(col("rel") === "IN")
      .select(col("src"), col("dst")).distinct().rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val g = Graph.fromEdges(edges, 0)
    LabelPropagation.run(g, 5).vertices
      .map { case (_, label) => label }
      .toDF("label")
      .groupBy(col("label")).agg(count(lit(1)).as("size"))
      .select(col("size"))
      .groupBy(col("size")).agg(count(lit(1)).as("n_communities"))
      .orderBy(col("size"))
  }
}
