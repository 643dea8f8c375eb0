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

  /** PageRank, 10 fixed iterations, on the deduplicated directed graph
    * (the memoized [[GraphModel.graphxCached]] build — same topology as
    * the old per-query `Graph.fromEdges` since every vertex is edge-
    * incident, without paying graph construction again). */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = GraphModel.graphxCached(spark, dir)
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
    val g = GraphModel.graphxCached(spark, dir)
    g.connectedComponents().vertices
      .map { case (_, comp) => comp }
      .toDF("component")
      .groupBy(col("component")).agg(count(lit(1)).as("size"))
      .orderBy(col("size").desc, col("component"))
  }

  /** Per-order co-occurrence fanout cap: at most this many distinct
    * parts per order enter the pair expansion (the corpus max is 7, so
    * no order is truncated at any tested SF — the cap exists so one hot
    * key can never go quadratic: pairs per order ≤ C(32,2) = 496). */
  val MaxOrderFanout = 32

  /** Canonical (src < dst, deduplicated) co-purchase pairs from an
    * (ok, pk) projection. One groupBy shuffle, no self-join: each
    * order's distinct parts are collected (capped, sorted — the cap
    * keeps the N smallest keys, deterministically), then expanded to
    * ordered pairs with higher-order lambdas. At 100 TB the old
    * `li ⋈ li ON ok` self-join shuffles the fact table twice and a hot
    * order produces O(fanout²) join rows inside the join; this shape
    * shuffles once, combines map-side, and bounds per-key work. */
  def copurchasePairs(li: DataFrame): DataFrame =
    li.groupBy(col("ok"))
      .agg(slice(sort_array(collect_set(col("pk"))), 1, MaxOrderFanout)
        .as("pks"))
      .select(explode(flatten(transform(col("pks"), (x, i) =>
        transform(slice(col("pks"), i + lit(2), size(col("pks"))),
          y => struct(x.as("src"), y.as("dst")))))).as("e"))
      .select(col("e.src"), col("e.dst"))
      .distinct()

  /** Triangle count over the part co-purchase projection: parts are
    * linked when they appear in the same order. Edges are canonicalized
    * (src < dst, deduplicated) as TriangleCount requires. Output:
    * per-triangle-count histogram (deterministic; per-vertex counts are
    * asserted in tests). */
  def triangleCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val copurchase = copurchasePairs(Tables(spark, dir).lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")))
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
    val g = GraphModel.graphxCached(spark, dir)
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
