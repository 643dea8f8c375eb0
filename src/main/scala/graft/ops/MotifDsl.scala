package graft.ops

import graft.GraphModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tiny motif query front-end: compile a GraphFrames-style pattern
  * string into chained equi-joins against the edge table, so a user can
  * express a NEW traversal without hand-writing a plan.
  *
  * Grammar (one edge term per `;`):
  * {{{
  *   pattern := term (';' term)*
  *   term    := '(' name ')' '-[' (':' relType)? ']->' '(' name ')'
  * }}}
  * e.g. `(o)-[:BY]->(c);(c)-[:IN]->(n)` — orders to their customer's
  * nation. Node names repeated across terms bind the terms together
  * (each shared name becomes an equi-join key); a term sharing no name
  * with the part already compiled is rejected rather than silently
  * cross-joined. Output: one BIGINT vertex-id column per node name,
  * alphabetical.
  *
  * Compilation is purely declarative — each term scans the (persisted)
  * edge table with its rel filter pushed down, and Catalyst/AQE pick
  * join order and strategy. At 100 TB with the edge table bucketed on
  * (src, dst), every hop join is co-located, same as the hand-written
  * traversals in [[GraphOps]].
  */
object MotifDsl {

  final case class EdgeTerm(src: String, rel: Option[String], dst: String)

  private val Term = """\((\w+)\)-\[(?::(\w+))?\]->\((\w+)\)""".r

  def parse(pattern: String): Seq[EdgeTerm] =
    pattern.split(";").toIndexedSeq.map(_.trim).map {
      case Term(s, r, d) =>
        require(s != d, s"self-loop terms unsupported: ($s)->($d)")
        EdgeTerm(s, Option(r), d)
      case t =>
        throw new IllegalArgumentException(s"bad motif term: '$t'")
    }

  /** Compile `pattern` against an edge table with (src, dst, rel). */
  def compile(edges: DataFrame, pattern: String): DataFrame = {
    val terms = parse(pattern)
    require(terms.nonEmpty, "empty pattern")
    var bound = Vector.empty[String]
    var result: DataFrame = null
    terms.foreach { t =>
      val filtered = t.rel.fold(edges)(r => edges.filter(col("rel") === r))
      val proj = filtered.select(col("src").as(t.src), col("dst").as(t.dst))
      if (result == null) result = proj
      else {
        val keys = Seq(t.src, t.dst).filter(bound.contains)
        require(keys.nonEmpty,
          s"term (${t.src})->(${t.dst}) shares no node with the pattern " +
            "so far — reorder terms or connect it (cross joins refused)")
        result = result.join(proj, keys)
      }
      bound = (bound ++ Seq(t.src, t.dst)).distinct
    }
    result.select(bound.sorted.map(col): _*)
  }

  /** Registered DSL exhibit 1 — a 2-hop chain: every order, its
    * customer, and the customer's nation. */
  def motifChain2hop(spark: SparkSession, dir: String): DataFrame =
    compile(GraphModel.edgesCached(spark, dir),
      "(o)-[:BY]->(c);(c)-[:IN]->(n)")
      .orderBy(col("c"), col("n"), col("o"))

  /** Registered DSL exhibit 2 — a V-shape (two edges into a shared
    * node): customer/supplier pairs co-located in one nation. */
  def motifVeeSharedNation(spark: SparkSession, dir: String): DataFrame =
    compile(GraphModel.edgesCached(spark, dir),
      "(c)-[:IN]->(n);(s)-[:IN]->(n)")
      // both IN-edge kinds land in each role: keep customer→nation on
      // the left leg and supplier→nation on the right (id namespaces)
      .filter(col("c").between(GraphModel.CustomerOff,
        GraphModel.SupplierOff - 1))
      .filter(col("s") >= GraphModel.SupplierOff)
      .orderBy(col("c"), col("n"), col("s"))
}
