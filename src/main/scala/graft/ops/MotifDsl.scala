package graft.ops

import graft.GraphModel
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tiny motif query front-end: compile a GraphFrames-style pattern
  * string into chained equi-joins against the edge table, so a user can
  * express a NEW traversal without hand-writing a plan.
  *
  * Grammar (one edge term per `;`):
  * {{{
  *   pattern := term (';' term)*
  *   term    := ('?' | '!')? '(' name ')' '-[' binding? (':' relType)? ']->' '(' name ')'
  * }}}
  * e.g. `(o)-[:BY]->(c);(c)-[:IN]->(n)` — orders to their customer's
  * nation. Node names repeated across terms bind the terms together
  * (each shared name becomes an equi-join key); a term sharing no name
  * with the part already compiled is rejected rather than silently
  * cross-joined. Output: one BIGINT vertex-id column per node name,
  * alphabetical.
  *
  * A `?`-prefixed term is an OPTIONAL MATCH: it compiles to a LEFT
  * OUTER join, keeping every row matched so far and null-extending the
  * term's new node columns where the edge is absent. A `!`-prefixed
  * term is a NEGATION ("no such edge exists"): it compiles to an ANTI
  * join on the shared nodes, and its exclusively-local nodes are
  * existentially quantified — they never appear in the output. The
  * first term must be a plain match (there is nothing to be optional
  * or negated against yet). Both are the same shuffled/broadcast hash
  * joins as the plain terms — at 100 TB an anti join on a bucketed
  * edge table co-locates exactly like the equi-join it complements.
  *
  * Compilation is purely declarative — each term scans the (persisted)
  * edge table with its rel filter pushed down, and Catalyst/AQE pick
  * join order and strategy. At 100 TB with the edge table bucketed on
  * (src, dst), every hop join is co-located, same as the hand-written
  * traversals in [[GraphOps]].
  */
object MotifDsl {

  final case class EdgeTerm(src: String, rel: Option[String], dst: String,
    minHops: Int = 1, maxHops: Int = 1,
    optional: Boolean = false, negated: Boolean = false,
    binding: Option[String] = None)

  private val Term =
    """([?!])?\((\w+)\)-\[(\w+)?(?::(\w+))?(?:\*(\d+)\.\.(\d+))?\]->\((\w+)\)""".r

  /** Max expansion of a `*min..max` var-length term — keeps a typo'd
    * pattern from compiling an enormous union of join chains. */
  val MaxVarHops = 8

  def parse(pattern: String): Seq[EdgeTerm] =
    pattern.split(";").toIndexedSeq.map(_.trim).map {
      case Term(pre, s, b, r, lo, hi, d) =>
        require(s != d, s"self-loop terms unsupported: ($s)->($d)")
        val (mn, mx) =
          if (lo == null) (1, 1) else (lo.toInt, hi.toInt)
        require(mn >= 1 && mx >= mn && mx <= MaxVarHops,
          s"bad hop range *$lo..$hi (need 1 <= min <= max <= $MaxVarHops)")
        if (b != null) {
          // an edge binding names one concrete edge: a var-length term
          // traverses many, a negated term matches none — neither can
          // bind its properties
          require(mx == 1,
            s"edge binding '$b' on a var-length term cannot bind")
          require(pre != "!",
            s"edge binding '$b' on a negated term cannot bind " +
              "(the matched rows are exactly those with NO such edge)")
        }
        EdgeTerm(s, Option(r), d, mn, mx,
          optional = pre == "?", negated = pre == "!",
          binding = Option(b))
      case t =>
        throw new IllegalArgumentException(s"bad motif term: '$t'")
    }

  /** One term's pair set. Fixed single hop = a plain edge projection
    * (multi-edges preserved); a `*min..max` var-length term compiles to
    * the UNION of min..max chained joins with DISTINCT — reachability
    * semantics, where each hop is an equi-join the optimizer places
    * like any other (bucketed edge table ⇒ co-located at scale). */
  /** Edge properties bindable through `[r:REL]` terms — the columns of
    * [[GraphModel.edgesProps]] beyond (src, dst, rel). */
  val EdgeProps = Seq("qty", "amt_c", "status")

  private def termPairs(edges: DataFrame, t: EdgeTerm): DataFrame = {
    val base = t.rel.fold(edges)(r => edges.filter(col("rel") === r))
    if (t.minHops == 1 && t.maxHops == 1) t.binding match {
      case Some(b) =>
        require(EdgeProps.forall(base.columns.contains),
          s"edge binding '$b' needs a property-carrying edge table " +
            s"(${EdgeProps.mkString(", ")}) — compile against " +
            "GraphModel.edgesProps")
        base.select(col("src").as(t.src) +: col("dst").as(t.dst) +:
          EdgeProps.map(p => col(p).as(s"${b}_$p")): _*)
      case None =>
        base.select(col("src").as(t.src), col("dst").as(t.dst))
    } else {
      val hops = (t.minHops to t.maxHops).map { len =>
        var acc = base.select(col("src").as("_a"), col("dst").as("_b"))
        for (_ <- 2 to len) {
          acc = acc.join(
            base.select(col("src").as("_m"), col("dst").as("_c")),
            col("_b") === col("_m"))
            .select(col("_a"), col("_c").as("_b"))
        }
        acc
      }
      hops.reduce(_ unionByName _).distinct()
        .select(col("_a").as(t.src), col("_b").as(t.dst))
    }
  }

  /** Compile `pattern` against an edge table with (src, dst, rel) —
    * plus the [[EdgeProps]] columns when the pattern carries `[r:REL]`
    * edge bindings. Output: one BIGINT column per node name
    * (alphabetical), then one `<binding>_<prop>` column per bound edge
    * property (alphabetical). */
  def compile(edges: DataFrame, pattern: String): DataFrame = {
    val terms = parse(pattern)
    require(terms.nonEmpty, "empty pattern")
    val nodeNames = terms.flatMap(t => Seq(t.src, t.dst)).toSet
    terms.flatMap(_.binding).groupBy(identity).foreach { case (b, bs) =>
      require(bs.size == 1, s"edge binding '$b' bound more than once")
      require(!nodeNames.contains(b),
        s"edge binding '$b' collides with a node name")
    }
    var bound = Vector.empty[String]
    var boundProps = Vector.empty[String]
    var result: DataFrame = null
    terms.foreach { t =>
      val proj = termPairs(edges, t)
      val props = t.binding.toSeq.flatMap(b => EdgeProps.map(p => s"${b}_$p"))
      if (result == null) {
        require(!t.optional && !t.negated,
          "first term must be a plain match (nothing precedes it to " +
            "be optional or negated against)")
        result = proj
        bound = (bound ++ Seq(t.src, t.dst)).distinct
        boundProps ++= props
      } else {
        val keys = Seq(t.src, t.dst).filter(bound.contains)
        require(keys.nonEmpty,
          s"term (${t.src})->(${t.dst}) shares no node with the pattern " +
            "so far — reorder terms or connect it (cross joins refused)")
        if (t.negated)
          // anti join on the shared nodes; the term's local-only nodes
          // are existentially quantified and never bind
          result = result.join(proj, keys, "left_anti")
        else {
          result = result.join(proj, keys,
            if (t.optional) "left_outer" else "inner")
          bound = (bound ++ Seq(t.src, t.dst)).distinct
          boundProps ++= props
        }
      }
    }
    result.select((bound.sorted ++ boundProps.sorted).map(col): _*)
  }

  // literal grammar: single-quoted, SQL-style '' escape for an
  // embedded apostrophe ('O''Brien')
  private val Cond = """(\w+)\.(\w+)\s*=\s*'((?:[^']|'')*)'""".r

  // edge-binding predicate: any comparison operator, string OR integer
  // literal (edge props are BIGINT or STRING — money is integer cents,
  // so a numeric threshold needs no decimal grammar)
  private val CondEdge =
    """(\w+)\.(\w+)\s*(<=|>=|!=|<>|=|<|>)\s*('(?:[^']|'')*'|-?\d+)""".r

  /** Appended to the WHERE/AND split regexes: the keyword only splits
    * when an EVEN number of single quotes follows it — i.e. it sits
    * outside any string literal. A literal like 'R AND D' or
    * 'NOT WHERE' is left intact. */
  private val outsideQuotes = "(?=(?:[^']*'[^']*')*[^']*$)"

  /** Vertex properties usable in WHERE conditions (the derived graph's
    * property bag — [[GraphModel.vertices]]). */
  private val Props = Set("kind", "name")

  /** Compile a full query `pattern [WHERE cond [AND cond]*]` against
    * the derived graph — the property-predicate extension of the motif
    * front-end. Each condition is an equality on a bound node's vertex
    * property (`kind` / `name`), e.g.
    * {{{ (c)-[:IN]->(n);(o)-[:BY]->(c) WHERE n.name = 'NATION_7' }}}
    * and compiles to a join of the matched id column against the
    * vertex-property frame plus a pushed filter. The property frame is
    * filtered BEFORE the join — at 100 TB that is a selective
    * broadcast-semi-join per predicate (the standard property-pushdown
    * shape of a graph query planner), never a full property scan
    * carried through the traversal. */
  private val RetCount = """(?i)count\s*\(\s*(\w+)\s*\)""".r
  private val RetProp = """(\w+)\.(\w+)""".r
  private val RetName = """(\w+)""".r

  def compileQuery(spark: SparkSession, dir: String,
      query: String): DataFrame = {
    // strip the RETURN clause first (also quote-aware), then WHERE
    val retSplit = query.split("(?i)\\s+RETURN\\s+" + outsideQuotes, 2)
    val parts = retSplit(0).split("(?i)\\s+WHERE\\s+" + outsideQuotes, 2)
    // edge bindings need the property-carrying frame; patterns without
    // them keep joining the persisted (src, dst, rel)-only cache
    val pattern = parts(0).trim
    val frame =
      if (parse(pattern).exists(_.binding.isDefined))
        GraphModel.edgesPropsCached(spark, dir)
      else GraphModel.edgesCached(spark, dir)
    val df = compile(frame, pattern)
    val filtered =
      if (parts.length == 1) df
      else parts(1).split("(?i)\\s+AND\\s+" + outsideQuotes)
        .map(_.trim).foldLeft(df) {
        // an edge-binding predicate filters the bound `<r>_<prop>`
        // column directly — Catalyst pushes it through the hop joins
        // into the one parquet scan that feeds the bound term
        case (acc, CondEdge(node, prop, op, rhs))
            if df.columns.contains(s"${node}_$prop") =>
          val c = col(s"${node}_$prop")
          val v: Column =
            if (rhs.startsWith("'"))
              lit(rhs.substring(1, rhs.length - 1).replace("''", "'"))
            else lit(rhs.toLong)
          acc.filter(op match {
            case "="          => c === v
            case "!=" | "<>"  => c =!= v
            case "<"          => c < v
            case "<="         => c <= v
            case ">"          => c > v
            case ">="         => c >= v
          })
        case (acc, Cond(node, prop, value)) =>
          require(df.columns.contains(node),
            s"WHERE references unbound node '$node'")
          require(Props.contains(prop),
            s"unknown property '$prop' (have: ${Props.mkString(", ")})")
          val ids = GraphModel.vertices(spark, dir)
            .filter(col(prop) === value.replace("''", "'"))
            .select(col("id").as(s"__${node}_id"))
          acc.join(broadcast(ids), col(node) === col(s"__${node}_id"),
              "left_semi")
        case (_, CondEdge(node, prop, _, _)) =>
          throw new IllegalArgumentException(
            s"WHERE references unbound edge property '$node.$prop' " +
              s"(bind the edge as [$node:REL] and use one of: " +
              s"${EdgeProps.mkString(", ")})")
        case (_, c) =>
          throw new IllegalArgumentException(
            s"bad WHERE condition: '$c' (need node.prop = 'literal' " +
              "or edge.prop <op> literal)")
      }
    if (retSplit.length == 1) filtered
    else applyReturn(spark, dir, filtered, retSplit(1))
  }

  /** RETURN clause: `RETURN item (, item)*` with item = a bound node
    * name (group/projection key), `node.prop` (a vertex-property
    * projection — the id column is resolved against the property bag
    * via a broadcast join, output column `<node>_<prop>`), or
    * `count(name)` (aggregate). Names/properties alone project the
    * per-match rows; mixing them with counts compiles to
    * groupBy(keys).agg(counts) — the grouped-traversal shape
    * (`orders per nation name`) a graph query language returns
    * without the caller hand-writing the aggregation plan. Aggregate
    * columns are named `count_<node>`. Deterministic total order on
    * the output keys. */
  private def applyReturn(spark: SparkSession, dir: String,
      df0: DataFrame, ret: String): DataFrame = {
    val items = ret.split(",").map(_.trim)
    require(items.nonEmpty && items.forall(_.nonEmpty),
      s"empty RETURN clause")
    // every item must parse as a node name, node.prop, or count(node)
    // — an unparseable item throws like the WHERE branch, instead of
    // silently vanishing from the projection
    sealed trait Item
    case class Key(n: String) extends Item
    case class Prop(n: String, p: String) extends Item
    case class Cnt(n: String) extends Item
    val parsed: Seq[Item] = items.toSeq.map {
      case RetCount(n) => Cnt(n)
      case RetProp(n, p) => Prop(n, p)
      case RetName(n) => Key(n)
      case i => throw new IllegalArgumentException(
        s"bad RETURN item: '$i' (need node, node.prop or count(node))")
    }
    parsed.foreach {
      case Key(n) => require(df0.columns.contains(n),
        s"RETURN references unbound node '$n'")
      case Cnt(n) => require(df0.columns.contains(n),
        s"RETURN references unbound node '$n'")
      case Prop(n, p) if df0.columns.contains(s"${n}_$p") =>
        // an edge binding's property — already carried by the compiled
        // frame, no resolution join needed
      case Prop(n, p) =>
        require(df0.columns.contains(n),
          s"RETURN references unbound node '$n'")
        require(Props.contains(p),
          s"unknown property '$p' (have: ${Props.mkString(", ")})")
    }
    // resolve each distinct node.prop through ONE broadcast join
    // against the vertex-property bag — the property-fetch step of a
    // graph query's RETURN, never a full property scan per row (edge
    // props skip this: their column is already in the frame)
    val props = parsed.collect {
      case Prop(n, p) if !df0.columns.contains(s"${n}_$p") => (n, p)
    }.distinct
    val df = props.foldLeft(df0) { case (acc, (n, p)) =>
      val bag = GraphModel.vertices(spark, dir)
        .select(col("id").as(s"__${n}_pid"), col(p).as(s"${n}_$p"))
      acc.join(broadcast(bag), col(n) === col(s"__${n}_pid"))
        .drop(s"__${n}_pid")
    }
    val keys = parsed.collect {
      case Key(n) => n
      case Prop(n, p) => s"${n}_$p"
    }
    val counts = parsed.collect { case Cnt(n) => n }
    if (counts.isEmpty) df.select(keys.map(col): _*)
      .orderBy(keys.map(col): _*)
    else {
      require(keys.nonEmpty, "RETURN with only aggregates needs a key")
      df.groupBy(keys.map(col): _*)
        .agg(count(col(counts.head)).as(s"count_${counts.head}"),
          counts.tail.map(n => count(col(n)).as(s"count_$n")): _*)
        .orderBy(keys.map(col): _*)
    }
  }

  /** Registered DSL exhibit 4 — property predicate: orders of customers
    * located in the NATION_7 nation, via the WHERE extension. */
  def motifWhereFilter(spark: SparkSession, dir: String): DataFrame =
    compileQuery(spark, dir,
      "(c)-[:IN]->(n);(o)-[:BY]->(c) WHERE n.name = 'NATION_7'")
      .orderBy(col("c"), col("n"), col("o"))

  /** Registered DSL exhibit 5 — RETURN aggregation: order counts per
    * nation through the 2-hop chain, grouped by the front-end, not by
    * hand-written plan code. */
  def motifReturnAgg(spark: SparkSession, dir: String): DataFrame =
    compileQuery(spark, dir,
      "(o)-[:BY]->(c);(c)-[:IN]->(n) RETURN n, count(o)")

  /** Registered DSL exhibit 8 — property RETURN: order counts per
    * nation NAME (not id) through the 2-hop chain — the
    * property-projection step of a graph query's RETURN, resolved via
    * a broadcast join against the vertex bag. */
  def motifReturnProperty(spark: SparkSession, dir: String): DataFrame =
    compileQuery(spark, dir,
      "(o)-[:BY]->(c);(c)-[:IN]->(n) RETURN n.name, count(o)")

  /** Registered DSL exhibit 6 — NEGATION: entities two IN-hops under
    * a region (customers and suppliers, through their nation) that
    * nothing was ordered BY — the "… WITHOUT such an edge" query,
    * compiled to an anti join by the `!` term. Selective on this
    * corpus: every customer has orders, so the anti join keeps exactly
    * the supplier legs — the negation genuinely removes rows rather
    * than matching vacuously. */
  def motifNegation(spark: SparkSession, dir: String): DataFrame =
    compileQuery(spark, dir,
      "(s)-[:IN]->(n);(n)-[:IN]->(r);!(o)-[:BY]->(s)")
      .orderBy(col("n"), col("r"), col("s"))

  /** Registered DSL exhibit 7 — OPTIONAL MATCH: every customer with
    * their orders, null-extended where none exist — the left-outer
    * hop the `?` term compiles to. */
  def motifOptional(spark: SparkSession, dir: String): DataFrame =
    compileQuery(spark, dir, "(c)-[:IN]->(n);?(o)-[:BY]->(c)")
      .filter(col("c").between(GraphModel.CustomerOff,
        GraphModel.SupplierOff - 1))
      .orderBy(col("c"), col("n"), col("o"))

  /** Registered DSL exhibit 9 — EDGE-PROPERTY predicate: high-quantity
    * line legs (order—HAS→part) with the ordering customer, filtered on
    * the BOUND edge's `qty` — the `[r:REL]` binding + `WHERE r.prop
    * <op> literal` extension. The predicate filters the bound
    * `r_qty` column, which Catalyst pushes through the hop joins into
    * the lineitem scan (at 100 TB: a selective pushed filter on the fact
    * table, not a post-join filter). */
  def motifEdgeFilter(spark: SparkSession, dir: String): DataFrame =
    compileQuery(spark, dir,
      "(o)-[r:HAS]->(p);(o)-[:BY]->(c) WHERE r.qty >= 45")
      // lineitem legs are multi-edges with no unique key: total order
      // over ALL output columns (the repo's lineitem discipline)
      .orderBy(col("c"), col("o"), col("p"), col("r_amt_c"),
        col("r_qty"), col("r_status"))

  /** Registered DSL exhibit 10 — RETURN of an edge property: line-leg
    * counts grouped by the bound edge's `status` (returnflag). The
    * edge prop is already a column of the compiled frame — RETURN
    * resolves it with no extra join, unlike vertex props. */
  def motifEdgeReturn(spark: SparkSession, dir: String): DataFrame =
    compileQuery(spark, dir, "(o)-[r:HAS]->(p) RETURN r.status, count(o)")

  /** Registered DSL exhibit 1 — a 2-hop chain: every order, its
    * customer, and the customer's nation. */
  def motifChain2hop(spark: SparkSession, dir: String): DataFrame =
    compile(GraphModel.edgesCached(spark, dir),
      "(o)-[:BY]->(c);(c)-[:IN]->(n)")
      .orderBy(col("c"), col("n"), col("o"))

  /** Registered DSL exhibit 3 — a variable-length path: every vertex
    * reaching `y` in 1–2 IN hops (customer/supplier/nation up to their
    * nation or region). */
  def motifVarlenReach(spark: SparkSession, dir: String): DataFrame =
    compile(GraphModel.edgesCached(spark, dir), "(x)-[:IN*1..2]->(y)")
      .orderBy(col("x"), col("y"))

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
