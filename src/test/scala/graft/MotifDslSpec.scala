package graft

import graft.ops.MotifDsl
import graft.ops.MotifDsl.EdgeTerm

/** Unit tests for the motif pattern compiler (corpus-level behavior is
  * oracle-checked via motif_chain_2hop / motif_vee_shared_nation). */
class MotifDslSpec extends SparkSpec {

  test("parser accepts chains, optional rels, and rejects junk") {
    assert(MotifDsl.parse("(a)-[:BY]->(b);(b)-[]->(c)") ==
      Seq(EdgeTerm("a", Some("BY"), "b"), EdgeTerm("b", None, "c")))
    intercept[IllegalArgumentException] {
      MotifDsl.parse("(a)-[:BY->(b)")
    }
    intercept[IllegalArgumentException] {
      MotifDsl.parse("(a)-[]->(a)") // self loop
    }
  }

  test("compile chains joins on shared names and filters rels") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L, "X"), (2L, 3L, "Y"), (2L, 4L, "Y"), (1L, 3L, "Z"))
      .toDF("src", "dst", "rel")
    val rows = MotifDsl.compile(edges, "(a)-[:X]->(b);(b)-[:Y]->(c)")
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("c"))).toSet
    assert(rows == Set((1L, 2L, 3L), (1L, 2L, 4L)))
    // untyped term matches every rel out of b
    val all = MotifDsl.compile(edges, "(a)-[:X]->(b);(b)-[]->(c)")
      .collect()
    assert(all.length == 2)
  }

  test("closing a cycle joins on both endpoints") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L, "X"), (2L, 3L, "Y"), (1L, 3L, "Z"), (2L, 4L, "Y"))
      .toDF("src", "dst", "rel")
    // triangle: a->b->c plus the closing a->c edge
    val tri = MotifDsl.compile(edges,
      "(a)-[:X]->(b);(b)-[:Y]->(c);(a)-[:Z]->(c)").collect()
    assert(tri.length == 1)
    val r = tri.head
    assert((r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("c"))
      == ((1L, 2L, 3L)))
  }

  test("disconnected terms are refused, not cross-joined") {
    import spark.implicits._
    val edges = Seq((1L, 2L, "X"), (3L, 4L, "Y")).toDF("src", "dst", "rel")
    intercept[IllegalArgumentException] {
      MotifDsl.compile(edges, "(a)-[:X]->(b);(c)-[:Y]->(d)")
    }
  }

  test("var-length term parses and expands to bounded reachability") {
    import spark.implicits._
    assert(MotifDsl.parse("(a)-[:R*1..3]->(b)") ==
      Seq(EdgeTerm("a", Some("R"), "b", 1, 3)))
    intercept[IllegalArgumentException] {
      MotifDsl.parse("(a)-[:R*3..2]->(b)") // inverted range
    }
    intercept[IllegalArgumentException] {
      MotifDsl.parse("(a)-[:R*1..99]->(b)") // over MaxVarHops
    }
    // chain 1→2→3→4 plus a shortcut 1→3: *1..3 from 1 reaches {2,3,4}
    val edges = Seq((1L, 2L, "R"), (2L, 3L, "R"), (3L, 4L, "R"),
      (1L, 3L, "R")).toDF("src", "dst", "rel")
    val reach = MotifDsl.compile(edges, "(a)-[:R*1..3]->(b)")
      .filter(org.apache.spark.sql.functions.col("a") === 1L)
      .collect().map(_.getAs[Long]("b")).toSet
    assert(reach == Set(2L, 3L, 4L))
    // DISTINCT semantics: 1→3 via shortcut and via 2 hops is one row
    val all = MotifDsl.compile(edges, "(a)-[:R*1..3]->(b)").collect()
    assert(all.length == all.map(_.toString).distinct.length)
  }

  test("WHERE extension filters by vertex property and rejects garbage") {
    import org.apache.spark.sql.functions.col
    // every surviving row's nation really is NATION_7
    val rows = MotifDsl.motifWhereFilter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n7 = GraphModel.vertices(spark, sfDir)
      .filter(col("name") === "NATION_7")
      .collect().map(_.getAs[Long]("id")).toSet
    assert(n7.size == 1)
    rows.foreach(r => assert(n7.contains(r.getAs[Long]("n"))))
    // WHERE equals pattern-then-filter semantics
    val unfiltered = MotifDsl.compileQuery(spark, sfDir,
      "(c)-[:IN]->(n);(o)-[:BY]->(c)")
      .filter(col("n").isin(n7.toSeq: _*))
      .orderBy(col("c"), col("n"), col("o")).collect()
    assert(rows.map(_.toString).toSeq == unfiltered.map(_.toString).toSeq)
    // unbound node and unknown property are rejected, not ignored
    intercept[IllegalArgumentException] {
      MotifDsl.compileQuery(spark, sfDir,
        "(c)-[:IN]->(n) WHERE z.name = 'x'")
    }
    intercept[IllegalArgumentException] {
      MotifDsl.compileQuery(spark, sfDir,
        "(c)-[:IN]->(n) WHERE n.acctbal = 'x'")
    }
  }

  test("compiled 2-hop chain matches the hand-written traversal") {
    val viaDsl = MotifDsl.motifChain2hop(spark, sfDir).collect()
    val hand = GraphModel.edgesCached(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("rel") === "BY")
      .select(org.apache.spark.sql.functions.col("src").as("o"),
        org.apache.spark.sql.functions.col("dst").as("c"))
      .join(GraphModel.edgesCached(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("rel") === "IN")
        .select(org.apache.spark.sql.functions.col("src").as("c"),
          org.apache.spark.sql.functions.col("dst").as("n")), "c")
      .select("c", "n", "o")
      .orderBy("c", "n", "o")
      .collect()
    assert(viaDsl.map(_.toString).toSeq == hand.map(_.toString).toSeq)
  }

  test("RETURN projects, aggregates, and rejects unbound names") {
    // aggregate form: orders per nation == hand-computed group counts
    val agg = MotifDsl.compileQuery(spark, sfDir,
      "(o)-[:BY]->(c);(c)-[:IN]->(n) RETURN n, count(o)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val raw = MotifDsl.compileQuery(spark, sfDir,
      "(o)-[:BY]->(c);(c)-[:IN]->(n)").collect()
    val expected = raw.groupBy(_.getAs[Long]("n"))
      .view.mapValues(_.length.toLong).toMap
    assert(agg == expected)
    // projection form keeps per-match rows (no implicit distinct)
    val proj = MotifDsl.compileQuery(spark, sfDir,
      "(o)-[:BY]->(c);(c)-[:IN]->(n) RETURN n").collect()
    assert(proj.length == raw.length)
    assert(proj.head.schema.fieldNames.toSeq == Seq("n"))
    intercept[IllegalArgumentException] {
      MotifDsl.compileQuery(spark, sfDir,
        "(o)-[:BY]->(c) RETURN z")
    }
    intercept[IllegalArgumentException] {
      MotifDsl.compileQuery(spark, sfDir,
        "(o)-[:BY]->(c) RETURN count(o)")
    }
  }

  test("negation and optional terms parse, join, and guard the first slot") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    assert(MotifDsl.parse("(a)-[:X]->(b);!(z)-[:Y]->(a)")(1) ==
      EdgeTerm("z", Some("Y"), "a", negated = true))
    assert(MotifDsl.parse("(a)-[:X]->(b);?(z)-[:Y]->(a)")(1) ==
      EdgeTerm("z", Some("Y"), "a", optional = true))
    // 1-X->2, 1-X->3; Y edges into 2 only
    val edges = Seq((1L, 2L, "X"), (1L, 3L, "X"), (9L, 2L, "Y"))
      .toDF("src", "dst", "rel")
    // negation: keep (a,b) pairs where NO (z)-Y->(b) edge exists; z
    // is existential and must not appear in the output
    val neg = MotifDsl.compile(edges, "(a)-[:X]->(b);!(z)-[:Y]->(b)")
    assert(neg.columns.toSeq == Seq("a", "b"))
    assert(neg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 3L)))
    // optional: all pairs survive, z null where no Y edge matches
    val opt = MotifDsl.compile(edges, "(a)-[:X]->(b);?(z)-[:Y]->(b)")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(r.fieldIndex("z"))))).toSet
    assert(opt == Set((1L, 2L, Some(9L)), (1L, 3L, None)))
    // a leading ?/! term has nothing to qualify — refused
    intercept[IllegalArgumentException] {
      MotifDsl.compile(edges, "!(a)-[:X]->(b)")
    }
    intercept[IllegalArgumentException] {
      MotifDsl.compile(edges, "?(a)-[:X]->(b);(b)-[:Y]->(c)")
    }
    // registered negation keeps exactly the supplier legs (every
    // customer on this corpus has a BY in-edge, suppliers never do) —
    // i.e. the anti join removed the customer rows
    val kept = MotifDsl.motifNegation(spark, sfDir)
    val nSupp = Tables(spark, sfDir).supplier.count()
    assert(kept.count() == nSupp)
    assert(kept.filter(col("s") < GraphModel.SupplierOff).isEmpty)
    // registered optional: orders null-extend; non-null rows = the
    // inner-join row count, plus no customer is dropped
    val optRows = MotifDsl.motifOptional(spark, sfDir)
    val nOrders = Tables(spark, sfDir).orders.count()
    assert(optRows.filter(col("o").isNotNull).count() == nOrders)
    assert(optRows.select(col("c")).distinct().count() ==
      Tables(spark, sfDir).customer.count())
  }

  test("RETURN node.prop projects the vertex property") {
    val rows = MotifDsl.motifReturnProperty(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("n_name")).forall(_.startsWith("NATION_")))
    // property-keyed counts equal the id-keyed counts (names unique)
    val byId = MotifDsl.motifReturnAgg(spark, sfDir).collect()
      .map(_.getAs[Long]("count_o")).sorted.toSeq
    val byName = rows.map(_.getAs[Long]("count_o")).sorted.toSeq
    assert(byName == byId)
    // unknown property still throws
    intercept[IllegalArgumentException] {
      MotifDsl.compileQuery(spark, sfDir,
        "(o)-[:BY]->(c);(c)-[:IN]->(n) RETURN n.acctbal")
    }
  }

  test("edge bindings parse, carry props, and guard their term shapes") {
    import spark.implicits._
    // binding name captured; unbound forms still parse as before
    assert(MotifDsl.parse("(a)-[r:X]->(b)") ==
      Seq(EdgeTerm("a", Some("X"), "b", binding = Some("r"))))
    assert(MotifDsl.parse("(a)-[r]->(b)") ==
      Seq(EdgeTerm("a", None, "b", binding = Some("r"))))
    // a binding cannot name a var-length or negated term, and one
    // binding cannot be bound twice or shadow a node
    intercept[IllegalArgumentException] {
      MotifDsl.parse("(a)-[r:X*1..2]->(b)")
    }
    intercept[IllegalArgumentException] {
      MotifDsl.parse("(a)-[:X]->(b);!(a)-[r:Y]->(c)")
    }
    val edges = Seq((1L, 2L, "X", 5L, 100L, "A"),
      (2L, 3L, "Y", 7L, 250L, "B")).toDF(
      "src", "dst", "rel", "qty", "amt_c", "status")
    intercept[IllegalArgumentException] {
      MotifDsl.compile(edges, "(a)-[r:X]->(b);(b)-[r:Y]->(c)")
    }
    intercept[IllegalArgumentException] {
      MotifDsl.compile(edges, "(a)-[b:X]->(b)")
    }
    // binding against a prop-less frame is an error, not null columns
    intercept[IllegalArgumentException] {
      MotifDsl.compile(
        Seq((1L, 2L, "X")).toDF("src", "dst", "rel"), "(a)-[r:X]->(b)")
    }
    // props surface as <binding>_<prop>, after the node columns
    val out = MotifDsl.compile(edges, "(a)-[r:X]->(b);(b)-[:Y]->(c)")
    assert(out.columns.toSeq ==
      Seq("a", "b", "c", "r_amt_c", "r_qty", "r_status"))
    val row = out.collect().head
    assert(row.getAs[Long]("r_qty") == 5L &&
      row.getAs[Long]("r_amt_c") == 100L &&
      row.getAs[String]("r_status") == "A")
  }

  test("edge predicates filter and RETURN r.prop resolves in-frame") {
    import spark.implicits._
    // corpus-level: WHERE r.qty >= 45 keeps exactly the high-qty legs
    val rows = MotifDsl.motifEdgeFilter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("r_qty") >= 45L))
    // predicate equals pattern-then-filter semantics
    val unfiltered = MotifDsl.compileQuery(spark, sfDir,
      "(o)-[r:HAS]->(p);(o)-[:BY]->(c)")
    assert(rows.length ==
      unfiltered.filter(org.apache.spark.sql.functions
        .col("r_qty") >= 45).count())
    // RETURN of an edge prop groups without a vertex-bag join
    val byStatus = MotifDsl.motifEdgeReturn(spark, sfDir).collect()
    assert(byStatus.map(_.getAs[String]("r_status")).toSeq.sorted ==
      byStatus.map(_.getAs[String]("r_status")).toSeq)
    assert(byStatus.map(_.getAs[Long]("count_o")).sum ==
      Tables(spark, sfDir).lineitem.count())
    // an unbound edge prop in WHERE throws (parse-error discipline)
    intercept[IllegalArgumentException] {
      MotifDsl.compileQuery(spark, sfDir,
        "(o)-[:HAS]->(p) WHERE r.qty >= 45")
    }
    // string predicate on a bound edge prop works through the same path
    val flagged = MotifDsl.compileQuery(spark, sfDir,
      "(o)-[r:HAS]->(p) WHERE r.status = 'A'")
    assert(flagged.filter(org.apache.spark.sql.functions
      .col("r_status") =!= "A").count() == 0)
  }

  test("RETURN tolerates count case/spacing and rejects unknown items") {
    // COUNT( o ) parses as the aggregate, not a silently-dropped item
    val agg = MotifDsl.compileQuery(spark, sfDir,
      "(o)-[:BY]->(c);(c)-[:IN]->(n) RETURN n, COUNT( o )").collect()
    val canonical = MotifDsl.compileQuery(spark, sfDir,
      "(o)-[:BY]->(c);(c)-[:IN]->(n) RETURN n, count(o)").collect()
    assert(agg.map(_.toString).toSeq == canonical.map(_.toString).toSeq)
    // an unsupported aggregate throws instead of vanishing
    intercept[IllegalArgumentException] {
      MotifDsl.compileQuery(spark, sfDir,
        "(o)-[:BY]->(c);(c)-[:IN]->(n) RETURN n, sum(o)")
    }
  }
}
