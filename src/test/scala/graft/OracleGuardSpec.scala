package graft

import org.scalatest.funsuite.AnyFunSuite

/** Build-time guard over the oracle SQL (no Spark, no DuckDB): DuckDB
  * returns HUGEINT for an integer `SUM(...)`, while Spark writes BIGINT
  * — the driver hashes typed values, so a bare integer SUM in an
  * oracle's OUTPUT columns hash-mismatches even when every value is
  * equal (this shipped twice in round 7: join_dpp_pruned,
  * multimodal_size_stats). Rule enforced here: every `SUM(` in a
  * statement's final (paren-depth-0) select list must sit inside a
  * `CAST(...)` span within its select-list item, which pins the output
  * type on the DuckDB side. CTE-internal sums are exempt — their type
  * is forced wherever the CTE's column reaches the output.
  */
class OracleGuardSpec extends AnyFunSuite {

  private val SumRe = "(?i)\\bsum\\s*\\(".r
  private val CastRe = "(?i)\\bcast\\s*\\(".r

  /** The final select list: text between the LAST depth-0 SELECT and
    * the following depth-0 FROM (or end of statement). With `WITH x AS
    * (...) SELECT ... FROM ...` every CTE body is inside parens, so
    * the depth-0 SELECT is the statement's output projection. */
  private def finalSelectList(sql: String): String = {
    val depth0 = new StringBuilder
    val pos = scala.collection.mutable.ArrayBuffer.empty[Int] // orig offsets
    var d = 0
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '(') d += 1
      else if (c == ')') d -= 1
      else if (d == 0) { depth0 += c; pos += i }
      i += 1
    }
    val flat = depth0.toString
    val selIdx = "(?i)\\bselect\\b".r.findAllMatchIn(flat).toList
      .lastOption.map(_.end).getOrElse(0)
    val fromIdx = "(?i)\\bfrom\\b".r.findFirstMatchIn(flat.substring(selIdx))
      .map(selIdx + _.start).getOrElse(flat.length)
    if (selIdx >= fromIdx) return ""
    // map the depth-0 span back to the original text so sub-expressions
    // (parenthesised args, CASTs) inside the select items are included
    sql.substring(pos(selIdx), pos(fromIdx - 1) + 1)
  }

  /** All [start, end) spans of CAST(...) calls, matching parens. */
  private def castSpans(s: String): Seq[(Int, Int)] =
    CastRe.findAllMatchIn(s).toSeq.flatMap { m =>
      var d = 0
      var i = m.end - 1 // the '('
      var close = -1
      while (i < s.length && close < 0) {
        val c = s.charAt(i)
        if (c == '(') d += 1
        else if (c == ')') { d -= 1; if (d == 0) close = i }
        i += 1
      }
      if (close >= 0) Some((m.start, close + 1)) else None
    }

  test("every SUM in an oracle's final select list is CAST-wrapped") {
    val offenders = Oracle.sql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val sel = finalSelectList(sql)
        val casts = castSpans(sel)
        val bare = SumRe.findAllMatchIn(sel).filterNot { m =>
          casts.exists { case (a, b) => a < m.start && m.end <= b }
        }.toSeq
        if (bare.isEmpty) None
        else Some(s"$name: ${bare.size} bare SUM in output columns " +
          s"(first at ...${sel.slice(math.max(0, bare.head.start - 20),
            bare.head.end + 20).replaceAll("\\s+", " ")}...)")
    }
    assert(offenders.isEmpty,
      "DuckDB integer SUM returns HUGEINT; wrap in CAST(...):\n" +
        offenders.mkString("\n"))
  }

  test("the guard rejects round 7's un-cast oracle shape (self-test)") {
    val bad = """SELECT lang, count(*) AS n, SUM(n_chars) AS s
                 FROM documents GROUP BY 1 ORDER BY 1"""
    val sel = finalSelectList(bad)
    val casts = castSpans(sel)
    val bare = SumRe.findAllMatchIn(sel).filterNot { m =>
      casts.exists { case (a, b) => a < m.start && m.end <= b }
    }.toSeq
    assert(bare.nonEmpty, "guard failed to flag a bare output SUM")
    // CTE-internal sums (inside parens) are exempt; cast sums pass
    val sel2 = finalSelectList(
      """WITH c AS (SELECT k, SUM(x) AS s FROM t GROUP BY 1)
         SELECT k, CAST(s AS BIGINT) AS s,
                CAST(ROUND(SUM(v), 2) AS DOUBLE) AS sv
         FROM c GROUP BY 1""")
    val casts2 = castSpans(sel2)
    val bare2 = SumRe.findAllMatchIn(sel2).filterNot { m =>
      casts2.exists { case (a, b) => a < m.start && m.end <= b }
    }.toSeq
    assert(bare2.isEmpty, s"guard false positive: $bare2")
  }
}
