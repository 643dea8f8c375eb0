package graft

/** Every registered query must execute and return rows on sf0.001 —
  * the cheap insurance layer under the driver's DuckDB gate. */
class OperatorSmokeSpec extends SparkSpec {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every Oracle.sql key names a registered query (typo guard)") {
    // checked against the UNFILTERED map — SparkEntry.oracleSql is
    // already filtered by queries.contains, so a typo'd oracle key
    // would silently drop that query's DuckDB coverage
    val unknown = Oracle.sql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without queries: $unknown")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes with rows > 0") {
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }
}
