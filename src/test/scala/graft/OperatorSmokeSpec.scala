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

  test("every registered key has a golden schema entry") {
    val missing = SparkEntry.queries.keySet -- GoldenSchemas.cols.keySet
    assert(missing.isEmpty,
      s"regenerate tools/golden_schemas.py for: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes with rows > 0") {
      val df = fn(spark, sfDir)
      // golden schema pin: catches silent output-shape regressions
      // (see GoldenSchemas) before the driver's comparator does
      GoldenSchemas.cols.get(name).foreach { want =>
        assert(df.schema.fieldNames.sorted.mkString(",") == want,
          s"$name schema drifted from golden '$want'")
      }
      // Nested result columns (array/map/struct) crash the DRIVER's
      // pandas comparator (`sort_values` → "unhashable type:
      // numpy.ndarray" — round-8's embed_quantize_int8 ERROR), so an
      // oracle-eligible query must only output scalars; render arrays
      // as comma-joined strings (the round-7 convention).
      if (SparkEntry.oracleSql.contains(name)) {
        val nested = df.schema.fields.filter(f => f.dataType match {
          case _: org.apache.spark.sql.types.ArrayType |
               _: org.apache.spark.sql.types.MapType |
               _: org.apache.spark.sql.types.StructType => true
          case _ => false
        })
        assert(nested.isEmpty,
          s"$name: nested output column(s) would crash the driver's " +
            s"comparator: ${nested.map(f => s"${f.name}: ${f.dataType}")
              .mkString(", ")}")
        // DECIMAL ban on the hashed surface: the driver's hasher
        // canonicalizes DECIMAL differently between its DuckDB and
        // parquet read paths (r12: graph_walk_embed value-identical
        // yet hash-red — the only key with DECIMAL output). DECIMAL
        // stays fine in intermediate arithmetic; the FINAL select must
        // cast to BIGINT/DOUBLE/STRING/DATE/TIMESTAMP/BOOLEAN.
        val decimals = df.schema.fields.filter(_.dataType
          .isInstanceOf[org.apache.spark.sql.types.DecimalType])
        assert(decimals.isEmpty,
          s"$name: DECIMAL on the hashed output surface — cast to " +
            s"BIGINT: ${decimals.map(f => s"${f.name}: ${f.dataType}")
              .mkString(", ")}")
      }
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
