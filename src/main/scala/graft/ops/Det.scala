package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine determinism helpers (SURVEY.md §7.5).
  *
  * The driver hash-compares our parquet output against DuckDB running
  * `SparkEntry.oracleSql` on the same tables. Double-precision sums are
  * order-dependent and the two engines add in different orders, so every
  * money/measure aggregate goes through fixed-point decimal — exact,
  * associative, engine-independent — and only the final rounded value is
  * cast back to double. This costs nothing at scale: decimal sum is still
  * a single-pass partial+final HashAggregate.
  */
object Det {
  /** Fixed-point view of a double measure. 18 digits / 4 frac digits —
    * deliberately the WIDEST precision Spark stores in a compact Long
    * (precision ≤ Decimal.MAX_LONG_DIGITS = 18): one digit more and
    * every sum2/avg2 aggregation falls off the unscaled-Long fast path
    * onto heap BigDecimals (measured 2-4× on sum-heavy queries).
    *
    * DOMAIN BOUND: values must stay below 1e14 in magnitude (18-4
    * integer digits); under default ANSI-off a cast overflow yields
    * silent NULL, not an error. Corpus max is ~5e5. A future operator
    * with a larger-domain measure must pre-scale (e.g. divide by 1e6
    * before the cast, multiply after) rather than widening this type. */
  private val Fixed = DecimalType(18, 4)

  /** Exact sum of a double measure, rounded to 2dp, returned as double. */
  def sum2(c: Column): Column =
    round(sum(c.cast(Fixed)), 2).cast(DoubleType)

  /** Average as (exact decimal sum → double) / count, rounded to 2dp.
    * The division happens in double space on identical inputs in both
    * engines (decimal division scale rules differ between engines).
    *
    * The 1e-9 epsilon resolves a rounding-SEMANTICS split: for doubles,
    * Spark rounds the shortest decimal string (39.535 → 39.54) while
    * DuckDB rounds the binary value (39.53499999… → 39.53). Exact-half
    * quotients (count=2 of 2dp inputs) hit this constantly; the epsilon
    * pushes both engines' identical double decisively off the boundary
    * so they agree. Must appear in the oracle SQL too ([[sqlAvg2]]). */
  def avg2(c: Column): Column =
    round(sum(c.cast(Fixed)).cast(DoubleType) / count(c) + lit(1e-9), 2)

  /** Round a per-row double expression to 2dp (no aggregation hazard —
    * per-row arithmetic is order-free and bit-identical across engines). */
  def r2(c: Column): Column = round(c, 2)

  /** Every double column in the corpus is exactly 2dp (verified against
    * the data), so this cast is unambiguous in both engines. Use it to
    * build exact decimal arithmetic chains — chained double products
    * cast to decimal at the end round differently across engines. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact decimal aggregate → rounded double (for decimal-typed c). */
  def sumd2(c: Column): Column = round(sum(c), 2).cast(DoubleType)

  /** DuckDB-side equivalents, for oracle SQL strings. */
  def sqlSum2(x: String): String =
    s"CAST(ROUND(SUM(CAST($x AS DECIMAL(18,4))), 2) AS DOUBLE)"
  def sqlAvg2(x: String): String =
    s"ROUND(CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE) / COUNT($x) + 1e-9, 2)"
}
