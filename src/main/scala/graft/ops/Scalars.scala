package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}

/** §2.7 scalar functions: string / date / math / array / map / JSON /
  * UDF / generator surfaces.
  *
  * Everything except `udfScalar` stays on codegen'd builtins (including
  * the higher-order array lambdas, which Catalyst compiles — no UDF
  * serialization). `udfScalar` is the deliberate UDF exhibit; its
  * Scaladoc notes the cost.
  *
  * Cross-engine numeric rules: transcendental outputs (`ln`, `pow`)
  * round to 6dp (libm last-ulp drift between JVM and C); float vectors
  * are cast to double BEFORE arithmetic so both engines multiply/add in
  * identical IEEE-754 double ops; integer-valued outputs are cast to
  * BIGINT on both sides (Spark's `length`/`size`/`year` return INT,
  * DuckDB's return BIGINT).
  */
object Scalars {

  /** substr/upper/lower/trim/concat_ws/length/split pipeline over part. */
  def scalarString(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).part
      .select(col("p_partkey"),
        upper(col("p_name")).as("name_up"),
        lower(col("p_brand")).as("brand_lo"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        length(col("p_name")).cast(LongType).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        trim(concat(lit("  "), col("p_type"), lit("  "))).as("type_trim"),
        array_join(split(col("p_name"), " "), "|").as("name_toks"))
      .orderBy(col("p_partkey"))

  /** year/month/day/date_trunc/datediff/last_day over o_orderdate. */
  def scalarDate(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("o_year"),
        month(col("o_orderdate")).cast(LongType).as("o_month"),
        dayofmonth(col("o_orderdate")).cast(LongType).as("o_day"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).cast(LongType).as("days_since_95"),
        last_day(col("o_orderdate")).as("month_end"))
      .orderBy(col("o_orderkey"))

  /** round/abs/pow/ln/sqrt/sign + integer div/mod over orders.
    *
    * Transcendental provenance (r12 audit): sqrt is IEEE-754
    * correctly-rounded — bit-identical across engines by spec; ln/pow
    * are libm-sensitive, but at the 6dp quantum a cross-engine flip
    * needs the true value within ~1 ulp (≈2e-15) of a 0.5e-6 boundary
    * — P ≈ 4e-9 per distinct 2dp price, ~1e-4 corpus-wide at sf0.1
    * (the r11 `graph_walk_embed` failure was the same hazard at the
    * 1000× tighter 9dp quantum over 18k values). */
  def scalarMath(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .select(col("o_orderkey"),
        round(col("o_totalprice"), 1).as("price_r1"),
        round(abs(col("o_totalprice") - 100000), 2).as("abs_diff"),
        round(pow(col("o_totalprice") / 100000, 2), 6).as("pow2"),
        round(log(col("o_totalprice")), 6).as("ln_price"),
        round(sqrt(col("o_totalprice")), 6).as("sqrt_price"),
        signum(col("o_totalprice") - 100000).cast("double").as("sign_diff"),
        expr("o_orderkey div 7").as("div7"),
        (col("o_orderkey") % 7).as("mod7"))
      .orderBy(col("o_orderkey"))

  /** sha2-256 + md5 content keys over documents (dedup prerequisite). */
  def scalarHash(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"),
        sha2(col("text"), 256).as("sha_text"),
        md5(col("text")).as("md5_text"),
        sha2(concat_ws("#", col("source"), col("text")), 256)
          .as("sha_salted"))
      .orderBy(col("doc_id"))

  /** Bitwise scalar surface: AND/OR/XOR, shifts, popcount — the bit
    * manipulation toolkit (flag fields, bitmap encodings, hash
    * mixing). All codegen'd integer exprs, exact on both engines. */
  def scalarBitwise(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .select(col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("and_255"),
        col("o_orderkey").bitwiseOR(lit(4096L)).as("or_4096"),
        col("o_orderkey").bitwiseXOR(lit(43690L)).as("xor_aaaa"),
        shiftleft(col("o_orderkey"), 3).as("shl3"),
        shiftright(col("o_orderkey"), 2).as("shr2"),
        bit_count(col("o_orderkey")).as("popcount"))
      .orderBy(col("o_orderkey"))

  /** size/slice/sort_array/element_at over the embedding vectors.
    * Float values are stored, not computed, so exact equality holds.
    * Array outputs are serialized to scaled-integer CSV (x*1e7 rounded
    * to BIGINT, exact for float inputs < 2^48/1e7 since the double
    * product p*1e7 stays integer-exact) — the driver's pandas hasher
    * cannot hash raw array cells, and float→string formatting differs
    * across engines, but scaled BIGINTs render identically. */
  def arrayBasic(spark: SparkSession, dir: String): DataFrame = {
    val u7 = (x: org.apache.spark.sql.Column) =>
      round(x.cast("double") * 1e7).cast(LongType)
    Tables(spark, dir).embeddings
      .select(col("vec_id"),
        size(col("embedding")).cast(LongType).as("dim"),
        array_join(transform(slice(col("embedding"), 1, 4), u7), ",")
          .as("head4"),
        array_join(transform(sort_array(slice(col("embedding"), 1, 4)), u7),
          ",").as("head4_sorted"),
        element_at(col("embedding"), 1).as("first_val"))
      .orderBy(col("vec_id"))
  }

  /** Higher-order lambdas: dot product vs a fixed probe vector
    * (zip_with + aggregate) and positive-component count (filter).
    * The probe (vec_id=0) is a 1-row broadcast — the same plan a
    * similarity-scan against a query vector uses at scale. */
  def arrayHigherOrder(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val probe = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("probe_vec"))
    e.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        round(aggregate(zip_with(col("v"), col("probe_vec"),
          (x, y) => x * y), lit(0.0d), (acc, x) => acc + x), 4).as("dot"),
        size(filter(col("v"), x => x > 0)).cast(LongType).as("n_pos"))
      .orderBy(col("vec_id"))
  }

  /** JSON props → MapType; element_at / map_keys projections (the
    * oracle-able view of map ops — raw map output isn't canonical
    * across engines). */
  def mapOps(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .withColumn("m", from_json(col("props"), MapType(StringType, LongType)))
      .select(col("event_id"),
        element_at(col("m"), "k").as("k_val"),
        size(map_keys(col("m"))).cast(LongType).as("n_keys"),
        array_join(sort_array(map_keys(col("m"))), ",").as("keys_csv"))
      .orderBy(col("event_id"))

  /** get_json_object path extraction, including a missing path → NULL. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k_val"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.missing").isNull.as("no_such_key"))
      .orderBy(col("event_id"))

  /** Custom scalar UDF exhibit: digit sum of the order key. A UDF is a
    * codegen black box (breaks whole-stage fusion, forces
    * serialization) — production code should prefer builtins/HOFs; this
    * exists to cover the extension surface. */
  def udfScalar(spark: SparkSession, dir: String): DataFrame = {
    val digitSum = udf { k: Long =>
      var x = k; var s = 0L
      while (x > 0) { s += x % 10; x /= 10 }
      s
    }
    Tables(spark, dir).orders
      .select(col("o_orderkey"), digitSum(col("o_orderkey")).as("digit_sum"))
      .orderBy(col("o_orderkey"))
  }

  /** regexp_extract (group capture), regexp_replace, and a regex match
    * count over part names/types. Patterns kept to the RE2-compatible
    * subset so Spark (java.util.regex) and DuckDB (RE2) agree. */
  def scalarRegex(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).part
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "^(\\w+) (\\w+)$", 1).as("adjective"),
        regexp_extract(col("p_name"), "^(\\w+) (\\w+)$", 2).as("noun"),
        regexp_replace(col("p_type"), "[AEIOU]", "_").as("type_masked"),
        size(split(col("p_name"), "[aeiou]")).cast(LongType).minus(1)
          .as("n_vowels"))
      .orderBy(col("p_partkey"))

  /** Generator surface: tokens of documents.text with position
    * (posexplode — the builtin UDTF; no custom Generator needed). */
  def udtfExplode(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"), col("tok"))
      .orderBy(col("doc_id"), col("pos"))
}
