package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.t

/** Scalar-function surface (SURVEY.md §2.2 `fn_*`): string/hex, date, decimal
  * math, JSON, array higher-order functions. All built-in `functions._` —
  * codegen'd, no UDFs, so every query here stays inside one
  * WholeStageCodegen span over the scan.
  */
object Scalars {

  /** `fn_string` — lower/substring/concat/lpad (the reference's 8-digit
    * `printf "%%08d"` padding, config.py:32-33) + regexp extraction. */
  def fnString(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part").select(
      col("p_partkey"),
      lower(col("p_name")).as("lname"),
      substring(col("p_type"), 1, 4).as("t4"),
      concat(col("p_brand"), lit("#"), col("p_size").cast(StringType)).as("brand_size"),
      lpad(col("p_partkey").cast(StringType), 8, "0").as("pad8"),
      regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
      levenshtein(col("p_brand"), col("p_type")).cast(LongType).as("edit_dist"))
      .orderBy("p_partkey")

  /** `fn_date` — unix-timestamp-style bucketing (blocks.timestamp analogue,
    * convert_blocks_to_parquet.py:44): month truncation + epoch seconds. */
  def fnDate(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast(DateType).as("mon"))
      .agg(count(lit(1)).as("n"))
      .orderBy("mon")

  /** `fn_math_decimal` — wei→eth-style exact decimal scaling plus
    * null-safe division (`try_divide`). Division runs in double (IEEE —
    * bit-identical across engines); scaling runs in decimal (exact). */
  def fnMathDecimal(spark: SparkSession, dir: String): DataFrame = {
    val priceDec = col("l_extendedprice").cast(DecimalType(18, 2))
    t(spark, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      (priceDec / 100).cast(DecimalType(18, 6)).as("price_scaled"),
      (priceDec * (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
        .cast(DecimalType(38, 4)).as("disc_price"),
      try_divide(col("l_extendedprice"), col("l_tax")).as("per_tax"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** `fn_bitwise` — bitwise AND/OR/XOR, shifts and popcount over the key
    * columns: the bit-manipulation surface address/bloom/bucket arithmetic
    * leans on (the reference's consumers hash-bucket on key bits). All
    * built-ins — one codegen'd projection over the scan, zero shuffles. */
  def fnBitwise(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_orderkey").bitwiseAND(col("l_partkey")).as("b_and"),
      col("l_orderkey").bitwiseOR(col("l_partkey")).as("b_or"),
      col("l_orderkey").bitwiseXOR(col("l_partkey")).as("b_xor"),
      shiftleft(col("l_partkey"), 3).as("shl3"),
      shiftright(col("l_orderkey"), 2).as("shr2"),
      bit_count(col("l_orderkey")).cast(LongType).as("popcount"))
      .orderBy("l_orderkey", "l_linenumber")

  /** `fn_json_extract` — event-props field pull (`get_json_object`).
    * try_cast, not cast: under ANSI a non-numeric field value must yield
    * null (the oracle's TRY_CAST semantics), not kill the query. */
  def fnJsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("k_str", get_json_object(col("props"), "$.k"))
      .select(
        col("event_id"),
        expr("try_cast(k_str as bigint)").as("k"))
      .orderBy("event_id")

  /** `fn_variant` — the VARIANT semi-structured type (Spark 4): parse the
    * JSON props column ONCE into variant's binary encoding, then extract
    * typed fields with `variant_get` path expressions. Against repeated
    * `get_json_object` calls this is the scale move — one parse, many typed
    * reads, no re-tokenizing the JSON text per extraction; the oracle reads
    * the same paths with DuckDB's JSON operators. */
  def fnVariant(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("v", parse_json(col("props")))
      .select(
        col("event_id"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("variant_get(v, '$.k', 'string')").as("k_str"),
        expr("variant_get(v, '$.missing', 'bigint')").as("missing"))
      .orderBy("event_id")

  /** `fn_url` — URL parsing, the first structural pass over any web-crawl
    * corpus. URLs are synthesized deterministically per document (the
    * testdata carries none), then decomposed with `parse_url` — host, path,
    * and one query parameter — all codegen'd per-row work; the final
    * per-host rollup is the only shuffle. The DuckDB oracle mirrors the
    * decomposition with regexes, pinning the semantics rather than the
    * function name. */
  def fnUrl(spark: SparkSession, dir: String): DataFrame = {
    val url = concat(
      lit("https://"), col("lang"), lit(".example.com/docs/"), col("doc_id").cast(StringType),
      lit("?page="), (col("n_chars") % 7).cast(StringType), lit("&ref=crawl"))
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY"), lit("page")).as("page"))
      .orderBy("doc_id")
  }

  /** `fn_array` — embedding-column plumbing with higher-order functions:
    * size / element access / elementwise transform / sequential fold — the
    * building blocks of the similarity operators, all codegen-friendly and
    * per-row (no shuffle). */
  def fnArray(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings").select(
      col("vec_id"),
      size(col("embedding")).cast(LongType).as("dim"),
      element_at(col("embedding"), 1).cast(DoubleType).as("first_val"),
      element_at(col("embedding"), -1).cast(DoubleType).as("last_val"),
      // The transformed array is surfaced through scalar probes (head + left
      // fold) rather than as an array column: the verify gate compares rows
      // in pandas, where array cells are unhashable/unsortable.
      element_at(transform(col("embedding"), x => x.cast(DoubleType) * 2), 1)
        .as("doubled_first"),
      aggregate(transform(col("embedding"), x => x.cast(DoubleType) * 2), lit(0.0),
        (acc, x) => acc + x).as("doubled_sum"),
      aggregate(transform(col("embedding"), _.cast(DoubleType)), lit(0.0),
        (acc, x) => acc + x).as("sum_val"))
      .orderBy("vec_id")
}
