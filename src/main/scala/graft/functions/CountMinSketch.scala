package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.Tables.t

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) —
  * point-frequency estimation over a token stream with FIXED-size state:
  * a d×w counter matrix, est(x) = min over the d rows of the cell x hashes
  * to. Estimates never undercount; they overcount by ≤ ε·N (ε = e/w) with
  * probability ≥ 1 − e^−d. The complement to the Misra-Gries summary
  * ([[HeavyHittersAggregator]]): MG answers "which items are frequent"
  * and underestimates; CMS answers "how frequent is THIS item" and
  * overestimates.
  *
  * Scale posture: the sketch IS the aggregation — the d-row fan-out
  * happens before a map-side-combined groupBy, so each task's shuffle
  * contribution is ≤ d·w rows no matter how large its token slice or the
  * corpus vocabulary (the exact `text_tokenize_tf` exchange is
  * vocabulary-sized). Merging partitions is cell-wise addition, which is
  * exactly what the final hash aggregation performs — the sketch's
  * mergeability is the plan, not a property bolted on.
  *
  * Determinism: row hashes are md5("r:token") truncated to 60 bits — the
  * repo's cross-engine hash contract — so the DuckDB oracle rebuilds the
  * identical matrix and the key triple-matches (most sketch
  * implementations hide behind rows-only checks; this one doesn't).
  */
object CountMin {

  /** Depth: 4 independent rows → failure probability e^−4 ≈ 1.8%. */
  val Depth = 4

  /** Width: 512 counters/row → ε = e/512 ≈ 0.5% of the stream length. */
  val Width = 512L

  /** Probe set: frequent stopwords, mid-frequency corpus words, and a
    * token guaranteed absent ("zqxjkv") — the absent probe documents the
    * overcount-only error mode (est ≥ 0 = true count exactly when none of
    * its d cells collide). Fixed literals keep the key deterministic. */
  val Probes: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "data", "model", "zqxjkv")

  /** 60-bit md5 bucket of "r:token" in [0, Width) — one definition shared
    * by sketch build and probe lookup; the oracle spells the same recipe
    * as `CAST('0x' || substring(md5(r || ':' || tok), 1, 15) AS BIGINT)`. */
  private[graft] def cell(r: Column, tok: Column): Column =
    conv(substring(md5(concat(r.cast(StringType), lit(":"), tok)), 1, 15), 16, 10)
      .cast(LongType) % Width

  /** `agg_countmin` — build the sketch over all document tokens, then
    * answer the probe set's frequency queries, reporting the estimate,
    * the exact count, and the overcount (always ≥ 0). */
  def aggCountmin(spark: SparkSession, dir: String): DataFrame = {
    val tok = t(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("token"))

    // d-row fan-out then count: ≤ d·w distinct (r, b) keys survive the
    // map-side combine, so the exchange is sketch-sized, not corpus-sized
    val sketch = tok
      .select(explode(array((0 until Depth).map { r =>
        struct(lit(r.toLong).as("r"), cell(lit(r), col("token")).as("b"))
      }: _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

    import spark.implicits._
    val probeCells = Probes.toDF("token")
      .select(col("token"), explode(array((0 until Depth).map { r =>
        struct(lit(r.toLong).as("r"), cell(lit(r), col("token")).as("b"))
      }: _*)).as("rb"))
      .select(col("token"), col("rb.r").as("r"), col("rb.b").as("b"))

    val est = probeCells
      .join(sketch, Seq("r", "b"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

    val exact = tok.groupBy("token").agg(count(lit(1)).as("true_cnt"))
    est
      .join(exact, Seq("token"), "left")
      .select(col("token"), col("est"),
        coalesce(col("true_cnt"), lit(0L)).as("true_cnt"))
      .withColumn("overcount", col("est") - col("true_cnt"))
      .orderBy("token")
  }
}
