package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.Tables.t

/** Bottom-k ("KMV") distinct-value sketch as a typed `Aggregator`: per
  * group, keep the K smallest DISTINCT 60-bit hashes seen; the K-th
  * smallest order statistic estimates the distinct count as
  * (K−1)·2⁶⁰ / h₍K₎ (Bar-Yossef et al. 2002, the classic KMV estimator).
  *
  * Why this exists next to `agg_approx_distinct` (HLL++): the KMV state is
  * a deterministic FUNCTION OF THE INPUT SET — no RNG, no stochastic
  * averaging — so unlike HLL the whole sketch is reproducible in ANSI SQL
  * (`ORDER BY h LIMIT K` per group) and the key is fully oracle-checked,
  * estimator arithmetic included. It is also the mergeable-sketch shape
  * that scales: state is O(K) longs, reduce is an O(log K) binary search +
  * occasional bounded insert, merge is a bounded sorted-merge — map-side
  * partial sketches mean the shuffle carries ≤ K·partitions longs per
  * group, never the group's rows (same contract as [[TopKAggregator]]).
  *
  * State is a SORTED, DISTINCT Array[Long] capped at K. Distinctness in
  * the state is what makes the aggregator insensitive to input
  * multiplicity — it consumes the raw fact stream (every lineitem row)
  * without any pre-`distinct` shuffle; duplicates of a key hash to an
  * already-present value and leave the buffer untouched.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, h)
    if (i >= 0) buf // already present — the common path on duplicate keys
    else {
      val ins = -i - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) {
        // beats the current K-th minimum: shift the tail right, drop last
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // sorted-merge with dedup, capped at k — O(|a|+|b|) with |a|,|b| ≤ k
    val out = new Array[Long](math.min(a.length + b.length, k))
    var ia = 0; var ib = 0; var n = 0
    while (n < k && (ia < a.length || ib < b.length)) {
      val v =
        if (ib >= b.length || (ia < a.length && a(ia) <= b(ib))) { val x = a(ia); ia += 1; x }
        else { val x = b(ib); ib += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}

object KmvSketch {

  /** K = 64 → theoretical relative standard error ≈ 1/√(K−2) ≈ 12.7%. */
  val K = 64

  /** `agg_kmv_distinct` — per-returnflag distinct `l_partkey` estimation
    * from the bottom-64 sketch, with the exact count and the error
    * alongside. One pass over the raw fact table; the only O(distinct)
    * work is the exact comparison column the key carries as evidence
    * (count_distinct — itself partial-aggregated), which a production
    * estimate-only run would drop.
    *
    * Estimator arithmetic is the repo's single-IEEE-operation contract:
    * (K−1)·2⁶⁰ is a ≤6-significant-bit double (exact), ONE double division
    * by h₍K₎ and ONE half-up round — bit-identical in Spark and DuckDB.
    * Groups with fewer than K distinct hashes are exact by construction
    * (the sketch IS the value set): est = n_kept.
    */
  def aggKmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val kmv = new KmvAggregator(K)
    val h60 = conv(substring(md5(col("l_partkey").cast(StringType)), 1, 15), 16, 10)
      .cast(LongType)
    val sketches = t(spark, dir, "lineitem")
      .select(col("l_returnflag"), h60.as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(kmv.toColumn.name("ks"))
      .map { case (flag, ks) => (flag, ks.length.toLong, if (ks.isEmpty) 0L else ks.last) }
      .toDF("l_returnflag", "n_kept", "h_k")
    val exact = t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count_distinct(col("l_partkey")).as("true_distinct"))
    val scale = (K - 1).toDouble * math.pow(2, 60) // exact double: 63·2⁶⁰
    sketches
      .join(exact, Seq("l_returnflag"))
      .withColumn("est_distinct",
        when(col("n_kept") < K, col("n_kept"))
          .otherwise(round(lit(scale) / col("h_k").cast("double")).cast(LongType)))
      .withColumn("err_ppm",
        expr("abs(est_distinct - true_distinct) * 1000000L DIV true_distinct"))
      .select("l_returnflag", "n_kept", "h_k", "est_distinct", "true_distinct", "err_ppm")
      .orderBy("l_returnflag")
  }
}
