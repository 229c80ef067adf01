package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.t

/** Exact top-k as a typed `Aggregator[IN, BUF, OUT]` (SURVEY.md §2.2 UDAF
  * surface): each partition keeps only its k best (value, id) pairs, merge
  * combines two k-buffers — so the shuffle carries k rows per group per
  * partition instead of the whole group (contrast with the window-function
  * top-k, which shuffles every row). This is the mergeable-sketch shape that
  * scales: state is O(k), commutative, associative. */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (v, id) => (-v, id) }.take(k)

  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    // only sort when the buffer actually changes: a full buffer whose
    // cutoff beats the new element is returned untouched (the common case
    // in the hot per-row path)
    if (buf.size < k) trim(buf :+ in)
    else if (beats(in, buf.last)) trim(buf :+ in)
    else buf
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}

object CustomFns {

  /** `agg_topk_exact` — top-3 (totalprice, orderkey) per order priority via
    * the typed Aggregator, flattened back to rows. Oracle-equal to the
    * window-function formulation but with O(k) per-group state. */
  def aggTopkExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val topk = new TopKAggregator(3)
    val ds = t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .as[(String, Double, Long)]
    ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(topk.toColumn.name("top"))
      .flatMap { case (prio, top) =>
        top.zipWithIndex.map { case ((price, key), i) => (prio, i + 1L, key, price) }
      }
      .toDF("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rank")
  }

  /** `fn_hex_decode` — round-trip through the codegen'd HexToDec38
    * expression: encode orderkeys to hex (0x-prefixed and bare), decode
    * back; a 160-bit constant overflows the 38-digit ceiling → null. */
  def fnHexDecode(spark: SparkSession, dir: String): DataFrame = {
    HexToDec38.register(spark)
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"))
      .withColumn("decoded", expr("hex_to_dec38(hex(l_orderkey))"))
      .withColumn("decoded_prefixed", expr("hex_to_dec38(concat('0x', lower(hex(l_orderkey))))"))
      .withColumn("overflow", expr("hex_to_dec38(repeat('f', 40))"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Scala udf() escape hatch for full-width uint256 (beyond decimal(38,0)):
    * returns the exact decimal string. Demonstrates the udf registration
    * surface; prefer HexToDec38 where 38 digits suffice (codegen, no boxing). */
  val hexToDecimalString: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => {
      if (s == null) null
      else {
        val h = if (s.startsWith("0x") || s.startsWith("0X")) s.substring(2) else s
        try BigInt(h, 16).toString catch { case _: NumberFormatException => null }
      }
    })
}
