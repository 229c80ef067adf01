package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Misra-Gries frequent-items summary as a typed `Aggregator` — the
  * mergeable-sketch answer to "top tokens over a 100 TB corpus" when the
  * exact answer (`text_tokenize_tf`) would shuffle a vocabulary-sized
  * aggregation per batch. State is ≤ `c` (token, count) entries
  * regardless of stream length; counts UNDERESTIMATE truth by at most
  * n/(c+1) after any sequence of reduces AND merges (Misra-Gries 1982;
  * mergeability with the same bound: Agarwal et al., PODS 2012 — merge =
  * sum counts, then subtract the (c+1)-th largest and drop non-positive).
  * Every token with true frequency > n/(c+1) is guaranteed present.
  *
  * reduce() is O(1) except the eviction sweep (O(c), amortized over ≥ c
  * arrivals); merge() is O(c log c). The shuffle carries ≤ c entries per
  * partition — contrast with the exact groupBy whose exchange is
  * vocabulary-sized. */
class HeavyHittersAggregator(c: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    buf.get(tok) match {
      case Some(n) => buf.updated(tok, n + 1)
      case None if buf.size < c => buf.updated(tok, 1L)
      case None => // decrement-all: the classic MG eviction step
        buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    if (sum.size <= c) sum
    else {
      // subtract the (c+1)-th largest count from everything, drop <= 0:
      // the PODS'12 merge that preserves the n/(c+1) bound with fixed size
      val d = sum.values.toSeq.sorted(Ordering[Long].reverse)(c)
      sum.view.mapValues(_ - d).filter(_._2 > 0).toMap
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
}

object HeavyHitters {

  /** Capacity 256 ≫ this corpus's ~31-word vocabulary, so here the sketch
    * never evicts and its counts are EXACT — which is what lets the driver
    * oracle-check this key against the top-10 of the exact term-frequency
    * aggregation. The spec pins the exactness precondition (vocab < c/4,
    * so a testdata regeneration that grows the vocabulary fails loudly in
    * the suite, not silently at the gate) and separately exercises the
    * under-capacity eviction path and its error bound with a tiny c. */
  val Capacity = 256

  /** `agg_heavy_hitters` — top-10 corpus tokens via the MG summary. */
  def aggHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mg = new HeavyHittersAggregator(Capacity)
    t(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("token"))
      .as[String]
      .select(mg.toColumn.name("hh"))
      .flatMap(_.toSeq)
      .toDF("token", "tf")
      .orderBy(col("tf").desc, col("token"))
      .limit(10)
  }
}
