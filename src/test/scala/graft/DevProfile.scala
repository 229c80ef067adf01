package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

// scratch profiling main (test scope, not shipped)
object DevProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"PROFILE [$tag] ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val docs = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"), array_distinct(split(col("text"), " ")).as("toks"))
      .cache()
    time("cache_docs")(docs.count())
    def minHash(p: Int) = array_min(transform(col("toks"),
      tk => conv(substring(md5(concat(lit(s"$p:"), tk)), 1, 15), 16, 10).cast(LongType)))
    val sigs = docs.select(Seq(col("doc_id"), floor(length(col("text")) / 64).as("lb")) ++
      (0 until 16).map(p => minHash(p).as(s"h$p")): _*)
    time("sigs_first")(sigs.count())
    time("sigs_second")(sigs.count())
    val banded = sigs.select(col("doc_id"),
      explode(array((for { b <- 0 until 8; dlb <- 0 to 1 } yield
        struct(lit(b).as("band"), (col("lb") + dlb).as("lbk"),
          col(s"h${2 * b}").as("h1"), col(s"h${2 * b + 1}").as("h2"))): _*)).as("k"))
      .select(col("doc_id"), col("k.band"), col("k.lbk"), col("k.h1"), col("k.h2"))
    val bc = banded.cache()
    time("banded")(bc.count())
    val candidates = bc.as("x").join(bc.as("y"),
        col("x.band") === col("y.band") && col("x.lbk") === col("y.lbk") &&
          col("x.h1") === col("y.h1") && col("x.h2") === col("y.h2") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    time("candidates")(println("n_cand=" + candidates.count()))
    spark.stop()
  }
}
