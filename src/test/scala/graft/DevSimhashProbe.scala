package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch probe main (test scope, not shipped): r17 verdict ask #6 —
// simhash banding masses at the next decade, WITHOUT running the full
// pair-enumeration key (a first attempt at n=5M sat 46 min at load ~1.3:
// single-task quadratic inside the hottest bucket). Prints per scheme the
// exact candidate mass Σ C(bucket,2), the max bucket, and the top-5
// bucket sizes — the numbers the keep/switch decision needs, all exact
// integers (steal-invariant).
object DevSimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val s = spark.newSession()
      val fp = graft.llm.Dedup.simhashFingerprints(s, dir).cache()
      val n = fp.count()
      Seq(("4x16", false), ("c63", true)).foreach { case (tag, manku) =>
        val buckets = graft.llm.Dedup.simhashBanded(fp, manku)
          .groupBy("blk", "key").agg(count(lit(1)).as("c"))
        val row = buckets.agg(
          coalesce(sum(col("c") * (col("c") - 1)), lit(0L)).cast("long").as("m2"),
          coalesce(max(col("c")), lit(0L)).as("top")).head()
        val top5 = buckets.orderBy(col("c").desc).limit(5)
          .collect().map(_.getLong(2)).mkString(",")
        println(s"""{"probe":"simhash_mass","dir":"$dir","scheme":"$tag","n":$n,""" +
          s""""candidates":${row.getLong(0) / 2},"max_bucket":${row.getLong(1)},"top5":[$top5]}""")
      }
      fp.unpersist(): Unit
    }
    spark.stop()
  }
}
