package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch probe main (test scope, not shipped): r17 verdict ask #6 —
// PPJoin prefix-index growth at the next decade. Per dir, prints the
// prefix-index posting mass Σ C(run,2) (candidate upper bound BEFORE the
// in-loop length filter — exact integer, steal-invariant), the true
// J≥0.7 output pair count via the real dedup_setsim_prefix path, and
// wall/CPU for the full key.
object DevSetsimProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpuNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) cpuNanos.addAndGet(m.executorCpuTime + m.executorDeserializeCpuTime): Unit
      }
    })
    args.foreach { dir =>
      val s = spark.newSession()
      val shs = graft.llm.Dedup.hashedShingleSets(s, dir)
      val n = shs.count()
      val runs = graft.llm.Dedup.setsimPrefixIndex(shs, 7, 10)
        .groupBy("h").agg(count(lit(1)).as("c"))
      val row = runs.agg(
        coalesce(sum(col("c") * (col("c") - 1)), lit(0L)).cast("long").as("m2"),
        coalesce(max(col("c")), lit(0L)).as("top"),
        coalesce(sum(col("c")), lit(0L)).cast("long").as("postings")).head()
      val (cand, top, postings) = (row.getLong(0) / 2, row.getLong(1), row.getLong(2))
      println(s"""{"probe":"setsim_mass","dir":"$dir","n":$n,"prefix_postings":$postings,"cand_upper":$cand,"max_run":$top}""")
      Console.out.flush()
      val c0 = cpuNanos.get(); val t0 = System.nanoTime()
      val out = graft.llm.Dedup.dedupSetsimPrefix(s, dir).count()
      org.apache.spark.sql.GraftBridge.waitListenerBusEmpty(s)
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (cpuNanos.get() - c0) / 1e9
      println(f"""{"probe":"setsim","dir":"$dir","n":$n,"out_pairs":$out,"wall_s":$wall%.2f,"cpu_s":$cpu%.2f}""")
    }
    spark.stop()
  }
}
