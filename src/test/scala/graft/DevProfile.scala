package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch profiling main (test scope, not shipped)
object DevProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // r17: panel recall@3 margin for the sim_knn_graph contract floor —
    // the boolean gates at RecallFloorPct; this prints the actual ratio
    // per sf so the floor choice is measured, not assumed.
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    dirs.foreach { dir =>
      val s = spark.newSession()
      val exact = graft.llm.Similarity.exactKnnPanel(s, dir)
        .groupBy("panel_id").agg(collect_set(col("neighbor_id")).as("exact_set"),
          count(lit(1)).as("n_exact"))
      val ann = graft.llm.Similarity.simKnnGraph(s, dir)
        .filter(col("vec_id") < graft.llm.Similarity.KnnPanelSize)
        .groupBy(col("vec_id").as("panel_id"))
        .agg(collect_set(col("neighbor_id")).as("ann_set"))
      val row = exact.join(ann, Seq("panel_id"), "left")
        .select(
          sum(size(array_intersect(coalesce(col("ann_set"),
            array().cast("array<bigint>")), col("exact_set")))).as("hits"),
          sum(col("n_exact")).as("total")).head()
      val (hits, total) = (row.getLong(0), row.getLong(1))
      println(s"KNN_PANEL dir=$dir hits=$hits total=$total recall=${hits.toDouble / total}")
    }
    spark.stop()
  }
}
