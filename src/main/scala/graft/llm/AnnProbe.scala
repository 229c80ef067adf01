package graft.llm

import org.apache.spark.sql.{Row, SparkSession}

/** ANN scale probe (PLANS.md probes #5/#6): for each corpus dir, measures
  * the approximate similarity keys against the exact brute-force answer —
  * recall@5, candidate volume (the post-bucketing pre-scoring set, via the
  * [[Similarity.lshCandidates]]/[[Similarity.ivfCandidates]] accessors so
  * the probe exercises the REAL query code path), and wall time. Run over
  * sf0.1 and its 10×/100× rotated-embedding expansions to check that
  * recall floors hold and candidate volume grows linearly (per-query
  * bucket population ∝ corpus size at fixed planes/cells — the designed
  * behavior; superlinear growth would mean degenerate bucketing).
  *
  * Usage: AnnProbe <sfDir> [<sfDir> ...]; prints one line per dir.
  */
object AnnProbe {

  private def top5(rows: Array[Row]): Map[Long, Set[Long]] =
    rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recall(exact: Map[Long, Set[Long]], approx: Map[Long, Set[Long]]): Double = {
    val denom = exact.values.map(_.size).sum.toDouble
    exact.map { case (q, s) => (approx.getOrElse(q, Set.empty[Long]) & s).size }.sum / denom
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnProbe <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.Tables.scratchDir("wh"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    args.foreach { dir =>
      val nVec = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val exact = top5(Similarity.simSearchTopk(spark, dir).collect())
      val (lsh, tLsh) = timed(top5(Similarity.simSearchLshBucketed(spark, dir).collect()))
      val lshCand = Similarity.lshCandidates(spark, dir).count()
      val (ivf, tIvf) = timed(top5(Similarity.simSearchIvf(spark, dir).collect()))
      val ivfCand = Similarity.ivfCandidates(spark, dir).count()
      println(f"""{"probe":"ann","dir":"$dir","n_vectors":$nVec,""" +
        f""""lsh_recall5":${recall(exact, lsh)}%.3f,"lsh_candidates":$lshCand,"lsh_sec":$tLsh%.2f,""" +
        f""""ivf_recall5":${recall(exact, ivf)}%.3f,"ivf_candidates":$ivfCand,"ivf_sec":$tIvf%.2f}""")
    }
    spark.stop()
  }
}
