package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pair-density scale probe (PLANS.md probe #20 follow-up): for the two
  * pigeonhole-banded near-dup keys whose OUTPUT is inherently quadratic on
  * a dense corpus — `multimodal_near_dup` (64-bit perceptual hash) and
  * `dedup_simhash` (64-bit simhash) — measures, per corpus dir, the
  * candidate volume (sum over (band, value) buckets of C(size, 2)), the
  * verified output pair count, and the largest bucket. Separates "the
  * engine does quadratic work" (a plan defect) from "the answer itself is
  * quadratic because the fingerprint space is finite and the corpus is
  * dense" (a data property no plan can beat while the key's contract is
  * pair enumeration; the cluster keys are the linear-output form).
  *
  * Usage: DensityProbe <sfDir> [<sfDir> ...]; prints one JSON line per
  * (dir, key).
  */
object DensityProbe {

  def main(argv: Array[String]): Unit = {
    // --simhash-only: skip the phash family (its near-dup pair count is
    // the Θ(n²)-output contract that hits the single-box disk ceiling at
    // 100× — see the bench exclude list) when only the simhash candidate
    // diagnostics are wanted.
    val simhashOnly = argv.contains("--simhash-only")
    val args = argv.filterNot(_.startsWith("--"))
    require(args.nonEmpty, "usage: DensityProbe [--simhash-only] <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.Tables.scratchDir("wh"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def stats(banded: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val buckets = banded.groupBy("bi", "bv").agg(count(lit(1)).as("c")).cache()
      // coalesce: sum/max over an EMPTY documents table is NULL and would
      // abort the whole multi-dir probe run with an NPE (r16 advice)
      val cand = buckets.agg(coalesce(sum(col("c") * (col("c") - 1)), lit(0L)).cast("long"))
        .head().getLong(0) / 2
      val top = buckets.agg(coalesce(max(col("c")), lit(0L))).head().getLong(0)
      buckets.unpersist()
      (cand, top)
    }

    args.foreach { dir =>
      if (!simhashOnly) {
      // multimodal phash: 4 bands of 16 bits (adjacent row pairs)
      val ph = Multimodal.multimodalPhash(spark, dir).cache()
      val n = ph.count()
      val phBands = (0 until 4).map(j => col(s"h${2 * j}") + col(s"h${2 * j + 1}") * 256)
      val (phCand, phTop) = stats(ph.select(col("doc_id"),
        posexplode(array(phBands: _*)).as(Seq("bi", "bv"))))
      val phPairs = Multimodal.multimodalNearDup(spark, dir).count()
      ph.unpersist()
      println(s"""{"probe":"density","key":"multimodal_near_dup","dir":"$dir",""" +
        s""""n":$n,"candidates":$phCand,"out_pairs":$phPairs,"max_bucket":$phTop}""")
      }

      // simhash input is the documents table, NOT the phash frame above —
      // report its own count (the two cardinalities differ in general).
      // r16: candidate volume under BOTH banding schemes on the real
      // fingerprints, so the Manku C(6,3) switch's collision claim is
      // measured, not derived (expect ~n²·4/2¹⁷ narrow vs ~noise wide).
      val fp = Dedup.simhashFingerprints(spark, dir)
      val shN = fp.count()
      val shCand = Seq(false, true).map { manku =>
        val buckets = Dedup.simhashBanded(fp, manku)
          .groupBy("blk", "key").agg(count(lit(1)).as("c"))
        buckets.agg(coalesce(sum(col("c") * (col("c") - 1)), lit(0L)).cast("long"))
          .head().getLong(0) / 2
      }
      val shPairs = Dedup.dedupSimhash(spark, dir).count()
      println(s"""{"probe":"density","key":"dedup_simhash","dir":"$dir",""" +
        s""""n":$shN,"candidates_4x16":${shCand(0)},"candidates_c63":${shCand(1)},""" +
        s""""out_rows":$shPairs}""")
    }
    spark.stop()
  }
}
