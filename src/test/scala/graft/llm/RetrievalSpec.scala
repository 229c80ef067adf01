package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The retrieval stack: BM25, hybrid RRF fusion, radius search. Each test
  * mirrors the full scoring rule driver-side in plain Scala (independent of
  * both Spark expressions and the DuckDB oracle) and pins the plan shapes
  * the 100 TB story depends on.
  */
class RetrievalSpec extends SparkTestBase {

  private def docTokens(): Map[Long, Array[String]] =
    graft.Tables.t(spark, sf, "documents")
      .filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap

  test("text_bm25_topk equals a driver-side BM25 mirror; plan is one bounded agg + TakeOrderedAndProject") {
    import Retrieval._
    val docs = docTokens()
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.length).sum.toDouble / n
    def df(t: String): Double = docs.values.count(_.contains(t)).toDouble
    val expected = docs.toSeq.map { case (id, toks) =>
      val dl = toks.length
      val score = Bm25Terms.map { term =>
        val tf = toks.count(_ == term).toDouble
        val idf = math.log(1.0 + ((n - df(term)) + 0.5) / (df(term) + 0.5))
        math.round((idf * ((tf * (Bm25K1 + 1)) /
          (tf + Bm25K1 * ((1 - Bm25B) + Bm25B * (dl / avgdl))))) * 1e6)
      }.sum
      (id, score)
    }.sortBy { case (id, s) => (-s, id) }.take(Bm25TopK)

    val out = Retrieval.textBm25Topk(spark, sf)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected, s"got ${got.take(3)}… expected ${expected.take(3)}…")

    // 100 TB pin: the scoring pass is map-only (per-term tf = codegen'd
    // array filter, stats pre-collected as literals) and the top-k is a
    // TakeOrderedAndProject — no shuffle, no window, anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    assert(!plan.contains("Exchange") && !plan.contains("Window"), plan.take(800))
  }

  test("sim_search_hybrid_rrf genuinely fuses both lists; structural contract + WindowGroupLimit") {
    val out = Retrieval.simSearchHybridRrf(spark, sf)
    val rows = out.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq)
      assert(rs.forall(_.getLong(2) != q), s"query $q retrieved itself")
      // ranked by (rrf desc, doc_id)
      val sorted = rs.sortBy(_.getLong(1)).map(r => (r.getLong(3), r.getLong(2)))
      assert(sorted.sameElements(sorted.sortBy { case (s, d) => (-s, d) }))
    }
    // fusion is real: some doc appears in BOTH lists, so its rrf exceeds
    // the maximum any single list can contribute (round(1e6/61) = 16393)
    assert(rows.exists(_.getLong(3) > 16393L),
      "no doc scored from both lists — fusion degenerated to a single ranker")

    // the per-query top-20 rank filters use literal bounds → Spark 4 pushes
    // them map-side as WindowGroupLimit (bounded shuffle at any corpus size)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("sim_search_hybrid_rrf matches a driver-side mirror of both rankers and the fusion") {
    import Retrieval._
    // dense: exact cosine ranks from the embeddings
    val vecs = graft.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0d; var na = 0d; var nb = 0d; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val dense: Map[(Long, Long), Long] = vecs.filter(_._1 < 10).flatMap { case (q, qv) =>
      vecs.filter(_._1 != q).map { case (d, dv) => (d, cos(qv, dv)) }
        .sortBy { case (d, c) => (-c, d) }.take(RrfDepth).zipWithIndex
        .map { case ((d, _), i) => (q, d) -> (i + 1L) }
    }.toMap
    // sparse: distinct-token-overlap ranks from the documents
    val docs = docTokens()
    val sparse: Map[(Long, Long), Long] = docs.filter(_._1 < 10).toSeq.flatMap { case (q, qt) =>
      val qset = qt.toSet
      docs.filter(_._1 != q).toSeq
        .map { case (d, dt) => (d, dt.toSet.count(qset.contains).toLong) }
        .filter(_._2 > 0)
        .sortBy { case (d, o) => (-o, d) }.take(RrfDepth).zipWithIndex
        .map { case ((d, _), i) => (q, d) -> (i + 1L) }
    }.toMap
    def recip(r: Option[Long]): Long = r.map(x => math.round(1e6 / (RrfK + x))).getOrElse(0L)
    val expected = (dense.keySet ++ sparse.keySet).groupBy(_._1).flatMap { case (q, keys) =>
      keys.toSeq.map { k => (k._2, recip(dense.get(k)) + recip(sparse.get(k))) }
        .sortBy { case (d, s) => (-s, d) }.take(RrfTopK).zipWithIndex
        .map { case ((d, s), i) => (q, i + 1L, d, s) }
    }.toSet
    val got = Retrieval.simSearchHybridRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("sim_search_range returns exactly the pairs at or above the rank-derived cutoff, map-only") {
    import Retrieval._
    val vecs = graft.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0d; var na = 0d; var nb = 0d; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val all = vecs.filter(_._1 < 10).flatMap { case (q, qv) =>
      vecs.filter(_._1 != q).map { case (d, dv) => (q, d, cos(qv, dv)) }
    }
    val tau = all.map(_._3).sorted(Ordering[Double].reverse).take(RangeTauRank).min
    val expected = all.filter(_._3 >= tau).map(t => (t._1, t._2)).toSet

    val out = Retrieval.simSearchRange(spark, sf)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.size >= RangeTauRank, s"${got.size} rows — data-derived τ must yield ≥ $RangeTauRank")

    // 100 TB pin: scoring is a broadcast join, τ is a TakeOrdered scalar,
    // the answer is a map-only filter — no hash-partition shuffle at all
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan.take(800))
    assert(!plan.contains("Exchange hashpartitioning") && !plan.contains("Window"), plan.take(800))
  }

  test("sim_search_coarse_refine: recall@5 >= 0.8 vs exact, ids-only shortlist, WindowGroupLimit") {
    import Retrieval._
    val out = Retrieval.simSearchCoarseRefine(spark, sf)
    val rows = out.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 5L))
      assert(rs.forall(_.getLong(2) != q))
    }
    // funnel recall floor vs the exact brute-force top-5 — random synthetic
    // vectors are the worst case for a prefix-dim proxy (no Matryoshka
    // variance concentration); (CoarseDims=32, CoarseK=100) measured 0.92
    val exact = Similarity.simSearchTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val approx = byQ.view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val denom = exact.values.map(_.size).sum.toDouble
    val hits = exact.map { case (q, s) => (approx.getOrElse(q, Set.empty) & s).size }.sum
    val recall = hits / denom
    assert(recall >= 0.8, f"coarse-refine recall@5 = $recall%.2f < 0.8")
    // the coarse shortlist must rank STRICTLY fewer than the corpus into
    // the refine stage (the funnel is real) and the rank filters keep
    // WindowGroupLimit so the shortlist shuffle stays bounded per task
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
    assert(CoarseK * 10 < 10 * 499, "shortlist must be smaller than brute force")
  }

  test("dedup_minhash_oph: one-permutation signatures find the identical verified pair set as the 64-permutation index") {
    val oph = Dedup.dedupMinhashOph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val classic = Dedup.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(oph == classic, s"oph ${oph.size} pairs vs classic ${classic.size}")
    assert(oph.nonEmpty)
  }

  test("OPH densification: short docs (mostly-empty bins) get complete deterministic signatures") {
    import spark.implicits._
    // 4-token docs → 2 shingles → at most 2 of 64 bins filled; the other
    // 62 values exist only through rotation densification
    val tiny = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val idx1 = Dedup.ophSignatureIndex(spark, tiny).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](2))).toMap
    val idx2 = Dedup.ophSignatureIndex(spark, tiny).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](2))).toMap
    assert(idx1 == idx2) // densification is deterministic
    assert(idx1(1L).length == 16 && idx1(1L).forall(_ != 0L))
    assert(idx1(1L) == idx1(2L), "identical docs must get identical signatures")
    assert(idx1(1L) != idx1(3L), "disjoint docs should not collide on all 16 bands")
  }
}
