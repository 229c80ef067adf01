package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CustomFnsSpec extends SparkTestBase {

  test("HexToDec38 parses bare and 0x hex, nulls overflow and garbage") {
    import spark.implicits._
    HexToDec38.register(spark)
    val df = Seq("ff", "0xFF", "0", "f" * 40, "zz", "0x", "115792").toDF("h")
      .withColumn("d", expr("hex_to_dec38(h)"))
    val out = df.collect().map(r => Option(r.getDecimal(1)).map(_.toBigInteger.toString))
    assert(out(0).contains("255"))
    assert(out(1).contains("255"))
    assert(out(2).contains("0"))
    assert(out(3).isEmpty) // 2^160-1 has 49 digits > 38 -> null
    assert(out(4).isEmpty) // garbage -> null
    assert(out(5).isEmpty) // empty after prefix -> null
    assert(out(6).contains(BigInt("115792", 16).toString))
  }

  test("HexToDec38 survives whole-stage codegen and interpreted eval equally") {
    import spark.implicits._
    HexToDec38.register(spark)
    val n = 1000
    val df = spark.range(n).select(expr("hex_to_dec38(hex(id))").as("d"), col("id"))
    assert(df.filter(col("d") === col("id").cast("decimal(38,0)")).count() == n)
  }

  test("exact top-k Aggregator equals the window-function answer") {
    val agg = CustomFns.aggTopkExact(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val win = graft.Tables.t(spark, sf, "orders")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("o_orderpriority", "rank", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(agg.sorted.toSeq == win.sorted.toSeq)
  }

  test("hexToDecimalString udf handles full uint256 width") {
    import spark.implicits._
    val max256 = "f" * 64
    val out = Seq(max256, "0x" + max256).toDF("h")
      .select(CustomFns.hexToDecimalString(col("h"))).collect()
    val expected = (BigInt(2).pow(256) - 1).toString
    assert(out.forall(_.getString(0) == expected))
  }

  test("PackedOrder.pack orders by value first, key as tie-break, across the domain") {
    import spark.implicits._
    // corners of the documented domain: value < 2^31, key < 2^32
    val rows = Seq(
      (0L, 0L), (0L, (1L << 32) - 1),                     // min value, key range
      (1L, 0L),                                           // value dominates any key
      ((1L << 31) - 1, 0L), ((1L << 31) - 1, (1L << 32) - 1)) // max corner
    val packed = rows.toDF("v", "k")
      .select(col("v"), col("k"), graft.functions.PackedOrder.pack(col("v"), col("k")).as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // packed order == lexicographic (value, key) order, and no overflow
    val byPacked = packed.sortBy(_._3).map(t => (t._1, t._2))
    val byPair = packed.sortBy(t => (t._1, t._2)).map(t => (t._1, t._2))
    assert(byPacked.toSeq == byPair.toSeq)
    assert(packed.forall(_._3 >= 0L), "no Long overflow inside the domain")
  }

  test("agg_heavy_hitters: in-capacity sketch equals the exact top-10; eviction path keeps the MG bound") {
    import org.apache.spark.sql.functions._
    // exactness precondition the oracle relies on: vocab is far below c
    val vocab = graft.Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t")).distinct().count()
    assert(vocab < HeavyHitters.Capacity / 4,
      s"vocab $vocab approaches sketch capacity — the oracle's exactness assumption is breaking")
    val sketch = HeavyHitters.aggHeavyHitters(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val exact = graft.Tables.t(spark, sf, "documents")
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, n) => (-n, t) }.take(10)
    assert(sketch.toSeq == exact.toSeq)
    // under-capacity behavior: tiny c over a known stream, after an
    // arbitrary merge split — counts underestimate by <= n/(c+1), and every
    // item with true frequency > n/(c+1) survives (Misra-Gries; PODS'12 merge)
    val stream = Seq.fill(60)("a") ++ Seq.fill(25)("b") ++ Seq.fill(8)("c") ++
      (1 to 20).map(i => s"x$i")
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size
    val mg = new HeavyHittersAggregator(3)
    val splits = Seq(0, 13, 37, 61, 89, n)
    val parts = splits.zip(splits.tail).map { case (a, b) =>
      stream.slice(a, b).foldLeft(mg.zero)(mg.reduce)
    }
    val merged = parts.reduce(mg.merge)
    assert(merged.size <= 3)
    val bound = n / (3 + 1)
    merged.foreach { case (k, est) =>
      assert(est <= truth(k) && truth(k) - est <= bound, s"$k est $est true ${truth(k)}")
    }
    truth.collect { case (k, tn) if tn > bound => k }
      .foreach(k => assert(merged.contains(k), s"guaranteed heavy hitter $k evicted"))
  }

  test("KmvAggregator: state is sorted/distinct/capped; any partition split merges to the true bottom-k") {
    val k = 16
    val kmv = new KmvAggregator(k)
    val rng = new scala.util.Random(7)
    // duplicates on purpose: multiplicity must not affect the state
    val stream = Vector.fill(500)(rng.nextLong(1L << 40)) ++ Vector.fill(500)(rng.nextLong(1L << 40))
    val expect = stream.distinct.sorted.take(k)
    val sequential = stream.foldLeft(kmv.zero)(kmv.reduce)
    assert(sequential.toSeq == expect)
    val splits = Seq(0, 3, 111, 512, 700, stream.size)
    val parts = splits.zip(splits.tail).map { case (a, b) =>
      stream.slice(a, b).foldLeft(kmv.zero)(kmv.reduce)
    }
    parts.foreach { p =>
      assert(p.length <= k && p.toSeq == p.toSeq.distinct.sorted, "partial state not sorted/distinct/capped")
    }
    assert(parts.reduce(kmv.merge).toSeq == expect, "merge order broke bottom-k")
    assert(parts.reverse.reduce(kmv.merge).toSeq == expect, "merge is not commutative")
  }

  test("agg_kmv_distinct: sub-K groups exact, over-K groups inside 3x the KMV standard error, layout-invariant") {
    import graft.functions.KmvSketch.K
    val rows = KmvSketch.aggKmvDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nKept, est, tru, errPpm) =
        (r.getAs[Long]("n_kept"), r.getAs[Long]("est_distinct"),
          r.getAs[Long]("true_distinct"), r.getAs[Long]("err_ppm"))
      assert(nKept <= K)
      if (nKept < K) assert(est == tru, s"sub-K group must be exact: est $est true $tru")
      else {
        // KMV relative standard error ~ 1/sqrt(K-2); allow 3 sigma
        val bound = (3.0 / math.sqrt(K - 2) * 1e6).toLong
        assert(errPpm <= bound, s"err $errPpm ppm > 3-sigma bound $bound ppm (true $tru)")
      }
    }
    // the sketch is a function of the input SET: immune to partitioning/order
    val again = KmvSketch.aggKmvDistinct(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("sortedIntersectSize equals size(array_intersect) on sorted-distinct arrays; codegen'd") {
    import spark.implicits._
    // deterministic pseudo-random sorted-distinct long sets, incl. empties,
    // disjoint pairs, identical pairs, and subset pairs
    val rnd = new scala.util.Random(42)
    val cases = (0 until 200).map { i =>
      val a = Array.fill(rnd.nextInt(60))(rnd.nextInt(100).toLong).distinct.sorted
      val b = i % 4 match {
        case 0 => Array.fill(rnd.nextInt(60))(rnd.nextInt(100).toLong).distinct.sorted
        case 1 => a // identical
        case 2 => a.filter(_ % 3 == 0) // subset
        case 3 => a.map(_ + 1000L) // disjoint
      }
      (a.toSeq, b.toSeq)
    }
    val df = cases.toDF("a", "b")
      .withColumn("fast", SortedSetOps.sortedIntersectSize(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
    // null array propagates null
    val withNull = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(SortedSetOps.sortedIntersectSize(col("a"), col("b"))).collect()
    assert(withNull.head.isNullAt(0))
    // the kernel stays inside whole-stage codegen (no interpreted fallback
    // in the hot verify loop): assert on a range-derived frame — the Seq
    // frame above constant-folds to a LocalTableScan (which itself proves
    // the interpreted eval path), so it can't witness codegen
    val ranged = spark.range(100)
      .select(expr("sequence(id, id + 5)").as("a"), expr("sequence(id + 3, id + 9)").as("b"))
      .select(SortedSetOps.sortedIntersectSize(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
    // the `*(n)` star prefix in toString marks codegen stages; assert on
    // the exec node itself and that the kernel's project sits INSIDE one
    val hasWsc = ranged.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasWsc, ranged.queryExecution.executedPlan.toString.take(500))
    assert(ranged.queryExecution.executedPlan.toString.contains("*(1) Project [sorted_intersect_size"))
    assert(ranged.filter(col("fast") =!= col("ref")).count() == 0)
    assert(ranged.filter(col("fast") =!= 3).count() == 0)
    // and equivalence holds with codegen forced off (interpreted eval path)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      assert(ranged.filter(col("fast") =!= col("ref")).count() == 0)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("NearestCentroid(s): matrix kernels equal the literal array_sort formulation incl. exact ties") {
    import spark.implicits._
    val dim = 8
    val k = 9
    val rnd = new scala.util.Random(11)
    // small-integer components make EXACT distance ties common — the
    // tie-break (lowest cell) must match array_sort's (d2, cell) order
    val cents: Array[Array[Double]] =
      Array.tabulate(k)(_ => Array.fill(dim)(rnd.nextInt(4).toDouble))
    val ids = Array.tabulate(k)(_.toLong)
    val vecs = Seq.tabulate(400)(i =>
        (i.toLong, Seq.fill(dim)(rnd.nextInt(4).toDouble)))
      .toDF("vec_id", "v")
      .cache()
    val litArr = array(cents.zip(ids).map { case (cv, cid) =>
      struct(VectorOps.vecSqDist(col("v"), typedLit(cv.toSeq)).as("d2"),
        lit(cid).as("cell"))
    }: _*)
    def run(): (Array[(Long, Double, Long, Seq[Long])], Array[(Long, Double, Long, Seq[Long])]) = {
      val fast = vecs.select(col("vec_id"),
          VectorOps.vecNearestCentroid(col("v"), cents, ids).as("m"),
          VectorOps.vecNearestCentroids(col("v"), cents, ids, 4).as("p"))
        .collect()
        .map(r => (r.getLong(0), r.getStruct(1).getDouble(0), r.getStruct(1).getLong(1),
          r.getSeq[Long](2).toSeq))
      val ref = vecs.select(col("vec_id"),
          element_at(array_sort(litArr), 1).as("m"),
          transform(slice(array_sort(litArr), 1, 4), x => x.getField("cell")).as("p"))
        .collect()
        .map(r => (r.getLong(0), r.getStruct(1).getDouble(0), r.getStruct(1).getLong(1),
          r.getSeq[Long](2).toSeq))
      (fast, ref)
    }
    val (fast, ref) = run()
    assert(fast.sortBy(_._1).toSeq == ref.sortBy(_._1).toSeq)
    // exact ties occurred (otherwise the tie-break assertion is vacuous)
    val d2s = vecs.select(explode(transform(litArr, x => x.getField("d2")))).collect().map(_.getDouble(0))
    assert(d2s.length != d2s.distinct.length, "no exact distance ties in the fixture")
    // interpreted path agrees with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val (fi, ri) = run()
      assert(fi.sortBy(_._1).toSeq == ri.sortBy(_._1).toSeq)
      assert(fi.sortBy(_._1).toSeq == fast.sortBy(_._1).toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    vecs.unpersist(): Unit
  }
}
