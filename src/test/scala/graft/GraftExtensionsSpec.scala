package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions wires strategy + function") {
    // a separate session with the extensions installed declaratively
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // function resolves from SQL without programmatic registration
      val v = s.sql("SELECT hex_to_dec38('0xff') AS d").head().getDecimal(0)
      assert(v.longValueExact() == 255L)
      // the as-of strategy is present in the session's planner strategies
      import java.sql.Timestamp
      import s.implicits._
      val left = Seq((1L, 1L, Timestamp.valueOf("2024-01-02 00:00:00"))).toDF("id", "k", "t")
      val right = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"), "m")).toDF("rk", "rt", "tag")
      val out = graft.plans.NativeAsofJoin.asof(left, right, "k", "rk", "t", "rt", Seq("tag"))
      assert(out.head().getAs[String]("asof_tag") == "m")
    } finally {
      // do not stop: the shared test session may be the same underlying
      // context; just leave it for the JVM to clean up
    }
  }

  test("IntersectCountRewrite: literal-set overlap counts get the probe kernel, results unchanged") {
    // the suite's shared session may already be default — getOrCreate
    // would silently reuse it WITHOUT extensions ("only runtime SQL
    // configurations will take effect") and this spec would assert against
    // the wrong session. Clear, build extended, restore.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
    import org.apache.spark.sql.functions._
    import s.implicits._
    // RDD-backed so ConvertToLocalRelation can't fold the whole query away
    val df = s.createDataFrame(
        s.sparkContext.parallelize(
          Seq("a b b c", "x y", "c a").map(t => org.apache.spark.sql.Row(t)), 2),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType))))
      .select(split(col("text"), " ").as("toks"))
    val q = df.select(
      size(array_intersect(col("toks"), lit(Array("a", "c", "z")))).as("n"))
    // the optimizer must have swapped in the kernel...
    assert(q.queryExecution.optimizedPlan.toString.contains("token_overlap_count"),
      q.queryExecution.optimizedPlan.toString.take(400))
    // ...and literal-first argument order rewrites too
    val q2 = df.select(
      size(array_intersect(lit(Array("a", "c", "z")), col("toks"))).as("n"))
    assert(q2.queryExecution.optimizedPlan.toString.contains("token_overlap_count"))
    // distinct-overlap counts, bit-for-bit what array_intersect counts
    assert(q.collect().map(_.getInt(0)).toSeq == Seq(2, 0, 2))
    assert(q2.collect().map(_.getInt(0)).toSeq == Seq(2, 0, 2))
    // a literal containing NULL keeps array_intersect (NULL ∩ NULL matches
    // there; the token kernel is for sets), and column-column intersects
    // are untouched
    val q3 = df.select(
      size(array_intersect(col("toks"), lit(Array("a", null)))).as("n"))
    assert(!q3.queryExecution.optimizedPlan.toString.contains("token_overlap_count"))
    val q4 = df.select(size(array_intersect(col("toks"), col("toks"))).as("n"))
    assert(!q4.queryExecution.optimizedPlan.toString.contains("token_overlap_count"))
    // provably sorted-distinct long arrays on BOTH sides → the two-pointer
    // merge kernel; result equals the array_intersect count
    val q5 = df.select(
      size(array_intersect(
        sort_array(array_distinct(transform(col("toks"), t => xxhash64(t)))),
        sort_array(array_distinct(transform(reverse(col("toks")), t => xxhash64(t)))))).as("n"))
    assert(q5.queryExecution.optimizedPlan.toString.contains("sorted_intersect_size"),
      q5.queryExecution.optimizedPlan.toString.take(400))
    // same token multiset both sides here, so overlap = distinct count
    assert(q5.collect().map(_.getInt(0)).toSeq == Seq(3, 2, 2))
    // unsorted (no sort_array) or non-long arrays stay on array_intersect
    val q6 = df.select(size(array_intersect(
      array_distinct(transform(col("toks"), t => xxhash64(t))),
      array_distinct(transform(col("toks"), t => xxhash64(t))))).as("n"))
    assert(!q6.queryExecution.optimizedPlan.toString.contains("sorted_intersect_size"))
    val q7 = df.select(size(array_intersect(
      sort_array(array_distinct(col("toks"))),
      sort_array(array_distinct(col("toks"))))).as("n"))
    assert(!q7.queryExecution.optimizedPlan.toString.contains("sorted_intersect_size"))
    // long arrays with a NULLABLE element must NOT rewrite: sort_array(asc)
    // puts NULL first and the merge kernel would read it as 0, turning
    // [null,5] ∩ [0,5] = 1 into 2 (the r12 ADVICE finding)
    val nullableLong = when(length(col("toks")(0)) < 0, xxhash64(col("toks")(0)))
    val q8 = df.select(size(array_intersect(
      sort_array(array_distinct(array(nullableLong, lit(5L)))),
      sort_array(array_distinct(array(lit(0L), lit(5L)))))).as("n"))
    assert(!q8.queryExecution.optimizedPlan.toString.contains("sorted_intersect_size"),
      q8.queryExecution.optimizedPlan.toString.take(400))
    assert(q8.collect().map(_.getInt(0)).toSeq == Seq(1, 1, 1))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
