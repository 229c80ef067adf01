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
}
