package graft

/** Suite-wide plan hygiene: every `SparkEntry.queries` key's OPTIMIZED plan
  * is linted for the two shapes that are always wrong at 100 TB unless
  * deliberately chosen — a cartesian product and a broadcast nested-loop
  * join — so a refactor that silently degrades one operator's join into a
  * per-row loop fails the suite, not a benchmark three rounds later.
  *
  * Allowlisted exceptions are the deliberate ones, each justified inline;
  * everything else must plan joins as hash/merge with real keys.
  */
class PlanLinterSpec extends SparkTestBase {

  // key -> why a nested-loop/cartesian shape is intentional there. Audited
  // r7, re-audited r12: EMPTY since r12 — the one excused shape (the IVF
  // family's broadcast k=16-row centroid cross join in
  // Similarity.assignCells) was rewritten as a map-only literal-centroid
  // expression (scoredCellArray), so every join in the suite now plans as
  // an equi-join with real keys and nothing needs excusing.
  private val allowNestedLoop: Map[String, String] = Map.empty

  test("no query key plans an unintended cartesian or nested-loop join") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.optimizedPlan.toString
        val bad =
          (plan.contains("Join Cross") || plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin")) &&
            !allowNestedLoop.contains(name)
        if (bad) failures += s"$name plans a cartesian/nested-loop join"
      } catch {
        case e: Throwable =>
          failures += s"$name failed to build: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
