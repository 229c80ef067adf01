package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.Tables.t

class AggregatesSpec extends SparkTestBase {

  test("agg_robust_mad: histogram median equals the exact sorted-median mirror; no value-buffering percentile in the plan") {
    val q = Aggregates.aggRobustMad(spark, sf)
    val out = q.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    // independent driver-side mirror: sort each group's raw micro values and
    // take the two middle elements directly (the definitionally-exact path
    // the distributed histogram median must reproduce)
    import spark.implicits._
    val raw = t(spark, sf, "events").filter(col("value").isNotNull)
      .select(col("event_type"), round(col("value") * 1e6).cast(LongType).as("v"))
      .as[(String, Long)].collect()
    def med2(xs: Array[Long]): Long = {
      val s = xs.sorted; val n = s.length
      s((n + 1) / 2 - 1) + s(n / 2 + 1 - 1)
    }
    val expected = raw.groupBy(_._1).toSeq.map { case (et, g) =>
      val xs = g.map(_._2)
      val m2 = med2(xs)
      val dev2 = xs.map(x => math.abs(2 * x - m2))
      val m4 = med2(dev2)
      (et, xs.length.toLong, m2, m4, dev2.count(d => 2 * d > 3 * m4).toLong)
    }.sortBy(_._1)
    assert(out == expected)
    // scale contract: no sort-based `percentile` that buffers every group
    // value in its aggregation buffer, and no single-partition exchange —
    // both windows partition by the group key over the COMPACTED histogram
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("percentile"), plan.take(800))
    assert(!plan.contains("SinglePartition"), plan.take(800))
  }

  test("win_moving_avg_range: day-bucket plan equals the RANGE window, with no Window node") {
    val got = Aggregates.winMovingRange(spark, sf)

    // The whole point of the rewrite: the single-task global window is gone.
    // Any WindowExec in this plan would mean the entire fact table funnels
    // through one partition at scale.
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"plan still contains a Window operator:\n$plan")
    // ... and the per-day frame comes back via broadcast, not a shuffle of
    // the fact table.
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"moving-day frame is not broadcast:\n$plan")

    // Reference semantics: the textbook RANGE BETWEEN 7 PRECEDING AND
    // CURRENT ROW global window (fine at test scale).
    val day = datediff(col("o_orderdate"), lit("1970-01-01")).cast(LongType)
    val w = Window.orderBy("d").rangeBetween(-7, 0)
    val want = t(spark, sf, "orders")
      .withColumn("d", day)
      .withColumn("mv_sum", sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast(DecimalType(38, 2)))
      .withColumn("mv_n", count(lit(1)).over(w))
      .select("o_orderkey", "d", "mv_sum", "mv_n")

    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "day-bucket moving range diverges from the RANGE window formulation")
  }

  test("lateral correlated aggregate decorrelates: no per-row nested loop, one row per customer") {
    val df = Relational.joinLateral(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"lateral subquery did not decorrelate:\n$plan")
    assert(df.count() == t(spark, sf, "customer").count())
  }

  test("graph_pagerank: exact integer ranks — bounded, deterministic, floor-conserving") {
    val a = GraphOps.graphPagerank(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank_micro")))
    val U = 1000000000000L
    assert(a.nonEmpty)
    // every rank carries at least the damping base; floor division only
    // loses mass, so the total never exceeds the initial N·U
    assert(a.forall(_._2 >= 15 * U / 100))
    assert(a.map(_._2).sum <= a.length * U)
    // exact integer arithmetic ⇒ bit-identical reruns (double PageRank
    // would wobble with partial-aggregation order)
    val b = GraphOps.graphPagerank(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank_micro")))
    assert(a.toSeq == b.toSeq)
  }

  test("graph_triangle_count equals the brute-force closure and counts each triangle once per vertex") {
    val got = GraphOps.graphTriangleCount(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.nonEmpty)
    // brute-force ground truth on the collected canonical edge set
    val n = t(spark, sf, "documents").count()
    val ids = t(spark, sf, "documents").select("doc_id").collect().map(_.getLong(0))
    val edges = ids.flatMap(d => Seq((d, (d + 1) % n), (d, (d + 2) % n), (d, (d * 7 + 3) % n)))
      .filter { case (s, d) => s != d }
      .map { case (s, d) => (math.min(s, d), math.max(s, d)) }.distinct
    val eset = edges.toSet
    // forward adjacency over canonical (low<high) edges: each triangle
    // a<b<c is generated exactly once, from edge (a,b) through c ∈ fwd(b)
    val fwd = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a0, b0) <- edges
      c <- fwd.getOrElse(b0, Set.empty) if eset((a0, c))
    } { counts(a0) += 1; counts(b0) += 1; counts(c) += 1 }
    assert(got == counts.toMap, s"got ${got.size} vertices, expected ${counts.size}")
    // sanity: per-vertex counts triple-count the triangle total
    assert(got.values.sum % 3 == 0)
  }

  test("agg_grouping_sets_id: one Expand pass, grouping_id distinguishes rollup NULLs") {
    val got = Aggregates.aggGroupingSetsId(spark, sf)
    // all four sets materialize through ONE Expand + one aggregate, not a
    // union of per-set scans
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"grouping sets did not plan an Expand:\n$plan")
    assert(!plan.contains("Union"), s"grouping sets planned per-set scans:\n$plan")

    val rows = got.collect()
    // gid 0 = both grouped; 1 = status aggregated; 2 = flag aggregated; 3 = total
    assert(rows.map(_.getAs[Long]("gid")).toSet == Set(0L, 1L, 2L, 3L))
    rows.foreach { r =>
      val gid = r.getAs[Long]("gid")
      assert(r.isNullAt(r.fieldIndex("l_linestatus")) == ((gid & 1L) == 1L))
      assert(r.isNullAt(r.fieldIndex("l_returnflag")) == ((gid & 2L) == 2L))
    }
    // the grand total row is unique and sums everything
    assert(rows.count(_.getAs[Long]("gid") == 3L) == 1)
    val total = rows.filter(_.getAs[Long]("gid") == 3L).head.getAs[Long]("n")
    assert(total == rows.filter(_.getAs[Long]("gid") == 0L).map(_.getAs[Long]("n")).sum)
  }

  test("win_fill_forward carries the last non-null observation per user") {
    val rows = Aggregates.winFillForward(spark, sf).collect()
    assert(rows.exists(_.isNullAt(2)), "synthesized gaps must exist")
    // driver-side recomputation: per user in (ts,event_id) order — which
    // the operator preserves within a user via the running frame — every
    // filled value equals the most recent non-null v
    val byUser = graft.Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
      .groupBy(_._1)
    val got = rows.map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    byUser.foreach { case (_, evs) =>
      var lastSeen: Option[Double] = None
      // sort by full-precision timestamp (getTime truncates to millis,
      // getNanos carries the sub-second part), then event_id
      evs.sortBy(e => (e._3.getTime / 1000, e._3.getNanos.toLong, e._2)).foreach { case (_, eid, _, v) =>
        if (eid % 7 != 0) lastSeen = Some(v)
        assert(got(eid) == lastSeen, s"event $eid: got ${got(eid)}, want $lastSeen")
      }
    }
  }

  test("win_interpolate_linear blends interior gaps time-weighted; one shuffle serves both neighbor frames") {
    val q = Aggregates.winInterpolateLinear(spark, sf)
    // both neighbor frames share the (user_id | us, event_id) sort, so the
    // whole operator costs ONE hash shuffle (the trailing orderBy adds the
    // deterministic-output range exchange, as everywhere in the suite) and
    // never collapses to a single partition
    val plan = q.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one hash shuffle:\n$plan")
    assert(!plan.contains("SinglePartition"), s"single-partition window:\n$plan")

    val got = q.collect().map { r =>
      r.getLong(0) -> ((r.getString(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
    }.toMap
    assert(got.values.exists(_._1 == "gap"), "interior gaps must exist")
    assert(got.values.exists(_._1 == "edge"), "edge gaps must exist")

    // driver-side mirror: per user in (ts, event_id) order, interior nulls
    // take the exact same double blend (identical association) then the
    // HALF_UP micro snap; edges stay null
    def halfUp(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val byUser = graft.Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value")).collect()
      .map { r =>
        val ts = r.getTimestamp(2)
        val us = (ts.getTime / 1000) * 1000000L + ts.getNanos / 1000L
        (r.getLong(0), r.getLong(1), us, r.getDouble(3))
      }
      .groupBy(_._1)
    byUser.foreach { case (_, evs) =>
      val s = evs.sortBy(e => (e._3, e._2))
      val vs = s.map(e => if (e._2 % 7 == 0) None else Some(e._4))
      s.indices.foreach { i =>
        val (_, eid, us, _) = s(i)
        val want: (String, Option[Long]) = vs(i) match {
          case Some(v) => ("obs", Some(halfUp(v * 1e6)))
          case None =>
            val prev = (i - 1 to 0 by -1).find(j => vs(j).isDefined)
            val next = (i + 1 until s.length).find(j => vs(j).isDefined)
            (prev, next) match {
              case (Some(p), Some(n)) =>
                val blend = vs(p).get +
                  (vs(n).get - vs(p).get) * (us - s(p)._3).toDouble /
                    (s(n)._3 - s(p)._3).toDouble
                ("gap", Some(halfUp(blend * 1e6)))
              case _ => ("edge", None)
            }
        }
        assert(got(eid) == want, s"event $eid: got ${got(eid)}, want $want")
      }
    }
  }

  // Error-bound floors for the two sketch keys (the rows-only keys' measured
  // contract, mirroring the ANN recall floors): each estimate must land
  // within EPS of the exact answer from the bitmap-exact twin / countDistinct.
  // HLL++ at rsd 0.01 and DataSketches HLL at lgK=12 (rse ~1.6%) both sit
  // far inside 5% on this data; a sketch-parameter regression (smaller
  // sketch, wrong column) fails the floor.

  test("agg_approx_distinct estimates within 5% of exact per group") {
    val eps = 0.05
    val approx = Aggregates.aggApproxDistinctRaw(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = t(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_orderkey").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (g, ex) =>
      val rel = math.abs(approx(g) - ex).toDouble / ex
      assert(rel <= eps, s"group $g: approx ${approx(g)} vs exact $ex (rel $rel > $eps)")
    }
    // the oracle-facing contract frame: exact anchors + all-true booleans
    val contract = Aggregates.aggApproxDistinct(spark, sf).collect()
    assert(contract.map(_.getString(0)).toSet == exact.keySet)
    contract.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)), s"anchor mismatch for ${r.getString(0)}")
      assert(r.getBoolean(2), s"approx_ok false for ${r.getString(0)}")
    }
  }

  test("agg_approx_quantile: exact quarter-cent anchors match a sequential mirror; rank booleans hold") {
    val out = Aggregates.aggApproxQuantile(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    val groups = t(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          .multiply(100).cast("long").as("cents"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    assert(out.keySet == groups.keySet)
    // the type-7 interpolation both engines use: idx = p*(n-1), linear —
    // exact in IEEE because cents are integers and frac ∈ {0,.25,.5,.75}
    def exactQC(vs: Array[Long], p: Double): Long = {
      val idx = p * (vs.length - 1)
      val lo = math.floor(idx).toInt
      val hi = math.ceil(idx).toInt
      val frac = idx - lo
      math.round((vs(lo) * (1 - frac) + vs(hi) * frac) * 4)
    }
    groups.foreach { case (g, vs) =>
      val (n, p50, p75, ok50, ok75) = out(g)
      assert(n == vs.length.toLong)
      assert(p50 == exactQC(vs, 0.5), s"group $g p50_qc $p50 != ${exactQC(vs, 0.5)}")
      assert(p75 == exactQC(vs, 0.75), s"group $g p75_qc $p75 != ${exactQC(vs, 0.75)}")
      // the sketch's rank guarantee, surfaced into the compared frame —
      // false would ALSO fail the DuckDB oracle (which states TRUE)
      assert(ok50 && ok75, s"group $g: sketch rank guarantee violated")
    }
  }

  test("agg_hll_partitioned estimates within 5% of the bitmap-exact twin, merged included") {
    val eps = 0.05
    val approx = Aggregates.aggHllPartitionedRaw(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exactPerGroup = Aggregates.aggBitmapDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactMerged = t(spark, sf, "lineitem")
      .agg(countDistinct("l_suppkey")).head().getLong(0)
    val exact = exactPerGroup + ("__all__" -> exactMerged)
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (g, ex) =>
      val rel = math.abs(approx(g) - ex) / ex
      assert(rel <= eps, s"group $g: approx ${approx(g)} vs exact $ex (rel $rel > $eps)")
    }
    // the oracle-facing contract frame: exact anchors + all-true booleans
    val contract = Aggregates.aggHllPartitioned(spark, sf).collect()
    assert(contract.map(_.getString(0)).toSet == exact.keySet)
    contract.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)), s"anchor mismatch for ${r.getString(0)}")
      assert(r.getBoolean(2), s"approx_ok false for ${r.getString(0)}")
    }
  }

  test("win_retention_cohort: offset-0 equals cohort size; users never precede their cohort") {
    val rows = Aggregates.winRetentionCohort(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // every cohort has a day-0 row (its members were active on their first day)
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (c, rs) =>
      assert(rs.exists(_._2 == 0L), s"cohort $c missing day-0 row")
      assert(rs.forall(_._2 >= 0L), s"cohort $c has negative offset")
    }
    // day-0 user count equals the cohort's distinct-user count, recomputed
    val ev = t(spark, sf, "events").select(col("user_id"), to_date(col("ts")).as("d"))
    val cohortSizes = ev.groupBy("user_id").agg(min("d").as("c"))
      .groupBy("c").count().collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    byCohort.foreach { case (c, rs) =>
      assert(rs.find(_._2 == 0L).get._3 == cohortSizes(c), s"cohort $c day-0 mismatch")
    }
    // retention never exceeds cohort size
    rows.foreach { case (c, _, n) => assert(n <= cohortSizes(c)) }
  }

  test("agg_dp_counts: released = clamp(true + rounded noise), reproducible, and the noise IS Laplace(b)") {
    import spark.implicits._
    val rows = Aggregates.aggDpCounts(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTrue, noiseMicro, nRel) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val rounded = math.signum(noiseMicro) * ((math.abs(noiseMicro) + 500000L) / 1000000L)
      assert(nRel == math.max(0L, nTrue + rounded), s"release arithmetic broke: $r")
      assert(nRel >= 0L)
    }
    // reproducible-release discipline: rerun publishes byte-identical noise
    val again = Aggregates.aggDpCounts(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // the hash-seeded inverse-CDF draw really is Laplace(b): over 4000
    // synthetic group keys, mean |X| estimates b (std err ~ b/sqrt(n) -> 3
    // sigma ~ 5%) and the sign is balanced
    val b = Aggregates.DpLaplaceScale
    val draws = spark.range(4000)
      .select(Aggregates.dpNoiseMicro(concat(lit("synth:"), col("id").cast("string"))).as("x"))
      .as[Long].collect().map(_ / 1e6)
    val meanAbs = draws.map(math.abs).sum / draws.length
    assert(math.abs(meanAbs - b) < 0.15 * b, s"mean |noise| $meanAbs vs Laplace scale $b")
    val pos = draws.count(_ > 0).toDouble / draws.length
    assert(pos > 0.45 && pos < 0.55, s"sign imbalance: $pos positive")
  }
}
