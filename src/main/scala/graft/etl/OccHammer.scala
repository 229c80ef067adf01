package graft.etl

/** One OCC committer PROCESS for the cross-process lake stress
  * (OccCrossProcessSpec). The in-JVM hammer (EtlOpsSpec) proves the
  * hard-link CAS linearizes racing THREADS; what threads cannot exercise
  * is the failure surface unique to processes — a committer killed
  * mid-commit leaves partial on-disk state (an orphaned `.tmp-v*` spill in
  * `_manifests/`) that every surviving and future committer must be
  * oblivious to. This main is deliberately Spark-free so a child JVM
  * starts in ~100 ms and the contention window is real.
  *
  * Args: `<root> <committerId> <startOp> <endOp> [crashAtOp]`
  *
  * Ops `startOp until endOp`: append one unit-mass file
  * `data/p<id>/f<op>.parquet` via [[Snapshots.commitRetry]] (the hard-link
  * CAS — genuinely cross-process: link(2)/EEXIST on the shared
  * filesystem). Each committed version prints as `COMMIT <v> <file>` so
  * the parent can check the reported history against the manifest chain.
  *
  * `crashAtOp`: at that op, reproduce the kill-mid-commit end state and
  * `Runtime.halt` (no shutdown hooks, no cleanup — the JVM equivalent of
  * SIGKILL). The torn window inside [[Snapshots.tryCommit]] is
  * [tmp written .. tmp deleted]; a kill anywhere in it leaves an orphaned
  * tmp file and possibly a published link. Writing the tmp and halting is
  * byte-identical to the earliest kill point, so the injection is
  * deterministic where an external kill -9 race is flaky, while testing
  * the same on-disk contract: tmp spills are invisible to readers and
  * never block later committers.
  */
object OccHammer {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val id = args(1).toInt
    val startOp = args(2).toInt
    val endOp = args(3).toInt
    val crashAt = if (args.length > 4) Some(args(4).toInt) else None
    val maxAtt = 1000 // liveness ceiling; every Conflicted implies progress
    (startOp until endOp).foreach { j =>
      if (crashAt.contains(j)) {
        val dir = java.nio.file.Paths.get(root, "_manifests")
        val tmp = dir.resolve(s".tmp-v99-crash-$id-$j")
        java.nio.file.Files.write(tmp,
          s"data/p$id/f$j.parquet,1,$id,$id".getBytes("UTF-8")): Unit
        Console.out.flush()
        Runtime.getRuntime.halt(137)
      }
      val f = s"data/p$id/f$j.parquet"
      val v = Snapshots.commitRetry(root,
        cur => cur :+ Snapshots.Entry(f, 1, id.toLong, id.toLong), maxAtt)
      println(s"COMMIT $v $f")
    }
    Console.out.flush()
  }
}
