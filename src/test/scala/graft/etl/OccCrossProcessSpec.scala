package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Cross-PROCESS stress for the OCC lake. The in-JVM hammer
  * (EtlOpsSpec) already linearizes 6 racing threads; hard-link CAS
  * semantics differ across processes only in the failure modes — partial
  * writes and orphaned tmp spills left by a kill mid-commit — so this
  * suite forks real committer JVMs ([[OccHammer]], Spark-free) against
  * one lake root on the shared filesystem, kills one inside the torn
  * window, and asserts the manifest chain never notices: no gaps, no
  * duplicate versions, every reported commit exactly its recorded append,
  * the orphan invisible to readers, and a restarted committer proceeding
  * from the observed latest.
  */
class OccCrossProcessSpec extends AnyFunSuite {

  private val javaBin =
    java.nio.file.Paths.get(System.getProperty("java.home"), "bin", "java").toString

  /** The forked test JVM carries the full test classpath; the child only
    * needs scala-library + the graft classes from it. */
  private val cp = System.getProperty("java.class.path")

  private def launch(root: String, id: Int, startOp: Int, endOp: Int,
      crashAt: Option[Int] = None): Process = {
    val cmd = Seq(javaBin, "-Xmx256m", "-cp", cp, "graft.etl.OccHammer",
      root, id.toString, startOp.toString, endOp.toString) ++
      crashAt.map(_.toString)
    new ProcessBuilder(cmd: _*).redirectErrorStream(false).start()
  }

  private def stdoutCommits(p: Process): Seq[(Long, String)] = {
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    out.linesIterator.collect {
      case l if l.startsWith("COMMIT ") =>
        val Array(_, v, f) = l.split(" ", 3)
        (v.toLong, f)
    }.toSeq
  }

  test("3 committer JVMs race one lake, one killed mid-commit: gap-free chain, invisible orphan, restarted committer proceeds") {
    import Snapshots.Entry
    val root = graft.Tables.scratchDir("occ_xproc")
    Snapshots.commit(root, 1, Seq(Entry("data/base/f0.parquet", 0, 0, 0)))

    val nOps = 12
    val crashOp = 5
    // committer 1 dies inside the torn window at op 5 (5 commits landed);
    // committers 2 and 3 run all 12 ops each, concurrently
    val procs = Seq(
      launch(root, 1, 0, nOps, crashAt = Some(crashOp)),
      launch(root, 2, 0, nOps),
      launch(root, 3, 0, nOps))
    procs.foreach { p =>
      assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS), "committer hung")
    }
    assert(procs.head.exitValue() == 137, "crash injection did not fire")
    assert(procs.tail.forall(_.exitValue() == 0), "surviving committer failed")
    val phase1 = procs.flatMap(stdoutCommits)
    assert(phase1.size == crashOp + 2 * nOps,
      s"expected ${crashOp + 2 * nOps} phase-1 commits, got ${phase1.size}")

    // the kill really left a partial write behind...
    val manifests = new java.io.File(s"$root/_manifests")
    val orphans = manifests.listFiles().filter(_.getName.startsWith(".tmp-v"))
    assert(orphans.nonEmpty, "no orphaned tmp spill — the crash window was not exercised")
    // ...and readers never see it: every version resolves purely from
    // published manifests
    val latest1 = Snapshots.latestVersion(root)
    assert(latest1 == 1L + phase1.size, s"version chain has a gap/dup: latest $latest1")

    // a restarted committer 1 (fresh JVM, same identity) proceeds from the
    // observed latest — the crash left nothing it must clean up first
    val restart = launch(root, 1, crashOp, nOps)
    assert(restart.waitFor(120, java.util.concurrent.TimeUnit.SECONDS), "restart hung")
    assert(restart.exitValue() == 0, "restarted committer failed")
    val phase2 = stdoutCommits(restart)
    assert(phase2.size == nOps - crashOp)

    val all = phase1 ++ phase2
    val totalCommits = all.size
    // crash op 5 never committed in phase 1; the restart redid ops 5..11,
    // so committer 1 still lands all 12 — 36 commits total
    assert(totalCommits == 3 * nOps)
    val latest = Snapshots.latestVersion(root)
    assert(latest == 1L + totalCommits, s"final chain gap/dup: latest $latest vs ${1L + totalCommits}")

    // linearizable history across processes: the reported (version, file)
    // pairs are exactly versions 2..latest, each version's manifest is its
    // predecessor plus exactly its recorded file, and row mass is conserved
    val byV = all.sortBy(_._1)
    assert(byV.map(_._1) == (2L to latest),
      s"reported versions not consecutive: ${byV.map(_._1)}")
    byV.foreach { case (v, f) =>
      val prev = Snapshots.entries(root, v - 1).map(_.file).toSet
      val cur = Snapshots.entries(root, v).map(_.file).toSet
      assert(cur == prev + f, s"v$v is not exactly its recorded append of $f")
    }
    assert(Snapshots.entries(root, latest).map(_.rows).sum == totalCommits.toLong,
      "row mass not conserved across the crash/restart")
    // the orphan tmp never entered any manifest
    val everyFile = (1L to latest).flatMap(v => Snapshots.entries(root, v).map(_.file))
    assert(!everyFile.exists(_.contains(".tmp")), "a tmp spill leaked into a manifest")
  }
}
