package graft

import graft.io.TempPaths
import java.io.File
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Scratch-path ownership, sweep safety, and terminal-marker idempotence.
  * Pure filesystem tests — no SparkSession needed except for the
  * scratchTableName cases, which only read the applicationId. */
class TempPathsSpec extends AnyFunSuite {

  private def mkDir(root: File, name: String): File = {
    val d = new File(root, name); assert(d.mkdirs()); d
  }
  private def age(f: File, hours: Long): Unit = {
    val t = System.currentTimeMillis() - hours * 3600 * 1000
    assert(f.setLastModified(t))
  }

  test("markComplete/isComplete: false until the marker is written LAST") {
    val dir = Files.createTempDirectory("tp-marker").toString
    assert(!TempPaths.isComplete(dir))
    Files.write(java.nio.file.Paths.get(dir, "part-0.parquet"), Array[Byte](1))
    assert(!TempPaths.isComplete(dir)) // data alone is not completion
    TempPaths.markComplete(dir)
    assert(TempPaths.isComplete(dir))
    // underscore prefix: invisible to Spark's hidden-file filter
    assert(new File(dir, "_GRAFT_COMPLETE").getName.startsWith("_"))
  }

  test("sweepStale deletes only stale, unowned, dead-owner scratch dirs") {
    val root = Files.createTempDirectory("tp-sweep").toFile
    val appId = "local-1700000000000"
    val sanitized = appId.replaceAll("[^a-zA-Z0-9]", "_")

    val staleOrphan = mkDir(root, "graft_otherapp_deadbeef")
    age(staleOrphan, 3)
    val freshOrphan = mkDir(root, "graft_otherapp_cafebabe") // idle < 2h
    val ownRaw = mkDir(root, s"graft_${appId}_12345678")
    age(ownRaw, 3)
    val ownSanitized = mkDir(root, s"graft_${sanitized}_87654321")
    age(ownSanitized, 3)
    val livePid = mkDir(root,
      s"graft-warehouse_pid${ProcessHandle.current().pid()}_x")
    age(livePid, 3)
    // a pid that cannot exist on Linux (pid_max caps at 2^22)
    val deadPid = mkDir(root, "graft-warehouse_pid999999999_x")
    age(deadPid, 3)
    val unrelated = mkDir(root, "someone-elses-dir")
    age(unrelated, 3)
    // stale root but a FRESH nested file: newest-mtime recursion keeps it
    val deepActive = mkDir(root, "graft_otherapp_deepwrite")
    Files.write(new File(deepActive, "leaf.bin").toPath, Array[Byte](1))
    age(deepActive, 3) // root looks idle; the leaf above is seconds old

    TempPaths.sweepStale(appId, Seq(root.toString))

    assert(!staleOrphan.exists(), "stale unowned dir must be swept")
    assert(freshOrphan.exists(), "recently-active dir must survive")
    assert(ownRaw.exists(), "own appId (raw) must survive")
    assert(ownSanitized.exists(), "own appId (sanitized) must survive")
    assert(livePid.exists(), "live pid token must survive regardless of age")
    assert(!deadPid.exists(), "dead pid token does not protect a stale dir")
    assert(unrelated.exists(), "non-graft prefixes are never touched")
    assert(deepActive.exists(), "fresh nested file must defeat stale root mtime")
  }

  test("newWarehouseDir embeds this process's pid as the ownership token") {
    val dir = TempPaths.newWarehouseDir()
    assert(new File(dir).isDirectory)
    val name = new File(dir).getName
    assert(name.contains(s"_pid${ProcessHandle.current().pid()}_"))
  }

  test("uniqueScratchDir never collides for the same (prefix, discriminator)") {
    val spark = SparkTestBase.session
    // concurrent landings of ONE fixture must get distinct staging dirs
    // (the clobber window ADVICE r14 flagged on the deterministic name);
    // uniqueness rides a process-wide counter, so it holds from any mix
    // of threads — including several calls on one thread
    val threads = (1 to 4).map { _ =>
      val out = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val t = new Thread(() => (1 to 2).foreach { _ =>
        out.add(TempPaths.uniqueScratchDir(spark, "graft_stage_spec",
          "same-landing")); ()
      })
      t.start(); (t, out)
    }
    val names = threads.flatMap { case (t, out) =>
      t.join(); scala.jdk.CollectionConverters.CollectionHasAsScala(out)
        .asScala
    }.toSet
    assert(names.size === 8, s"staging names collided: $names")
    // while the deterministic variant is shared by design
    val a = TempPaths.scratchDir(spark, "graft_det_spec", "x")
    assert(a === TempPaths.scratchDir(spark, "graft_det_spec", "x"))
  }

  test("stableScratchDir is epoch-independent (fixture payloads persist across reps)") {
    val spark = SparkTestBase.session
    val before = TempPaths.stableScratchDir(spark, "graft_stable_spec", "d")
    val scratchBefore = TempPaths.scratchDir(spark, "graft_det_spec", "x")
    TempPaths.bumpEpoch() // monotonic by design; nothing to restore
    val after = TempPaths.stableScratchDir(spark, "graft_stable_spec", "d")
    assert(before === after, "epoch bump must not move a stable fixture dir")
    // ...whereas the epoch-aware scratch DOES move (state must go cold)
    assert(TempPaths.scratchDir(spark, "graft_det_spec", "x") != scratchBefore)
  }

  test("scratchTableName is catalog-safe and collision-resistant") {
    val spark = SparkTestBase.session
    val a = TempPaths.scratchTableName(spark, "t", "bucketed|16|by-h")
    val b = TempPaths.scratchTableName(spark, "t", "bucketed|32|by-h")
    assert(a != b, "different discriminators must not collide")
    assert(a == TempPaths.scratchTableName(spark, "t", "bucketed|16|by-h"),
      "same (app, discriminator, epoch) must be stable")
    assert(a.matches("[A-Za-z0-9_]+"), "name must be catalog-identifier safe")
  }
}
