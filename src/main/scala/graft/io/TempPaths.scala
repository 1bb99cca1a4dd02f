package graft.io

/** Per-application scratch directories for queries that demonstrate a
  * write-then-read pattern (partitioned mart round trip, compaction).
  * Paths are unique per (application, input) so concurrent drivers —
  * bench and correctness, or two scale factors — never read each
  * other's output, and a JVM shutdown hook removes whatever was
  * registered (deleting earlier would break the lazily-read DataFrames
  * the queries return). */
object TempPaths {

  /** Monotone scratch epoch. The benchmark bumps this before every rep so
    * queries with per-application state (streaming checkpoints, bucketed
    * warehouse tables, write-then-read marts) get FRESH scratch paths and
    * therefore execute their full work each rep: a rep that resumes an
    * existing checkpoint measures the exactly-once no-op (0.2 s), not the
    * operator (3-16 s) — which made round-9's streaming medians
    * unusable as performance numbers. Epoch 0 (the default — Verify,
    * tests, ad-hoc use) keeps the historical stable path shape, so the
    * idempotent-resume behavior itself is still exercised wherever the
    * epoch is never bumped. */
  private val epoch = new java.util.concurrent.atomic.AtomicInteger(0)
  def bumpEpoch(): Unit = { epoch.incrementAndGet(); () }
  /** Empty at epoch 0, "_eN" after — embedded in every scratch name. */
  def epochTag: String = { val e = epoch.get; if (e == 0) "" else s"_e$e" }

  /** Catalog-safe scratch TABLE name, unique per (application, input,
    * epoch) — the warehouse-table analogue of [[scratchDir]], shared by
    * the bucketed-layout rows (q34/p54/p56): appId so concurrent drivers
    * sharing one warehouse never clobber each other, a SHA-256 prefix of
    * the discriminator (a 32-bit hashCode collision would silently reuse
    * the WRONG layout), and the epoch so benchmark reps rebuild. */
  def scratchTableName(spark: org.apache.spark.sql.SparkSession, prefix: String,
                       discriminator: String): String = {
    val app = spark.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")
    s"${prefix}_${app}_${tagOf(discriminator)}$epochTag"
  }

  /** SHA-256 prefix of the discriminator — shared by every scratch-name
    * scheme here. A 32-bit `String.hashCode` tag (the old scratch-DIR
    * device) can collide across two input dirs, and for the
    * isComplete-guarded landings a collision means the second caller is
    * silently served the FIRST corpus's payloads — a wrong-fixture bug
    * that presents as a codec/oracle mismatch. */
  private def tagOf(discriminator: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(discriminator.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString

  /** `<tmpdir>/<prefix>_<appId>_<sha(discriminator)>[_eN]`. */
  def scratchDir(spark: org.apache.spark.sql.SparkSession, prefix: String,
                 discriminator: String): String = {
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      s"${prefix}_${spark.sparkContext.applicationId}_${tagOf(discriminator)}$epochTag")
      .getAbsolutePath
    cleanupOnExit(out)
    out
  }

  /** [[scratchDir]] WITHOUT the epoch tag — for deterministic FIXTURE
    * payloads (content a pure function of the input dir) that should
    * land once per application and be reused across bench reps: the
    * epoch bump exists to force operator STATE cold per rep, and
    * re-synthesizing an identical fixture per rep only times the
    * generator, not the operator (the p68 GIF payloads were the
    * costliest example). Pair with isComplete/markComplete. */
  def stableScratchDir(spark: org.apache.spark.sql.SparkSession,
                       prefix: String, discriminator: String): String = {
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      s"${prefix}_${spark.sparkContext.applicationId}_${tagOf(discriminator)}")
      .getAbsolutePath
    cleanupOnExit(out)
    out
  }

  private val landLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Land a deterministic fixture DataFrame ONCE per application and
    * serve it from parquet thereafter — the [[stableScratchDir]] +
    * isComplete/markComplete + per-path-lock device the media fixture
    * rows share (epoch tag deliberately absent: epochs force operator
    * STATE cold, and a fixture that is a pure function of the input dir
    * is not state; re-synthesizing it per bench rep only times the
    * generator). The marker is written only after a complete overwrite,
    * so a crash mid-landing is healed by the next caller's rebuild;
    * the per-path lock keeps two same-fixture landings in one app from
    * clobbering each other's part files. */
  def landOnce(spark: org.apache.spark.sql.SparkSession, prefix: String,
               discriminator: String)(
      build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = stableScratchDir(spark, prefix, discriminator)
    val lock = landLocks.computeIfAbsent(dir, _ => new Object)
    lock.synchronized {
      if (!isComplete(dir)) {
        build.write.mode("overwrite").parquet(dir)
        markComplete(dir)
      }
    }
    spark.read.parquet(dir)
  }

  /** Run `body` under the per-path landing lock [[landOnce]] uses — for
    * callers that land a shared fixture through their own multi-step
    * protocol (part-file moves, mtime stamping) rather than a single
    * parquet write, so two concurrent landings of one dir in one app
    * cannot both see `!isComplete` and interleave their moves. */
  def withLandingLock[A](path: String)(body: => A): A =
    landLocks.computeIfAbsent(path, _ => new Object).synchronized(body)

  private val scratchSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** [[scratchDir]] plus a per-call uniqueness token (thread id + a
    * process-wide counter). For short-lived STAGING directories: the
    * deterministic scratchDir name is the right ownership story for
    * resumable state (checkpoints, landed fixtures), but a staging dir
    * is written-then-deleted within one call — two CONCURRENT landings
    * of the same (prefix, discriminator) in one app would share the
    * deterministic name and clobber each other's part files mid-build
    * (the collision-freedom the old bare createTempDirectory had, kept
    * here WITH the appId ownership + exit-hook cleanup). */
  def uniqueScratchDir(spark: org.apache.spark.sql.SparkSession,
                       prefix: String, discriminator: String): String = {
    val unique = s"t${Thread.currentThread().getId}n${scratchSeq.incrementAndGet()}"
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      s"${prefix}_${spark.sparkContext.applicationId}_${tagOf(discriminator)}_$unique$epochTag")
      .getAbsolutePath
    cleanupOnExit(out)
    out
  }

  /** Warehouse temp dir with the creating PROCESS's pid embedded in the
    * name. The warehouse must be chosen before the SparkSession exists,
    * so the appId-ownership convention scratchDir uses is unavailable —
    * and without any ownership token a live sibling's warehouse was
    * protected from [[sweepStale]] only by the 2h newest-mtime
    * heuristic, which fails for a session that built its tables early
    * and then only READS them (reads do not bump mtimes). The pid token
    * gives the sweeper a liveness check that outlives any idle window. */
  def newWarehouseDir(): String =
    java.nio.file.Files.createTempDirectory(
      s"graft-warehouse_pid${ProcessHandle.current().pid()}_").toString

  /** Pid embedded by [[newWarehouseDir]], if the name carries one. */
  private val pidToken = """_pid(\d+)_""".r

  /** True iff the pid embedded in `name` belongs to a LIVE process that
    * was ALREADY RUNNING when the directory was created. The second
    * check is what defeats pid recycling: after a reboot (or a pid
    * wraparound on a busy box) an unrelated process can hold the same
    * pid, and liveness alone would then protect a stale warehouse dir
    * from [[sweepStale]] forever — unbounded /tmp growth. A process
    * whose start instant is NEWER than the directory cannot be the
    * creator, so its liveness is irrelevant. Missing metadata on either
    * side degrades to the conservative keep. */
  private def ownerAlive(name: String, dir: java.io.File): Boolean =
    pidToken.findFirstMatchIn(name).exists { m =>
      try {
        val h = ProcessHandle.of(m.group(1).toLong)
        h.isPresent && h.get.isAlive && {
          val started = h.get.info().startInstant()
          val created =
            try java.nio.file.Files
              .readAttributes(dir.toPath,
                classOf[java.nio.file.attribute.BasicFileAttributes])
              .creationTime().toInstant
            catch { case _: java.io.IOException => null }
          // keep unless we can PROVE the live process post-dates the dir
          started.isEmpty || created == null ||
            !started.get.isAfter(created)
        }
      } catch { case _: SecurityException => true } // can't tell: keep
    }

  /** Best-effort sweep of scratch left behind by PRIOR runs: the exit
    * hook only covers a cleanly-exiting JVM, so a killed driver strands
    * its `graft*` dirs until someone removes them. Only directories that
    * (a) carry one of our scratch prefixes, (b) do NOT belong to
    * `ownAppId` — matched in BOTH its raw and sanitized forms, because
    * q34-style warehouse tables embed `appId.replaceAll("[^a-zA-Z0-9]",
    * "_")` which never contains the raw id — (c) do NOT carry a live
    * process's `_pid<N>_` token (warehouse dirs are created before the
    * session exists, so they carry pid ownership instead of appId), and
    * (d) have been idle past `maxAgeMs` are touched. Idleness is the
    * NEWEST mtime found recursively, not the root dir's: a directory's
    * own mtime does not update when nested files change, so a live
    * sibling's checkpoint or warehouse (actively writing deep inside)
    * would look idle at the root while its leaves are seconds old. */
  def sweepStale(ownAppId: String, roots: Seq[String],
                 maxAgeMs: Long = 2L * 3600 * 1000): Unit = {
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val prefixes = Seq("graft_", "graft-warehouse", "graft-compact-spec")
    val sanitizedAppId = ownAppId.replaceAll("[^a-zA-Z0-9]", "_")
    def newestMtime(f: java.io.File): Long = {
      val own = f.lastModified()
      val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      kids.foldLeft(own)((mx, k) =>
        math.max(mx, if (k.isDirectory) newestMtime(k) else k.lastModified()))
    }
    roots.map(new java.io.File(_)).filter(_.isDirectory).foreach { root =>
      Option(root.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { f =>
        val n = f.getName
        if (f.isDirectory && prefixes.exists(n.startsWith) &&
            !n.contains(ownAppId) && !n.contains(sanitizedAppId) &&
            !ownerAlive(n, f) && newestMtime(f) < cutoff) {
          try org.apache.commons.io.FileUtils.deleteDirectory(f)
          catch { case _: java.io.IOException => () }
        }
      }
    }
  }

  /** Terminal-marker idempotence for multi-step scratch builds (landing
    * dirs assembled file-by-file, multi-generation writes): a directory
    * is complete only when the marker exists, and the marker is written
    * LAST — so a driver killed mid-build re-lands on the next run
    * instead of silently accepting a partial fixture (which would
    * surface as an oracle mismatch, not a setup error). The underscore
    * prefix keeps the marker invisible to Spark's file listing and the
    * streaming file source (hidden-file filter). */
  def isComplete(dir: String): Boolean =
    new java.io.File(dir, "_GRAFT_COMPLETE").isFile
  def markComplete(dir: String): Unit = {
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_GRAFT_COMPLETE"),
      Array.emptyByteArray); ()
  }

  private val exitCleanupPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val exitHookInstalled: Unit = {
    sys.addShutdownHook {
      exitCleanupPaths.forEach { p =>
        try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
        catch { case _: java.io.IOException => () }
      }
    }; ()
  }

  def cleanupOnExit(path: String): Unit = {
    exitHookInstalled
    exitCleanupPaths.add(path); ()
  }
}
