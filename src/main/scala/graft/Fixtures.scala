package graft

import java.nio.file.{Files, Path, StandardCopyOption}

/** Atomic publish-once for deterministic fixture directories under
  * java.io.tmpdir (landing zips, media PNGs, audio WAVs).
  *
  * The previous pattern — `if (!exists(sentinelFile)) writeAll(dir)` — was
  * an unsynchronized check-then-write: a concurrent Verify/Bench/test JVM
  * could read the directory mid-build and see a partial fixture set. Here
  * the build lands in a process-unique staging dir, a `_COMPLETE` marker is
  * written LAST, and the whole dir is atomically renamed into place: readers
  * see either nothing or everything. First publisher wins; losers discard
  * their staging. A legacy marker-less dir (built by an older binary, or a
  * crashed partial) is swapped aside and replaced by the freshly-built
  * complete copy, so the tree self-heals to marker-verified state.
  */
object Fixtures {

  /** Temp dirs pending removal at JVM exit (session-lifetime artifacts —
    * staged events copies, per-JVM bucketed-table locations — that cannot
    * be deleted per query but must not accumulate in tmpdir across runs).
    */
  private val cleanupAtExit =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  private lazy val exitHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      cleanupAtExit.forEach { p =>
        try org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
        catch { case _: Throwable => () }
      }))

  def tempDirCleanedAtExit(prefix: String): Path = {
    exitHook
    val dir = Files.createTempDirectory(prefix)
    cleanupAtExit.add(dir)
    dir
  }

  /** Register an externally-created dir (e.g. under a RAM-backed root
    * rather than tmpdir) for exit-time deletion — the crash-safety net
    * behind the streaming harness's transient checkpoint dirs.
    */
  def registerForExitCleanup(dir: Path): Unit = {
    exitHook
    cleanupAtExit.add(dir)
  }

  /** For dirs already removed on the normal path — keeps the hook's set small. */
  def removeFromExitCleanup(dir: Path): Unit = cleanupAtExit.remove(dir)

  /** Test seam: whether a path is registered for exit-time deletion. */
  private[graft] def isPendingExitCleanup(p: Path): Boolean =
    cleanupAtExit.contains(p)

  /** Identity tag for a derived artifact of one fixture table: scheme
    * version + sanitized source dir + a RAW-PATH identity hash + a
    * fingerprint over the table's LEAF parquet files (relative path,
    * size, mtime — recursed when the table is a directory of
    * part-files). The identity hash makes the dataset component
    * injective where sanitization is not ("/sf0.1" and "/sf0_1" share a
    * sanitized name; "sf0.1" is a sanitized-name PREFIX of "sf0.1.x"),
    * which [[sweepSuperseded]] depends on: its stale-tag prefix must
    * match THIS dataset's builds only, never a sibling dataset whose
    * live artifact would otherwise be registered for deletion. A
    * regenerated fixture changes the fingerprint; bumping `version` keys
    * out artifacts built by an older derivation.
    */
  def datasetTag(d: String, table: String, version: String): String = {
    val src = java.nio.file.Paths.get(d, s"$table.parquet")
    val leaves = {
      val st = Files.walk(src)
      try st.filter(Files.isRegularFile(_)).sorted()
        .toArray.toSeq.map(_.asInstanceOf[Path])
      finally st.close()
    }
    val fpInput = (d.hashCode.toLong +: leaves.flatMap(p => Seq(
      src.relativize(p).toString.hashCode.toLong,
      Files.size(p),
      Files.getLastModifiedTime(p).toMillis))).toArray
    val fp = java.lang.Long.toHexString(
      java.util.Arrays.hashCode(fpInput).toLong & 0xffffffffL)
    s"${datasetPrefix(d, version)}$fp"
  }

  /** The dataset-identity prefix shared by [[datasetTag]] and
    * [[sweepSuperseded]]: version + sanitized dir + hex of the RAW dir's
    * hashCode, underscore-terminated — everything in a tag except the
    * per-generation fingerprint.
    */
  private def datasetPrefix(d: String, version: String): String = {
    val idHex = java.lang.Long.toHexString(d.hashCode.toLong & 0xffffffffL)
    s"${version}_${d.replaceAll("[^a-zA-Z0-9]", "_")}_${idHex}_"
  }

  /** Stage-once home for a FINGERPRINT-TAGGED derived artifact of one
    * fixture table (`$tmpdir/$family/<tag>` via [[datasetTag]] +
    * [[ensure]]), with the sweep the bare composition lacked: every
    * fixture regeneration mints a new tag, and the superseded sibling —
    * a full fact-table copy for the compaction input — previously just
    * accumulated. Stale tags (same family + version + dataset prefix,
    * different fingerprint) are registered for EXIT-time deletion rather
    * than deleted in place, because a concurrently running JVM may still
    * hold lazy scans over the old tag; in-flight `_staging_` dirs are
    * left to their owners.
    */
  def ensureDerived(family: String, d: String, table: String,
      version: String, extraTables: Seq[String] = Nil)(
      build: Path => Unit): Path = {
    val parent = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), family)
    // multi-source artifacts COMBINE every source table's generation
    // fingerprint into the one bare-hex fingerprint slot the sweep
    // contract expects — folding a second fingerprint into the VERSION
    // string instead (the r11 first cut) changes the identity prefix per
    // generation, so sweepSuperseded never matches the superseded
    // sibling and full artifact copies accumulate forever. The combine
    // is a REAL digest (md5 truncated to 8 hex chars, same width as the
    // single-table slot): composing Java hashCodes here would let a
    // 32-bit-hashCode collision across fixture regenerations silently
    // serve a stale artifact, which then fails the oracle gate with no
    // pointer back to the cache
    val tag =
      if (extraTables.isEmpty) datasetTag(d, table, version)
      else {
        val prefix = datasetPrefix(d, version)
        val fps = (table +: extraTables)
          .map(tb => datasetTag(d, tb, version).drop(prefix.length))
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(fps.mkString("|").getBytes("UTF-8"))
        val combined = md.take(4).map("%02x".format(_)).mkString
        s"$prefix$combined"
      }
    val dir = ensure(parent.resolve(tag))(build)
    sweepSuperseded(family, d, version, tag)
    dir
  }

  /** Register stale sibling tags of a live artifact for exit-time
    * deletion: same family + scheme version + dataset identity (sanitized
    * name AND raw-path hash — see [[datasetPrefix]]), different
    * fingerprint — i.e. builds of THIS artifact against a fixture
    * generation that no longer exists. Other datasets' tags and other
    * scheme versions never match the identity prefix, and the remainder
    * must parse as a bare fingerprint, so a sibling dataset's LIVE
    * artifact can never be registered.
    *
    * Deferral to exit time protects THIS JVM's in-flight lazy scans over
    * the old tag; it is best-effort toward OTHER JVMs (one that started
    * before the regeneration and outlives this process can still lose
    * the files at our exit). That is accepted single-host dev-harness
    * hygiene — the staged artifacts are rebuildable caches; a cluster
    * deployment manages index retention as a lifecycle policy, not a
    * tmpdir sweep.
    */
  def sweepSuperseded(family: String, d: String, version: String,
      liveTag: String): Unit = {
    val parent = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), family)
    if (!Files.isDirectory(parent)) return
    val prefix = datasetPrefix(d, version)
    val st = Files.list(parent)
    try st.forEach { p =>
      val n = p.getFileName.toString
      if (n != liveTag && n.startsWith(prefix) &&
        n.drop(prefix.length).matches("[0-9a-f]{1,8}")) {
        exitHook
        cleanupAtExit.add(p)
      }
    } finally st.close()
  }

  def ensure(dir: Path)(build: Path => Unit): Path = {
    if (!Files.exists(dir.resolve("_COMPLETE"))) {
      val staging = dir.resolveSibling(
        s"${dir.getFileName}_staging_${java.util.UUID.randomUUID()}")
      try {
        build(staging)
        Files.createFile(staging.resolve("_COMPLETE"))
        // re-check the marker RIGHT BEFORE retiring: a concurrent publisher
        // may have landed a complete dir since our first check, and moving
        // that aside would yank files out from under its lazy Spark scans
        if (!publish(staging, dir) && !Files.exists(dir.resolve("_COMPLETE"))) {
          // target exists but is legacy/partial: retire it, then try once
          // more (retired copies are swept at JVM exit, not leaked)
          val retired = dir.resolveSibling(
            s"${dir.getFileName}_retired_${java.util.UUID.randomUUID()}")
          try {
            Files.move(dir, retired, StandardCopyOption.ATOMIC_MOVE)
            cleanupAtExit.add(retired)
          } catch { case _: java.nio.file.FileSystemException => } // raced: other mover won
          exitHook
          publish(staging, dir)
        }
      } finally {
        // covers build/marker failures AND the lost-publish case — a
        // staging dir must never outlive the attempt that created it
        if (Files.exists(staging))
          org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
      }
    }
    dir
  }

  /** Atomic rename; false when the target already exists (concurrent winner
    * or legacy dir).
    */
  private def publish(staging: Path, dir: Path): Boolean =
    try {
      Files.move(staging, dir, StandardCopyOption.ATOMIC_MOVE)
      true
    } catch { case _: java.nio.file.FileSystemException => false }
}
