package graft.operators

/** Rebuild-and-swap monitor (reference scripts/reindex.py:31-248): rebuild
  * the search index into a standby core, watch the sink until writes
  * settle and the commit lands, verify the new index clears the
  * committed-docs and index-size floors, then swap the standby live.
  *
  * The monitor itself is driver-side control flow — the heavy lifting (the
  * full reindex) is whatever job the caller passes in, e.g. a forced
  * `Pipeline.runBatch` sweep. Everything external is behind [[StatusProbe]]
  * (the reference's SOLR admin/cores + mbeans endpoints) and time is
  * injected, so the whole state machine is testable with canned responses
  * (mirroring adsmp/tests/test_reindex.py) and runs in microseconds under
  * spec.
  *
  * Failure semantics follow the reference: any stage failure leaves the
  * lock in place (permanently locked until an operator inspects it) and
  * reports the stage; only a fully verified swap releases the lock.
  */
object Rebuild {

  /** One core's view from the admin endpoint (reindex.py:186-207). */
  case class CoreStatus(dataDir: String, numDocs: Long, sizeInBytes: Long)

  /** str_to_datetime (reindex.py:204-213): the sink reports searcher
    * timestamps both with and without milliseconds; parse either, timezone
    * naive (UTC millis). A real [[StatusProbe]] uses this to turn the
    * mbean's registeredAt string into the millis the monitor compares. */
  def parseSolrTime(s: String): Long =
    // ISO_LOCAL_DATE_TIME accepts an optional fraction of any precision,
    // matching strptime's %f fallback pair in the reference
    java.time.LocalDateTime.parse(s.stripSuffix("Z"))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli

  /** The pollable sink surface. Implementations may throw — the monitor
    * applies the reference's bounded error tolerance where it applies. */
  trait StatusProbe {
    /** name → status for all cores (admin/cores). */
    def cores(): Map[String, CoreStatus]
    /** delete *:* on the build core (update?commit=true). */
    def deleteAll(buildCore: String): Unit
    /** async commit on the build core. */
    def commit(buildCore: String): Unit
    /** searcher registration time, millis (mbean SEARCHER.searcher.registeredAt). */
    def searcherRegisteredAtMillis(): Long
    /** pending (uncommitted) docs (mbean UPDATE.updateHandler.docsPending). */
    def docsPending(): Long
    /** swap build and live cores (admin/cores?action=SWAP). */
    def swap(buildCore: String, liveCore: String): Unit
  }

  /** Floors and cadences (reindex.py:134-140, 109-131, 225-248; the env
    * overrides MIN_COMMITTED_DOCS / MIN_INDEX_SIZE). */
  case class Config(
      liveCore: String = "collection1",
      buildCore: String = "collection2",
      minCommittedDocs: Long = 17500000L,
      minIndexSizeGb: Double = 200.0,
      settleConsecutive: Int = 5,       // docsPending equal readings to settle
      settlePollMillis: Long = 30000L,  // 30 s between docsPending polls
      maxProbeErrors: Int = 2,          // tolerated mbean failures (>2 → abort)
      commitWaitMaxMillis: Long = 3L * 3600 * 1000, // 3 h commit-wait abort
      commitPollMillis: Long = 30000L,
      sizeCheckAttempts: Int = 24,      // every 5 min for 2 h max
      sizeCheckIntervalMillis: Long = 300000L,
      postSwapSleepMillis: Long = 30000L)

  sealed trait Result { def ok: Boolean }
  case class Swapped(elapsedMillis: Long) extends Result { val ok = true }
  case class Failed(stage: String, message: String) extends Result { val ok = false }

  /** Simple key=value lockfile, the reference's rebuild.locked analog. The
    * reference pickles a dict; plain properties keep it operator-readable. */
  class Lock(path: java.nio.file.Path) {
    def exists: Boolean = java.nio.file.Files.exists(path)
    def read(): Map[String, String] =
      if (!exists) Map.empty
      else scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(path)).asScala
        .filter(_.contains("="))
        .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
    def write(data: Map[String, String]): Unit = {
      val body = data.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("\n")
      java.nio.file.Files.write(path, body.getBytes("UTF-8"))
    }
    def release(): Unit = java.nio.file.Files.deleteIfExists(path)
  }

  /** Floor verification (reindex.py:186-207): probe errors report as a
    * failed (retryable) attempt, exactly like the reference's catch. */
  def verifyBuildSize(probe: StatusProbe, cfg: Config): (Boolean, String) =
    try {
      val st = probe.cores().getOrElse(cfg.buildCore,
        return (false, s"core ${cfg.buildCore} missing"))
      val sizeGb = st.sizeInBytes / (1024.0 * 1024 * 1024)
      if (st.numDocs < cfg.minCommittedDocs)
        (false, s"Too few committed documents in the new index: ${st.numDocs}")
      else if (sizeGb < cfg.minIndexSizeGb)
        (false, f"The new index is suspiciously small: $sizeGb%.2f GB")
      else (true, "Successfully verified the new collection")
    } catch { case e: Exception => (false, e.toString) }

  /** Wait until docsPending stops changing for `settleConsecutive`
    * consecutive readings (reindex.py:225-248). Probe errors are tolerated
    * up to maxProbeErrors, then rethrown. */
  def awaitWritesSettled(probe: StatusProbe, cfg: Config, sleep: Long => Unit): Unit = {
    var previous = -1L
    var matches = 0
    var errors = 0
    while (matches < cfg.settleConsecutive) {
      try {
        val current = probe.docsPending()
        if (current == previous) matches += 1 else matches = 0
        previous = current
      } catch {
        // an errored poll neither matches nor resets (reindex.py:236-240)
        case e: Exception =>
          errors += 1
          if (errors > cfg.maxProbeErrors) throw e
      }
      if (matches < cfg.settleConsecutive) sleep(cfg.settlePollMillis)
    }
  }

  /** Issue the commit and wait for a searcher registered after it; abort
    * past commitWaitMaxMillis (reindex.py:102-131's 3-hour guard). */
  def awaitCommit(probe: StatusProbe, cfg: Config,
      sleep: Long => Unit, now: () => Long): Unit = {
    val commitTime = now()
    probe.commit(cfg.buildCore)
    var errors = 0
    while (true) {
      val registered =
        try Some(probe.searcherRegisteredAtMillis())
        catch {
          case e: Exception =>
            errors += 1
            if (errors > cfg.maxProbeErrors) throw e
            None
        }
      if (registered.exists(_ > commitTime)) return
      if (now() - commitTime > cfg.commitWaitMaxMillis)
        throw new IllegalStateException("commit running for over three hours, aborting")
      sleep(cfg.commitPollMillis)
    }
  }

  /** The full rebuild-and-swap run (reindex.py:52-170).
    *
    * @param index the actual rebuild job (e.g. a forced full Pipeline
    *              sweep into the build core's sink); false = failed
    * @param sleep injected so specs run instantly
    * @param now   injected monotonic clock, millis
    */
  def run(probe: StatusProbe, index: () => Boolean, lock: Lock,
      cfg: Config = Config(),
      sleep: Long => Unit = Thread.sleep(_),
      now: () => Long = System.currentTimeMillis _): Result = {
    if (lock.exists)
      return Failed("lock", s"lockfile already exists; exiting: ${lock.read()}")
    val start = now()

    def fail(stage: String, msg: String): Failed = {
      lock.write(lock.read() + ("start" -> start.toString) + ("last-exception" -> msg))
      Failed(stage, msg)
    }

    try {
      // both cores present with distinct data dirs
      val before = probe.cores()
      if (before.keySet != Set(cfg.liveCore, cfg.buildCore))
        return fail("cores", s"we dont have both cores available: ${before.keySet}")
      if (before(cfg.liveCore).dataDir == before(cfg.buildCore).dataDir)
        return fail("cores", "live and build share a dataDir")

      probe.deleteAll(cfg.buildCore)
      val recheck = probe.cores()
      if (recheck.keySet != Set(cfg.liveCore, cfg.buildCore))
        return fail("cores", "we dont have both cores available after delete")

      lock.write(Map("start" -> start.toString))
      if (!index())
        return fail("index", "rebuild job failed")

      awaitWritesSettled(probe, cfg, sleep)
      awaitCommit(probe, cfg, sleep, now)

      // committed-docs + index-size floors, every 5 min for 2 h max
      var verified = (false, "never checked")
      var attempt = 0
      while (!verified._1 && attempt < cfg.sizeCheckAttempts) {
        sleep(cfg.sizeCheckIntervalMillis)
        verified = verifyBuildSize(probe, cfg)
        attempt += 1
      }
      if (!verified._1) return fail("verify", verified._2)

      probe.swap(cfg.buildCore, cfg.liveCore)
      sleep(cfg.postSwapSleepMillis)

      // the swapped-in live core must serve the old build dataDir
      val after = probe.cores()
      if (after.get(cfg.liveCore).map(_.dataDir) != Some(before(cfg.buildCore).dataDir))
        return fail("swap-verify",
          s"live dataDir ${after.get(cfg.liveCore).map(_.dataDir)} is not the build dir")

      lock.release()
      Swapped(now() - start)
    } catch {
      case e: Exception => fail("exception", e.toString)
    }
  }
}
