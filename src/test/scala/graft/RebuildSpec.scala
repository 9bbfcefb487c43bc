package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Rebuild
import graft.operators.Rebuild.{Config, CoreStatus, Failed, Lock, StatusProbe, Swapped}

/** Rebuild-and-swap monitor, canned-response style after
  * adsmp/tests/test_reindex.py:13-98: a scripted probe plays the sink and
  * a virtual clock advances on sleep, so the 3-hour guards run instantly. */
class RebuildSpec extends AnyFunSuite {

  /** Virtual time: sleep() advances the clock. */
  class Clock {
    var millis = 0L
    def now(): Long = millis
    def sleep(ms: Long): Unit = millis += ms
  }

  /** Scripted probe. docsPending plays a list then holds its last value;
    * the searcher registers `searcherDelay` ms after commit() is called. */
  class CannedProbe(
      var coreMap: Map[String, CoreStatus],
      pendingScript: Seq[Long],
      clock: Clock,
      searcherDelay: Long = 10000L,
      var pendingErrors: Int = 0) extends StatusProbe {
    var deleted, committed = 0
    var swapped = false
    var commitAt = -1L
    private var pi = 0
    def cores(): Map[String, CoreStatus] = coreMap
    def deleteAll(b: String): Unit = deleted += 1
    def commit(b: String): Unit = { committed += 1; commitAt = clock.now() }
    def searcherRegisteredAtMillis(): Long =
      if (commitAt >= 0 && clock.now() >= commitAt + searcherDelay) commitAt + searcherDelay
      else -1L
    def docsPending(): Long = {
      if (pendingErrors > 0) { pendingErrors -= 1; throw new RuntimeException("mbean 500") }
      val v = pendingScript(math.min(pi, pendingScript.length - 1))
      pi += 1
      v
    }
    def swap(b: String, l: String): Unit = {
      swapped = true
      coreMap = Map(
        l -> coreMap(b), // build becomes live, data dir travels
        b -> coreMap(l))
    }
  }

  private def lockIn(dir: java.nio.file.Path) = new Lock(dir.resolve("rebuild.locked"))

  private val cfg = Config(minCommittedDocs = 1000, minIndexSizeGb = 1.0)

  private def healthyCores = Map(
    "collection1" -> CoreStatus("/data/one", 900, 5L << 30),
    "collection2" -> CoreStatus("/data/two", 1500, 2L << 30))

  test("happy path: settle, commit, floors met, swap verified, lock released " +
    "(test_reindex, test_monitor_solr_writes)") {
    val clock = new Clock
    val probe = new CannedProbe(healthyCores,
      pendingScript = Seq(50, 20, 5, 0, 0, 0, 0, 0, 0), clock)
    val tmp = java.nio.file.Files.createTempDirectory("graft_rebuild")
    val lock = lockIn(tmp)
    val res = Rebuild.run(probe, () => true, lock, cfg, clock.sleep, clock.now _)
    assert(res == Swapped(clock.now()))
    assert(probe.deleted == 1 && probe.committed == 1 && probe.swapped)
    assert(!lock.exists, "verified swap releases the lock")
  }

  test("refuses to run while the lockfile exists") {
    val clock = new Clock
    val probe = new CannedProbe(healthyCores, Seq(0L), clock)
    val tmp = java.nio.file.Files.createTempDirectory("graft_rebuild")
    val lock = lockIn(tmp)
    lock.write(Map("start" -> "123"))
    val res = Rebuild.run(probe, () => true, lock, cfg, clock.sleep, clock.now _)
    assert(res.isInstanceOf[Failed] &&
      res.asInstanceOf[Failed].stage == "lock")
    assert(probe.deleted == 0, "nothing touched under an existing lock")
  }

  test("missing build core aborts before any destructive step") {
    val clock = new Clock
    val probe = new CannedProbe(
      Map("collection1" -> CoreStatus("/data/one", 900, 5L << 30)), Seq(0L), clock)
    val tmp = java.nio.file.Files.createTempDirectory("graft_rebuild")
    val lock = lockIn(tmp)
    val res = Rebuild.run(probe, () => true, lock, cfg, clock.sleep, clock.now _)
    assert(res.asInstanceOf[Failed].stage == "cores")
    assert(probe.deleted == 0)
  }

  test("shared dataDir between cores aborts") {
    val clock = new Clock
    val probe = new CannedProbe(Map(
      "collection1" -> CoreStatus("/data/same", 900, 5L << 30),
      "collection2" -> CoreStatus("/data/same", 1500, 2L << 30)), Seq(0L), clock)
    val tmp = java.nio.file.Files.createTempDirectory("graft_rebuild")
    val res = Rebuild.run(probe, () => true, lockIn(tmp), cfg, clock.sleep, clock.now _)
    assert(res.asInstanceOf[Failed].stage == "cores")
  }

  test("failed rebuild job keeps the lock with the error recorded") {
    val clock = new Clock
    val probe = new CannedProbe(healthyCores, Seq(0L), clock)
    val tmp = java.nio.file.Files.createTempDirectory("graft_rebuild")
    val lock = lockIn(tmp)
    val res = Rebuild.run(probe, () => false, lock, cfg, clock.sleep, clock.now _)
    assert(res.asInstanceOf[Failed].stage == "index")
    assert(lock.exists, "failure leaves the process locked (reindex.py:163-168)")
    assert(lock.read().contains("last-exception"))
  }

  test("docsPending settle: changes reset the consecutive-match counter") {
    val clock = new Clock
    // 0 appears 4× then changes — counter must reset, settling only after
    // 5 consecutive equal readings at the tail
    val probe = new CannedProbe(healthyCores,
      Seq(0, 0, 0, 0, 7, 7, 7, 7, 7, 7), clock)
    val tmp = java.nio.file.Files.createTempDirectory("graft_rebuild")
    val res = Rebuild.run(probe, () => true, lockIn(tmp), cfg, clock.sleep, clock.now _)
    assert(res.ok)
    // settle alone needs ≥9 polls × 30 s
    assert(clock.millis >= 9 * 30000L)
  }

  test("transient docsPending probe errors are tolerated up to the bound") {
    val clock = new Clock
    val probe = new CannedProbe(healthyCores, Seq(0, 0, 0, 0, 0, 0), clock,
      pendingErrors = 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft_rebuild")
    val res = Rebuild.run(probe, () => true, lockIn(tmp), cfg, clock.sleep, clock.now _)
    assert(res.ok, "2 errors tolerated")

    val clock2 = new Clock
    val probe2 = new CannedProbe(healthyCores, Seq(0, 0, 0, 0, 0, 0), clock2,
      pendingErrors = 3)
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_rebuild")
    val res2 = Rebuild.run(probe2, () => true, lockIn(tmp2), cfg, clock2.sleep, clock2.now _)
    assert(!res2.ok, "third consecutive error aborts (reindex.py:237-240)")
  }

  test("commit wait aborts after three hours") {
    val clock = new Clock
    val probe = new CannedProbe(healthyCores, Seq(0, 0, 0, 0, 0, 0), clock,
      searcherDelay = 4L * 3600 * 1000) // searcher never registers in time
    val tmp = java.nio.file.Files.createTempDirectory("graft_rebuild")
    val lock = lockIn(tmp)
    val res = Rebuild.run(probe, () => true, lock, cfg, clock.sleep, clock.now _)
    val f = res.asInstanceOf[Failed]
    assert(f.stage == "exception" && f.message.contains("three hours"))
    assert(lock.exists)
  }

  test("committed-docs floor: too-few docs fails after bounded attempts") {
    val clock = new Clock
    val probe = new CannedProbe(Map(
      "collection1" -> CoreStatus("/data/one", 900, 5L << 30),
      "collection2" -> CoreStatus("/data/two", 10, 2L << 30)), // 10 < 1000
      Seq(0, 0, 0, 0, 0, 0), clock)
    val tmp = java.nio.file.Files.createTempDirectory("graft_rebuild")
    val res = Rebuild.run(probe, () => true, lockIn(tmp), cfg, clock.sleep, clock.now _)
    val f = res.asInstanceOf[Failed]
    assert(f.stage == "verify" && f.message.contains("Too few committed documents"))
    assert(!probe.swapped, "no swap on an underfilled index")
  }

  test("index-size floor: suspiciously small index blocks the swap") {
    val clock = new Clock
    val probe = new CannedProbe(Map(
      "collection1" -> CoreStatus("/data/one", 900, 5L << 30),
      "collection2" -> CoreStatus("/data/two", 1500, 100L << 20)), // 0.1 GB < 1 GB
      Seq(0, 0, 0, 0, 0, 0), clock)
    val tmp = java.nio.file.Files.createTempDirectory("graft_rebuild")
    val res = Rebuild.run(probe, () => true, lockIn(tmp), cfg, clock.sleep, clock.now _)
    val f = res.asInstanceOf[Failed]
    assert(f.stage == "verify" && f.message.contains("suspiciously small"))
    assert(!probe.swapped)
  }

  test("sink timestamps parse with and without milliseconds, timezone naive " +
    "(test_reindex.py test_date)") {
    val plain = Rebuild.parseSolrTime("2020-03-15T19:32:15Z")
    val millis = Rebuild.parseSolrTime("2020-03-15T19:32:15.314Z")
    assert(millis - plain == 314L)
    assert(plain == java.time.LocalDateTime.of(2020, 3, 15, 19, 32, 15)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    intercept[java.time.format.DateTimeParseException] {
      Rebuild.parseSolrTime("not-a-date")
    }
  }

  test("default floors match the reference deployment") {
    val d = Config()
    assert(d.minCommittedDocs == 17500000L && d.minIndexSizeGb == 200.0)
    assert(d.commitWaitMaxMillis == 3L * 3600 * 1000)
    assert(d.sizeCheckAttempts == 24 && d.sizeCheckIntervalMillis == 300000L)
  }
}
