package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.sources.CronLease

/** The cron single-writer lease: atomic acquire, loud refusal naming a
  * live holder, TTL steal of a crashed holder's lease, release-only-if-
  * mine — plus the CLI integration: two interleaved sitemap cadences,
  * where the second exits loudly with state unharmed, and a crashed
  * holder's stale lease expiring so the next cron proceeds. Reference
  * analog: the lockfiles in scripts/reindex.py:52-58 and
  * scripts/cleanup_sitemaps.py:90-99. */
class CronLeaseSpec extends AnyFunSuite with SparkSpec {

  test("acquire/held/steal/release semantics") {
    val dir = Files.createTempDirectory("graft_lease")
    val p = dir.resolve("cron.lease")

    val a = new CronLease(p, ttlMs = 60000)
    assert(a.tryAcquire("cron-a").isRight)
    // a second handle (another process) is refused, naming the holder
    val b = new CronLease(p, ttlMs = 60000)
    val held = b.tryAcquire("cron-b").left.toOption.get
    assert(held.owner.contains("cron-a"))
    assert(held.describe.contains("cron-a"))
    // re-acquire by the SAME handle is idempotent (our token is in place)
    assert(a.tryAcquire("cron-a").isRight)
    // release frees it for the next acquirer
    a.release()
    assert(!Files.exists(p))
    assert(b.tryAcquire("cron-b").isRight)

    // a crashed holder: backdate past the TTL — the next acquirer steals
    Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000))
    val c = new CronLease(p, ttlMs = 60000)
    assert(c.tryAcquire("cron-c").isRight)
    // the stolen lease now belongs to c: b's release must NOT delete it
    b.release()
    assert(Files.exists(p), "release of a stolen lease must be a no-op")
    assert(new String(Files.readAllBytes(p), "UTF-8").contains("cron-c"))
    // refresh moves the mtime forward so a long-running holder keeps it
    Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 50000))
    c.refresh()
    assert(System.currentTimeMillis() -
      Files.getLastModifiedTime(p).toMillis < 10000)
    c.release()
    assert(!Files.exists(p))
  }

  test("CLI: a second sitemap cron is refused loudly while the lease is " +
    "held, state unharmed; a crashed holder's stale lease expires and " +
    "the cron proceeds") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_lease_cli").toString
    val store = new graft.sources.MasterStore(s"$root/master")
    val log = collection.mutable.Buffer.empty[String]
    val t = new CliSpec.CountingTransport
    val d = Cli.Deps(t, t, now = () => Timestamp.valueOf("2024-06-01 00:00:00"),
      out = log += _)
    val argvBase = Seq("--store", s"$root/master",
      "--sitemap-store", s"$root/smstate", "--out", s"$root/sitemaps")

    val msgs = Seq(records.UpdateMessage("2024Test.....1....A", "metadata",
      """{"title": ["one"]}""", Timestamp.valueOf("2024-01-01 00:00:00"))).toDS()
    Pipeline.runBatch(spark, store, msgs, d.solrTransport, d.bulkTransport,
      now = Timestamp.valueOf("2024-01-03 00:00:00"))

    // simulate a LIVE concurrent cron: hold the shared sitemap lease
    val lease = new CronLease(Paths.get(s"$root/smstate", "cron.lease"),
      ttlMs = 3600000)
    assert(lease.tryAcquire("concurrent-cadence").isRight)

    // every sitemap-state-writing action refuses while it is held
    for (argv <- Seq(
        Seq("--manage-sitemap", "--action", "bootstrap"),
        Seq("--update-sitemap-files"),
        Seq("--cleanup-invalid-sitemaps"),
        Seq("--update-sitemaps-auto", "--days-back", "1"),
        Seq("--delete", "--bibcodes", "2024Test.....1....A"),
        Seq("--delete_obsolete", "--since", "2024-01-01 00:00:00"))) {
      log.clear()
      assert(Cli.run(spark, argvBase ++ argv, d) == 2, s"$argv must refuse")
      assert(log.exists(l => l.contains("lease") &&
        l.contains("concurrent-cadence")), s"$argv must name the holder: $log")
    }
    // nothing was written: the sitemap store has no generations, the
    // master row survived the refused --delete
    assert(new graft.sources.MasterStore(s"$root/smstate",
      empty = graft.operators.SitemapState.empty).currentVersion.isEmpty)
    assert(store.read(spark).count() == 1)

    // the holder released → the cron proceeds
    lease.release()
    log.clear()
    assert(Cli.run(spark, argvBase ++
      Seq("--manage-sitemap", "--action", "bootstrap"), d) == 0)
    assert(new java.io.File(s"$root/sitemaps/ads/sitemap_bib_1.xml").exists)

    // a crashed holder: plant a lease, backdate it past --lease-ttl-min
    assert(lease.tryAcquire("crashed-cadence").isRight)
    Files.setLastModifiedTime(Paths.get(s"$root/smstate", "cron.lease"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10 * 60000))
    log.clear()
    assert(Cli.run(spark, argvBase ++
      Seq("--update-sitemap-files", "--lease-ttl-min", "5"), d) == 0,
      s"stale lease must be stolen: $log")
    // and the index sweep's own lease guards --index-from-feed
    val idxLease = new CronLease(Paths.get(s"$root/master", "reindex.lease"),
      ttlMs = 3600000)
    assert(idxLease.tryAcquire("concurrent-sweep").isRight)
    log.clear()
    assert(Cli.run(spark, argvBase ++ Seq("--index-from-feed"), d) == 2)
    assert(log.exists(l => l.contains("lease") &&
      l.contains("concurrent-sweep")), s"got $log")
    idxLease.release()
    log.clear()
    assert(Cli.run(spark, argvBase ++ Seq("--index-from-feed"), d) == 0,
      s"got $log")
  }
}
