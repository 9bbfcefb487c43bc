package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

import graft.sources.GenerationLog

/** The shared CAS-pointer protocol both stores (MasterStore,
  * FingerprintIndexStore) publish through — pinned once, at the
  * primitive, so a protocol regression fails HERE regardless of which
  * store's code path would have hit it. */
class GenerationLogSpec extends AnyFunSuite {

  private def fresh(): (String, GenerationLog) = {
    val dir = Files.createTempDirectory("genlog").toString
    (dir, new GenerationLog(dir, "gen_"))
  }

  test("fresh log: no generations, latest is None") {
    val (_, log) = fresh()
    assert(log.generations().isEmpty)
    assert(log.latest().isEmpty)
  }

  test("publish/read round-trips content; generations are monotone") {
    val (_, log) = fresh()
    assert(log.tryPublish(0L, "alpha"))
    assert(log.latest().contains(1L -> "alpha"))
    assert(log.tryPublish(1L, "beta\nlines"))
    assert(log.latest().contains(2L -> "beta\nlines"))
    assert(log.generations().map(_._1).sorted == Seq(1L, 2L))
  }

  test("CAS: a stale expected generation loses, nothing is overwritten") {
    val (_, log) = fresh()
    assert(log.tryPublish(0L, "winner"))
    // a second writer raced on the same expected generation and lost —
    // the winner's content must survive untouched
    assert(!log.tryPublish(0L, "loser"))
    assert(log.latest().contains(1L -> "winner"))
    // the loser re-resolves and lands on top
    assert(log.tryPublish(1L, "loser-rebased"))
    assert(log.latest().contains(2L -> "loser-rebased"))
  }

  test("concurrent publishers at the same generation: exactly one wins") {
    val (_, log) = fresh()
    assert(log.tryPublish(0L, "base"))
    val gate = new java.util.concurrent.CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        gate.await()
        if (log.tryPublish(1L, s"w$i")) wins.incrementAndGet()
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(wins.get() == 1)
    val (g, c) = log.latest().get
    assert(g == 2L && c.startsWith("w"))
  }

  test("latest survives a vacuumed max pointer (re-list loop)") {
    val (dir, log) = fresh()
    assert(log.tryPublish(0L, "old"))
    assert(log.tryPublish(1L, "live"))
    // a maintenance job dropped the superseded generation: readers keep
    // resolving the live one
    Files.delete(Paths.get(dir, f"gen_${1L}%012d"))
    assert(log.latest().contains(2L -> "live"))
    assert(log.generations().map(_._1) == Seq(2L))
  }

  test("prefix isolation: two logs share a root without cross-talk") {
    val dir = Files.createTempDirectory("genlog").toString
    val a = new GenerationLog(dir, "gen_")
    val b = new GenerationLog(dir, "manifest_")
    assert(a.tryPublish(0L, "a1"))
    assert(b.tryPublish(0L, "b1"))
    assert(a.latest().contains(1L -> "a1"))
    assert(b.latest().contains(1L -> "b1"))
    assert(a.generations().size == 1 && b.generations().size == 1)
  }

  test("no temp-file litter after publishes and lost races") {
    val (dir, log) = fresh()
    assert(log.tryPublish(0L, "x"))
    assert(!log.tryPublish(0L, "y"))
    val stray = Files.list(Paths.get(dir)).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (stray.hasNext) names += stray.next().getFileName.toString
    assert(names.forall(!_.endsWith(".tmp")), s"temp litter: $names")
  }
}
