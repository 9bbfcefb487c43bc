package graft.sources

import java.nio.file.{Files, Path, StandardOpenOption}

/** Advisory single-writer lease for the cron entry points.
  *
  * Several CLI actions mutate state whose SEMANTICS are single-writer even
  * though every individual publish is CAS-safe: the sitemap fill cursor is
  * global arithmetic (two interleaved cadences would double-assign file
  * slots — rows stay consistent under the CAS, the fill math does not),
  * and the cadence's precomputed-rows flag-clear publishes assume no
  * concurrent remove/add landed between its render and its stamp. The
  * reference serializes these crons with lockfiles
  * (`scripts/reindex.py:52-58`, `scripts/cleanup_sitemaps.py:90-99`); this
  * is the engine's equivalent, with a TTL so a crashed holder's lease
  * expires instead of wedging the cron forever (the reference's bare
  * lockfile needs a human to delete it).
  *
  * Protocol (single local/posix-rename filesystem, same substrate as the
  * stores' GenerationLog):
  *  - acquire: `CREATE_NEW` open of the lease file — an atomic
  *    fail-if-exists claim — then the holder token is written into it.
  *    A held, FRESH lease fails the acquire loudly, naming the holder.
  *  - steal: a lease whose mtime is older than the TTL is a crashed
  *    holder's; it is deleted and the claim retried. Two concurrent
  *    stealers both delete (one no-ops) and both re-claim — CREATE_NEW
  *    serializes them, the loser now sees a fresh lease and gives up.
  *  - release: delete ONLY if the file still holds our token — a lease
  *    stolen from us mid-run (we outlived our own TTL) belongs to the
  *    thief, and deleting it would let a third writer in.
  *
  * The lease is ADVISORY: it serializes the cooperating cron entry points,
  * it does not and cannot fence raw MasterStore API users — the store's
  * generation checks (cadence summary validation, CAS rebase) remain the
  * correctness backstop; the lease upgrades "detected after the fact as a
  * rebuild" to "refused up front".
  */
final class CronLease(val path: Path, ttlMs: Long) {

  /** What `tryAcquire` found when the lease was already held. */
  final case class Held(owner: String, ageMs: Long) {
    def describe: String =
      s"held by '$owner' for ${ageMs / 1000}s (lease $path, " +
        s"expires after ${ttlMs / 1000}s)"
  }

  private val token =
    s"${java.util.UUID.randomUUID().toString.take(8)}"

  private def readOwner(): String =
    try new String(Files.readAllBytes(path), "UTF-8").trim
    catch { case scala.util.control.NonFatal(_) => "<unreadable>" }

  private def ageMs(): Long =
    try System.currentTimeMillis() - Files.getLastModifiedTime(path).toMillis
    catch { case scala.util.control.NonFatal(_) => 0L }

  private def claim(owner: String): Boolean =
    try {
      val ch = Files.newByteChannel(path,
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      // CREATE_NEW already won the claim atomically; the token write that
      // follows only identifies us (a crash here leaves an empty lease
      // that expires via the TTL like any other crashed holder's)
      try ch.write(java.nio.ByteBuffer.wrap(
        s"$owner token=$token pid=${ProcessHandle.current().pid()}"
          .getBytes("UTF-8")))
      finally ch.close()
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }

  private def isMine: Boolean = readOwner().contains(s"token=$token")

  /** One acquisition attempt (plus at most one steal of an expired
    * lease). Right(()) = acquired; Left(held) = a live holder owns it. */
  def tryAcquire(owner: String): Either[Held, Unit] = {
    Option(path.getParent).foreach(Files.createDirectories(_))
    if (claim(owner)) return Right(())
    if (ageMs() > ttlMs) {
      // crashed holder: steal (delete + re-claim). A concurrent stealer
      // may win the re-claim — then the lease is legitimately theirs
      Files.deleteIfExists(path)
      if (claim(owner)) return Right(())
    }
    if (isMine) Right(()) else Left(Held(readOwner(), ageMs()))
  }

  /** Refresh the TTL mid-run (long renders). No-op if stolen from us. */
  def refresh(): Unit =
    if (isMine)
      try Files.setLastModifiedTime(path,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      catch { case scala.util.control.NonFatal(_) => () }

  /** Release iff we still hold it (see class doc). */
  def release(): Unit =
    if (isMine) Files.deleteIfExists(path)
}
