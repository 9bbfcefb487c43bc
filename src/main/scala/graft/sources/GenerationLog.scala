package graft.sources

import java.nio.file.{Files, Path, Paths}

/** Generation-numbered CAS pointer log on a shared filesystem — the ONE
  * publish primitive both snapshot stores ([[MasterStore]]'s manifest
  * generations, [[FingerprintIndexStore]]'s segment manifests) build on,
  * extracted so a fix to the protocol cannot land in one store and
  * silently miss the other.
  *
  * Protocol (the engine-side replacement for the reference's
  * Postgres-serialized writers, adsmp/app.py:120-195):
  *
  *  - The live state is the HIGHEST `<prefix><gen>` file under `root`
  *    (12-digit zero-padded, so lexicographic listing order is numeric
  *    order for any tooling that looks).
  *  - Generation g+1 is published by writing the new content to a temp
  *    file and hard-linking it into place: link(2) fails with EEXIST if
  *    the name is taken — the one true compare-and-swap a shared
  *    filesystem offers. rename(2) would silently replace, turning a
  *    lost race into a lost update.
  *  - Reading the latest is a list → read-max loop: if a concurrent
  *    vacuum removed the max pointer between the two steps, re-list.
  *    The replacement generation is strictly higher, so the loop
  *    terminates in one hop per lost race.
  *
  * Content is an opaque string; each store keeps its own format
  * (MasterStore: manifest JSON or a legacy dir line; FingerprintIndexStore:
  * one entry name per line) and its own retry-loop semantics on top
  * (vanished-input re-resolve, fold-once delta publish) — those differ by
  * design, the pointer protocol must not.
  */
private[graft] final class GenerationLog(root: String, prefix: String) {

  private val Name = (java.util.regex.Pattern.quote(prefix) + raw"(\d{12})").r

  /** (generation, pointer file) pairs of all published generations,
    * unsorted. Empty for a fresh (or absent) root. */
  def generations(): Seq[(Long, Path)] = {
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.flatMap { p =>
        p.getFileName.toString match {
          case Name(g) => Some(g.toLong -> p)
          case _       => None
        }
      }.toSeq
    } finally s.close()
  }

  /** (generation, content) of the highest generation; None for a fresh
    * log. Re-lists when a concurrent vacuum removes the max pointer
    * between list and read — callers always observe SOME consistent
    * published generation, never a torn read. */
  def latest(): Option[(Long, String)] = {
    while (true) {
      generations() match {
        case Nil => return None
        case gs =>
          val (g, p) = gs.maxBy(_._1)
          try return Some(g -> new String(Files.readAllBytes(p), "UTF-8"))
          catch { case _: java.nio.file.NoSuchFileException => () }
      }
    }
    sys.error("unreachable")
  }

  /** CAS publish: generation `expected`+1 carries `content` iff no other
    * writer published that generation first. The early `exists` check is
    * a fast path only — the hard link is the decision. */
  def tryPublish(expected: Long, content: String): Boolean = {
    Files.createDirectories(Paths.get(root))
    val target = Paths.get(root, f"$prefix${expected + 1}%012d")
    if (Files.exists(target)) return false
    val tmp = Files.createTempFile(Paths.get(root), s".$prefix", ".tmp")
    try {
      Files.write(tmp, content.getBytes("UTF-8"))
      try { Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }
}
