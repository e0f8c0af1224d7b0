package graft.ops

/** Shared write-once artifact protocol (factored from IndexStore in
  * round 17 so the X13 media fixture reuses it verbatim): content
  * fingerprinting for the root key, and the temp-dir + atomic-rename
  * ensure that guarantees a canonical root only ever holds a COMPLETE
  * artifact, with concurrent writers racing benignly and every loser's
  * temp copy removed (round-16 advice item 1).
  */
object ArtifactStore {

  /** Content fingerprint of a source table: MD5 over the sorted
    * (relative path, size, mtime) triples of its parquet files PLUS a
    * bounded content component — the first and last 4 KiB of each file
    * (round-17 advice item 3: an mtime-preserving copy of a DIFFERENT
    * fixture with equal sizes — `rsync -a`, an archive restore, a
    * same-millisecond rewrite — would keep a metadata-only key and
    * silently serve a stale write-once artifact). For parquet the tail
    * 4 KiB covers the footer, which carries the row-group statistics
    * and column offsets — any data change reaches it. Regenerating the
    * source in place must invalidate any write-once artifact derived
    * from it (round-16 advice item 2). Driver-side walk: one stat +
    * one ≤8 KiB read per file — at production scale this is the
    * object-store listing (plus ranged HEAD reads) an artifact build
    * already performs. */
  private[graft] def fingerprint(dir: String, table: String): String = {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get(dir, table)
    val md = java.security.MessageDigest.getInstance("MD5")
    if (java.nio.file.Files.exists(base)) {
      val walk = java.nio.file.Files.walk(base)
      try walk.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p))
        .map(p => (base.relativize(p).toString,
          java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis, p))
        .toVector.sortBy(_._1)
        .foreach { case (n, s, t, p) =>
          md.update(s"$n|$s|$t;".getBytes("UTF-8"))
          md.update(headTail(p))
        }
      finally walk.close()
    }
    md.digest().map(b => f"$b%02x").mkString.take(12)
  }

  /** First and last [[FingerprintSpan]] bytes of a file (overlapping is
    * fine for small files — determinism, not uniqueness, is the
    * contract). */
  private val FingerprintSpan = 4096
  private def headTail(p: java.nio.file.Path): Array[Byte] = {
    val ch = java.nio.file.Files.newByteChannel(p)
    try {
      val size = ch.size()
      val span = math.min(FingerprintSpan.toLong, size).toInt
      val head = java.nio.ByteBuffer.allocate(span)
      while (head.hasRemaining && ch.read(head) >= 0) {}
      val tail = java.nio.ByteBuffer.allocate(span)
      ch.position(size - span)
      while (tail.hasRemaining && ch.read(tail) >= 0) {}
      head.array() ++ tail.array()
    } finally ch.close()
  }

  /** Age guard for the crash-orphan janitor: a `.tmp-*` sibling older
    * than this is unreferenced by construction — its rename either
    * happened (the temp name is gone) or its writer died (SIGKILL skips
    * [[ensureDirAt]]'s `finally`), because no healthy writer holds a
    * temp dir for 15 minutes in this store. */
  private[graft] val OrphanAgeMs: Long = 15L * 60L * 1000L

  // stores this process has already swept — the janitor runs once per
  // (JVM, store dir), at first open, like a lakehouse VACUUM-on-attach
  private val swept = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Crash-orphan janitor (round-17 verdict item 3): delete `.tmp-*`
    * siblings under `storeDir` older than `ageMs`. [[ensureDirAt]]'s
    * `finally` removes the loser's temp copy on every EXCEPTION path,
    * but a process killed mid-write leaves its temp sibling forever —
    * nothing else ever references it (the canonical root either exists,
    * meaning some writer's rename won, or the orphan's build never
    * finished), so age is the only guard needed: a FRESH `.tmp-*` may
    * belong to a live concurrent writer and is left untouched. Returns
    * the deleted names (test seam). */
  private[graft] def sweepOrphanTmp(storeDir: String,
      ageMs: Long = OrphanAgeMs,
      nowMs: Long = System.currentTimeMillis()): Seq[String] = {
    val dir = new java.io.File(storeDir)
    Option(dir.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
      .filter(f => f.getName.contains(".tmp-"))
      .filter(f => nowMs - f.lastModified() > ageMs)
      .map { f =>
        if (f.isDirectory) org.apache.commons.io.FileUtils.deleteDirectory(f)
        else f.delete()
        f.getName
      }
  }

  /** Run [[sweepOrphanTmp]] once per (process, store dir) — called by
    * store openers (IndexStore, the media fixture) before their first
    * ensure. */
  private[graft] def sweepAtOpen(storeDir: String): Unit =
    if (swept.add(java.nio.file.Paths.get(storeDir)
        .toAbsolutePath.toString)) {
      sweepOrphanTmp(storeDir)
      ()
    }

  /** Root key component for an absolute source path (round-15 advice:
    * String.hashCode is 32 bits — two dirs colliding would silently
    * share one artifact root). */
  private[graft] def pathKey(dir: String): String = {
    val abs = java.nio.file.Paths.get(dir).toAbsolutePath.toString
    java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  /** If `root` is absent: run `write` against a temp sibling, then
    * ATOMIC-rename it into place. The canonical root only ever holds a
    * complete artifact; concurrent processes ensuring the same root
    * race benignly (deterministic builds ⇒ identical content — the
    * rename loser discards its temp copy). On Linux the loser's move
    * lands as DirectoryNotEmptyException (a FileSystemException), so
    * the catch is any FileSystemException WITH the root verified
    * present — anything else is a real disk error and rethrows — and
    * the temp copy is removed in a finally so no .tmp-* directory
    * leaks on any path. */
  private[graft] def ensureDirAt(root: String)(
      write: String => Unit): String = {
    val rootPath = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(rootPath)) {
      val tmp = root + ".tmp-" + java.util.UUID.randomUUID().toString
      try {
        write(tmp)
        try
          java.nio.file.Files.move(java.nio.file.Paths.get(tmp), rootPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileSystemException
              if java.nio.file.Files.exists(rootPath) => ()
        }
      } finally {
        val tmpFile = new java.io.File(tmp)
        if (tmpFile.exists())
          org.apache.commons.io.FileUtils.deleteDirectory(tmpFile)
      }
    }
    root
  }
}
