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
    * (relative path, size, mtime) triples of its parquet files —
    * regenerating the source in place must invalidate any write-once
    * artifact derived from it (round-16 advice item 2). Driver-side
    * metadata walk only: one stat per file, no data read — at
    * production scale this is the object-store listing an artifact
    * build already performs. */
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
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toVector.sortBy(_._1)
        .foreach { case (n, s, t) =>
          md.update(s"$n|$s|$t;".getBytes("UTF-8")) }
      finally walk.close()
    }
    md.digest().map(b => f"$b%02x").mkString.take(12)
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
