package graft

import java.nio.file.{Files, Paths}

import graft.ops.{ArtifactStore, IndexStore, Multimodal}

/** The shared write-once artifact protocol (round-16 advice items 1+2,
  * factored in round 17): content-fingerprinted root keys that
  * invalidate when the source data is regenerated in place, and the
  * temp-dir + atomic-rename ensure that never leaks a .tmp directory —
  * including when the writer itself throws.
  */
class ArtifactStoreSpec extends SparkSpec {

  test("fingerprint: regenerating the source table in place changes " +
    "the artifact root key (stale write-once roots are unreachable)") {
    val dir = "target/artifact_store_spec/data"
    val table = Paths.get(dir, "embeddings.parquet")
    Files.createDirectories(table)
    Files.writeString(table.resolve("part-0.parquet"), "v1-bytes")
    val root1 = IndexStore.defaultRoot(dir)
    // same content, same mtime → stable key
    assert(IndexStore.defaultRoot(dir) == root1,
      "the key must be deterministic while the source is unchanged")
    // regenerate in place: size changes ⇒ new key, old root orphaned
    Files.writeString(table.resolve("part-0.parquet"), "v2-bytes-longer")
    val root2 = IndexStore.defaultRoot(dir)
    assert(root2 != root1,
      "an in-place regen must invalidate the write-once root " +
        "(round-16 advice: a stale persisted index would otherwise " +
        "serve stale neighbors in bench/sweep runs with no error)")
    // adding a file also changes the key
    Files.writeString(table.resolve("part-1.parquet"), "more")
    assert(IndexStore.defaultRoot(dir) != root2)
    // and the media fixture key tracks ITS source table independently
    val docs = Paths.get(dir, "documents.parquet")
    Files.createDirectories(docs)
    Files.writeString(docs.resolve("part-0.parquet"), "docs-v1")
    val mroot1 = Multimodal.defaultMediaRoot(dir)
    Files.writeString(table.resolve("part-1.parquet"), "embeddings-moved")
    assert(Multimodal.defaultMediaRoot(dir) == mroot1,
      "the media key must not move when only embeddings change")
  }

  test("fingerprint: an mtime-preserving same-size rewrite (rsync -a / " +
    "archive restore of a different fixture) still changes the key") {
    val dir = "target/artifact_store_spec/content_data"
    val table = Paths.get(dir, "embeddings.parquet")
    Files.createDirectories(table)
    val part = table.resolve("part-0.parquet")
    Files.writeString(part, "fixture-A-bytes")
    val mtime = Files.getLastModifiedTime(part)
    val root1 = IndexStore.defaultRoot(dir)
    // same length, same restored mtime, different bytes — the metadata
    // triple is identical; only the content component can see this
    Files.writeString(part, "fixture-B-bytes")
    Files.setLastModifiedTime(part, mtime)
    assert(IndexStore.defaultRoot(dir) != root1,
      "a same-size mtime-preserving rewrite must invalidate the root " +
        "(round-17 advice: the metadata-only key would silently serve " +
        "a stale write-once artifact)")
    // and restoring the original bytes + mtime restores the key
    Files.writeString(part, "fixture-A-bytes")
    Files.setLastModifiedTime(part, mtime)
    assert(IndexStore.defaultRoot(dir) == root1,
      "the content component must be a pure function of the bytes")
  }

  test("sweepOrphanTmp: a stale SIGKILL-orphaned .tmp-* sibling is " +
    "deleted at store open; a fresh one (a live writer's) is untouched") {
    val store = "target/artifact_store_spec/janitor_" +
      java.util.UUID.randomUUID().toString.take(8)
    Files.createDirectories(Paths.get(store))
    // a stale orphan DIRECTORY (a crashed index writer's temp copy)
    val stale = Paths.get(store, "root_a.tmp-dead-writer")
    Files.createDirectories(stale)
    Files.writeString(stale.resolve("partial"), "half-written")
    assert(stale.toFile.setLastModified(
      System.currentTimeMillis() - 2 * ArtifactStore.OrphanAgeMs))
    // a stale orphan FILE (a crashed alias writer's temp payload)
    val staleFile = Paths.get(store, "alias.serving.tmp-dead-writer")
    Files.writeString(staleFile, "version=v1\n")
    assert(staleFile.toFile.setLastModified(
      System.currentTimeMillis() - 2 * ArtifactStore.OrphanAgeMs))
    // a fresh orphan — by age indistinguishable from a LIVE concurrent
    // writer's temp dir, so the janitor must leave it alone
    val fresh = Paths.get(store, "root_b.tmp-live-writer")
    Files.createDirectories(fresh)
    // a canonical root must never be touched regardless of age
    val root = Paths.get(store, "root_c")
    Files.createDirectories(root)
    assert(root.toFile.setLastModified(
      System.currentTimeMillis() - 2 * ArtifactStore.OrphanAgeMs))

    val deleted = ArtifactStore.sweepOrphanTmp(store)
    assert(deleted.toSet ==
      Set("root_a.tmp-dead-writer", "alias.serving.tmp-dead-writer"),
      s"exactly the stale orphans must go, got $deleted")
    assert(!Files.exists(stale) && !Files.exists(staleFile))
    assert(Files.exists(fresh), "a fresh temp may belong to a live writer")
    assert(Files.exists(root), "canonical roots are not the janitor's")
  }

  test("ensureDirAt: a writer that THROWS leaves no .tmp directory " +
    "and no root — the failure is loud, the filesystem is clean") {
    // unique per run: ensureDirAt is write-once by design, so a root
    // surviving from a previous suite run would skip the writer
    val root = "target/artifact_store_spec/throwing_root_" +
      java.util.UUID.randomUUID().toString.take(8)
    val boom = intercept[RuntimeException] {
      ArtifactStore.ensureDirAt(root) { tmp =>
        Files.createDirectories(Paths.get(tmp))
        Files.writeString(Paths.get(tmp, "partial"), "half-written")
        throw new RuntimeException("writer failed mid-artifact")
      }
    }
    assert(boom.getMessage.contains("writer failed"))
    assert(!Files.exists(Paths.get(root)),
      "a failed build must never surface as a canonical root")
    val parent = Paths.get(root).getParent
    val leftovers = Files.list(parent).iterator()
    while (leftovers.hasNext) {
      val f = leftovers.next().getFileName.toString
      assert(!f.contains(".tmp-"),
        s"failed write leaked a temp directory: $f")
    }
    // and a subsequent successful ensure works on the same root
    ArtifactStore.ensureDirAt(root) { tmp =>
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(tmp, "whole"), "complete")
    }
    assert(Files.readString(Paths.get(root, "whole")) == "complete")
  }

  test("ensureDirAt: an existing root is never rebuilt or touched") {
    val root = "target/artifact_store_spec/immutable_root"
    ArtifactStore.ensureDirAt(root) { tmp =>
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(tmp, "gen"), "first")
    }
    var ran = false
    ArtifactStore.ensureDirAt(root) { _ => ran = true }
    assert(!ran, "the writer must not run when the root exists")
    assert(Files.readString(Paths.get(root, "gen")) == "first")
  }
}
