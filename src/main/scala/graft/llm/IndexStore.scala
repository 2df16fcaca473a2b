package graft.llm

import java.io.File

/** Shared lifecycle for the pre-materialized parquet indexes (d21's
  * ingest index, v18's ANN index, d23's delta chain): a content
  * fingerprint that actually identifies the source corpus, and an
  * atomic build-and-publish so concurrent sessions can never observe
  * (or co-author) a half-written index.
  *
  * Why not (length, mtime) of the source alone: Spark-written parquet
  * "files" are directories, whose File.length() is a near-constant
  * directory-entry size — two distinct corpora could collide on the
  * key and one would silently probe the other's stale index. The
  * fingerprint therefore hashes the canonical PATH plus every child
  * file's (name, length, mtime), recursively.
  *
  * Why rename-as-publish instead of a _BUILT marker: the marker was
  * created after three separate overwrite writes with no locking, so
  * two racing builders could interleave overwrites and then bless the
  * mix. Here each builder writes into its own unique temp sibling and
  * a single directory rename makes the index visible; the loser of the
  * race finds the winner's complete directory and discards its temp.
  * Mirrors the reference's stage-output publish (a shuffle stage's
  * files appear to consumers only once fully written,
  * `core/src/execution_plans/shuffle_writer.rs`).
  */
private[graft] object IndexStore {

  /** 16-hex content fingerprint of a parquet source file or directory:
    * md5 over canonical path + recursive child (name, length, mtime). */
  def fingerprint(src: File): String = {
    val sb = new StringBuilder(src.getCanonicalPath)
    def walk(f: File): Unit = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty[File])
      kids.sortBy(_.getName).foreach { c =>
        if (c.isDirectory) walk(c)
        else sb.append('|').append(c.getName).append(':')
          .append(c.length()).append(':').append(c.lastModified())
      }
    }
    if (src.isDirectory) walk(src)
    else if (src.isFile)
      sb.append('|').append(src.length()).append(':')
        .append(src.lastModified())
    java.security.MessageDigest.getInstance("MD5")
      .digest(sb.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }

  /** Build-if-missing with atomic publish. `base`'s existence IS the
    * built marker (a rename either fully succeeds or not at all on the
    * same filesystem — tmpdir — so no partially-visible state exists).
    * `build` receives the private temp directory to write into. */
  def ensureBuilt(base: File)(build: File => Unit): String = {
    if (!base.exists()) {
      base.getParentFile.mkdirs()
      val tmp = new File(base.getParentFile,
        base.getName + ".tmp_" +
          java.util.UUID.randomUUID().toString.take(8))
      build(tmp)
      if (!tmp.renameTo(base)) {
        if (base.exists()) deleteRec(tmp) // concurrent builder won
        else throw new java.io.IOException(
          s"cannot publish index at $base")
      }
    }
    base.getAbsolutePath
  }

  private def deleteRec(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(deleteRec)
    f.delete()
  }
}
