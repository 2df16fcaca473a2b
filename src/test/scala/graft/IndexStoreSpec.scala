package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.IndexStore

/** Lifecycle spec for the shared index-artifact store — the round-12
  * validation/eviction hardening (round-11 advice: `base.exists()` alone
  * trusted a tmp-reaper-gutted artifact, and fingerprint-keyed trees
  * stranded forever).
  */
class IndexStoreSpec extends AnyFunSuite {

  private def freshFamily(): File = {
    val d = Files.createTempDirectory("graft_idxspec_").toFile
    d.deleteOnExit()
    d
  }

  private def writeArtifact(tmp: File): Unit = {
    val part = new File(tmp, "labels")
    part.mkdirs()
    Files.writeString(new File(part, "part-00000").toPath, "rows")
    Files.writeString(new File(part, "_SUCCESS").toPath, "")
  }

  test("ensureBuilt builds once, writes a manifest, and reuses a valid " +
    "artifact without rebuilding") {
    val fam = freshFamily()
    val base = new File(fam, "aaaabbbbccccdddd")
    var builds = 0
    IndexStore.ensureBuilt(base) { tmp => builds += 1; writeArtifact(tmp) }
    assert(builds == 1)
    assert(new File(base, "_MANIFEST").isFile,
      "publish must include the manifest")
    IndexStore.ensureBuilt(base) { tmp => builds += 1; writeArtifact(tmp) }
    assert(builds == 1, "a valid artifact must not rebuild")
  }

  test("a gutted artifact (file deleted inside a published dir) fails " +
    "validation and rebuilds instead of being probed") {
    val fam = freshFamily()
    val base = new File(fam, "aaaabbbbccccdddd")
    var builds = 0
    IndexStore.ensureBuilt(base) { tmp => builds += 1; writeArtifact(tmp) }
    // Simulate a tmp reaper: delete a data file but keep base + subdir.
    assert(new File(new File(base, "labels"), "part-00000").delete())
    IndexStore.ensureBuilt(base) { tmp => builds += 1; writeArtifact(tmp) }
    assert(builds == 2, "a gutted artifact must rebuild")
    assert(new File(new File(base, "labels"), "part-00000").isFile)
  }

  test("a legacy artifact without a manifest rebuilds once") {
    val fam = freshFamily()
    val base = new File(fam, "aaaabbbbccccdddd")
    base.mkdirs()
    writeArtifact(base) // pre-manifest layout: parts but no _MANIFEST
    var builds = 0
    IndexStore.ensureBuilt(base) { tmp => builds += 1; writeArtifact(tmp) }
    assert(builds == 1, "legacy artifact must rebuild under validation")
    assert(new File(base, "_MANIFEST").isFile)
  }

  test("publish evicts >24h-idle siblings of ANY fingerprint (retired " +
    "tag generations included) — fresh siblings and .tmp_ dirs survive") {
    val fam = freshFamily()
    val old = System.currentTimeMillis() - 25L * 3600 * 1000
    def sibling(name: String, mtime: Long): File = {
      val d = new File(fam, name)
      d.mkdirs()
      Files.writeString(new File(d, "x").toPath, "x")
      d.setLastModified(mtime)
      d
    }
    val staleOther = sibling("1111222233334444-full", old)
    val freshOther = sibling("5555666677778888", System.currentTimeMillis())
    // 7h idle: would have died under the old 6h horizon — pins that the
    // horizon is 24h (a build round runs ~6h; see IndexStore doc).
    val midOther = sibling("2222333344445555",
      System.currentTimeMillis() - 7L * 3600 * 1000)
    // Retired artifact-schema generation of the SAME corpus (e.g. a
    // pre-"-v2" name after a cache-key bump): 24h idle → evicted, or
    // it strands forever (round-13 advice).
    val staleSameFp = sibling("aaaabbbbccccdddd-delta", old)
    val freshSameFp = sibling("aaaabbbbccccdddd-delta-v2",
      System.currentTimeMillis())
    val tmpDir = sibling("9999000011112222.tmp_ab12cd34", old)
    val base = new File(fam, "aaaabbbbccccdddd")
    IndexStore.ensureBuilt(base)(writeArtifact)
    assert(!staleOther.exists(),
      "stale different-fingerprint sibling must be evicted")
    assert(freshOther.exists(), "fresh sibling must survive (age guard)")
    assert(midOther.exists(),
      "a 7h-idle sibling must survive — the horizon is 24h, not 6h")
    assert(!staleSameFp.exists(),
      "24h-idle same-fingerprint retired-tag sibling must be evicted")
    assert(freshSameFp.exists(),
      "fresh same-fingerprint tag sibling must survive (age guard)")
    assert(tmpDir.exists(), "a concurrent builder's .tmp_ must survive")
  }
}
