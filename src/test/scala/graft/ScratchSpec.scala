package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scratch-directory registry semantics: fresh dirs are distinct,
  * memoized exports build once per (kind, dataset) key, and distinct
  * datasets never share an export. */
class ScratchSpec extends AnyFunSuite {

  test("dir returns a fresh existing directory every call") {
    val a = Scratch.dir("graft-spec-")
    val b = Scratch.dir("graft-spec-")
    assert(a !== b)
    assert(new java.io.File(a).isDirectory && new java.io.File(b).isDirectory)
  }

  test("cachedExport builds once per key and memoizes the path") {
    var builds = 0
    val key = s"spec-${System.nanoTime()}"
    def get() = Scratch.cachedExport(key, "/root/testdata/sf0.001") { dir =>
      builds += 1
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "marker"), "x")
    }
    val p1 = get()
    val p2 = get()
    assert(p1 === p2)
    assert(builds === 1, "build closure ran more than once for one key")
    assert(new java.io.File(p1, "marker").exists)
    // a different dataset path under the same kind is a different export
    val other = Scratch.cachedExport(key, "/root/testdata/sf0.01")(_ => builds += 1)
    assert(other !== p1)
    assert(builds === 2)
  }
}
