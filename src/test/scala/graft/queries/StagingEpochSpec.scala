package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Staged fixtures are a function of (source data, writer code), but
  * r11's memo keys carried only the data identity — the driver's final
  * Verify consumed a bucket warehouse staged two commits BEFORE that
  * round's bucket-path fixes, so a write-path fix could be invisible to
  * CORRECTNESS until the testdata regenerated. `Staging.sourceKey` now
  * salts every key with `Staging.codeEpoch` (newest mtime under the
  * class's code source, i.e. any recompile). This spec proves the
  * contract: same epoch → memoized, bumped epoch → restaged.
  */
class StagingEpochSpec extends AnyFunSuite {

  test("sourceKey carries the code epoch") {
    val f = java.io.File.createTempFile("graft-epoch", ".dat")
    f.deleteOnExit()
    assert(Staging.sourceKey(f).endsWith(s":${Staging.codeEpoch}"))
    assert(Staging.sourceKey(f, "m:k")
      .contains(s":${Staging.codeEpoch}:m:k"))
  }

  test("a bumped epoch restages; an unchanged epoch memoizes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-epoch")
    val marker = dir.resolve("_staged")
    val src = java.io.File.createTempFile("graft-epoch-src", ".parquet")
    src.deleteOnExit()
    var runs = 0
    def stageWith(epoch: String): Boolean = {
      val prev = sys.props.get("graft.staging.epoch")
      sys.props("graft.staging.epoch") = epoch
      try Staging.once(marker, Staging.sourceKey(src)) { runs += 1 }
      finally prev match {
        case Some(v) => sys.props("graft.staging.epoch") = v
        case None => sys.props.remove("graft.staging.epoch")
      }
    }
    assert(stageWith("epoch-a") && runs == 1, "first call must stage")
    assert(!stageWith("epoch-a") && runs == 1,
      "same data + same epoch must memoize")
    assert(stageWith("epoch-b") && runs == 2,
      "same data + bumped epoch must restage")
    assert(!stageWith("epoch-b") && runs == 2)
  }
}
