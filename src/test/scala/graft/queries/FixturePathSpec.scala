package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Contract for [[Ingest.resolveFixture]] (r5 advice #3): the Spark
  * reader and the oracle SQL must ALWAYS receive the same absolute path
  * for a fixture — including when `GRAFT_FIXTURE_DIR` points at a dir
  * that does not contain the file (previously the Spark side silently
  * fell back to the repo copy while the oracle kept the env dir, so the
  * two engines could compare different bytes).
  */
class FixturePathSpec extends AnyFunSuite {

  test("env dir wins when the file exists there") {
    val dir = Files.createTempDirectory("graft_fix").toFile
    val f = new java.io.File(dir, "league.csv")
    Files.write(f.toPath, "A,B\n1,2\n".getBytes)
    assert(Ingest.resolveFixture(dir.getAbsolutePath, "league.csv")
      == f.getAbsolutePath)
  }

  test("stale env dir falls back to the fallback copy — one path, both engines") {
    // the fallback dir is pinned to an absolute temp dir (r7 advice #3:
    // the previous cwd-relative repo path made this spec depend on the
    // JVM working directory, not on resolveFixture's own contract)
    val stale = Files.createTempDirectory("graft_stale").toFile
    val fallbackDir = Files.createTempDirectory("graft_fallback").toFile
    val copy = new java.io.File(fallbackDir, "league.csv")
    Files.write(copy.toPath, "A,B\n1,2\n".getBytes)
    val resolved = Ingest.resolveFixture(stale.getAbsolutePath, "league.csv",
      fallbackDir.getAbsolutePath)
    assert(resolved == copy.getAbsolutePath)
    assert(new java.io.File(resolved).exists)
  }

  test("when neither copy exists both engines get the SAME missing path") {
    val stale = Files.createTempDirectory("graft_stale2").toFile
    val fallbackDir = Files.createTempDirectory("graft_fallback2").toFile
    val resolved = Ingest.resolveFixture(stale.getAbsolutePath, "no_such.json",
      fallbackDir.getAbsolutePath)
    assert(resolved ==
      new java.io.File(stale, "no_such.json").getAbsolutePath)
  }
}
