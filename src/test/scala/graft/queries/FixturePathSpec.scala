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

  test("stale env dir falls back to the repo copy — one path, both engines") {
    val stale = Files.createTempDirectory("graft_stale").toFile
    val resolved = Ingest.resolveFixture(stale.getAbsolutePath, "league.csv")
    val repoCopy =
      new java.io.File("src/test/resources/fixtures/league.csv")
    assume(repoCopy.exists, "repo fixture must exist for this spec")
    assert(resolved == repoCopy.getAbsolutePath)
    assert(new java.io.File(resolved).exists)
  }

  test("when neither copy exists both engines get the SAME missing path") {
    val stale = Files.createTempDirectory("graft_stale2").toFile
    val resolved = Ingest.resolveFixture(stale.getAbsolutePath, "no_such.json")
    assert(resolved ==
      new java.io.File(stale, "no_such.json").getAbsolutePath)
  }
}
