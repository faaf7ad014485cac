package graft.streaming

import graft.SparkSpecBase

/** st28 — the retention gap guard in isolation (the streaming paths —
  * lag-safe resume and the loud outrun failure — are driven end-to-end
  * with real checkpointed restarts by the registered
  * `st28_feed_across_vacuum` row; this pins the guard's algebra). */
class FeedRetentionSpec extends SparkSpecBase {

  test("the guard passes resolvable tails, skips fed versions, names the gap") {
    val dir = java.nio.file.Files.createTempDirectory("graft_st28s_")
    val base = dir.toString
    try {
      import java.nio.file.{Files, Paths}
      Seq(3, 4).foreach(v =>
        Files.writeString(Paths.get(base, s"manifest-$v"), s"t$v"))
      // unread tail fully resolvable → fine
      FeedRetention.requireNoGap(base, Set(1, 2), 3)
      FeedRetention.requireNoGap(base, Set(1, 2), 4)
      // an ALREADY-FED version may be vacuumed freely
      Files.delete(Paths.get(base, "manifest-3"))
      FeedRetention.requireNoGap(base, Set(1, 2, 3), 4)
      // an UNREAD vacuumed version fails loudly, by name
      val e = intercept[IllegalArgumentException](
        FeedRetention.requireNoGap(base, Set(1, 2), 4))
      assert(e.getMessage.contains("version 3"))
      // bootstrap: nothing fed, version 1 needs no predecessor
      FeedRetention.requireNoGap(base, Set.empty, 1)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
