package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared shuffle-partition scope for the BOUNDED streaming catch-up
  * rows (st4s–st10): a stateful streaming query instantiates state
  * stores per shuffle partition per stateful operator (a stream-stream
  * join holds FOUR per partition), and every micro-batch pays a
  * setup/commit round per store. At the session's 32 partitions that is
  * pure fixed overhead for a catch-up run over a staged file — measured
  * on st4s, 32 → 8 partitions cut the run 2.5× with the result
  * hash-unchanged (the oracle re-certifies every row).
  *
  * Production sizing note: this is the same knob a real deployment
  * sizes to cluster cores × state volume — and it must be set BEFORE
  * `start()`, because the value is pinned into the checkpoint for the
  * query's lifetime. The scope restores the caller's setting on exit,
  * so batch queries in the same session keep their 32-way shuffles.
  *
  * CONCURRENCY CONTRACT: the scope mutates the SESSION-GLOBAL
  * `spark.sql.shuffle.partitions` and assumes SEQUENTIAL execution on
  * the session (Verify/Bench run queries one at a time; scalatest runs
  * suites sequentially). A future parallel harness running a batch
  * query concurrently with a scoped catch-up would silently plan that
  * batch at `n` partitions, and nested scopes would restore stale
  * values — under a parallel runner, give each catch-up its own
  * `spark.newSession()` (per-session conf) instead of this scope.
  */
object CatchupConf {

  val boundedStatePartitions = 8

  def withBoundedStatePartitions[A](s: SparkSession,
      n: Int = boundedStatePartitions)(body: => A): A = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body
    finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
