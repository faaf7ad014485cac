package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** One-line JSON string escape (the artifact must stay a single line
    * even when an error message carries quotes or newlines).
    */
  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC like Verify/SparkSpecBase: the events TIMESTAMP_NTZ→TIMESTAMP
      // normalization (Tables.normalizeTs) is value-identity only in UTC
      .config("spark.sql.session.timeZone", "UTC")
      // FileOutputCommitter v2 (public MR/Spark setting): task commits
      // rename straight to the destination instead of through the job-
      // commit's single-threaded driver merge. The many-partition fan-out
      // writes (a23's ~240 day×bucket dirs) otherwise serialize their
      // commit on the driver; v2's tradeoff (partial task output visible
      // on job failure) is irrelevant for these scratch-dir stagings and
      // the standard choice for HDFS-like stores (object stores use
      // dedicated committers instead).
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup outside the timed region: the first query
    // otherwise absorbs ~3-5s of one-time session cost into its number.
    // The warmup is ALSO timed and emitted as `warmup_calib_sec` — a
    // machine-load discriminator (r10 verdict #1): this fixed workload
    // measured 6.7 s on a quiet machine under the driver harness
    // (sbt-launched local[32], r11 calibration run) and scales with
    // contention, so a bench artifact whose per-query numbers sit above
    // band can be adjudicated (load artifact vs real regression) from
    // the artifact alone instead of requiring a quiet re-run: calib at
    // ~2× the quiet value or more marks the run as loaded.
    val warmT0 = System.nanoTime()
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    SparkEntry.entry(spark).count()
    val warmupCalib = (System.nanoTime() - warmT0) / 1e9
    // Local-profiling filter: SPARK_GRAFT_ONLY=q1,q2 limits the run to
    // the named queries. Unset (the driver's invocation) runs everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    // Deterministic name order: Map iteration order is effectively
    // arbitrary and changes as queries are added, which re-assigns the
    // per-plan codegen warmup to different queries each round and makes
    // per-query numbers non-comparable across bench artifacts.
    val ordered = selected.toSeq.sortBy(_._1)
    // SPARK_GRAFT_REPS (r3 advice: one loaded machine produced a
    // misleading single-pass artifact) re-runs the whole sequence and
    // reports the per-query MIN — the contention-resistant number — next
    // to the untouched first-pass total. Later passes run against warm
    // session caches (shingle index, pair/cluster relations), so the min
    // also separates each query's own cost from the shared-infrastructure
    // build its first pass may absorb. Default 2 so the recorded artifact
    // always carries a meaningful sum-of-min (the warm pass costs ~half
    // the cold one); set 1 to restore the single-pass-only behavior.
    // Malformed values fall back to the default instead of crashing the
    // whole bench (r4 advice).
    val reps = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_REPS", "2").trim.toInt).getOrElse(2).max(1)
    // A failing query must NOT masquerade as a fast one (r4 verdict: the
    // old catch recorded elapsed time and exited 0). Failures are
    // recorded per query in "errors", excluded from the min, and force a
    // nonzero exit so the driver's artifact cannot silently lie.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val passes = (1 to reps).map { _ =>
      ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            errors.getOrElseUpdate(name,
              s"${e.getClass.getSimpleName}: " +
                Option(e.getMessage).getOrElse("").linesIterator
                  .take(1).mkString.take(300))
            false
          }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    }
    def timesOf(n: String, okOnly: Boolean): Seq[Double] =
      passes.flatMap(_.collectFirst {
        case (`n`, t, ok) if ok || !okOnly => t })
    // "queries" keeps its r4 meaning (per-query min over passes) for the
    // driver; "queries_first_pass" carries the unreduced first-pass times
    // so old (first-pass) and new (min) artifacts are not conflated
    // (r4 advice). A query with zero successful passes reports -1.
    val minPer = ordered.map(_._1).map { n =>
      val oks = timesOf(n, okOnly = true)
      n -> (if (oks.nonEmpty) oks.min else -1.0)
    }
    def jmap(kvs: Seq[(String, String)]): String =
      kvs.map { case (k, v) => "\"" + esc(k) + "\":" + v }
        .mkString("{", ",", "}")
    val qs = jmap(minPer.map { case (k, v) => k -> v.toString })
    val firstQs = jmap(passes.head.map { case (n, t, _) => n -> t.toString })
    val errJson = jmap(errors.toSeq.map { case (k, v) =>
      k -> ("\"" + esc(v) + "\"") })
    val total = passes.head.map(_._2).sum
    val sumOfMin = minPer.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_first_pass":$firstQs,"sum_of_min":$sumOfMin,"reps":$reps,"warmup_calib_sec":$warmupCalib,"errors":$errJson,"sf":"${esc(sfDir)}"}""")
    // Compact summary, printed LAST (r8 verdict #3): the driver records
    // only a bounded TAIL of stdout, and the full line above has grown
    // past it — two rounds in a row the leading total/sum_of_min fields
    // were truncated away, leaving only load-sensitive first-pass times
    // and triggering false regression alarms. The final ~300-byte line
    // always survives the tail and carries the contention-resistant
    // numbers: sum-of-min, first-pass total, error count, and the ten
    // most expensive per-query MINS.
    val top10 = minPer.filter(_._2 >= 0).sortBy(-_._2).take(10)
    // Regression check against the committed quiet-run band (see
    // BenchBand): offenders are per-query MINS above band×3 — a signal
    // that survives machine load, unlike first-pass times.
    val band = BenchBand.load(
      sys.env.getOrElse("GRAFT_BENCH_BAND", "BENCH_BAND.json"))
    val regress = BenchBand.regressions(
      minPer.filter(_._2 >= 0).toMap, band)
    val regressJson = jmap(regress.toSeq.sortBy(_._1).map {
      case (k, (fr, b)) => k -> f"""{"min":$fr%.3f,"band":$b%.3f}""" })
    println(s"""{"metric":"summary","sum_of_min":$sumOfMin,"total":$total,"n_queries":${minPer.size},"n_errors":${errors.size},"warmup_calib_sec":${f"$warmupCalib%.3f"},"band_regressions":$regressJson,"top10_min":${jmap(top10.map { case (k, v) => k -> f"$v%.3f" })},"sf":"${esc(sfDir)}"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
