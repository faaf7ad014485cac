package graft

/** Per-query performance band (r8 verdict #6): `BENCH_BAND.json` holds
  * the quiet-machine per-query MIN times recorded at band-capture time;
  * [[Bench]] compares each fresh run's per-query min against band ×
  * [[defaultFactor]] and reports offenders in its summary line. This
  * separates genuine plan regressions from driver-machine load — the
  * min-over-reps is already contention-resistant, and the ×3 margin
  * absorbs the rest (two rounds of false alarms were first-pass times
  * on a loaded box at 10–30× the quiet min; a real plan regression
  * multiplies the MIN).
  *
  * Parsing is a flat regex over the band file's `"mins"` object — the
  * file is repo-authored (one shape), and the library must not grow a
  * JSON dependency for it.
  */
object BenchBand {

  val defaultFactor = 3.0

  /** The `"mins"` object of the band file as name → seconds. Returns
    * empty on any shape surprise (no band → no regression checks).
    */
  def parseMins(json: String): Map[String, Double] = {
    val minsIdx = json.indexOf("\"mins\"")
    if (minsIdx < 0) Map.empty
    else {
      val start = json.indexOf('{', minsIdx)
      val end = if (start < 0) -1 else json.indexOf('}', start)
      if (start < 0 || end < 0) Map.empty
      else
        "\"([^\"]+)\"\\s*:\\s*([0-9][0-9.eE+-]*)".r
          .findAllMatchIn(json.substring(start + 1, end))
          .flatMap { m =>
            scala.util.Try(m.group(2).toDouble).toOption
              .map(m.group(1) -> _)
          }.toMap
    }
  }

  /** Queries whose fresh min exceeds band × factor →
    * (fresh, band). Queries missing from the band (new this round) are
    * skipped — they enter the band at its next capture.
    */
  def regressions(fresh: Map[String, Double], band: Map[String, Double],
      factor: Double = defaultFactor): Map[String, (Double, Double)] =
    fresh.flatMap { case (n, t) =>
      band.get(n).filter(b => b > 0 && t > b * factor).map(b => n -> (t, b))
    }

  /** Band mins from `path`, or empty when absent/unreadable. */
  def load(path: String = "BENCH_BAND.json"): Map[String, Double] =
    scala.util.Try(
      parseMins(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8))
    ).getOrElse(Map.empty)
}
