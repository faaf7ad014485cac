package graft

import org.apache.spark.sql.functions._

/** Pins the micro-unit quantization contract ([[Tables.uq6]]): floats
  * whose shortest decimal rendering has 7 decimals ending in 5 sit an
  * ulp BELOW the half when widened to double (e.g. -0.1975755f widens
  * to -0.19757549464…), so correct round-to-nearest keeps them at the
  * lower 6-decimal value. `CAST(float AS DECIMAL(18,6))` disagrees
  * between engines on exactly these values (DuckDB rounds the decimal
  * string, half away from zero) — the one-digit s18 hash flip this
  * spec memorializes. uq6 must follow the BINARY value, matching the
  * r6/LUT arithmetic both engines replay identically.
  */
class Uq6Spec extends SparkSpecBase {

  test("uq6 rounds the widened binary value, not the float's decimal string") {
    // the three corpus floats that flipped s18's hash at sf0.001:
    // all print as 7 decimals ending in 5, all widen to just below half
    val cases = Seq(
      -0.1975755f -> -197575L,
      -0.1656795f -> -165679L,
      -0.2348055f -> -234805L)
    cases.foreach { case (f, expected) =>
      val got = spark.range(1)
        .select(Tables.uq6(lit(f))).head().getLong(0)
      assert(got == expected,
        s"uq6($f) = $got, want $expected (binary ${f.toDouble})")
    }
  }

  test("uq6Mean mirrors its SQL rendering's association exactly") {
    // 18 members summing to -2402360 micro-units (the s18 cluster
    // shape): one BIGINT sum, /count, /1e6 — same two double ops the
    // oracle performs
    val m = spark.range(1)
      .select(Tables.uq6Mean(lit(-2402360L), lit(18L))).head().getDouble(0)
    assert(m == -2402360L.toDouble / 18L / 1000000.0)
  }
}
