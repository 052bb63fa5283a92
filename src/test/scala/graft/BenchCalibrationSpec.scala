package graft

/** The box-calibration probe (round-13 verdict item #1) must actually
  * run and yield a sane number — the full-sweep JSON depends on it for
  * cross-round total comparability, and a probe that silently returned
  * 0/NaN would make every calibrated ratio garbage.
  */
class BenchCalibrationSpec extends SparkSuite {

  test("calibration probe returns a positive finite wall time") {
    val sec = Bench.calibrationProbe(spark)
    assert(!sec.isNaN && !sec.isInfinite && sec > 0.0,
      s"probe returned $sec")
    // generous sanity ceiling: the fixed 16M-row hash+shuffle workload is
    // sub-second warm on any box this suite runs on; a minute means the
    // probe's workload definition regressed into something fixture- or
    // corpus-sized
    assert(sec < 60.0, s"probe took $sec s — workload definition regressed?")
  }
}
