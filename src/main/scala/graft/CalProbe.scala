package graft

/** Standalone machine-load probe: runs [[Bench.calibrate]]'s exact
  * CPU+exchange probe in a fresh session and prints one JSON line with
  * the ratio to the all-time floor — the cheap (~30 s) way to detect a
  * calm window before paying for a full multi-minute bench run
  * (BASELINE.md protocol: suite totals are load-hostage on this box;
  * only calibration ≲ 1.2 windows yield code figures, and r13 closed
  * without one). Floor handling is calibrate's own: read from
  * bench_calibration_floor.txt, only ever lowered.
  *
  * The session comes from [[Bench.buildSession]] — the bench's exact
  * master/conf set (ADVICE r14: a hard-coded faster config here could
  * permanently depress the shared, never-rotated floor and make every
  * subsequent Bench run read as loaded).
  *
  * Usage: tools/jvmrun.sh graft.CalProbe */
object CalProbe {
  def main(args: Array[String]): Unit = {
    val spark = Bench.buildSession()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: pay whole-stage codegen/JIT for both probe shapes
    // once, so the timed min-of-3 measures the machine, not the compiler
    Bench.warmCalibration(spark)
    val (sec, floor) = Bench.calibrate(spark)
    println(f"""{"cal_sec":$sec%.4f,"floor":$floor%.4f,"ratio":${sec / floor}%.3f}""")
    spark.stop()
  }
}
