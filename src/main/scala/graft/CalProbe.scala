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
  * Usage: tools/jvmrun.sh graft.CalProbe */
object CalProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: pay whole-stage codegen/JIT for both probe shapes
    // once, so the timed min-of-3 measures the machine, not the compiler
    spark.range(0L, 1000000L, 1, 32)
      .selectExpr("(id % 65536) AS k", "id AS v")
      .groupBy("k").agg(org.apache.spark.sql.functions.expr("sum(v)"))
      .selectExpr("sum(k)").collect()
    val (sec, floor) = Bench.calibrate(spark)
    println(f"""{"cal_sec":$sec%.4f,"floor":$floor%.4f,"ratio":${sec / floor}%.3f}""")
    spark.stop()
  }
}
