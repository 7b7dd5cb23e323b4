package graft

import graft.operators.Cdc

import java.sql.Timestamp

/** Dev probe (VERDICT r14 task 6): where does the watermark store's
  * whole-file-rewrite knee sit?
  *
  * The r14 driver-local commit reads the live store file(s) with
  * parquet-mr, merges one key, and writes the WHOLE store back as one
  * parquet file — O(T) bytes per commit at T tables. At T=1,000 that is
  * ~35 ms and the commit tail is noise; this probe measures the
  * steady-state per-commit cost at T = 1k / 10k / 100k so the scale
  * bound is a number, not a guess. The sharding design if the bound ever
  * binds: hash-bucket the store into B independent files-behind-pointers
  * (bucket = hash(table) % B), each committed by the same
  * atomicOverwriteWith protocol — per-commit cost drops to O(T/B) and
  * concurrent streams on different buckets stop serializing. Not built
  * until a deployment actually runs >10k CDC tables through ONE store.
  *
  * Seeding goes through [[Cdc.seedWatermarkStore]] — the store's own
  * writer invoked once with the full map (the exact bytes a T-commit
  * history would converge to); seeding through T public commits would be
  * an O(T^2) rewrite and measure nothing new.
  *
  * Usage: tools/jvmrun.sh graft.WmProbe [sizes...]
  * Prints one JSON line per store size: median + p90 of 20 commits. */
object WmProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1000, 10000, 100000)
    // a session only because updateWatermark's signature takes one — the
    // commit path is driver-side and schedules zero Spark jobs (CdcSpec pin)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sizes.foreach { t =>
      val state = java.nio.file.Files.createTempDirectory(s"graft_wmprobe_$t").toString
      val base = new Timestamp(1704067200000L) // 2024-01-01, fixed epoch
      val seed = (1 to t).map(k => f"table_$k%06d" -> base).toMap
      Cdc.seedWatermarkStore(state, seed)
      require(Cdc.readWatermarkMap(state).size == t, s"seed failed at T=$t")
      // untimed warmup commit (classloading/JIT), then 20 timed
      // single-key advances — the cycle tail's exact operation
      Cdc.updateWatermark(spark, state, "table_000001", new Timestamp(base.getTime + 500L))
      val times = (1 to 20).map { j =>
        val t0 = System.nanoTime()
        Cdc.updateWatermark(spark, state, f"table_${j % t + 1}%06d",
          new Timestamp(base.getTime + j * 1000L))
        (System.nanoTime() - t0) / 1e6
      }.sorted
      val med = times(times.size / 2)
      val p90 = times((times.size * 9) / 10)
      println(f"""{"tables":$t,"commit_ms_median":$med%.1f,"commit_ms_p90":$p90%.1f}""")
    }
    spark.stop()
  }
}
