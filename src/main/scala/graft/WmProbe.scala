package graft

import graft.operators.Cdc

import java.sql.Timestamp

/** Dev probe (VERDICT r14 task 6): where does the watermark store's
  * whole-file-rewrite knee sit — and what does sharding buy back?
  *
  * The r14 driver-local commit reads the live store file(s) with
  * parquet-mr, merges one key, and writes the WHOLE store back as one
  * parquet file — O(T) bytes per commit at T tables. At T=1,000 that is
  * ~35 ms and the commit tail is noise; this probe measures the
  * steady-state per-commit cost at T = 1k / 10k / 100k so the scale
  * bound is a number, not a guess. r15 built the sharded store
  * ([[Cdc.shardWatermarkStore]]: B independent files-behind-pointers,
  * shard = portable hash32(table) % B, per-shard locks) — pass `T:B` to
  * measure it: per-commit cost drops to O(T/B) and commits to different
  * shards stop serializing (the probe also times a parallel burst to
  * show the lock-level win).
  *
  * Seeding goes through [[Cdc.seedWatermarkStore]] — the store's own
  * writer invoked once per shard with the full map (the exact bytes a
  * T-commit history would converge to); seeding through T public commits
  * would be an O(T^2) rewrite and measure nothing new.
  *
  * Usage: tools/jvmrun.sh graft.WmProbe [T[:B]...]
  * Prints one JSON line per configuration: median + p90 of 20 commits,
  * plus wall time of a 32-commit burst from 8 threads. */
object WmProbe {
  def main(args: Array[String]): Unit = {
    val configs: Seq[(Int, Int)] =
      if (args.nonEmpty) args.toSeq.map { a =>
        a.split(':') match {
          case Array(t) => (t.toInt, 1)
          case Array(t, b) => (t.toInt, b.toInt)
          case _ => throw new IllegalArgumentException(s"expected T or T:B, got $a")
        }
      }
      else Seq((1000, 1), (10000, 1), (100000, 1), (100000, 16))
    // a session only because updateWatermark's signature takes one — the
    // commit path is driver-side and schedules zero Spark jobs (CdcSpec pin)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    configs.foreach { case (t, b) =>
      val state = java.nio.file.Files.createTempDirectory(s"graft_wmprobe_${t}_$b").toString
      val base = new Timestamp(1704067200000L) // 2024-01-01, fixed epoch
      val seed = (1 to t).map(k => f"table_$k%06d" -> base).toMap
      if (b > 1) {
        Cdc.seedWatermarkStore(state, Map("table_000001" -> base))
        Cdc.shardWatermarkStore(state, b)
      }
      Cdc.seedWatermarkStore(state, seed)
      require(Cdc.readWatermarkMap(state).size == t, s"seed failed at T=$t B=$b")
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
      // 32 commits from 8 threads: unsharded they serialize on one lock;
      // sharded they spread over B locks and overlap
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val burstKeys = (1 to 32).map(j => f"table_${(j * 37) % t + 1}%06d")
      val t0 = System.nanoTime()
      burstKeys.map { k =>
        pool.submit(new Runnable {
          def run(): Unit =
            Cdc.updateWatermark(spark, state, k, new Timestamp(base.getTime + 99999000L))
        })
      }.foreach(_.get())
      val burstMs = (System.nanoTime() - t0) / 1e6
      pool.shutdown()
      println(f"""{"tables":$t,"shards":$b,"commit_ms_median":$med%.1f,"commit_ms_p90":$p90%.1f,"burst32x8_ms":$burstMs%.1f}""")
    }
    spark.stop()
  }
}
