package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev probe: per-JOB attribution for a named query — prints each Spark
  * job's call site, duration, and task count, so job-count-dense queries
  * (the CDC cycle, the CC loops) can be optimized against a measured
  * breakdown instead of a guess. Warm-run: each query runs once untimed
  * (codegen/JIT), then once traced. */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    @volatile var on = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = if (on) {
        val site = j.stageInfos.sortBy(_.stageId).map(_.name.takeWhile(_ != '+').trim)
          .distinct.mkString(" | ")
        starts.put(j.jobId, (System.nanoTime(), site, j.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (on) {
        Option(starts.get(e.jobId)).foreach { case (t0, site, tasks) =>
          println(f"JOB ${e.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3fs tasks=$tasks%4d  $site")
        }
      }
    })
    for (q <- args) {
      Bench.materialize(SparkEntry.queries(q)(spark, dir)) // warm
      spark.catalog.clearCache()
      CcProbe.drainListenerBus(spark)
      println(s"===== $q =====")
      on = true
      val t0 = System.nanoTime()
      Bench.materialize(SparkEntry.queries(q)(spark, dir))
      val secs = (System.nanoTime() - t0) / 1e9
      CcProbe.drainListenerBus(spark)
      on = false
      println(f"TOTAL $q $secs%.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
