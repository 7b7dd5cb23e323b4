package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev probe for the iterative-CC queries' fixed-cost profile: times warm
  * repeats of named queries while counting Spark jobs/stages/tasks, and
  * applies `spark.*=value` args as session-conf overrides between queries —
  * the A/B harness behind the q45/q74 drift diagnosis in BASELINE.md. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    var jobs = 0; var stages = 0; var tasks = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })
    for (arg <- args) arg.split("=", 2) match {
      case Array(k, v) if k.startsWith("spark.") =>
        spark.conf.set(k, v); println(s"SET $k=$v")
      case Array("jobfloor") =>
        // per-stage-job fixed latency on this box: 30 trivial one-task
        // jobs, data-free — the divisor for the CC queries' job counts
        (1 to 2).foreach { rep =>
          val t0 = System.nanoTime()
          (1 to 30).foreach(_ => spark.range(0L, 8L, 1, 1).count())
          val ms = (System.nanoTime() - t0) / 1e6 / 30
          println(f"PROBE jobfloor rep$rep $ms%6.1f ms/job (30 trivial 1-task count jobs)")
        }
      case Array(q) =>
        Bench.materialize(SparkEntry.queries(q)(spark, dir)) // warm
        spark.catalog.clearCache()
        (1 to 3).foreach { i =>
          // listener events arrive asynchronously on the bus: drain it
          // before BOTH the reset and the read, or the counters undercount
          // and the reset races events still in flight from the last run
          drainListenerBus(spark)
          jobs = 0; stages = 0; tasks = 0
          val t0 = System.nanoTime()
          Bench.materialize(SparkEntry.queries(q)(spark, dir))
          val secs = (System.nanoTime() - t0) / 1e9
          drainListenerBus(spark)
          println(f"PROBE $q%-24s run$i $secs%6.2fs jobs=$jobs stages=$stages tasks=$tasks")
          spark.catalog.clearCache()
        }
      case _ => ()
    }
    spark.stop()
  }

  /** Block until every queued listener event has been delivered.
    * `SparkContext.listenerBus` is `private[spark]`, which erases to a
    * public accessor in bytecode — reflection reaches it without putting
    * probe code inside Spark's package; a 200 ms settle is the fallback
    * if either signature ever moves. */
  private[graft] def drainListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      ()
    } catch { case _: Exception => Thread.sleep(200) }
}
