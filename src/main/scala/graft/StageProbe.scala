package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import scala.collection.mutable.ArrayBuffer

/** Stage-level metrics probe for ladder diagnosis: runs one query under
  * the EXACT [[ScaleBench.session]] confs and prints, per stage of the
  * timed (warm) repeat, the numbers that localize a scale knee — task
  * count, wall duration, input/shuffle volumes in records AND bytes, and
  * memory/disk spill. The r12 verdict's q79 directive ("stage-time the
  * distinct's shuffle-read / spill metrics at sx125 vs sx625") is this
  * tool's reason to exist; it generalizes to any query on the ladder.
  *
  * Usage: runMain graft.StageProbe <query> <dir> [spark.conf=value ...]
  * Conf overrides apply AFTER session construction (runtime-settable SQL
  * confs only — the A/B lever surface, same contract as CcProbe).
  */
object StageProbe {

  private case class StageRow(
      id: Int, attempt: Int, name: String, tasks: Int, wallMs: Long,
      inputRec: Long, inputMB: Long, srRec: Long, srMB: Long,
      swRec: Long, swMB: Long, memSpillMB: Long, diskSpillMB: Long,
      runMs: Long, cpuMs: Long, gcMs: Long)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageProbe <query> <dir> [spark.conf=value ...]")
    val (query, dir) = (args(0), args(1))
    val spark = ScaleBench.session()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.startsWith("spark.") =>
          spark.conf.set(k, v); println(s"SET $k=$v")
        case other => sys.error(s"bad conf override: ${other.mkString("=")}")
      }
    }
    val stages = ArrayBuffer.empty[StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val wall = (for { a <- i.completionTime; b <- i.submissionTime } yield a - b).getOrElse(-1L)
        stages.synchronized {
          stages += StageRow(
            i.stageId, i.attemptNumber, i.name.takeWhile(_ != '\n').take(60), i.numTasks, wall,
            m.inputMetrics.recordsRead, m.inputMetrics.bytesRead >> 20,
            m.shuffleReadMetrics.recordsRead, m.shuffleReadMetrics.totalBytesRead >> 20,
            m.shuffleWriteMetrics.recordsWritten, m.shuffleWriteMetrics.bytesWritten >> 20,
            m.memoryBytesSpilled >> 20, m.diskBytesSpilled >> 20,
            m.executorRunTime, m.executorCpuTime / 1000000L, m.jvmGCTime)
        }
      }
    })
    def run(label: String): Double = {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      Bench.materialize(SparkEntry.queries(query)(spark, dir))
      val secs = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      println(f"PROBE $query $label%-6s $secs%8.2f s")
      secs
    }
    run("warm") // codegen/classloading charged here, not to the table
    CcProbe.drainListenerBus(spark)
    val secs = run("timed")
    // drain the async listener bus before reading the rows
    CcProbe.drainListenerBus(spark)
    val rows = stages.synchronized(stages.sortBy(-_.wallMs).toVector)
    println(f"STAGES of the timed repeat ($query, $dir, ${secs}%.2f s) — sorted by wall time:")
    println(f"${"stage"}%-8s ${"tasks"}%6s ${"wallMs"}%8s ${"inRec"}%12s ${"inMB"}%7s " +
      f"${"shRdRec"}%12s ${"shRdMB"}%7s ${"shWrRec"}%12s ${"shWrMB"}%7s " +
      f"${"spillMemMB"}%10s ${"spillDskMB"}%10s ${"runMs"}%9s ${"cpuMs"}%9s ${"gcMs"}%8s  name")
    rows.foreach { r =>
      println(f"${r.id}%-4d.${r.attempt}%-3d ${r.tasks}%6d ${r.wallMs}%8d ${r.inputRec}%12d ${r.inputMB}%7d " +
        f"${r.srRec}%12d ${r.srMB}%7d ${r.swRec}%12d ${r.swMB}%7d " +
        f"${r.memSpillMB}%10d ${r.diskSpillMB}%10d ${r.runMs}%9d ${r.cpuMs}%9d ${r.gcMs}%8d  ${r.name}")
    }
    spark.stop()
  }
}
