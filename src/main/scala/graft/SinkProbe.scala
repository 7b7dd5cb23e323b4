package graft

import org.apache.spark.sql.functions._

/** Dev probe for the vector sink's write amplification: drives the two
  * commit paths — fast (fresh buckets → rename) and merge (overlapping
  * buckets → kept-side rewrite) — on a synthetic embedding batch and
  * prints, per phase, wall seconds plus the bytes Spark actually wrote
  * (task output metrics) and shuffled (shuffle-write metrics). This is
  * the evidence harness behind the r14 merge change (staged files MOVE
  * into the generation root instead of riding a second shuffle + rewrite)
  * and the standing tool for re-measuring S9's copy-on-write costs.
  *
  * Usage: tools/jvmrun.sh graft.SinkProbe [rows] [dim]
  *   phase 1: `rows` fresh ids          → fast path (rename, ~0 write)
  *   phase 2: `rows` ids, 50% overlap   → merge path (kept rewrite)
  */
object SinkProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(200000)
    val dim = args.lift(1).map(_.toInt).getOrElse(96)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")

    var out = 0L; var shuf = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { out += m.outputMetrics.bytesWritten; shuf += m.shuffleWriteMetrics.bytesWritten }
      }
    })

    val sink = java.nio.file.Files.createTempDirectory("graft_sinkprobe").toString
    graft.operators.Cdc.initVectorSink(spark, sink)
    def batch(lo: Long, hi: Long) = spark.range(lo, hi).select(
      concat(lit("doc#"), col("id")).as("id"),
      expr(s"transform(sequence(1, $dim), i -> cast(pmod(hash(id, i), 1000) / 1000.0 as float))")
        .as("embedding"),
      lit("probe").as("source"),
      concat(lit("text payload for row "), col("id"), lit(" "),
        repeat(lit("x"), 400)).as("text"))

    def timed(label: String)(body: => Unit): Unit = {
      CcProbe.drainListenerBus(spark)
      out = 0L; shuf = 0L
      val t0 = System.nanoTime()
      body
      val secs = (System.nanoTime() - t0) / 1e9
      CcProbe.drainListenerBus(spark)
      println(f"PROBE $label%-28s $secs%7.2fs  written=${out / 1e6}%8.1f MB  shuffled=${shuf / 1e6}%8.1f MB")
    }

    timed("fast-path (fresh buckets)") {
      graft.operators.Cdc.upsertVectors(spark, sink, batch(0, rows))
    }
    timed("merge (50% id overlap)") {
      graft.operators.Cdc.upsertVectors(spark, sink, batch(rows / 2, rows / 2 + rows))
    }
    val n = graft.operators.Cdc.readVectorSink(spark, sink).count()
    println(s"PROBE sink rows after both commits: $n (expect ${rows + rows / 2})")
    spark.stop()
  }
}
