package graft

import graft.functions.Embeddings
import graft.operators.{Cdc, Chunker}
import org.apache.spark.sql.functions._

/** Stage profiler for the CDC cycle (dev tool): times each stage of
  * q93's pipeline separately so sink-write vs chunk vs embed cost is
  * attributable instead of guessed. */
object ProfileCdc {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"T $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val scratch = java.nio.file.Files.createTempDirectory("graft_profcdc").toString
    // whole-cycle baselines
    time("cycle 1 (full sync)")(Cdc.syncCycle(spark, dir, s"$scratch/state", s"$scratch/sink"))
    time("cycle 2 (no-op delta)")(Cdc.syncCycle(spark, dir, s"$scratch/state", s"$scratch/sink"))
    // stage breakdown on a fresh sink
    val s2 = java.nio.file.Files.createTempDirectory("graft_profcdc2").toString
    val events = time("read events")(graft.sources.Tables.table(spark, dir, "events"))
    val n = time("count")(events.count())
    println(s"  events rows = $n")
    val json = events.withColumn("_json", graft.functions.JsonRows.toJsonCol(events))
    time("json+chunk (scalable)")(Chunker.chunkScalable(json, col("_json"), "events", 100).count())
    val chunks = Chunker.chunkScalable(json, col("_json"), "events", 100)
    time("chunk+embed")(chunks.select(col("id"), Embeddings.embedCol(col("text")).as("embedding"),
      col("source"), col("text")).count())
    val vectors = chunks.select(col("id"), Embeddings.embedCol(col("text")).as("embedding"),
      col("source"), col("text"))
    Cdc.initVectorSink(spark, s2)
    time("upsertVectors (fresh sink)")(Cdc.upsertVectors(spark, s2, vectors))
    time("upsertVectors (same again)")(Cdc.upsertVectors(spark, s2, vectors))
    time("read sink back")(Cdc.readVectorSink(spark, s2).count())
    spark.stop()
  }
}
