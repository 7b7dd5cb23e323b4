package graft

import graft.functions.Embeddings
import graft.operators.Chunker
import org.apache.spark.sql.functions._

/** Dev micro-probe: measures the actual chunk text sizes a fixture
  * produces and the driver-side cost of [[Embeddings.embed]] on texts of
  * that size — separates "the embed scanner is slow" from "the rows are
  * bigger than assumed" when a cycle's per-chunk CPU looks wrong. */
object DevMicro {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val events = graft.sources.Tables.table(spark, dir, "events")
    val json = events.limit(100000)
      .withColumn("_json", graft.functions.JsonRows.toJsonCol(events))
    val chunks = Chunker.chunkScalable(json, col("_json"), "events", 100)
    val stats = chunks.select(length(col("text")).as("len"))
      .agg(count(lit(1)), min("len"), avg("len"), max("len")).collect()(0)
    println(s"CHUNKS n=${stats.get(0)} minLen=${stats.get(1)} avgLen=${stats.get(2)} maxLen=${stats.get(3)}")
    val sample = chunks.select("text").head().getString(0)
    println(s"SAMPLE len=${sample.length} head=${sample.take(120)}")
    // driver-side embed timing on the real text
    var i = 0
    val t0 = System.nanoTime()
    while (i < 200) { Embeddings.embed(sample); i += 1 }
    val perMs = (System.nanoTime() - t0) / 1e6 / 200
    println(f"EMBED per-call ${perMs}%.3f ms for ${sample.length} chars (${sample.length / perMs / 1000}%.1f MB/s)")
    spark.stop()
  }
}
