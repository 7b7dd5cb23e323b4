package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

/** The facade end-to-end: bootstrap → poll twice → query the index. */
class EngineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("engine lifecycle: initialize, poll, watermark advance, similarity query") {
    val scratch = Files.createTempDirectory("graft_engine").toString
    val src = s"$scratch/src"
    new java.io.File(src).mkdirs()
    (1 to 150).map(i => (i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"), s"payload-$i"))
      .toDF("event_id", "ts", "payload")
      .write.parquet(s"$src/events.parquet")

    val engine = new Engine(spark, src, s"$scratch/state", s"$scratch/sink")
    engine.initializeIndex()
    engine.runPolling(intervalSeconds = 0, maxCycles = 2) // second cycle = empty delta

    val wm = engine.watermarks().collect()
    assert(wm.length == 1 && wm(0).getAs[String]("table_name") == "events")

    // nprobe = 0 → exact full-namespace scan: a 2-chunk sink must return
    // both regardless of which simb partitions the chunks hash into
    val hits = engine.searchSimilar("payload-42 payload-43", k = 2, nprobe = 0).collect()
    assert(hits.length == 2)
    assert(hits(0).getAs[Double]("score") > 0.1) // tokens overlap the indexed chunks
    assert(hits(0).getAs[String]("id").startsWith("events#"))
  }

  test("searchSimilarBatch returns per-query ranked hits in one plan") {
    import graft.operators.Cdc
    import graft.functions.Embeddings
    val scratch = Files.createTempDirectory("graft_engine_batch").toString
    val sink = s"$scratch/sink"
    Cdc.initVectorSink(spark, sink)
    val batch = (1 to 30).map(i => (s"d#$i", Embeddings.embed(s"alpha beta doc number $i"), "t", s"text $i"))
      .toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, batch)
    val engine = new Engine(spark, s"$scratch/src", s"$scratch/state", sink)
    val out = engine.searchSimilarBatch(
      Seq("alpha beta doc number 7", "alpha beta doc number 23"), k = 3).collect()
    val byQuery = out.groupBy(_.getAs[String]("query"))
    assert(byQuery.size == 2)
    byQuery.foreach { case (_, rows) =>
      assert(rows.length <= 3 && rows.map(_.getAs[Int]("rank")).min == 1)
    }
    // each query's own doc ranks first in its bucket
    assert(byQuery("alpha beta doc number 7").minBy(_.getAs[Int]("rank")).getAs[String]("id") == "d#7")
    assert(byQuery("alpha beta doc number 23").minBy(_.getAs[Int]("rank")).getAs[String]("id") == "d#23")
  }

  test("engine builds a persisted IVF index from its sink and answers text queries") {
    import graft.operators.Cdc
    import graft.functions.Embeddings
    val scratch = Files.createTempDirectory("graft_engine_ivf").toString
    val sink = s"$scratch/sink"
    Cdc.initVectorSink(spark, sink)
    val batch = (1 to 40).map(i => (s"d#$i", Embeddings.embed(s"alpha beta doc number $i"), "t", s"text $i"))
      .toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, batch)
    val engine = new Engine(spark, s"$scratch/src", s"$scratch/state", sink)
    engine.buildIvfIndex(s"$scratch/ivf", k = 4, iters = 2)
    val hits = engine.searchIvf(s"$scratch/ivf", "alpha beta doc number 17", k = 5, nprobe = 4)
      .collect().map(_.getAs[String]("id"))
    assert(hits.nonEmpty && hits.head == "d#17", s"got: ${hits.mkString(",")}")
  }

  test("searchSimilar partition-prunes the scan to the probe's simb buckets") {
    import graft.operators.{Cdc, SimilaritySearch}
    import graft.functions.Embeddings
    val scratch = Files.createTempDirectory("graft_engine_prune").toString
    val sink = s"$scratch/sink"
    Cdc.initVectorSink(spark, sink)
    // vectors spanning several simb partitions: real embeddings of distinct texts
    val batch = (1 to 40).map(i => (s"d#$i", Embeddings.embed(s"alpha beta doc number $i"), "t", s"text $i"))
      .toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, batch)
    val nSimb = Cdc.readVectorSink(spark, sink).select("simb").distinct().count()
    assert(nSimb > 1, "fixture must span multiple simb partitions for the pruning test to bite")

    val engine = new Engine(spark, s"$scratch/src", s"$scratch/state", sink)
    val query = "alpha beta doc number 7"
    val result = engine.searchSimilar(query, k = 5, nprobe = 2)
    val ids = result.collect().map(_.getAs[String]("id"))
    // the probe's own bucket contains doc 7 → it must surface
    assert(ids.contains("d#7"))
    // the scan must carry the simb filter as a PARTITION filter (directory
    // pruning, not a post-scan row filter) ...
    val planStr = result.queryExecution.executedPlan.toString
    assert(planStr.matches("(?s).*PartitionFilters: \\[[^\\]]*simb.*"),
      s"simb must prune partitions at the scan:\n$planStr")
    // ... and actually read fewer files than the sink holds
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    val totalFiles = Option(new java.io.File(sink).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && (f.getName == "vectors" || f.getName.startsWith("vectors_g")))
      .flatMap(walk).count(_.getName.endsWith(".parquet"))
    val scanned = result.queryExecution.executedPlan.collectWithSubqueries {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metrics("numFiles").value
    }.sum
    assert(scanned > 0 && scanned < totalFiles,
      s"pruned scan should read a strict subset of files ($scanned of $totalFiles)")
  }
}
