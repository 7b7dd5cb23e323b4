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

    val hits = engine.searchSimilar("payload-42 payload-43", k = 2).collect()
    assert(hits.length == 2)
    assert(hits(0).getAs[Double]("score") > 0.1) // tokens overlap the indexed chunks
    assert(hits(0).getAs[String]("id").startsWith("events#"))
  }
}
