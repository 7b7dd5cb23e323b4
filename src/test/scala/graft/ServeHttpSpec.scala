package graft

import org.scalatest.funsuite.AnyFunSuite

import java.net.{HttpURLConnection, URI}
import java.nio.file.Files
import java.sql.Timestamp

/** End-to-end over the HTTP surface: one synced engine served on an
  * ephemeral port, every route exercised through a real TCP request
  * (reference analog: the Flask app object of `app.py:5-18`, which
  * registers no routes — ServeHttp's four are the engine's live
  * surfaces). */
class ServeHttpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(60000)
    val code = conn.getResponseCode
    val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(in.readAllBytes(), "UTF-8")
    conn.disconnect()
    (code, body)
  }

  test("health, stats, watermarks, and query respond over TCP; missing param is a 400") {
    val scratch = Files.createTempDirectory("graft_http").toString
    val src = s"$scratch/src"
    new java.io.File(src).mkdirs()
    (1 to 120).map(i => (i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"), s"payload-$i"))
      .toDF("event_id", "ts", "payload")
      .write.parquet(s"$src/events.parquet")

    val engine = new Engine(spark, src, s"$scratch/state", s"$scratch/sink")
    engine.initializeIndex()
    engine.runSyncCycle()

    val api = new ServeHttp(engine)
    val port = api.start(0)
    try {
      val base = s"http://127.0.0.1:$port"

      val (hc, health) = get(s"$base/health")
      assert(hc == 200)
      assert(health.contains("\"healthy\":true"))
      assert(health.contains("\"consecutive_failures\":0"))

      val (sc, stats) = get(s"$base/stats")
      assert(sc == 200)
      assert(stats.startsWith("[") && stats.contains("n_vectors"))

      val (wc, wm) = get(s"$base/watermarks")
      assert(wc == 200)
      assert(wm.contains("events"))

      val (qc, hits) = get(s"$base/query?q=payload-42+payload-43&k=2")
      assert(qc == 200)
      assert(hits.contains("events#"))
      assert(hits.contains("\"score\""))
      // k bound respected: exactly 2 row objects
      assert(hits.sliding(7).count(_ == "\"score\"") == 2)

      val (bc, err) = get(s"$base/query?k=2")
      assert(bc == 400)
      assert(err.contains("missing required param: q"))
    } finally api.stop()
  }
}
