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

  test("/query defaults to the persisted IVF index when one exists; explicit nprobe pins the sink path") {
    val scratch = Files.createTempDirectory("graft_http_ivf").toString
    val src = s"$scratch/src"
    new java.io.File(src).mkdirs()
    (1 to 80).map(i => (i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"), s"alpha-$i"))
      .toDF("event_id", "ts", "payload")
      .write.parquet(s"$src/events.parquet")

    val engine = new Engine(spark, src, s"$scratch/state", s"$scratch/sink")
    engine.initializeIndex()
    engine.runSyncCycle()
    assert(!engine.hasIvfIndex(), "no index yet → default must be the exact scan")
    engine.buildIvfIndex(engine.ivfIndexDir(), k = 4, iters = 2)
    assert(engine.hasIvfIndex(), "conventional-location build must be discoverable")

    // vectors upserted AFTER the index build exist only in the sink — a
    // routing probe: the IVF path (index files only) cannot return them,
    // the exact sink scan must
    (81 to 82).map(i => (i.toLong, Timestamp.valueOf(s"2024-01-02 00:00:0${i - 80}"), "zebra unique marker"))
      .toDF("event_id", "ts", "payload")
      .write.mode("append").parquet(s"$src/events.parquet")
    engine.runSyncCycle()

    val api = new ServeHttp(engine)
    val port = api.start(0)
    try {
      val base = s"http://127.0.0.1:$port"
      // explicit nprobe=0 → exact sink scan → the post-index vector wins
      val (ec, exact) = get(s"$base/query?q=zebra+unique+marker&k=1&nprobe=0")
      assert(ec == 200)
      assert(exact.contains("zebra") || exact.contains("events#"), exact)
      val exactTop = exact
      // default (no nprobe) → routed through the persisted index, whose
      // pruned cluster scan reads only index files: the post-index vector
      // CANNOT appear (SimilaritySpec plan-asserts the partition pruning)
      val (dc, viaIvf) = get(s"$base/query?q=zebra+unique+marker&k=80")
      assert(dc == 200)
      val exactIds = idsOf(exactTop)
      val ivfIds = idsOf(viaIvf)
      assert(exactIds.nonEmpty)
      assert(exactIds.forall(id => !ivfIds.contains(id)),
        s"post-index-build ids must be invisible to the IVF default route: $exactIds vs $ivfIds")
      // sanity: the IVF route still serves the indexed corpus
      assert(ivfIds.nonEmpty)
    } finally api.stop()
  }

  private def idsOf(json: String): Set[String] =
    "\"id\":\"([^\"]+)\"".r.findAllMatchIn(json).map(_.group(1)).toSet
}
