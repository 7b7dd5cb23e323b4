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

  test("/query IVF routing: served_by observable, staleness bounded by auto-refresh, mode pins paths") {
    val scratch = Files.createTempDirectory("graft_http_ivf").toString
    val src = s"$scratch/src"
    new java.io.File(src).mkdirs()
    (1 to 80).map(i => (i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"), s"alpha-$i"))
      .toDF("event_id", "ts", "payload")
      .write.parquet(s"$src/events.parquet")

    // autoRefreshIvf = false first: the STALE-index scenario must be
    // detectable from the response, not silent (r12 ADVICE medium)
    val engine = new Engine(spark, src, s"$scratch/state", s"$scratch/sink",
      autoRefreshIvf = false)
    engine.initializeIndex()
    engine.runSyncCycle()
    assert(!engine.hasIvfIndex(), "no index yet → default must be the exact scan")

    val api = new ServeHttp(engine)
    val port = api.start(0)
    try {
      val base = s"http://127.0.0.1:$port"
      // no index: auto mode says so; mode=ivf demands one loudly
      val (nc, noIdx) = get(s"$base/query?q=alpha-42&k=2")
      assert(nc == 200 && noIdx.contains("\"served_by\":\"exact\""), noIdx)
      val (mc, mErr) = get(s"$base/query?q=alpha-42&k=2&mode=ivf")
      assert(mc == 400 && mErr.contains("no IVF index"), mErr)

      engine.refreshIvfIndex(k = 4, iters = 2)
      assert(engine.hasIvfIndex(), "refresh must publish a discoverable index")

      // vectors upserted AFTER the build exist only in the sink; with
      // auto-refresh off the IVF route cannot see them — but the caller
      // can TELL, because served_by names the index path
      (81 to 82).map(i => (i.toLong, Timestamp.valueOf(s"2024-01-02 00:00:0${i - 80}"), "zebra unique marker"))
        .toDF("event_id", "ts", "payload")
        .write.mode("append").parquet(s"$src/events.parquet")
      engine.runSyncCycle()

      val (ec, exact) = get(s"$base/query?q=zebra+unique+marker&k=1&mode=exact")
      assert(ec == 200 && exact.contains("\"served_by\":\"exact\""), exact)
      val (dc, viaIvf) = get(s"$base/query?q=zebra+unique+marker&k=80")
      assert(dc == 200 && viaIvf.contains("\"served_by\":\"ivf\""), viaIvf)
      val exactIds = idsOf(exact)
      val ivfIds = idsOf(viaIvf)
      assert(exactIds.nonEmpty && ivfIds.nonEmpty)
      assert(exactIds.forall(id => !ivfIds.contains(id)),
        s"stale IVF cannot see post-build ids (and says so via served_by): $exactIds vs $ivfIds")

      // an atomic refresh bounds the staleness: the same route now serves
      // the post-build vector — this is what runSyncCycle does every
      // cycle under autoRefreshIvf = true (the default)
      engine.refreshIvfIndex()
      val (rc, fresh) = get(s"$base/query?q=zebra+unique+marker&k=80")
      assert(rc == 200 && fresh.contains("\"served_by\":\"ivf\""), fresh)
      assert(exactIds.subsetOf(idsOf(fresh)),
        s"refreshed index must serve the new rows: $exactIds vs ${idsOf(fresh)}")

      // explicit nprobe still pins the sign-bucket sink path
      val (sc2, viaSimb) = get(s"$base/query?q=zebra+unique+marker&k=5&nprobe=2")
      assert(sc2 == 200 && viaSimb.contains("\"served_by\":\"simb\""), viaSimb)
    } finally api.stop()
  }

  test("/ivf/status: no-index answers exists=false; a live index reports the " +
      "staleness clock, the stale-cluster list, and the maintain chooser's advice") {
    val scratch = Files.createTempDirectory("graft_http_ivfstatus").toString
    val src = s"$scratch/src"
    new java.io.File(src).mkdirs()
    (1 to 60).map(i => (i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"), s"gamma-$i"))
      .toDF("event_id", "ts", "payload")
      .write.parquet(s"$src/events.parquet")
    val engine = new Engine(spark, src, s"$scratch/state", s"$scratch/sink",
      autoRefreshIvf = false)
    engine.initializeIndex()
    engine.runSyncCycle()

    val api = new ServeHttp(engine)
    val port = api.start(0)
    try {
      val base = s"http://127.0.0.1:$port"
      val (nc, none) = get(s"$base/ivf/status")
      assert(nc == 200 && none.contains("\"exists\":false") &&
        none.contains("\"advice\":\"none\""), none)

      engine.refreshIvfIndex(k = 4, iters = 2)
      val (hc, healthy) = get(s"$base/ivf/status")
      assert(hc == 200 && healthy.contains("\"exists\":true") &&
        healthy.contains("\"centroids\":4") &&
        healthy.contains("\"appended_fraction\":0.0000") &&
        healthy.contains("\"stale_clusters\":[]") &&
        healthy.contains("\"advice\":\"none\""), healthy)

      // concentrated append straight into the LIVE index dir: one cluster
      // absorbs everything → the route must report it and advise repair
      import org.apache.spark.sql.functions.col
      val live = engine.liveIvfDir().get
      val anchor = spark.read.parquet(s"$live/data")
        .limit(1).collect()(0).getSeq[Float](1).toArray
      val rnd = new scala.util.Random(47)
      val conc = (0 until 25).map { i =>
        val v = anchor.clone()
        (0 until v.length).foreach(j => v(j) += (rnd.nextFloat() * 2 - 1) * 0.02f)
        (s"hot#$i", v)
      }.toDF("vec_id", "embedding").withColumn("embedding", col("embedding").cast("array<float>"))
      graft.operators.IvfIndex.append(conc, "vec_id", "embedding", live)

      val (sc, staleBody) = get(s"$base/ivf/status")
      assert(sc == 200 && staleBody.contains("\"exists\":true"), staleBody)
      assert(staleBody.contains("\"advice\":\"repair\"") ||
        staleBody.contains("\"advice\":\"rebuild\""),
        s"absorbed mass must surface an actionable advice: $staleBody")
      assert(staleBody.contains("\"cluster\":") && staleBody.contains("\"appended_rows\":"),
        s"the stale report must name clusters: $staleBody")
    } finally api.stop()
  }

  test("store-reading routes take no lock: all respond while a commit holds Engine.commitLock") {
    val scratch = Files.createTempDirectory("graft_http_lockfree").toString
    val src = s"$scratch/src"
    new java.io.File(src).mkdirs()
    (1 to 40).map(i => (i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"), s"pay-$i"))
      .toDF("event_id", "ts", "payload")
      .write.parquet(s"$src/events.parquet")
    val engine = new Engine(spark, src, s"$scratch/state", s"$scratch/sink")
    engine.initializeIndex()
    engine.runSyncCycle()
    val api = new ServeHttp(engine)
    val port = api.start(0)
    try {
      val base = s"http://127.0.0.1:$port"
      // hold the writers' lock — exactly what a table's commit section
      // does for its whole duration — and require every read route to
      // complete anyway (pre-r13 they would deadlock-wait here)
      val done = new java.util.concurrent.CountDownLatch(1)
      val holder = new Thread(() => engine.commitLock.synchronized {
        done.await()
      })
      holder.start()
      try {
        for (route <- Seq("/stats", "/watermarks", "/query?q=pay-7&k=2")) {
          val (code, body) = get(s"$base$route")
          assert(code == 200, s"$route blocked or failed under commitLock: $body")
        }
      } finally { done.countDown(); holder.join() }
    } finally api.stop()
  }

  test("/health answers while a slow /query is pinned in flight (r14: no dispatcher serialization)") {
    val scratch = Files.createTempDirectory("graft_http_health").toString
    val src = s"$scratch/src"
    new java.io.File(src).mkdirs()
    (1 to 40).map(i => (i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"), s"pay-$i"))
      .toDF("event_id", "ts", "payload")
      .write.parquet(s"$src/events.parquet")
    val engine = new Engine(spark, src, s"$scratch/state", s"$scratch/sink")
    engine.initializeIndex()
    engine.runSyncCycle()
    val api = new ServeHttp(engine)
    val port = api.start(0)
    try {
      val base = s"http://127.0.0.1:$port"
      // park a /query at its entry hook — the deterministic stand-in for
      // a slow exact scan (pre-r14 setExecutor(null) would queue /health
      // behind it on the single dispatcher thread for its full duration)
      val entered = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      api.onQueryStart = () => { entered.countDown(); release.await() }
      val slow = new java.util.concurrent.atomic.AtomicReference[(Int, String)]()
      val t = new Thread(() => slow.set(get(s"$base/query?q=pay-7&k=2")))
      t.start()
      try {
        assert(entered.await(10, java.util.concurrent.TimeUnit.SECONDS),
          "the pinned query never reached its handler")
        api.onQueryStart = () => () // only the pinned request parks
        val t0 = System.nanoTime()
        val (hc, health) = get(s"$base/health")
        val healthSecs = (System.nanoTime() - t0) / 1e9
        assert(hc == 200 && health.contains("\"healthy\""), health)
        assert(healthSecs < 5.0,
          f"/health took $healthSecs%.1fs while a query was pinned — still queueing behind it")
      } finally { release.countDown(); t.join() }
      // the pinned query completes normally once released
      assert(slow.get() != null && slow.get()._1 == 200, s"pinned query failed: ${slow.get()}")
    } finally api.stop()
  }

  test("/query flood degrades with 503 backpressure within the bound; slot holders and /health unaffected (r15)") {
    val scratch = Files.createTempDirectory("graft_http_flood").toString
    val src = s"$scratch/src"
    new java.io.File(src).mkdirs()
    (1 to 40).map(i => (i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"), s"pay-$i"))
      .toDF("event_id", "ts", "payload")
      .write.parquet(s"$src/events.parquet")
    val engine = new Engine(spark, src, s"$scratch/state", s"$scratch/sink")
    engine.initializeIndex()
    engine.runSyncCycle()
    val api = new ServeHttp(engine)
    val port = api.start(0)
    try {
      val base = s"http://127.0.0.1:$port"
      api.queryWaitMs = 400
      // pin all 8 slot holders in flight (deterministic saturation): the
      // excess requests must 503 within ~queryWaitMs instead of parking
      // their threads indefinitely (pre-r15 behavior, VERDICT r14 #2)
      val acquired = new java.util.concurrent.atomic.AtomicInteger()
      val hold = new java.util.concurrent.CountDownLatch(1)
      api.onQuerySlotAcquired = () => { acquired.incrementAndGet(); hold.await() }
      val results = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
      val t0 = System.nanoTime()
      val threads = (1 to 12).map { _ =>
        val t = new Thread(() => results.add(get(s"$base/query?q=pay-7&k=1")))
        t.start(); t
      }
      try {
        // the 4 excess requests are answered 503 while the 8 holders park
        val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
        while (results.size() < 4 && System.nanoTime() < deadline) Thread.sleep(20)
        val rejects = results.toArray(Array.empty[(Int, String)])
        assert(rejects.length == 4, s"expected exactly 4 saturated rejects, got ${rejects.mkString(";")}")
        assert(rejects.forall(_._1 == 503), s"excess must 503: ${rejects.mkString(";")}")
        assert(rejects.forall(_._2.contains("saturated")), rejects.mkString(";"))
        val rejectSecs = (System.nanoTime() - t0) / 1e9
        assert(rejectSecs < 10.0, f"503s took $rejectSecs%.1fs — not a bounded wait")
        assert(acquired.get == 8, s"all 8 slots should be held, saw ${acquired.get}")
        // /health stays green throughout the flood
        val (hc, health) = get(s"$base/health")
        assert(hc == 200 && health.contains("\"healthy\""), health)
      } finally hold.countDown()
      threads.foreach(_.join(60000))
      // the 8 slot holders complete normally once released
      val all = results.toArray(Array.empty[(Int, String)])
      assert(all.count(_._1 == 200) == 8, s"slot holders must succeed: ${all.map(_._1).mkString(",")}")
    } finally {
      api.onQuerySlotAcquired = () => ()
      api.stop()
    }
  }

  private def idsOf(json: String): Set[String] =
    "\"id\":\"([^\"]+)\"".r.findAllMatchIn(json).map(_.group(1)).toSet
}
