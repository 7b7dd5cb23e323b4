package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

/** CDC semantics (SURVEY §5.4): strict-`>` watermark, empty-delta skip,
  * watermark advance to max(ts), idempotent re-run (the property the
  * reference LACKS — its UUID ids duplicate on retry, T3). */
class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("strict-> delta excludes rows equal to the watermark (T2 parity)") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-02 00:00:00")),
      (3L, ts("2024-01-03 00:00:00"))).toDF("event_id", "ts")
    val delta = Cdc.deltaScan(df, "ts", Some(ts("2024-01-02 00:00:00")))
    assert(delta.select("event_id").as[Long].collect().toSet == Set(3L))
    // no watermark → full scan (first sync, service.py:55-57)
    assert(Cdc.deltaScan(df, "ts", None).count() == 3)
  }

  test("boundedDeltaScan pins the sunk interval to (wm, upTo] — concurrent " +
      "appends past the measured watermark never leak into the cycle") {
    val wm = ts("2024-01-01 00:00:00")
    val newWm = ts("2024-01-03 00:00:00")
    // row 4 models a source append landing BETWEEN the watermark agg and
    // the delta re-scan: changeCol > newWm, so it must be excluded this
    // cycle (the commit only covers newWm) and picked up once by the next
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-02 00:00:00")),
      (3L, newWm),
      (4L, ts("2024-01-04 00:00:00"))).toDF("event_id", "ts")
    val sunk = Cdc.boundedDeltaScan(df, "ts", Some(wm), newWm)
    assert(sunk.select("event_id").as[Long].collect().toSet == Set(2L, 3L))
    // the next cycle (watermark = newWm) picks up exactly the leftover
    assert(Cdc.deltaScan(df, "ts", Some(newWm))
      .select("event_id").as[Long].collect().toSet == Set(4L))
    // first sync: lower bound absent, upper clamp still holds
    assert(Cdc.boundedDeltaScan(df, "ts", None, newWm)
      .select("event_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("deltaScanWithLateness re-reads the lateness window (T2 documented fix)") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:10:00")),
      (3L, ts("2024-01-01 00:20:00"))).toDF("event_id", "ts")
    val delta = Cdc.deltaScanWithLateness(df, "ts", Some(ts("2024-01-01 00:10:00")), latenessSeconds = 600)
    // >= (wm - 10min) → includes rows 1 (equal to adjusted), 2 and 3
    assert(delta.select("event_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("schema drift: a column added between cycles flows into the chunk JSON (dynamic SELECT *)") {
    val scratch = Files.createTempDirectory("graft_cdc_evo").toString
    val src = s"$scratch/src"
    new java.io.File(src).mkdirs()
    // cycle 1: (event_id, ts, payload)
    Seq((1L, ts("2024-01-01 00:00:00"), "a"), (2L, ts("2024-01-02 00:00:00"), "b"))
      .toDF("event_id", "ts", "payload").write.parquet(s"$src/events.parquet")
    Cdc.syncCycle(spark, src, s"$scratch/state", s"$scratch/sink")
    // cycle 2: the table gained a column (ALTER TABLE analog) — new rows
    // carry it as appended wider-schema files, old files stay untouched
    Seq((3L, ts("2024-01-03 00:00:00"), "c", "eu"))
      .toDF("event_id", "ts", "payload", "region")
      .write.mode("append").parquet(s"$src/events.parquet")
    Cdc.syncCycle(spark, src, s"$scratch/state", s"$scratch/sink")
    val texts = Cdc.readVectorSink(spark, s"$scratch/sink")
      .select("text").as[String].collect()
    // the delta row serializes WITH the new column (the reference's
    // SELECT * against the post-ALTER schema)
    assert(texts.exists(t => t.contains("\"region\":\"eu\"") && t.contains("\"event_id\":3")),
      s"new column missing from cycle-2 chunks: ${texts.mkString("\n")}")
    // cycle-1 chunks were not rewritten (their JSON predates the column)
    assert(texts.exists(t => t.contains("\"event_id\":1") && !t.contains("region")))
  }

  test("scalable chunking in the sync path covers the same rows (the default mode)") {
    val scratch = java.nio.file.Files.createTempDirectory("graft_cdc_sc").toString
    val src = s"$scratch/src"
    new java.io.File(src).mkdirs()
    (1 to 250).map(i => (i.toLong, ts(f"2024-01-01 00:${i % 60}%02d:${i % 60}%02d"), s"u$i"))
      .toDF("event_id", "ts", "payload").write.parquet(s"$src/events.parquet")
    val n = Cdc.syncCycle(spark, src, s"$scratch/state", s"$scratch/sink")
    assert(n("events") == 250)
    val sink = Cdc.readVectorSink(spark, s"$scratch/sink")
    assert(sink.count() >= 3) // >= ceil(250/100); partition-local boundaries may add chunks
  }

  test("watermark store: absent → None; upsert is last-writer-wins by max") {
    val state = Files.createTempDirectory("graft_wm").toString
    assert(Cdc.getWatermark(spark, state, "t1").isEmpty)
    Cdc.updateWatermark(spark, state, "t1", ts("2024-01-02 00:00:00"))
    assert(Cdc.getWatermark(spark, state, "t1").contains(ts("2024-01-02 00:00:00")))
    // MERGE semantics: second upsert with later value advances
    Cdc.updateWatermark(spark, state, "t1", ts("2024-01-05 00:00:00"))
    assert(Cdc.getWatermark(spark, state, "t1").contains(ts("2024-01-05 00:00:00")))
    // independent keys don't interfere
    Cdc.updateWatermark(spark, state, "t2", ts("2024-01-01 00:00:00"))
    assert(Cdc.getWatermark(spark, state, "t1").contains(ts("2024-01-05 00:00:00")))
  }

  test("watermark RMW is driver-side: zero Spark jobs per commit, Spark read surface agrees (r14)") {
    // VERDICT r13 #2: the commit used to run ~3 Spark jobs per table per
    // cycle under the commit lock — O(jobs), not O(rows), at 1,000 CDC
    // tables the cycle's driver bottleneck. The RMW of a T-row store is
    // driver work; pin that NO job is scheduled by lookups or commits.
    val state = Files.createTempDirectory("graft_wm_jobs").toString
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      CcProbe.drainListenerBus(spark)
      jobs = 0
      (1 to 5).foreach { i =>
        Cdc.updateWatermark(spark, state, s"t$i", ts(f"2024-01-0$i%d 00:00:00"))
      }
      assert(Cdc.getWatermark(spark, state, "t3").contains(ts("2024-01-03 00:00:00")))
      assert(Cdc.readWatermarkMap(state).size == 5)
      CcProbe.drainListenerBus(spark)
      assert(jobs == 0, s"watermark lookups+commits must schedule no Spark job, saw $jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
    // the Spark read surface (readWatermarks) sees exactly what the
    // driver-side writer committed — same schema, same µs instants
    val rows = Cdc.readWatermarks(spark, state).collect()
      .map(r => r.getString(0) -> Cdc.asTimestamp(r.get(1))).toMap
    assert(rows == (1 to 5).map(i => s"t$i" -> ts(f"2024-01-0$i%d 00:00:00")).toMap)
  }

  test("watermark store survives a crash injected before the commit (pre-write value readable)") {
    // The old implementation had a window (live → _old rename, then
    // tmp → live rename) where NO live store existed; a crash there
    // silently reset every watermark (forced full re-sync). The versioned
    // store commits by one atomic pointer rename — a crash at ANY point
    // before it must leave the previous value intact and readable.
    val state = Files.createTempDirectory("graft_wm_crash").toString
    Cdc.updateWatermark(spark, state, "t1", ts("2024-01-02 00:00:00"))
    val boom = intercept[RuntimeException] {
      Cdc.updateWatermark(spark, state, "t1", ts("2024-03-01 00:00:00"),
        onBeforeCommit = () => throw new RuntimeException("injected crash before pointer publish"))
    }
    assert(boom.getMessage.contains("injected"))
    // pre-write value still live and readable — no reset, no missing dir
    assert(Cdc.getWatermark(spark, state, "t1").contains(ts("2024-01-02 00:00:00")))
    // the next successful write commits the new value, GCs the crashed
    // write's orphan dir, and keeps the previously-pointed version for one
    // extra write (reader-vs-GC grace) — so exactly 2 version dirs remain:
    // the published one and its predecessor, with the orphan gone
    Cdc.updateWatermark(spark, state, "t1", ts("2024-03-01 00:00:00"))
    assert(Cdc.getWatermark(spark, state, "t1").contains(ts("2024-03-01 00:00:00")))
    val vdirs = new java.io.File(state).listFiles().map(_.getName)
      .filter(_.startsWith(Cdc.WatermarkTable + "_v")).sorted
    assert(vdirs.length == 2, s"expected published + grace-kept predecessor: ${vdirs.mkString(",")}")
    // a further write retires the grace-kept dir: still exactly 2
    Cdc.updateWatermark(spark, state, "t1", ts("2024-03-02 00:00:00"))
    val vdirs2 = new java.io.File(state).listFiles().map(_.getName)
      .filter(_.startsWith(Cdc.WatermarkTable + "_v")).sorted
    assert(vdirs2.length == 2, s"grace must be ONE write long: ${vdirs2.mkString(",")}")
    assert(vdirs2.toSet.intersect(vdirs.toSet).size == 1, "only the previously-published dir survives")
  }

  test("watermark store reads a legacy unversioned layout and upgrades it on the next write") {
    val state = Files.createTempDirectory("graft_wm_legacy").toString
    // seed the pre-versioning layout: a bare parquet dir at state/watermark
    Seq(("t1", ts("2024-01-02 00:00:00"))).toDF("table_name", "last_updated")
      .write.parquet(s"$state/${Cdc.WatermarkTable}")
    assert(Cdc.getWatermark(spark, state, "t1").contains(ts("2024-01-02 00:00:00")))
    Cdc.updateWatermark(spark, state, "t2", ts("2024-02-01 00:00:00"))
    // both keys live; legacy dir replaced by the pointer + version dir
    assert(Cdc.getWatermark(spark, state, "t1").contains(ts("2024-01-02 00:00:00")))
    assert(Cdc.getWatermark(spark, state, "t2").contains(ts("2024-02-01 00:00:00")))
    assert(!new java.io.File(s"$state/${Cdc.WatermarkTable}").exists())
    assert(new java.io.File(s"$state/${Cdc.WatermarkTable}.current").exists())
  }

  test("sharded watermark store: migration preserves the map, commits touch only the owning shard") {
    val state = Files.createTempDirectory("graft_wm_shard").toString
    (1 to 8).foreach(i => Cdc.updateWatermark(spark, state, s"t$i", ts(f"2024-01-0$i%d 00:00:00")))
    val before = Cdc.readWatermarkMap(state)
    Cdc.shardWatermarkStore(state, 4)
    assert(Cdc.watermarkShards(state) == 4)
    // every read surface agrees with the pre-migration store
    assert(Cdc.readWatermarkMap(state) == before)
    assert(Cdc.getWatermark(spark, state, "t3").contains(ts("2024-01-03 00:00:00")))
    val sparkRows = Cdc.readWatermarks(spark, state).collect()
      .map(r => r.getString(0) -> Cdc.asTimestamp(r.get(1))).toMap
    assert(sparkRows == before)
    // the single store is drained (pointer + version dirs GC'd)
    val leftovers = new java.io.File(state).listFiles().map(_.getName)
      .filter(n => n == s"${Cdc.WatermarkTable}.current" || n.matches(Cdc.WatermarkTable + "_v\\d+"))
    assert(leftovers.isEmpty, s"single store must be drained: ${leftovers.mkString(",")}")
    // a commit lands in the OWNING shard's store only: other shards' live
    // version dirs are untouched (O(T/B) rewrite, not O(T))
    def liveVersions(): Map[String, Set[String]] =
      new java.io.File(state).listFiles().map(_.getName)
        .filter(_.matches(Cdc.WatermarkTable + "_b\\d{4}_v\\d+"))
        .groupBy(_.take(Cdc.WatermarkTable.length + 6)).map { case (k, v) => k -> v.toSet }
    val owner = f"${Cdc.WatermarkTable}_b${Cdc.shardOf("t1", 4)}%04d"
    val pre = liveVersions()
    Cdc.updateWatermark(spark, state, "t1", ts("2024-06-01 00:00:00"))
    val post = liveVersions()
    assert(post(owner) != pre(owner), "owning shard must publish a new version")
    (pre.keySet - owner).foreach(k => assert(post(k) == pre(k), s"non-owning shard $k rewritten"))
    assert(Cdc.getWatermark(spark, state, "t1").contains(ts("2024-06-01 00:00:00")))
    // re-sharding an already-sharded store is refused (one-time migration)
    intercept[IllegalArgumentException](Cdc.shardWatermarkStore(state, 8))
  }

  test("shard assignment matches PortableHash.hash32 % B (any engine can locate a shard)") {
    val names = Seq("events", "orders", "EVENTS_SRC", "t1", "table_000042")
    val viaSpark = names.toDF("n")
      .select(col("n"), pmod(graft.functions.PortableHash.hash32(col("n")), lit(4)).cast("int"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    names.foreach(n => assert(Cdc.shardOf(n, 4) == viaSpark(n), s"shard mismatch for $n"))
  }

  test("sharded store: concurrent commits across shards all land (per-shard locks)") {
    val state = Files.createTempDirectory("graft_wm_shard_conc").toString
    Cdc.updateWatermark(spark, state, "seed", ts("2024-01-01 00:00:00"))
    Cdc.shardWatermarkStore(state, 4)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      (1 to 24).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = Cdc.updateWatermark(spark, state, s"c$i", ts("2024-02-01 00:00:00"))
        })
      }.foreach(_.get())
    } finally pool.shutdown()
    val m = Cdc.readWatermarkMap(state)
    (1 to 24).foreach(i => assert(m.contains(s"c$i"), s"concurrent commit c$i lost"))
    assert(m("seed") == ts("2024-01-01 00:00:00"))
  }

  test("sharded store: crash before a shard's pointer publish leaves the pre-write value live") {
    val state = Files.createTempDirectory("graft_wm_shard_crash").toString
    Cdc.updateWatermark(spark, state, "t1", ts("2024-01-02 00:00:00"))
    Cdc.shardWatermarkStore(state, 4)
    intercept[RuntimeException] {
      Cdc.updateWatermark(spark, state, "t1", ts("2024-03-01 00:00:00"),
        onBeforeCommit = () => throw new RuntimeException("injected crash before pointer publish"))
    }
    assert(Cdc.getWatermark(spark, state, "t1").contains(ts("2024-01-02 00:00:00")))
    Cdc.updateWatermark(spark, state, "t1", ts("2024-03-01 00:00:00"))
    assert(Cdc.getWatermark(spark, state, "t1").contains(ts("2024-03-01 00:00:00")))
  }

  test("concurrent double-migration cannot wipe the store (in-lock re-check, ADVICE r15)") {
    val state = Files.createTempDirectory("graft_wm_toctou").toString
    (1 to 6).foreach(i => Cdc.updateWatermark(spark, state, s"t$i", ts(f"2024-01-0$i%d 00:00:00")))
    val before = Cdc.readWatermarkMap(state)
    // thread A passes the outer unsharded check, then parks BEFORE taking
    // the lock; the main thread completes a full migration in that window —
    // the exact TOCTOU interleaving. A must then refuse (in-lock re-check),
    // not re-read the drained single store and republish empty shards.
    val aPastCheck = new java.util.concurrent.CountDownLatch(1)
    val mainDone = new java.util.concurrent.CountDownLatch(1)
    val aOutcome = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val a = new Thread(() =>
      try Cdc.shardWatermarkStore(state, 8, onBeforeLock = () => {
        aPastCheck.countDown(); mainDone.await()
      }) catch { case e: Throwable => aOutcome.set(e) })
    a.start()
    aPastCheck.await()
    Cdc.shardWatermarkStore(state, 4)
    mainDone.countDown()
    a.join()
    assert(aOutcome.get().isInstanceOf[IllegalStateException],
      s"losing migration must refuse, got ${aOutcome.get()}")
    assert(Cdc.watermarkShards(state) == 4)
    assert(Cdc.readWatermarkMap(state) == before, "store wiped by losing migration")
  }

  test("readers racing a live migration never observe an absent watermark (read fence, ADVICE r15)") {
    (1 to 10).foreach { _ =>
      val state = Files.createTempDirectory("graft_wm_readrace").toString
      (1 to 8).foreach(i => Cdc.updateWatermark(spark, state, s"t$i", ts(f"2024-01-0$i%d 00:00:00")))
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val bad = new java.util.concurrent.atomic.AtomicReference[String]()
      val readers = (1 to 4).map { k =>
        new Thread(() =>
          try while (!stop.get()) {
            if (Cdc.getWatermark(spark, state, "t1").isEmpty)
              bad.compareAndSet(null, "getWatermark returned None mid-migration")
            val m = Cdc.readWatermarkMap(state)
            if (m.size != 8)
              bad.compareAndSet(null, s"readWatermarkMap saw ${m.size}/8 rows mid-migration")
          } catch { case e: Throwable => bad.compareAndSet(null, s"reader threw: $e") })
      }
      readers.foreach(_.start())
      Cdc.shardWatermarkStore(state, 4)
      stop.set(true)
      readers.foreach(_.join())
      assert(bad.get() == null, String.valueOf(bad.get()))
    }
  }

  test("migration GCs orphan shard stores above the new B (crashed larger-B attempt, ADVICE r15)") {
    val state = Files.createTempDirectory("graft_wm_orphan").toString
    Cdc.updateWatermark(spark, state, "t1", ts("2024-01-01 00:00:00"))
    // simulate a crashed B=8 attempt that wrote shards b0006/b0007 (version
    // dir + pointer) before dying pre-marker
    Seq("_b0006", "_b0007", "_b10000").foreach { s =>
      val v = new java.io.File(s"$state/${Cdc.WatermarkTable}${s}_v000001")
      v.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$state/${Cdc.WatermarkTable}$s.current"), v.getName)
    }
    Cdc.shardWatermarkStore(state, 4)
    val names = new java.io.File(state).listFiles().map(_.getName).toSet
    assert(!names.exists(_.contains("_b0006")) && !names.exists(_.contains("_b0007")) &&
      !names.exists(_.contains("_b10000")),
      s"orphan shards above B=4 (incl. 5-digit indices) must be GC'd: ${names.mkString(",")}")
    assert(Cdc.getWatermark(spark, state, "t1").contains(ts("2024-01-01 00:00:00")))
  }

  test("sync cycle runs unchanged over a sharded watermark store (delta + advance via shards)") {
    val scratch = Files.createTempDirectory("graft_cdc_shardcycle").toString
    val src = s"$scratch/src"
    new java.io.File(src).mkdirs()
    Seq((1L, ts("2024-01-01 00:00:00"), "a"), (2L, ts("2024-01-02 00:00:00"), "b"))
      .toDF("event_id", "ts", "payload").write.parquet(s"$src/events.parquet")
    Cdc.syncCycle(spark, src, s"$scratch/state", s"$scratch/sink")
    Cdc.shardWatermarkStore(s"$scratch/state", 4)
    // watermark survives the migration and keeps gating the delta
    Seq((3L, ts("2024-01-03 00:00:00"), "c"))
      .toDF("event_id", "ts", "payload").write.mode("append").parquet(s"$src/events.parquet")
    val n = Cdc.syncCycle(spark, src, s"$scratch/state", s"$scratch/sink")
    assert(n("events") == 1, s"post-migration cycle must sink exactly the delta: $n")
    assert(Cdc.getWatermark(spark, s"$scratch/state", "events")
      .contains(ts("2024-01-03 00:00:00")))
    // idempotency unchanged: a third cycle is an empty-delta no-op
    assert(Cdc.syncCycle(spark, src, s"$scratch/state", s"$scratch/sink")("events") == 0)
  }

  test("vector upsert: same id overwrites (Pinecone semantics, service.py:160-166)") {
    val sink = Files.createTempDirectory("graft_sink").toString
    Cdc.initVectorSink(spark, sink)
    val b1 = Seq(("a#1", Array(1f), "t", "old"), ("a#2", Array(2f), "t", "x"))
      .toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, b1)
    val b2 = Seq(("a#1", Array(9f), "t", "new")).toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, b2)
    val out = Cdc.readVectorSink(spark, sink).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("text")).toMap
    assert(out == Map("a#1" -> "new", "a#2" -> "x"))
  }

  test("namespaces isolate ids: same id upserted into two namespaces keeps both") {
    val sink = Files.createTempDirectory("graft_sink_ns").toString
    Cdc.initVectorSink(spark, sink)
    val b = Seq(("a#1", Array(1f), "t", "in-task1")).toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, b) // default namespace task1
    val b2 = Seq(("a#1", Array(2f), "t", "in-task2")).toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, b2, namespace = "task2")
    val rows = Cdc.readVectorSink(spark, sink).collect()
      .map(r => (r.getAs[String]("namespace"), r.getAs[String]("text")))
    assert(rows.toSet == Set(("task1", "in-task1"), ("task2", "in-task2")))
    // overwriting in task2 leaves task1 untouched
    val b3 = Seq(("a#1", Array(3f), "t", "in-task2-v2")).toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, b3, namespace = "task2")
    val after = Cdc.readVectorSink(spark, sink).collect()
      .map(r => (r.getAs[String]("namespace"), r.getAs[String]("text")))
    assert(after.toSet == Set(("task1", "in-task1"), ("task2", "in-task2-v2")))
  }

  test("merge commit MOVES staged files into the new root — new rows are never rewritten (r14)") {
    val sink = Files.createTempDirectory("graft_sink_mv").toString
    Cdc.initVectorSink(spark, sink)
    // publish a first batch so the second batch's buckets OVERLAP →
    // commit takes the merge path, not the empty-overlap rename
    val ids = (1 to 40).map(i => s"m#$i")
    Cdc.upsertVectors(spark, sink,
      ids.map(id => (id, Array(1f), "t", s"v1-$id")).toDF("id", "embedding", "source", "text"))
    val b2 = ids.take(20).map(id => (id, Array(2f), "t", s"v2-$id"))
      .toDF("id", "embedding", "source", "text")
    val staged = Cdc.stageUpsert(spark, sink, b2).get
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    val stagedNames = walk(new java.io.File(staged.stageDir))
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    assert(stagedNames.nonEmpty)
    Cdc.commitStagedUpsert(spark, sink, staged)
    // the staged batch's physical files live under the published roots,
    // names intact — one rename each, zero Spark rewrite of new rows
    val rootFiles = walk(new java.io.File(sink))
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    assert(stagedNames.subsetOf(rootFiles),
      s"staged files must be MOVED into the root: missing ${stagedNames -- rootFiles}")
    // and the merge is still correct: overwritten ids serve v2, rest v1
    val out = Cdc.readVectorSink(spark, sink).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("text")).toMap
    assert(out == ids.map(id => id ->
      (if (ids.take(20).contains(id)) s"v2-$id" else s"v1-$id")).toMap)
  }

  test("upsert rewrites only touched buckets: other bucket files stay byte-identical") {
    val sink = Files.createTempDirectory("graft_sink_bk").toString
    Cdc.initVectorSink(spark, sink)
    // spread ids over buckets, then find two ids in different buckets
    val ids = (1 to 40).map(i => s"t#$i")
    val b1 = ids.map(id => (id, Array(1f), "t", s"v1-$id")).toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, b1)
    val byBucket = Cdc.readVectorSink(spark, sink).select("id", "bucket").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val (touchId, touchBucket) = byBucket.head
    val otherBucket = byBucket.values.find(_ != touchBucket).get
    def bucketFiles(bk: Int): Map[String, String] = {
      // locate the bucket through the manifest (MVCC: its generation root
      // is part of its identity — an untouched bucket must not even MOVE)
      val entry = Cdc.readManifest(sink).get
        .find(e => e.namespace == "task1" && e.bucket == bk).get
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      val dir = new java.io.File(s"$sink/${entry.root}/namespace=task1/bucket=$bk")
      walk(dir).filter(_.getName.endsWith(".parquet")).map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        f.getPath.stripPrefix(sink) -> java.util.Base64.getEncoder.encodeToString(
          java.security.MessageDigest.getInstance("MD5").digest(bytes))
      }.toMap
    }
    val before = bucketFiles(otherBucket)
    assert(before.nonEmpty)
    // upsert touching only touchBucket
    val b2 = Seq((touchId, Array(9f), "t", "v2")).toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, b2)
    assert(bucketFiles(otherBucket) == before,
      "untouched bucket must keep identical bytes at identical paths")
    val texts = Cdc.readVectorSink(spark, sink).where(col("id") === touchId)
      .select("text").collect().map(_.getString(0))
    assert(texts.toSeq == Seq("v2"))
  }

  test("re-upsert that moves an id to a new simb sub-partition leaves no stale copy") {
    val sink = Files.createTempDirectory("graft_sink_simb").toString
    Cdc.initVectorSink(spark, sink)
    // all-positive leading signs → simb 15; all-negative → simb 0
    val b1 = Seq(("a#1", Array(1f, 1f, 1f, 1f), "t", "v1")).toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, b1)
    val b2 = Seq(("a#1", Array(-1f, -1f, -1f, -1f), "t", "v2")).toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, b2)
    val rows = Cdc.readVectorSink(spark, sink).select("id", "text", "simb").collect()
    assert(rows.length == 1, s"stale simb copy survived: ${rows.mkString(",")}")
    assert(rows(0).getAs[String]("text") == "v2")
    assert(rows(0).getAs[Int]("simb") == 0)
  }

  test("crash before the manifest flip leaves the committed snapshot; retry converges; orphan swept") {
    val sink = Files.createTempDirectory("graft_sink_crash").toString
    Cdc.initVectorSink(spark, sink)
    // commit a first batch spread over several buckets
    val ids = (1 to 40).map(i => s"t#$i")
    val b1 = ids.map(id => (id, Array(1f), "t", s"v1-$id")).toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, b1)
    val committed = Cdc.readVectorSink(spark, sink).select("id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(committed.size == 40)

    // second batch touches several buckets; die AFTER the data write but
    // BEFORE the atomic manifest pointer flip
    val b2 = ids.take(10).map(id => (id, Array(2f), "t", s"v2-$id")).toDF("id", "embedding", "source", "text")
    val boom = intercept[RuntimeException] {
      Cdc.upsertVectors(spark, sink, b2,
        onBeforeCommit = () => throw new RuntimeException("injected crash"))
    }
    assert(boom.getMessage == "injected crash")

    // MVCC: a crashed commit is INVISIBLE — the read is bit-for-bit the
    // previous snapshot, never a mid-swap mix (the pre-r13 bucket-swap
    // design could only promise per-bucket old-or-new here)
    val midway = Cdc.readVectorSink(spark, sink).select("id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(midway == committed, "crashed (unpublished) commit leaked into a read")
    val orphanRoots = new java.io.File(sink).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("vectors_g")).map(_.getName).toSet

    // re-running the same upsert (what a crashed CDC cycle does)
    // converges the sink to the full batch-2 state
    Cdc.upsertVectors(spark, sink, b2)
    val after = Cdc.readVectorSink(spark, sink).select("id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after.keySet == committed.keySet)
    ids.take(10).foreach(id => assert(after(id) == s"v2-$id", s"$id not overwritten on retry"))
    ids.drop(10).foreach(id => assert(after(id) == s"v1-$id"))
    // the crashed attempt's orphan generation root was GC-swept by the
    // successful commit (it was never referenced by any manifest)
    val live = Cdc.readManifest(sink).get.map(_.root).toSet
    orphanRoots.diff(live).foreach { orphan =>
      assert(!new java.io.File(sink, orphan).exists(), s"orphan root $orphan survived GC")
    }
  }

  test("crash during the staged write leaves the live sink untouched") {
    val sink = Files.createTempDirectory("graft_sink_stagefail").toString
    Cdc.initVectorSink(spark, sink)
    val b1 = Seq(("a#1", Array(1f), "t", "v1")).toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, b1)
    // a failing batch plan aborts the stage write before any manifest/swap
    val bad = Seq(("a#1", Array(2f), "t", "v2")).toDF("id", "embedding", "source", "text")
      .withColumn("text", expr("raise_error('boom')"))
    intercept[Exception] { Cdc.upsertVectors(spark, sink, bad) }
    val rows = Cdc.readVectorSink(spark, sink).select("id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows == Map("a#1" -> "v1"))
  }

  test("incremental compaction bounds live generation roots at MaxLiveRoots") {
    val sink = Files.createTempDirectory("graft_sink_compact").toString
    Cdc.initVectorSink(spark, sink)
    // 2×MaxLiveRoots single-id commits: every commit adds a root, so
    // without compaction the root count would grow without bound (and
    // with it every read's union width and the sink's file count)
    val n = Cdc.MaxLiveRoots * 2
    (1 to n).foreach { i =>
      val b = Seq((s"t#$i", Array(i.toFloat), "t", s"v$i")).toDF("id", "embedding", "source", "text")
      Cdc.upsertVectors(spark, sink, b)
      val roots = Cdc.readManifest(sink).get.map(_.root).distinct
      assert(roots.size <= Cdc.MaxLiveRoots,
        s"commit $i left ${roots.size} live roots: $roots")
    }
    // no row was lost to the folds, and every id reads its latest value
    val rows = Cdc.readVectorSink(spark, sink).select("id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows == (1 to n).map(i => s"t#$i" -> s"v$i").toMap)
    // physically retired roots are gone from disk: GC keeps the roots of
    // the current and previous manifests, and current = (prev − folded)
    // ∪ {new}, so at most MaxLiveRoots + 1 root dirs may exist
    val onDisk = new java.io.File(sink).listFiles()
      .filter(f => f.isDirectory && (f.getName == "vectors" || f.getName.startsWith("vectors_g")))
      .map(_.getName).toSet
    assert(onDisk.size <= Cdc.MaxLiveRoots + 1,
      s"retired roots not GC'd: ${onDisk.size} on disk: $onDisk")
  }

  test("MVCC snapshot isolation: a read resolved mid-commit or pre-commit sees the old snapshot") {
    val sink = Files.createTempDirectory("graft_sink_mvcc").toString
    Cdc.initVectorSink(spark, sink)
    val ids = (1 to 30).map(i => s"t#$i")
    def gen(tag: String) =
      ids.map(id => (id, Array(1f), "t", s"$tag-$id")).toDF("id", "embedding", "source", "text")
    def textsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select("text").collect().map(_.getString(0).takeWhile(_ != '-')).toSet
    Cdc.upsertVectors(spark, sink, gen("g1"))

    // (a) a reader that resolves DURING an in-flight commit (after the
    // data write, before the pointer flip) sees exactly the old snapshot
    var midCommit: Set[String] = null
    Cdc.upsertVectors(spark, sink, gen("g2"),
      onBeforeCommit = () => midCommit = textsOf(Cdc.readVectorSink(spark, sink)))
    assert(midCommit == Set("g1"), s"mid-commit read tore: $midCommit")

    // (b) a reader that RESOLVED before a commit still materializes its
    // snapshot after it (one-behind GC retention) — and it is the OLD one
    val pinned = Cdc.readVectorSink(spark, sink) // resolves manifest + listing now
    Cdc.upsertVectors(spark, sink, gen("g3"))
    assert(textsOf(pinned) == Set("g2"), "pinned reader must see its resolved snapshot")
    assert(textsOf(Cdc.readVectorSink(spark, sink)) == Set("g3"))
  }

  test("pre-simb sink layout fails fast with a reinitialize error") {
    val sink = Files.createTempDirectory("graft_sink_oldlayout").toString
    // fabricate the round-2 layout: (namespace, bucket) with files directly
    // under bucket= (no simb= level)
    Seq(("a#1", Array(1f), "t", "old", "task1", 3))
      .toDF("id", "embedding", "source", "text", "namespace", "bucket")
      .write.partitionBy("namespace", "bucket").parquet(s"$sink/vectors")
    val b = Seq(("a#2", Array(2f), "t", "new")).toDF("id", "embedding", "source", "text")
    val e = intercept[IllegalStateException] { Cdc.upsertVectors(spark, sink, b) }
    assert(e.getMessage.contains("pre-simb"))
  }

  test("sink layout is chosen at creation, persisted, and honored by later upserts") {
    val sink = Files.createTempDirectory("graft_sink_layout").toString
    Cdc.initVectorSink(spark, sink, Cdc.SinkLayout(buckets = 4, simBits = 2))
    assert(Cdc.readLayout(sink) == Cdc.SinkLayout(4, 2))
    val b = (1 to 30).map(i => (s"t#$i", Array(1f, -1f, 1f), "t", s"v$i"))
      .toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, b)
    val rows = Cdc.readVectorSink(spark, sink).select("bucket", "simb").collect()
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 4), "bucket beyond layout")
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 4), "simb beyond 2^simBits")
    // a second init must NOT re-layout an existing sink
    Cdc.initVectorSink(spark, sink, Cdc.SinkLayout(buckets = 64, simBits = 4))
    assert(Cdc.readLayout(sink) == Cdc.SinkLayout(4, 2))
    // a sink with no layout file (pre-layout era) reads as the default
    val bare = Files.createTempDirectory("graft_sink_nolayout").toString
    assert(Cdc.readLayout(bare) == Cdc.DefaultLayout)
  }

  test("upsertVectors drops null ids (non-nullable partition contract)") {
    val sink = Files.createTempDirectory("graft_sink_nullid").toString
    Cdc.initVectorSink(spark, sink)
    val b = Seq((null.asInstanceOf[String], Array(1f), "t", "x"), ("a#1", Array(1f), "t", "y"))
      .toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, b)
    val ids = Cdc.readVectorSink(spark, sink).select("id").collect().map(_.getString(0))
    assert(ids.toSeq == Seq("a#1"))
  }

  test("sinkStats summarizes per-namespace count and dim (describe_index_stats analog)") {
    val sink = Files.createTempDirectory("graft_sink_st").toString
    Cdc.initVectorSink(spark, sink)
    val b = Seq(("a#1", Array(1f, 2f, 3f), "t", "x"), ("a#2", Array(4f, 5f, 6f), "t", "y"))
      .toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, b)
    val st = Cdc.sinkStats(spark, sink).collect()(0)
    assert(st.getAs[String]("namespace") == "task1")
    assert(st.getAs[Long]("n_vectors") == 2L)
    assert(st.getAs[Int]("dim") == 3)
  }

  test("two-batch incremental sync: second batch picks up only ts > wm; " +
    "re-run is a no-op (idempotence via content-hash ids)") {
    val scratch = Files.createTempDirectory("graft_cdc").toString
    val src = s"$scratch/src"; val state = s"$scratch/state"; val sink = s"$scratch/sink"
    new java.io.File(src).mkdirs()
    val batch1 = (1 to 150).map(i => (i.toLong, ts(f"2024-01-01 00:${i % 60}%02d:${i % 60}%02d"), s"u$i"))
      .toDF("event_id", "ts", "payload")
    batch1.write.parquet(s"$src/events.parquet")
    // deterministic mode: exact chunk counts are what this test asserts
    val r1 = Cdc.syncCycle(spark, src, state, sink, deterministicChunks = true)
    assert(r1("events") == 150)
    val wm1 = Cdc.getWatermark(spark, state, "events").get
    val n1 = Cdc.readVectorSink(spark, sink).count()
    assert(n1 == 2) // ceil(150/100) chunks

    // append newer rows (overwrite table with union)
    val batch2 = (151 to 180).map(i => (i.toLong, ts("2024-01-02 00:00:00"), s"u$i"))
      .toDF("event_id", "ts", "payload")
    batch1.union(batch2).write.mode("overwrite").parquet(s"$src/events.parquet")
    val r2 = Cdc.syncCycle(spark, src, state, sink, deterministicChunks = true)
    assert(r2("events") == 30) // only the delta
    assert(Cdc.getWatermark(spark, state, "events").get.after(wm1))

    // third run: empty delta → skip, watermark unchanged (P6)
    val wm2 = Cdc.getWatermark(spark, state, "events").get
    val r3 = Cdc.syncCycle(spark, src, state, sink)
    assert(r3("events") == 0)
    assert(Cdc.getWatermark(spark, state, "events").get == wm2)
  }

  test("a failed table is isolated AND loud: outcomes name it, syncCycle throws (T6)") {
    val scratch = Files.createTempDirectory("graft_cdc_fail").toString
    val src = s"$scratch/src"
    new java.io.File(src).mkdirs()
    Seq((1L, ts("2024-01-01 00:00:00"), "a"), (2L, ts("2024-01-02 00:00:00"), "b"))
      .toDF("event_id", "ts", "payload").write.parquet(s"$src/events.parquet")
    // a table whose read fails: garbage bytes behind a .parquet name
    Files.write(java.nio.file.Paths.get(s"$src/broken.parquet"),
      "this is not a parquet file".getBytes)

    // outcome surface: failure isolated per table, healthy table commits
    val outcomes = Cdc.syncCycleOutcomes(spark, src, s"$scratch/state", s"$scratch/sink")
    assert(outcomes("events") == Cdc.TableSynced(2L))
    assert(outcomes("broken").isFailure)
    assert(Cdc.readVectorSink(spark, s"$scratch/sink").count() > 0)
    assert(Cdc.getWatermark(spark, s"$scratch/state", "events").isDefined)

    // legacy surface: a partial failure must raise, not masquerade as
    // "no new data" (VERDICT r8: empty sink read as fast success)
    val e = intercept[Cdc.CdcCycleException] {
      Cdc.syncCycle(spark, src, s"$scratch/state2", s"$scratch/sink2")
    }
    assert(e.failures.keySet == Set("broken"))
    assert(e.getMessage.contains("broken"))
  }

  test("concurrent cycle matches the serial result (commit-lock correctness)") {
    val scratch = Files.createTempDirectory("graft_cdc_par").toString
    val src = s"$scratch/src"
    new java.io.File(src).mkdirs()
    // several independent CDC tables, all with deltas, synced in one cycle
    (0 until 4).foreach { k =>
      (1 to 120).map(i => (i.toLong + k * 1000, ts(f"2024-01-01 0$k:${i % 60}%02d:00"), s"t$k-u$i"))
        .toDF("event_id", "ts", "payload").write.parquet(s"$src/tab$k.parquet")
    }
    val r = Cdc.syncCycle(spark, src, s"$scratch/state", s"$scratch/sink")
    assert(r == (0 until 4).map(k => s"tab$k" -> 120L).toMap)
    val sink = Cdc.readVectorSink(spark, s"$scratch/sink")
    // every table's chunks present, ids unique (no lost update under the
    // concurrent upserts), watermark per table committed
    assert(sink.select("id").distinct().count() == sink.count())
    (0 until 4).foreach { k =>
      assert(sink.where(col("source") === s"tab$k").count() >= 2)
      assert(Cdc.getWatermark(spark, s"$scratch/state", s"tab$k").isDefined)
    }
  }

  test("concurrent watermark commits from streaming-style threads: no lost update (r15 lock)") {
    // ADVICE r14: the batch path serializes commits under the cycle's
    // commitLock, but CdcStream's foreachBatch threads call
    // updateWatermark concurrently — two unlocked RMWs could both read
    // version N and race to publish v{N+1}, the last pointer flip
    // dropping the loser's table. The per-store lock makes the RMW
    // atomic; this drives 8 simultaneous commits (barrier-released, the
    // racing shape) and requires every one of them to survive.
    val state = Files.createTempDirectory("graft_wm_race").toString
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 8).map { i =>
      val t = new Thread(() => {
        try {
          barrier.await()
          Cdc.updateWatermark(spark, state, s"stream$i", ts(f"2024-01-0$i%d 00:00:00"))
        } catch { case e: Throwable => failures.add(e); () }
      })
      t.start(); t
    }
    threads.foreach(_.join(60000))
    assert(failures.isEmpty, s"commit threw: ${failures.toArray.mkString(";")}")
    val store = Cdc.readWatermarkMap(state)
    assert(store == (1 to 8).map(i => s"stream$i" -> ts(f"2024-01-0$i%d 00:00:00")).toMap,
      s"lost update under concurrent streaming commits: $store")
  }

  test("schema evolution converges: updated rows re-emit under the new schema, " +
      "repeat cycles are byte-stable no-ops (VERDICT r14 #5)") {
    val scratch = Files.createTempDirectory("graft_cdc_evo2").toString
    val src = s"$scratch/src"
    val state = s"$scratch/state"
    val sink = s"$scratch/sink"
    new java.io.File(src).mkdirs()
    // cycle 1: rows 1-2 under schema (event_id, ts, payload)
    Seq((1L, ts("2024-01-01 00:00:00"), "a"), (2L, ts("2024-01-02 00:00:00"), "b"))
      .toDF("event_id", "ts", "payload").write.parquet(s"$src/events.parquet")
    Cdc.syncCycle(spark, src, state, sink)
    val v1 = Cdc.readVectorSink(spark, sink).select("id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // ALTER analog + an UPDATE of row 2: the updated row's ts is bumped
    // (the only way a CDC source re-surfaces a row), and it now carries
    // the new column — appended as a wider-schema file, old file untouched
    Seq((2L, ts("2024-01-03 00:00:00"), "b", "eu"))
      .toDF("event_id", "ts", "payload", "region")
      .write.mode("append").parquet(s"$src/events.parquet")
    Cdc.syncCycle(spark, src, state, sink)
    val v2 = Cdc.readVectorSink(spark, sink).select("id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // the re-emitted row serializes WITH the new field under a NEW
    // content-hash id — the new-schema chunk supersedes the old one as
    // the row's latest content; the old chunk persists as then-current
    // history (exactly the reference's UUID-keyed Pinecone behavior)
    val newChunks = v2.keySet -- v1.keySet
    assert(newChunks.nonEmpty, "the updated row must re-emit")
    assert(newChunks.forall(id => v2(id).contains("\"region\":\"eu\"") &&
      v2(id).contains("\"event_id\":2")), s"new-schema serialization missing: $v2")
    assert(v1.keySet.subsetOf(v2.keySet), "pre-ALTER chunks are never rewritten")
    // convergence: with no further source changes the cycle is a no-op —
    // same ids, same text, watermark parked (idempotent thereafter)
    val wm2 = Cdc.getWatermark(spark, state, "events")
    Cdc.syncCycle(spark, src, state, sink)
    val v3 = Cdc.readVectorSink(spark, sink).select("id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(v3 == v2, "a quiet cycle must be a no-op after evolution")
    assert(Cdc.getWatermark(spark, state, "events") == wm2)
  }

  test("shard advisory fires once at the measured knee, only for unsharded stores (r16)") {
    Cdc.resetShardAdvisories()
    val state = Files.createTempDirectory("graft_wm_advise").toString
    val abs = new java.io.File(state).getAbsolutePath
    val base = ts("2024-01-01 00:00:00")
    // seed to one under the knee: the commit that crosses it advises
    val seed = (1 until Cdc.ShardAdvisoryTables)
      .map(i => f"table_$i%06d" -> base).toMap
    Cdc.seedWatermarkStore(state, seed)
    Cdc.updateWatermark(spark, state, "under", base)
    assert(Cdc.shardAdvisedStores.contains(abs),
      "crossing the knee unsharded must advise shardWatermarkStore")
    // once per store per process: a second commit does not re-advise
    // (the set add is the once-guard; membership is stable)
    Cdc.updateWatermark(spark, state, "under", ts("2024-01-02 00:00:00"))
    assert(Cdc.shardAdvisedStores.count(_ == abs) == 1)
    // a SHARDED store at the same size never advises — sharding was the fix
    Cdc.resetShardAdvisories()
    val state2 = Files.createTempDirectory("graft_wm_advise2").toString
    Cdc.seedWatermarkStore(state2, Map("seed" -> base))
    Cdc.shardWatermarkStore(state2, 4)
    Cdc.seedWatermarkStore(state2, seed)
    Cdc.updateWatermark(spark, state2, "over", base)
    assert(Cdc.shardAdvisedStores.isEmpty, "sharded store must not advise")
  }

  test("quiet-table fast path: footer-stats max is exact across encodings, " +
      "drift, and nulls — and unknown when stats can't be trusted (r16)") {
    val dir = Files.createTempDirectory("graft_stats_max").toString
    import graft.sources.Tables
    // a modern lake writes INT64 timestamps (Delta/Iceberg, pyarrow; the
    // driver fixtures); Spark's own legacy default is INT96 — pinned
    // below as the untrusted fall-back case
    val prevTsType = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      // exact max over multiple files
      Seq((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-05 00:00:00")))
        .toDF("event_id", "ts").write.parquet(s"$dir/t1.parquet")
      Seq((3L, ts("2024-01-03 00:00:00")))
        .toDF("event_id", "ts").write.mode("append").parquet(s"$dir/t1.parquet")
      assert(Tables.parquetTimestampMax(s"$dir/t1.parquet", "ts")
        .contains(Some(ts("2024-01-05 00:00:00"))))
      // drift: one file lacks the column — its rows are null there, max
      // still exact from the carrying file
      Seq((4L, "x")).toDF("event_id", "payload")
        .write.mode("append").parquet(s"$dir/t1.parquet")
      assert(Tables.parquetTimestampMax(s"$dir/t1.parquet", "ts")
        .contains(Some(ts("2024-01-05 00:00:00"))))
      // all-null column → Some(None); absent table dir → Some(None)
      Seq((1L, Option.empty[java.sql.Timestamp])).toDF("event_id", "ts")
        .write.parquet(s"$dir/t2.parquet")
      assert(Tables.parquetTimestampMax(s"$dir/t2.parquet", "ts").contains(None))
      assert(Tables.parquetTimestampMax(s"$dir/absent.parquet", "ts").contains(None))
      // non-timestamp column → unknown (fall back to the Spark aggregate)
      assert(Tables.parquetTimestampMax(s"$dir/t1.parquet", "event_id").isEmpty)
      // a data file Spark's scan WOULD read but the probe can't see through
      // (renamed, no .parquet suffix) → unknown, never an under-reported max
      Seq((9L, ts("2024-09-01 00:00:00"))).toDF("event_id", "ts")
        .write.parquet(s"$dir/t4.parquet")
      val part = new java.io.File(s"$dir/t4.parquet").listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        part.toPath.resolveSibling("renamed-data-file"))
      assert(Tables.parquetTimestampMax(s"$dir/t4.parquet", "ts").isEmpty,
        "foreign data files must make the probe answer unknown")
      // legacy INT96 timestamps: stats are untrustworthy by design
      // (PARQUET-1065 ordering corruption) → unknown, never a wrong max
      spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      Seq((1L, ts("2024-01-09 00:00:00"))).toDF("event_id", "ts")
        .write.parquet(s"$dir/t3.parquet")
      assert(Tables.parquetTimestampMax(s"$dir/t3.parquet", "ts").isEmpty)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevTsType)
  }

  test("quiet-table fast path: a quiet sync schedules ZERO Spark jobs; an " +
      "active table is never skipped (r16)") {
    val scratch = Files.createTempDirectory("graft_quiet_path").toString
    val (src, state, sink) = (s"$scratch/src", s"$scratch/state", s"$scratch/sink")
    new java.io.File(src).mkdirs()
    val prevTsType = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    Seq((1L, ts("2024-01-01 00:00:00"), "a"), (2L, ts("2024-01-02 00:00:00"), "b"))
      .toDF("event_id", "ts", "payload").write.parquet(s"$src/events.parquet")
    Cdc.syncCycle(spark, src, state, sink) // first sync: full path
    val wmAfter = Cdc.getWatermark(spark, state, "events")
    assert(wmAfter.contains(ts("2024-01-02 00:00:00")))
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      CcProbe.drainListenerBus(spark)
      jobs = 0
      // quiet table (footer max == watermark): syncTable must answer from
      // driver-side footer stats — no relation, no aggregate, no job
      val n = Cdc.syncTable(spark, src, state, sink, "events",
        "ts", "event_id", chunkSize = 99)
      CcProbe.drainListenerBus(spark)
      assert(n == 0L)
      assert(jobs == 0, s"quiet sync must schedule no Spark job, saw $jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
    // new rows past the watermark: the probe answers ACTIVE and the full
    // path syncs them — the fast path can never under-report
    try {
      Seq((3L, ts("2024-01-03 00:00:00"), "c"))
        .toDF("event_id", "ts", "payload").write.mode("append").parquet(s"$src/events.parquet")
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevTsType)
    val n2 = Cdc.syncTable(spark, src, state, sink, "events",
      "ts", "event_id", chunkSize = 99)
    assert(n2 == 1L, "active table must not be skipped by the fast path")
    assert(Cdc.getWatermark(spark, state, "events").contains(ts("2024-01-03 00:00:00")))
  }

  test("schema drift, DROP direction: a parquet lake keeps the union schema — " +
      "post-drop rows serialize the field as null, sink converges (VERDICT r15 #4)") {
    val scratch = Files.createTempDirectory("graft_cdc_drop").toString
    val (src, state, sink) = (s"$scratch/src", s"$scratch/state", s"$scratch/sink")
    new java.io.File(src).mkdirs()
    Seq((1L, ts("2024-01-01 00:00:00"), "a", "eu"))
      .toDF("event_id", "ts", "payload", "region").write.parquet(s"$src/events.parquet")
    Cdc.syncCycle(spark, src, state, sink)
    val v1 = Cdc.readVectorSink(spark, sink).select("id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(v1.values.exists(_.contains("\"region\":\"eu\"")))
    // DROP analog: later files simply stop carrying the column (a parquet
    // lake has no DDL — the old files still have it, so the merged SELECT *
    // keeps the union schema and null-fills, unlike a database drop)
    Seq((2L, ts("2024-01-02 00:00:00"), "b"))
      .toDF("event_id", "ts", "payload").write.mode("append").parquet(s"$src/events.parquet")
    Cdc.syncCycle(spark, src, state, sink)
    val v2 = Cdc.readVectorSink(spark, sink).select("id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val fresh = v2.keySet -- v1.keySet
    assert(fresh.nonEmpty, "the new row must sync")
    assert(fresh.forall(id => v2(id).contains("\"region\":null")),
      s"post-drop row must serialize the dropped field as null (F1 null retention): $v2")
    assert(v1.keySet.subsetOf(v2.keySet), "pre-drop chunks are never rewritten")
    // convergence: a quiet third cycle is a byte-stable no-op
    Cdc.syncCycle(spark, src, state, sink)
    val v3 = Cdc.readVectorSink(spark, sink).select("id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(v3 == v2)
  }

  test("schema drift, WIDEN direction: int->bigint between polls — the merged " +
      "read widens instead of crashing, values serialize identically (VERDICT r15 #4)") {
    val scratch = Files.createTempDirectory("graft_cdc_widen").toString
    val (src, state, sink) = (s"$scratch/src", s"$scratch/state", s"$scratch/sink")
    new java.io.File(src).mkdirs()
    // cycle 1: qty is INT
    Seq((1L, ts("2024-01-01 00:00:00"), 10, "a"))
      .toDF("event_id", "ts", "qty", "payload").write.parquet(s"$src/events.parquet")
    Cdc.syncCycle(spark, src, state, sink)
    val v1 = Cdc.readVectorSink(spark, sink).select("id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(v1.values.exists(_.contains("\"qty\":10")))
    // ALTER COLUMN widen analog: new files carry qty as BIGINT. Spark's own
    // mergeSchema refuses int-vs-long footers, so this pins the widened-
    // union fallback in Tables.table end-to-end through the cycle.
    Seq((2L, ts("2024-01-02 00:00:00"), 3000000000L, "b"))
      .toDF("event_id", "ts", "qty", "payload").write.mode("append").parquet(s"$src/events.parquet")
    Cdc.syncCycle(spark, src, state, sink)
    val v2 = Cdc.readVectorSink(spark, sink).select("id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val fresh = v2.keySet -- v1.keySet
    assert(fresh.nonEmpty, "the widened row must sync, not crash the read")
    assert(fresh.forall(id => v2(id).contains("\"qty\":3000000000")),
      s"post-widen row must carry the long value: $v2")
    assert(v1.keySet.subsetOf(v2.keySet), "pre-widen chunks are never rewritten")
    // old rows re-read under the widened schema serialize the SAME text
    // (10 as long prints \"10\") — convergence: quiet cycle is a no-op
    Cdc.syncCycle(spark, src, state, sink)
    val v3 = Cdc.readVectorSink(spark, sink).select("id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(v3 == v2)
  }
}
