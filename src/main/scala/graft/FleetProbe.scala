package graft

import graft.operators.{Cdc, JdbcWatermarkStore, ParquetWatermarkStore}

import java.sql.Timestamp

/** Dev probe (VERDICT r15 task 5, extended r17): the realistic FLEET TICK,
  * end-to-end, over both source bindings.
  *
  * WmProbe measures the watermark store in isolation; this probe runs
  * [[Cdc.syncCycleOutcomesOn]] itself over a T-table catalog where only
  * ~10% of tables have new rows — the steady state of a large CDC fleet
  * polling on a cadence (most tables quiet most ticks). What it isolates:
  *  - the per-table floor a QUIET table still pays (driver probe only
  *    since r16 — no Spark job),
  *  - the active tables' chunk→embed→sink→commit path overlapping on the
  *    table-level thread pool,
  *  - the watermark commit tail at B=1 vs sharded B (per-shard locks),
  *  - (r17, VERDICT r16 task 1) the JDBC deployment's per-tick connection
  *    bill: physical connections opened by the source probes and the
  *    database-resident watermark store, pooled vs the connection-per-call
  *    BEFORE shape.
  *
  * Dir-mode source tables are written DRIVER-side with parquet-mr (same
  * writer family as the store), in parallel — T tiny single-file tables; a
  * Spark write job per table would make generation, not the cycle, the
  * probe's cost. Jdbc mode creates T Derby tables over one connection.
  *
  * Usage: tools/jvmrun.sh graft.FleetProbe [CONFIG...]
  *   dir config:    T[:B[:parallelism]]        e.g. 1000:16:8, 10000:16:8
  *   jdbc config:   jdbc:T[:parallelism[:pooled|unpooled]]
  *   shard config:  shard:T:D[:parallelism]    (dir source, D driver JVMs)
  *   jshard config: jshard:T:D[:parallelism]   (JDBC fleet × D driver JVMs,
  *                  VERDICT r17 task 5 — per-shard Derby dbs)
  * Defaults: 1000:1:8 1000:16:8. Prints one JSON line per config. */
object FleetProbe {

  private val messageType: org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.schema._
    Types.buildMessage()
      .required(PrimitiveType.PrimitiveTypeName.INT64).named("event_id")
      .optional(PrimitiveType.PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.MICROS))
      .named("ts")
      .optional(PrimitiveType.PrimitiveTypeName.BINARY)
      .as(LogicalTypeAnnotation.stringType()).named("payload")
      .named("events")
  }

  private def writeTable(dir: String, name: String, rows: Seq[(Long, Timestamp, String)]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val out = org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
      new org.apache.hadoop.fs.Path(s"$dir/$name.parquet"), conf)
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter.builder(out)
      .withType(messageType).withConf(conf).build()
    try rows.foreach { case (id, ts, p) =>
      val g = new org.apache.parquet.example.data.simple.SimpleGroup(messageType)
      g.add("event_id", id)
      g.add("ts", ts.getTime * 1000L)
      g.add("payload", p)
      writer.write(g)
    } finally writer.close()
  }

  /** Generation must not dominate a T=10k probe: fan the driver-side
    * parquet writes over a small pool (they are independent files). */
  private def parForeach[A](items: Seq[A], par: Int)(f: A => Unit): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    try {
      val futs = items.map(a => pool.submit(new Runnable { def run(): Unit = f(a) }))
      futs.foreach(_.get())
    } finally { pool.shutdown(); () }
  }

  private sealed trait Config
  private final case class DirCfg(t: Int, b: Int, par: Int) extends Config
  private final case class JdbcCfg(t: Int, par: Int, pooled: Boolean) extends Config
  private final case class ShardCfg(t: Int, drivers: Int, par: Int) extends Config
  private final case class JShardCfg(t: Int, drivers: Int, par: Int) extends Config

  private def parse(a: String): Config = a.split(':') match {
    case Array("jdbc", t) => JdbcCfg(t.toInt, 8, pooled = true)
    case Array("jdbc", t, p) => JdbcCfg(t.toInt, p.toInt, pooled = true)
    case Array("jdbc", t, p, mode) => JdbcCfg(t.toInt, p.toInt, mode == "pooled")
    case Array("shard", t, d) => ShardCfg(t.toInt, d.toInt, 8)
    case Array("shard", t, d, p) => ShardCfg(t.toInt, d.toInt, p.toInt)
    case Array("jshard", t, d) => JShardCfg(t.toInt, d.toInt, 8)
    case Array("jshard", t, d, p) => JShardCfg(t.toInt, d.toInt, p.toInt)
    case Array(t) => DirCfg(t.toInt, 1, 8)
    case Array(t, b) => DirCfg(t.toInt, b.toInt, 8)
    case Array(t, b, p) => DirCfg(t.toInt, b.toInt, p.toInt)
    case _ => throw new IllegalArgumentException(
      s"expected T[:B[:par]], jdbc:T[:par[:pooled|unpooled]], shard:T:D[:par], " +
        s"or jshard:T:D[:par], got $a")
  }

  def main(args: Array[String]): Unit = {
    val configs: Seq[Config] =
      if (args.nonEmpty) args.toSeq.map(parse)
      else Seq(DirCfg(1000, 1, 8), DirCfg(1000, 16, 8))
    val spark = Bench.buildSession()
    spark.sparkContext.setLogLevel("ERROR")
    val base = new Timestamp(1704067200000L) // 2024-01-01, fixed epoch

    configs.foreach {
      case DirCfg(t, b, par) => runDir(spark, base, t, b, par)
      case JdbcCfg(t, par, pooled) => runJdbc(spark, base, t, par, pooled)
      case ShardCfg(t, d, par) => runSharded(spark, base, t, d, par)
      case JShardCfg(t, d, par) => runJdbcSharded(spark, base, t, d, par)
    }
    spark.stop()
  }

  /** The JDBC fleet COMPOSED with driver sharding (VERDICT r17 task 5):
    * r17 measured the pooled JDBC tick (T=1k, 57.6 s) and the dir-mode
    * shard relief (2.15× at D=2) separately; this config runs the
    * reference's literal topology — poll a live database, watermark state
    * IN it — split across D spawned driver JVMs. Each shard owns its own
    * ON-DISK Derby database holding its name-hash slice of the tables
    * (embedded Derby refuses two JVMs on one database at the boot lock —
    * the WmXProc pin — so per-shard databases are the honest in-container
    * approximation of D drivers on one networked MySQL; the tables and
    * watermark rows are disjoint across shards either way, so no
    * cross-shard contention is being dodged). The single-driver BASELINE
    * runs in-process over one database with all T tables, warm, before
    * the Derby engine is shut down to release the boot locks for the
    * children. Reports per-shard tick walls AND per-shard physical
    * connection counts (the pooling claim must survive the split). */
  private def runJdbcSharded(spark: org.apache.spark.sql.SparkSession, base: Timestamp,
      t: Int, d: Int, par: Int): Unit = {
    val scratch = java.nio.file.Files.createTempDirectory(s"graft_fleet_jshard_$t").toString
    val names = (1 to t).map(k => f"TBL_$k%06d")
    val maxTs = new Timestamp(base.getTime + 9000L)
    val midTs = new Timestamp(base.getTime + 4000L)
    val activityOf: Map[String, Timestamp] = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i % 10 == 0) midTs else maxTs)
    }.toMap
    val (warmTbl, measTbl) = ("WATERMARK_WARM", "WATERMARK_MEAS")

    // --- build one db per shard (its slice) + the baseline db (all T);
    // on-disk so a CHILD JVM can boot it after this engine lets go
    val tGen0 = System.nanoTime()
    def createDb(path: String, tables: Seq[String]): Unit = {
      val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$path;create=true")
      try {
        val st = conn.createStatement()
        tables.foreach { n =>
          st.executeUpdate(s"CREATE TABLE $n (event_id BIGINT NOT NULL PRIMARY KEY, " +
            "ts TIMESTAMP, payload VARCHAR(32))")
          val ps = conn.prepareStatement(s"INSERT INTO $n VALUES (?, ?, ?)")
          (0 until 10).foreach { i =>
            ps.setLong(1, i.toLong)
            ps.setTimestamp(2, new Timestamp(base.getTime + i * 1000L))
            ps.setString(3, s"$n-row-$i"); ps.addBatch()
          }
          ps.executeBatch()
          ps.close()
        }
        st.close()
      } finally conn.close()
      // seed both watermark stores (warm + measured) with the 10%-active
      // pattern — table indices come from the GLOBAL name list, so the
      // active share is uniform across shards
      Seq(warmTbl, measTbl).foreach { wt =>
        val store = JdbcWatermarkStore(s"jdbc:derby:$path", table = wt)
        tables.foreach(n => store.update(n, activityOf(n)))
        store.closePool()
      }
    }
    val slices = (0 until d).map(i => names.filter(FleetShard.sliceOf(_, d) == i))
    val shardDbs = (0 until d).map(i => s"$scratch/db-$i")
    shardDbs.zip(slices).foreach { case (p, s) => createDb(p, s) }
    val baseDb = s"$scratch/db-base"
    createDb(baseDb, names)
    val genMs = (System.nanoTime() - tGen0) / 1e6

    // --- single driver, in-process, over the all-T database: warm tick
    // on the warm store, then the measured tick
    def sourceOn(path: String) = FleetShard.ExcludingSource(
      graft.sources.JdbcSource(s"jdbc:derby:$path", schemaPattern = Some("APP")),
      Set(warmTbl, measTbl))
    val srcBase = sourceOn(baseDb)
    val warmStore = JdbcWatermarkStore(s"jdbc:derby:$baseDb", table = warmTbl)
    val measStore = JdbcWatermarkStore(s"jdbc:derby:$baseDb", table = measTbl)
    Cdc.syncCycleOutcomesOn(spark, srcBase, warmStore, s"$scratch/sink0w", parallelism = par)
    val c0 = srcBase.inner.asInstanceOf[graft.sources.JdbcSource].connectionsOpened +
      measStore.connectionsOpened
    val t1 = System.nanoTime()
    val out1 = Cdc.syncCycleOutcomesOn(spark, srcBase, measStore, s"$scratch/sink0",
      parallelism = par)
    val singleMs = (System.nanoTime() - t1) / 1e6
    require(out1.collect { case (_, Cdc.TableSynced(n)) if n > 0 => n }.size == t / 10,
      "baseline tick must sync the active 10%")
    val singleConns = srcBase.inner.asInstanceOf[graft.sources.JdbcSource].connectionsOpened +
      measStore.connectionsOpened - c0

    // release every Derby boot lock so the children can claim their dbs
    srcBase.inner.asInstanceOf[graft.sources.JdbcSource].closePool()
    warmStore.closePool(); measStore.closePool()
    try java.sql.DriverManager.getConnection("jdbc:derby:;shutdown=true")
    catch { case _: java.sql.SQLException => () } // XJ015 = clean shutdown
    // the engine shutdown DEREGISTERS the embedded driver; re-instantiate
    // it so this process (a later config, another probe) can reconnect
    try {
      Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        .getDeclaredConstructor().newInstance()
      ()
    } catch { case _: ReflectiveOperationException => () }

    // --- D child drivers, warm/barrier/measure protocol as dir-mode shard
    val barrier = s"$scratch/go"
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
      "java.base/java.io", "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
      "java.base/sun.nio.cs", "java.base/sun.security.action",
      "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val procs = (0 until d).map { i =>
      new ProcessBuilder((Seq(javaBin, "-cp",
        "target/scala-2.13/classes:/opt/spark/jars/*") ++ addOpens ++ Seq(
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC", "-Xmx6g",
        "graft.FleetShard", "jdbc", s"jdbc:derby:${shardDbs(i)}", warmTbl, measTbl,
        s"$scratch/sink$d-$i", barrier, i.toString, d.toString, par.toString)): _*)
        .redirectErrorStream(true).start()
    }
    val readers = procs.map(p => new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream)))
    readers.foreach { r =>
      var l = r.readLine()
      while (l != null && l != "WARM") l = r.readLine()
      require(l == "WARM", "a shard child died before warmup completed")
    }
    java.nio.file.Files.createFile(java.nio.file.Paths.get(barrier))
    val outs = readers.map { r =>
      val sb = new StringBuilder
      var l = r.readLine()
      while (l != null) { sb.append(l).append('\n'); l = r.readLine() }
      sb.toString
    }
    procs.foreach(_.waitFor())
    def field(o: String, k: String): Long =
      (s""""$k":(\\d+)""").r.findFirstMatchIn(o).getOrElse(
        throw new IllegalStateException(s"shard child failed:\n$o")).group(1).toLong
    val shardMs = outs.map(field(_, "tick_ms"))
    val shardConns = outs.map(field(_, "conns_tick"))
    println(f"""{"mode":"jdbc_sharded","tables":$t,"drivers":$d,"parallelism":$par,"gen_ms":$genMs%.0f,"single_driver_tick_ms":$singleMs%.0f,"single_driver_conns":$singleConns,"sharded_tick_wall_ms":${shardMs.max},"per_shard_ms":[${shardMs.mkString(",")}],"per_shard_conns":[${shardConns.mkString(",")}],"speedup":${singleMs / shardMs.max}%.2f}""")
  }

  /** The ACTIVE-term bottleneck, attacked (named in BASELINE r17: at
    * T=10k/10% active the tick is ~9 min and widening the in-process pool
    * barely moves it — ONE driver's job scheduling is the shared
    * resource). The engine's per-table isolation makes the fleet
    * embarrassingly parallel ACROSS drivers: each driver takes a disjoint
    * table slice with its own state+sink prefix (disjoint tables ⇒ no
    * shared watermark rows, no shared sink manifest — no cross-process
    * coordination needed at all). This config measures it for real: the
    * same tick once on one in-process driver, then split over D spawned
    * JVMs ([[FleetShard]]) running concurrently; the D-driver wall is the
    * slowest child's TICK time (session startup excluded — a real fleet's
    * drivers are long-lived). */
  private def runSharded(spark: org.apache.spark.sql.SparkSession, base: Timestamp,
      t: Int, d: Int, par: Int): Unit = {
    val scratch = java.nio.file.Files.createTempDirectory(s"graft_fleet_shard_$t").toString
    val src = s"$scratch/src"
    new java.io.File(src).mkdirs()
    val names = (1 to t).map(k => f"table_$k%06d")
    parForeach(names, 8) { n =>
      writeTable(src, n, (0 until 10).map(i =>
        (i.toLong, new Timestamp(base.getTime + i * 1000L), s"$n-row-$i")))
    }
    val maxTs = new Timestamp(base.getTime + 9000L)
    val midTs = new Timestamp(base.getTime + 4000L)
    val activity = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i % 10 == 0) midTs else maxTs)
    }.toMap
    def seedFor(tables: Seq[String], state: String): Unit = {
      // Set, not Seq.contains: a Seq filter is O(T²) string compares —
      // ~10⁸ at T=10k, called 2D+2 times, inflating the setup of the very
      // probe meant to isolate tick cost (ADVICE r17)
      val ts = tables.toSet
      Cdc.seedWatermarkStore(state, activity.filter { case (n, _) => ts(n) })
    }

    // --- single driver, in-process, WARM (one throwaway-state tick pays
    // JIT/codegen — matching the children's own warmup tick)
    seedFor(names, s"$scratch/state0w")
    Cdc.syncCycleOutcomesOn(spark, graft.sources.DirSource(src),
      ParquetWatermarkStore(s"$scratch/state0w"), s"$scratch/sink0w", parallelism = par)
    seedFor(names, s"$scratch/state0")
    val t1 = System.nanoTime()
    val out1 = Cdc.syncCycleOutcomesOn(spark, graft.sources.DirSource(src),
      ParquetWatermarkStore(s"$scratch/state0"), s"$scratch/sink0", parallelism = par)
    val singleMs = (System.nanoTime() - t1) / 1e6
    require(out1.collect { case (_, Cdc.TableSynced(n)) if n > 0 => n }.size == t / 10)

    // --- D drivers on disjoint NAME-HASH slices (index-modulo correlated
    // with the every-10th active pattern and starved D-1 shards); each
    // child warms up on its own throwaway state, then all measured ticks
    // start together at the file barrier
    val slices = (0 until d).map(i => names.filter(FleetShard.sliceOf(_, d) == i))
    slices.zipWithIndex.foreach { case (s, i) =>
      seedFor(s, s"$scratch/stateW-$i")
      seedFor(s, s"$scratch/stateM-$i")
    }
    val barrier = s"$scratch/go"
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
      "java.base/java.io", "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
      "java.base/sun.nio.cs", "java.base/sun.security.action",
      "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val procs = (0 until d).map { i =>
      new ProcessBuilder((Seq(javaBin, "-cp",
        "target/scala-2.13/classes:/opt/spark/jars/*") ++ addOpens ++ Seq(
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC", "-Xmx6g",
        "graft.FleetShard", "dir", src, s"$scratch/stateW-$i", s"$scratch/stateM-$i",
        s"$scratch/sink$d-$i", barrier, i.toString, d.toString, par.toString)): _*)
        .redirectErrorStream(true).start()
    }
    val readers = procs.map(p => new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream)))
    // wait for every child's WARM, then drop the barrier
    readers.foreach { r =>
      var l = r.readLine()
      while (l != null && l != "WARM") l = r.readLine()
      require(l == "WARM", "a shard child died before warmup completed")
    }
    java.nio.file.Files.createFile(java.nio.file.Paths.get(barrier))
    val outs = readers.map { r =>
      val sb = new StringBuilder
      var l = r.readLine()
      while (l != null) { sb.append(l).append('\n'); l = r.readLine() }
      sb.toString
    }
    procs.foreach(_.waitFor())
    val shardMs = outs.map { o =>
      val m = """"tick_ms":(\d+)""".r.findFirstMatchIn(o).getOrElse(
        throw new IllegalStateException(s"shard child failed:\n$o"))
      m.group(1).toLong
    }
    println(f"""{"mode":"sharded","tables":$t,"drivers":$d,"parallelism":$par,"single_driver_tick1_ms":$singleMs%.0f,"sharded_tick1_wall_ms":${shardMs.max},"per_shard_ms":[${shardMs.mkString(",")}],"speedup":${singleMs / shardMs.max}%.2f}""")
  }

  private def runDir(spark: org.apache.spark.sql.SparkSession, base: Timestamp,
      t: Int, b: Int, par: Int): Unit = {
    val scratch = java.nio.file.Files.createTempDirectory(s"graft_fleet_${t}_$b").toString
    val (src, state, sink) = (s"$scratch/src", s"$scratch/state", s"$scratch/sink")
    new java.io.File(src).mkdirs()

    // --- generate: T single-file tables, 10 rows each, driver-side
    val tGen0 = System.nanoTime()
    val names = (1 to t).map(k => f"table_$k%06d")
    parForeach(names, 8) { n =>
      writeTable(src, n, (0 until 10).map(i =>
        (i.toLong, new Timestamp(base.getTime + i * 1000L), s"$n-row-$i")))
    }
    val genMs = (System.nanoTime() - tGen0) / 1e6

    // --- seed watermarks: 10% of tables behind max ts (5-row delta),
    // 90% AT max ts (quiet — the P6 empty-delta skip path)
    val maxTs = new Timestamp(base.getTime + 9000L)
    val midTs = new Timestamp(base.getTime + 4000L)
    val seed = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i % 10 == 0) midTs else maxTs)
    }.toMap
    Cdc.seedWatermarkStore(state, Map(names.head -> maxTs))
    if (b > 1) Cdc.shardWatermarkStore(state, b)
    Cdc.seedWatermarkStore(state, seed)
    require(Cdc.readWatermarkMap(state).size == t, s"seed failed at T=$t")

    val store = ParquetWatermarkStore(state)
    val source = graft.sources.DirSource(src)

    // --- tick 1: 10% active — compute + sink + commit overlap
    val t1 = System.nanoTime()
    val out1 = Cdc.syncCycleOutcomesOn(spark, source, store, sink, parallelism = par)
    val tick1Ms = (System.nanoTime() - t1) / 1e6
    val synced = out1.collect { case (_, Cdc.TableSynced(n)) if n > 0 => n }
    require(synced.size == t / 10 && synced.forall(_ == 5L),
      s"expected ${t / 10} active tables x5 rows, got ${synced.size}")

    // --- tick 2: all quiet — the pure per-table floor
    val t2 = System.nanoTime()
    val out2 = Cdc.syncCycleOutcomesOn(spark, source, store, sink, parallelism = par)
    val tick2Ms = (System.nanoTime() - t2) / 1e6
    require(out2.values.forall(_ == Cdc.TableSynced(0L)), "tick 2 must be all-quiet")

    println(f"""{"mode":"dir","tables":$t,"shards":$b,"parallelism":$par,"gen_ms":$genMs%.0f,"tick1_10pct_active_ms":$tick1Ms%.0f,"tick2_quiet_ms":$tick2Ms%.0f,"quiet_floor_ms_per_table":${tick2Ms / t}%.2f}""")
  }

  /** The reference's literal topology (poll a live database), measured at
    * fleet width: T Derby tables, watermark state IN the database
    * ([[JdbcWatermarkStore]]), and the r17 connection pool either on
    * (AFTER) or off (BEFORE — `poolMaxIdle = 0`, the connection-per-call
    * shape). Reports tick walls AND physical connections opened by the
    * source probes + the store per tick. */
  private def runJdbc(spark: org.apache.spark.sql.SparkSession, base: Timestamp,
      t: Int, par: Int, pooled: Boolean): Unit = {
    val db = s"fleetdb_${t}_${if (pooled) "p" else "u"}_${System.nanoTime()}"
    val url = s"jdbc:derby:memory:$db;create=true"
    val names = (1 to t).map(k => f"TBL_$k%06d")

    // --- generate: T tables x 10 rows over ONE connection (DDL is the
    // setup cost, not the measured tick)
    val tGen0 = System.nanoTime()
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      names.foreach { n =>
        st.executeUpdate(s"CREATE TABLE $n (event_id BIGINT NOT NULL PRIMARY KEY, " +
          "ts TIMESTAMP, payload VARCHAR(32))")
        val ps = conn.prepareStatement(s"INSERT INTO $n VALUES (?, ?, ?)")
        (0 until 10).foreach { i =>
          ps.setLong(1, i.toLong)
          ps.setTimestamp(2, new Timestamp(base.getTime + i * 1000L))
          ps.setString(3, s"$n-row-$i"); ps.addBatch()
        }
        ps.executeBatch()
        ps.close()
      }
      st.close()
    } finally conn.close()
    val genMs = (System.nanoTime() - tGen0) / 1e6

    val maxIdle = if (pooled) 8 else 0
    val source = graft.sources.JdbcSource(url, schemaPattern = Some("APP"),
      poolMaxIdle = maxIdle)
    val store = JdbcWatermarkStore(url, poolMaxIdle = maxIdle)
    val sink = s"${java.nio.file.Files.createTempDirectory(s"graft_fleet_jdbc_$t")}/sink"

    // seed: 10% behind max (5-row delta), 90% quiet
    val maxTs = new Timestamp(base.getTime + 9000L)
    val midTs = new Timestamp(base.getTime + 4000L)
    names.zipWithIndex.foreach { case (n, i) =>
      store.update(n, if (i % 10 == 0) midTs else maxTs)
    }
    val (src0, st0) = (source.connectionsOpened, store.connectionsOpened)

    val t1 = System.nanoTime()
    val out1 = Cdc.syncCycleOutcomesOn(spark, source, store, sink, parallelism = par)
    val tick1Ms = (System.nanoTime() - t1) / 1e6
    val synced = out1.collect { case (_, Cdc.TableSynced(n)) if n > 0 => n }
    require(synced.size == t / 10 && synced.forall(_ == 5L),
      s"expected ${t / 10} active tables x5 rows, got ${synced.size}")
    val (src1, st1) = (source.connectionsOpened - src0, store.connectionsOpened - st0)

    val t2 = System.nanoTime()
    val out2 = Cdc.syncCycleOutcomesOn(spark, source, store, sink, parallelism = par)
    val tick2Ms = (System.nanoTime() - t2) / 1e6
    require(out2.values.forall(_ == Cdc.TableSynced(0L)), "tick 2 must be all-quiet")
    val (src2, st2) = (source.connectionsOpened - src0 - src1,
      store.connectionsOpened - st0 - st1)

    println(f"""{"mode":"jdbc","pooled":$pooled,"tables":$t,"parallelism":$par,"gen_ms":$genMs%.0f,"tick1_10pct_active_ms":$tick1Ms%.0f,"tick2_quiet_ms":$tick2Ms%.0f,"quiet_floor_ms_per_table":${tick2Ms / t}%.2f,"conns_tick1_source":$src1,"conns_tick1_store":$st1,"conns_tick2_source":$src2,"conns_tick2_store":$st2}""")
  }
}
