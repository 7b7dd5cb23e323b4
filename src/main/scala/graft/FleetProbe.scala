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
  *   dir config:  T[:B[:parallelism]]          e.g. 1000:16:8, 10000:16:8
  *   jdbc config: jdbc:T[:parallelism[:pooled|unpooled]]
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

  private def parse(a: String): Config = a.split(':') match {
    case Array("jdbc", t) => JdbcCfg(t.toInt, 8, pooled = true)
    case Array("jdbc", t, p) => JdbcCfg(t.toInt, p.toInt, pooled = true)
    case Array("jdbc", t, p, mode) => JdbcCfg(t.toInt, p.toInt, mode == "pooled")
    case Array(t) => DirCfg(t.toInt, 1, 8)
    case Array(t, b) => DirCfg(t.toInt, b.toInt, 8)
    case Array(t, b, p) => DirCfg(t.toInt, b.toInt, p.toInt)
    case _ => throw new IllegalArgumentException(
      s"expected T[:B[:par]] or jdbc:T[:par[:pooled|unpooled]], got $a")
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
    }
    spark.stop()
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
