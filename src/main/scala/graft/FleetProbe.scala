package graft

import graft.operators.{Cdc, ParquetWatermarkStore}

import java.sql.Timestamp

/** Dev probe (VERDICT r15 task 5): the realistic FLEET TICK, end-to-end.
  *
  * WmProbe measures the watermark store in isolation; this probe runs
  * [[Cdc.syncCycleOutcomesOn]] itself over a T-table catalog where only
  * ~10% of tables have new rows — the steady state of a large CDC fleet
  * polling on a cadence (most tables quiet most ticks). What it isolates:
  *  - the per-table floor a QUIET table still pays (relation setup + ONE
  *    count/max aggregate job per table — the P6 empty-delta probe),
  *  - the active tables' chunk→embed→sink→commit path overlapping on the
  *    table-level thread pool,
  *  - the watermark commit tail at B=1 vs sharded B (per-shard locks).
  *
  * Source tables are written DRIVER-side with parquet-mr (same writer
  * family as the store) — T tiny single-file tables; a Spark write job
  * per table would make generation, not the cycle, the probe's cost.
  *
  * Usage: tools/jvmrun.sh graft.FleetProbe [T[:B[:parallelism]]...]
  * Defaults: 1000:1:8 1000:16:8. Prints one JSON line per config:
  * generation time, tick1 (10% active) wall, tick2 (all-quiet steady
  * state) wall, plus derived per-table floor ms. */
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

  def main(args: Array[String]): Unit = {
    val configs: Seq[(Int, Int, Int)] =
      if (args.nonEmpty) args.toSeq.map { a =>
        a.split(':') match {
          case Array(t) => (t.toInt, 1, 8)
          case Array(t, b) => (t.toInt, b.toInt, 8)
          case Array(t, b, p) => (t.toInt, b.toInt, p.toInt)
          case _ => throw new IllegalArgumentException(s"expected T[:B[:par]], got $a")
        }
      }
      else Seq((1000, 1, 8), (1000, 16, 8))
    val spark = Bench.buildSession()
    spark.sparkContext.setLogLevel("ERROR")
    val base = new Timestamp(1704067200000L) // 2024-01-01, fixed epoch

    configs.foreach { case (t, b, par) =>
      val scratch = java.nio.file.Files.createTempDirectory(s"graft_fleet_${t}_$b").toString
      val (src, state, sink) = (s"$scratch/src", s"$scratch/state", s"$scratch/sink")
      new java.io.File(src).mkdirs()

      // --- generate: T single-file tables, 10 rows each, driver-side
      val tGen0 = System.nanoTime()
      val names = (1 to t).map(k => f"table_$k%06d")
      names.foreach { n =>
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

      println(f"""{"tables":$t,"shards":$b,"parallelism":$par,"gen_ms":$genMs%.0f,"tick1_10pct_active_ms":$tick1Ms%.0f,"tick2_quiet_ms":$tick2Ms%.0f,"quiet_floor_ms_per_table":${tick2Ms / t}%.2f}""")
    }
    spark.stop()
  }
}
