package graft

import graft.operators.{Cdc, ParquetWatermarkStore}

/** One fleet DRIVER in the sharded-fleet measurement
  * ([[FleetProbe]] `shard:T:D` config): warms up with one tick on a
  * throwaway state copy (a real fleet driver is long-lived — cold-JVM
  * JIT/codegen must not masquerade as per-tick cost), waits at a file
  * barrier so every driver's MEASURED tick starts together, then runs
  * the measured tick over its disjoint slice of the table catalog with
  * its own state and sink prefix, printing the tick wall.
  *
  * The slice is a pure function of the table NAME (murmur3 mod D) — no
  * coordinator, stable under catalog growth, and uncorrelated with any
  * activity pattern (an index-modulo slice collided with the probe's
  * every-10th-table-active layout and put ALL active tables in one
  * shard).
  *
  * Usage: java … graft.FleetShard <srcDir> <warmStateDir> <stateDir>
  *          <sinkDir> <barrierFile> <i> <D> <par> */
object FleetShard {

  /** Shard owning a table name: murmur3(name) mod shards, sign-safe. */
  def sliceOf(name: String, shards: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(name), shards)

  /** A disjoint name-hash slice of another source's catalog. Reads
    * delegate — only the table LIST is filtered. */
  final case class SlicedSource(
      inner: graft.sources.CdcSource, idx: Int, of: Int) extends graft.sources.CdcSource {
    def listTables(): Seq[String] =
      inner.listTables().filter(t => sliceOf(t, of) == idx)
    def table(spark: org.apache.spark.sql.SparkSession, name: String) =
      inner.table(spark, name)
    def primaryKey(name: String): Option[String] = inner.primaryKey(name)
    override def changeMax(name: String, changeCol: String) =
      inner.changeMax(name, changeCol)
    override def hintParallelism(n: Int): Unit = inner.hintParallelism(n)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 8,
      "usage: FleetShard <src> <warmState> <state> <sink> <barrier> <i> <D> <par>")
    val Array(src, warmState, state, sink, barrier, iStr, dStr, parStr) = args
    val (i, d, par) = (iStr.toInt, dStr.toInt, parStr.toInt)
    val spark = Bench.buildSession()
    spark.sparkContext.setLogLevel("ERROR")
    val source = SlicedSource(graft.sources.DirSource(src), i, d)

    // warmup: same work, throwaway state+sink — pays JIT/codegen once
    Cdc.syncCycleOutcomesOn(spark, source, ParquetWatermarkStore(warmState),
      s"$sink-warm", parallelism = par)
    println("WARM")
    Console.out.flush()
    val deadline = System.nanoTime() + 600L * 1000000000L
    while (!new java.io.File(barrier).exists() && System.nanoTime() < deadline)
      Thread.sleep(50L)

    val t0 = System.nanoTime()
    val out = Cdc.syncCycleOutcomesOn(spark, source, ParquetWatermarkStore(state),
      sink, parallelism = par)
    val tickMs = (System.nanoTime() - t0) / 1e6
    val synced = out.collect { case (_, Cdc.TableSynced(n)) if n > 0 => n }
    println(s"""{"shard":$i,"tick_ms":${tickMs.toLong},"tables":${out.size},"active":${synced.size}}""")
    spark.stop()
  }
}
