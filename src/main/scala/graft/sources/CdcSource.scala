package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A CDC source catalog: the two capabilities a sync cycle needs from
  * wherever the change data lives — enumerate tables (S2, the reference's
  * `SHOW TABLES`, `service_layer/service.py:11-19`) and load one of them
  * as a timestamp-normalized DataFrame (S4, `SELECT *`, `:55-57`).
  *
  * Two shipped bindings:
  *  - [[DirSource]] — a fixture/lake directory of parquet tables (the
  *    engine's test + bench shape; at scale, "a prefix on the object
  *    store").
  *  - [[JdbcSource]] — a live database (the reference's literal
  *    deployment: poll MySQL on a cadence,
  *    `controller/controller.py:17-35`). Catalog enumeration goes through
  *    JDBC `DatabaseMetaData.getTables` (what `SHOW TABLES` compiles to,
  *    portable across MySQL/Derby/Postgres); per-table reads go through
  *    Spark's JDBC source, so the strict-`>` delta predicate pushes into
  *    the database WHERE clause (JdbcSpec pins it) and large tables split
  *    into bounded per-partition queries instead of the reference's single
  *    unbounded fetchall (`service_layer/service.py:59`).
  *
  * `table` must return a [[Tables.normalizeTimestamps]]-normalized frame:
  * the cycle's watermark arithmetic is monomorphic on TimestampType. */
trait CdcSource {

  /** S2: the syncable table names, sorted. Driver-side metadata work —
    * never a data scan. */
  def listTables(): Seq[String]

  /** S4: one table as a DataFrame on `spark` (the cycle may pass a cloned
    * session — the binding must not capture a session at construction). */
  def table(spark: SparkSession, name: String): DataFrame

  /** S3: the table's primary-key column when the catalog knows one — used
    * as the deterministic chunk order (`utils/util.py:2-18` reads
    * `information_schema.KEY_COLUMN_USAGE`; its result is dead in the
    * reference — here it is load-bearing). None → the caller's orderCol. */
  def primaryKey(name: String): Option[String]

  /** Cheap driver-side MAX of the change column — the fleet quiet-table
    * fast path (VERDICT r15 task 5): a mostly-quiet tick's cost is one
    * count/max Spark job per table (~20-30 ms measured, graft.FleetProbe);
    * a binding that can answer "has this table anything past the
    * watermark?" from metadata lets the cycle skip the job entirely.
    *
    *  - None           — can't tell cheaply; the cycle runs its aggregate.
    *  - Some(None)     — no non-null change values (empty table).
    *  - Some(Some(mx)) — EXACT max of the column's non-null values; the
    *    cycle skips the table when mx <= watermark. Must never
    *    under-report (a skipped table with real deltas would silently
    *    stall) — bindings return None when exactness is not guaranteed.
    *
    * Default None: correctness never depends on this. */
  def changeMax(name: String, changeCol: String): Option[Option[java.sql.Timestamp]] = None

  /** The cycle announces its worker parallelism before a tick (VERDICT
    * r17 task 6): a pooled binding sizes its warm connection set to it,
    * so a par=16 cycle over a default-sized pool no longer re-opens the
    * 8 connections the pool couldn't cache (invisible on embedded Derby,
    * real handshakes on networked MySQL). Advisory — a binding without
    * pooling ignores it. */
  def hintParallelism(n: Int): Unit = ()
}

/** Shared JDBC plumbing for the source bindings and the JDBC watermark
  * store — one place for the credential split so pooling or options land
  * everywhere at once. */
private[graft] object JdbcConnections {
  def connect(url: String, user: String, password: String): java.sql.Connection =
    if (user.isEmpty) java.sql.DriverManager.getConnection(url)
    else java.sql.DriverManager.getConnection(url, user, password)

  /** Tiny driver-side connection pool (VERDICT r16 task 1): the per-tick
    * metadata probes (`changeMax`, `primaryKey`, `derivedPartitioning`)
    * and watermark commits each used to open a fresh connection per call,
    * so a 10k-table JDBC fleet paid ~20k+ handshakes per tick before any
    * data moved — where the reference amortizes ONE connection across its
    * whole cycle (`utils/mysql_connect.py:5-17`). Borrow/return over a
    * lock-free queue; at most `maxIdle` connections are kept warm (the
    * steady state is one per cycle worker thread), `maxIdle = 0` disables
    * reuse entirely (the pre-r17 shape, kept measurable for the
    * BEFORE/AFTER probe). A connection is discarded, never returned, when
    * its use threw — a statement error can leave driver-side session
    * state (aborted transaction, dirty autoCommit) the next borrower
    * must not inherit. `openedCount` counts PHYSICAL opens — the
    * fleet-scaling pin (JdbcCdcSpec: one cycle opens O(workers), not
    * O(2·tables), connections).
    *
    * Stale warm connections are survived, not inherited (ADVICE r17,
    * r18): on a client/server engine the server kills idle sessions
    * (MySQL `wait_timeout`, restarts) while the driver-side `isClosed`
    * stays false — so a connection idle past [[validateAfterMillis]] is
    * liveness-checked (`isValid(1)`) on borrow and discarded when dead.
    * Steady-state ticks (borrow/return within milliseconds) skip the
    * check — no extra roundtrip on the hot path; only the first tick
    * after a quiet period pays one ping per warm connection, exactly
    * when staleness is possible. Belt-and-braces for the race the check
    * can't close (death between validation and use): when the operation
    * fails with an SQLException ON A POOLED connection, it is retried
    * ONCE on a freshly-opened one — callers' operations must be
    * idempotent, and all current ones are (probes are reads; the
    * watermark upsert is a max-merge). A fresh connection's failure
    * propagates: that is a real error, not staleness. */
  final class Pool(url: String, user: String, password: String, maxIdle: Int,
      validateAfterMillis: Long = 30000L)
      extends Serializable {
    @transient private lazy val idle =
      new java.util.concurrent.ConcurrentLinkedQueue[(java.sql.Connection, Long)]()
    @transient private lazy val opened = new java.util.concurrent.atomic.AtomicLong(0L)
    // the cycle's parallelism hint widens the warm set at runtime; an
    // explicit maxIdle=0 (pooling disabled — the measured BEFORE shape)
    // is a caller decision and stays 0
    @volatile private var maxIdleDyn = maxIdle

    def openedCount: Long = opened.get()

    /** Warm at least `n` connections when pooling is on (VERDICT r17
      * task 6 — pool capacity follows the cycle's parallelism; never
      * shrinks below the constructor's floor). */
    def ensureIdleCapacity(n: Int): Unit =
      if (maxIdle > 0 && n > maxIdleDyn) maxIdleDyn = n

    def withConnection[A](f: java.sql.Connection => A): A = {
      val (conn, fromIdle) = borrow()
      try { val r = f(conn); release(conn); r }
      catch {
        case e: Throwable =>
          discard(conn)
          e match {
            case _: java.sql.SQLException if fromIdle => runOnFresh(f)
            case _ => throw e
          }
      }
    }

    private def runOnFresh[A](f: java.sql.Connection => A): A = {
      val conn = open()
      try { val r = f(conn); release(conn); r }
      catch { case e: Throwable => discard(conn); throw e }
    }

    private def borrow(): (java.sql.Connection, Boolean) = {
      val now = System.nanoTime()
      var e = idle.poll()
      while (e != null) {
        val usable =
          try !e._1.isClosed &&
            (now - e._2 < validateAfterMillis * 1000000L || e._1.isValid(1))
          catch { case _: java.sql.SQLException | _: AbstractMethodError => false }
        if (usable) return (e._1, true)
        discard(e._1)
        e = idle.poll()
      }
      (open(), false)
    }
    private def open(): java.sql.Connection = {
      opened.incrementAndGet()
      connect(url, user, password)
    }
    private def release(c: java.sql.Connection): Unit = {
      val keep =
        try maxIdleDyn > 0 && !c.isClosed && idle.size < maxIdleDyn
        catch { case _: java.sql.SQLException => false }
      if (keep) { idle.offer((c, System.nanoTime())); () }
      else discard(c)
    }
    private def discard(c: java.sql.Connection): Unit =
      try c.close() catch { case _: java.sql.SQLException => () }

    /** Drain the warm connections (e.g. before dropping the source). */
    def drain(): Unit = {
      var e = idle.poll()
      while (e != null) { discard(e._1); e = idle.poll() }
    }
  }

  /** Quoted-identifier rendering with the quote character doubled — a
    * catalog-sourced name containing the quote must not break (or worse,
    * rewrite) the statement it is interpolated into (ADVICE r16). */
  def ansiQuoted(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""
  def backtickQuoted(id: String): String = "`" + id.replace("`", "``") + "`"
}

/** Directory-of-parquet binding ([[Tables.listTables]]/[[Tables.table]]).
  * Parquet carries no constraint metadata, so PKs are the static fixture
  * config ([[Tables.fixturePrimaryKeys]]). */
final case class DirSource(dir: String) extends CdcSource {
  def listTables(): Seq[String] = Tables.listTables(dir)
  def table(spark: SparkSession, name: String): DataFrame = Tables.table(spark, dir, name)
  def primaryKey(name: String): Option[String] = Tables.primaryKey(name)
  /** Exact from parquet footer statistics, ~1 ms driver-side, zero jobs;
    * None whenever any file's stats can't be trusted (Tables doc). */
  override def changeMax(name: String, changeCol: String): Option[Option[java.sql.Timestamp]] =
    Tables.parquetTimestampMax(s"$dir/$name.parquet", changeCol)
}

/** Live-database binding over Spark's JDBC source.
  *
  * @param url        JDBC url (use [[Tables.mysqlUrl]] for MySQL — it pins
  *                   the zero-date/TINYINT(1)/UTC connection options the
  *                   reference's pymysql applies client-side)
  * @param user       database user ("" → connect without credentials,
  *                   e.g. embedded Derby)
  * @param password   database password
  * @param schemaPattern optional JDBC schema filter for the catalog walk
  *                   (e.g. Some("APP") on Derby; MySQL exposes the
  *                   database as the catalog and ignores this)
  * @param partitioning per-table parallel-read spec: (partitionColumn,
  *                   lowerBound, upperBound, numPartitions). An explicit
  *                   entry always wins over auto-ranging.
  * @param autoPartitionMinRange tables WITHOUT a static entry get their
  *                   read bounds derived automatically (VERDICT r15 #1):
  *                   when the table has a numeric primary key whose
  *                   min/max span at least this many values, the scan
  *                   splits into ~[[autoPartitionTargetRows]]-value
  *                   stripes (capped at [[maxAutoPartitions]]) instead of
  *                   reading on one connection — the reference's
  *                   unbounded single-fetchall
  *                   (`service_layer/service.py:59`) is no longer the
  *                   default for big tables. The probe is ONE
  *                   `SELECT min(pk), max(pk)` per read — an index
  *                   endpoint lookup, not a scan (COUNT(*) is a full
  *                   index walk on InnoDB, so the stripe decision uses
  *                   the key RANGE — exactly the stride Spark's JDBC
  *                   partitioner divides uniformly anyway). Sparse key
  *                   spaces therefore over-estimate rows per stripe;
  *                   [[maxAutoPartitions]] bounds the harm (each empty
  *                   stripe costs one cheap indexed query). Set to
  *                   Long.MaxValue to disable auto-ranging.
  * @param autoPartitionTargetRows key-range width of one derived stripe
  * @param maxAutoPartitions cap on derived stripes per scan
  * @param autoPartitionChangeCol the CDC change column the TIMESTAMP
  *                   fallback stripes on (VERDICT r16 task 2): a big
  *                   table with a UUID/string PK declines the numeric
  *                   path, but every CDC table has the change column the
  *                   delta already filters on (`change_datetime`,
  *                   `service_layer/service.py:53`) — MIN/MAX of it
  *                   derives time-range stripes instead. Must match the
  *                   cycle's `changeCol` (both default "ts").
  * @param autoPartitionMinTimeRangeMillis engage the timestamp fallback
  *                   only when the change column spans at least this long
  *                   (default 1 day). Time range is a weaker cardinality
  *                   proxy than key range, so the stripe count is the
  *                   fixed [[autoPartitionTimeStripes]], not derived —
  *                   each stripe costs one cheap indexed query, bounding
  *                   the harm of over-striping a small long-lived table.
  * @param autoPartitionTimeStripes stripe count for the timestamp path
  *                   when the dialect offers no cardinality stats
  * @param autoPartitionTargetBytes size of one stripe when the dialect
  *                   exposes cheap TABLE SIZE stats (VERDICT r16 task 7):
  *                   a sparse key space (hash/snowflake ids) makes the
  *                   key-RANGE stripe count a wild over-estimate — up to
  *                   [[maxAutoPartitions]] mostly-empty stripes. Where the
  *                   catalog can answer "how big is this table" for free
  *                   (MySQL `information_schema.TABLES.TABLE_ROWS`; Derby
  *                   `SYSCS_DIAG.SPACE_TABLE` allocated bytes), the stripe
  *                   count is capped at stats/target — fewer, fuller
  *                   stripes. Stats are ESTIMATES, so they size only the
  *                   stripe COUNT, never the read bounds — correctness
  *                   is untouched when they are stale or absent.
  * @param poolMaxIdle warm driver-side metadata/probe connections kept
  *                   between calls (VERDICT r16 task 1); 0 restores the
  *                   connection-per-call shape (the measured BEFORE). */
final case class JdbcSource(
    url: String,
    user: String = "",
    password: String = "",
    schemaPattern: Option[String] = None,
    partitioning: Map[String, (String, Long, Long, Int)] = Map.empty,
    autoPartitionMinRange: Long = 1000000L,
    autoPartitionTargetRows: Long = 250000L,
    maxAutoPartitions: Int = 32,
    autoPartitionChangeCol: String = "ts",
    autoPartitionMinTimeRangeMillis: Long = 86400000L,
    autoPartitionTimeStripes: Int = 8,
    autoPartitionTargetBytes: Long = 64L << 20,
    poolMaxIdle: Int = 8) extends CdcSource {

  import JdbcConnections.{ansiQuoted, backtickQuoted}

  @transient private lazy val pool =
    new JdbcConnections.Pool(url, user, password, poolMaxIdle)

  /** Physical connections this source has opened — the fleet-amortization
    * pin and probe counter (VERDICT r16 task 1). Driver-side probes only:
    * Spark's own partitioned JDBC reads open per-task connections that
    * are not (and cannot be) routed through a driver pool. */
  def connectionsOpened: Long = pool.openedCount

  /** Drop the warm probe connections (e.g. when retiring the source). */
  def closePool(): Unit = pool.drain()

  /** Pool capacity follows the cycle's parallelism (VERDICT r17 task 6);
    * an explicit `poolMaxIdle = 0` stays unpooled. */
  override def hintParallelism(n: Int): Unit = pool.ensureIdleCapacity(n)

  /** `SHOW TABLES` via the portable JDBC metadata surface: base TABLEs
    * only (no views/system tables), on a pooled metadata connection —
    * the reference amortizes one connection per poll the same way
    * (`utils/mysql_connect.py:5-17`). */
  def listTables(): Seq[String] = pool.withConnection { conn =>
    val rs = conn.getMetaData.getTables(null, schemaPattern.orNull, "%", Array("TABLE"))
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (rs.next()) out += rs.getString("TABLE_NAME")
    rs.close()
    out.toSeq.sorted
  }

  def table(spark: SparkSession, name: String): DataFrame = {
    val (pc, lo, hi, np) = partitioning.get(name)
      .map(p => (Some(p._1), Some(p._2.toString), Some(p._3.toString), p._4))
      .orElse(derivedPartitioning(name)
        .map(p => (Some(p._1), Some(p._2), Some(p._3), p._4)))
      .getOrElse((None, None, None, 1))
    Tables.normalizeTimestamps(
      Tables.jdbc(spark, url, name, user, password, pc, lo, hi, np))
  }

  /** Auto-ranged read spec for a table with no static `partitioning`
    * entry: (column, lower, upper, stripes) with bounds rendered as the
    * SQL-literal strings Spark's JDBC partitioner parses, or None when
    * the table declines both derivations (small tables keep the
    * reference's single-connection shape — a partition setup would cost
    * more than it buys).
    *
    * Two derivations, in preference order:
    *  1. numeric PK (r16): stripe the key range into
    *     ~[[autoPartitionTargetRows]]-value stripes when it spans at
    *     least [[autoPartitionMinRange]]. Range math is BigInt: a
    *     hash-keyed BIGINT PK can legally span nearly the whole Long
    *     line, where `hi - lo` alone overflows.
    *  2. change-column time range (r17, VERDICT r16 task 2): when the PK
    *     path declines (string/UUID PK, no PK), stripe on
    *     MIN/MAX([[autoPartitionChangeCol]]) — [[autoPartitionTimeStripes]]
    *     stripes once the span reaches [[autoPartitionMinTimeRangeMillis]].
    *     Spark's JDBC partitioner takes timestamp partition columns
    *     natively; its first/last stripes are open-ended
    *     (`col < b OR col IS NULL` / `col >= b`), so completeness never
    *     depends on the probed bounds being current.
    *
    * The probe is one indexed min/max lookup on a pooled connection,
    * memoized for [[ProbeMemoMillis]]: CDC tables GROW between polls so
    * the spec must refresh each poll, but within ONE cycle the same
    * table is read twice (the measured-width re-scan) and must not pay a
    * second probe — stale-within-a-cycle bounds are harmless because
    * boundedDeltaScan pins the sunk row interval regardless. */
  private[graft] def derivedPartitioning(name: String): Option[(String, String, String, Int)] = {
    val now = System.nanoTime()
    val cached = probeMemo.get(name)
    if (cached != null && now - cached._2 < ProbeMemoMillis * 1000000L) return cached._1
    // The whole derivation is best-effort: ANY SQLException — including a
    // lock timeout on the metadata catalogs under heavy concurrent load
    // (observed on Derby at T=1000, FleetProbe r17) — degrades to None
    // (single-connection read), never fails the table's sync. The failure
    // is NOT memoized: the next poll retries.
    var probeFailed = false
    val spec = try pool.withConnection { conn =>
      val byKey = primaryKeyOn(conn, name).flatMap { pk =>
        minMax(conn, name, pk).flatMap {
          case (lo: Number, hi: Number) =>
            val range = BigInt(hi.longValue()) - BigInt(lo.longValue()) + 1
            if (range < autoPartitionMinRange) None
            else {
              val byRange = ((range + autoPartitionTargetRows - 1) / autoPartitionTargetRows)
                .min(maxAutoPartitions).toInt
              // sparse key space (r17, task 7): cap at what the table's
              // SIZE stats justify — fewer, fuller stripes
              val stripes = statsStripes(conn, name).fold(byRange)(math.min(byRange, _))
              Some((pk, lo.longValue().toString, hi.longValue().toString,
                math.max(2, stripes)))
            }
          case _ => None // non-numeric PK — fall through to the time path
        }
      }
      byKey.orElse {
        resolveColumn(conn, name, autoPartitionChangeCol).flatMap { col =>
          minMax(conn, name, col).flatMap {
            case (lo: java.sql.Timestamp, hi: java.sql.Timestamp)
                if hi.getTime - lo.getTime >= autoPartitionMinTimeRangeMillis =>
              // time span is a weak cardinality proxy: size stats CAP the
              // stripe count when the dialect has them (never raise it)
              val stripes = statsStripes(conn, name)
                .fold(autoPartitionTimeStripes)(math.min(autoPartitionTimeStripes, _))
              Some((col, lo.toString, hi.toString,
                math.max(2, math.min(stripes, maxAutoPartitions))))
            case _ => None // short-lived, empty, or non-timestamp change col
          }
        }
      }
    } catch { case _: java.sql.SQLException => probeFailed = true; None }
    if (!probeFailed) probeMemo.put(name, (spec, now))
    spec
  }
  private val probeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (Option[(String, String, String, Int)], Long)]()
  /** Spec memo lifetime (and negative column-resolution lifetime) —
    * longer than one cycle's two scans of a table, far shorter than any
    * poll cadence. Test-tunable (JdbcCdcSpec pins the ADD-direction
    * re-resolve). */
  private[graft] var ProbeMemoMillis = 30000L

  /** MIN/MAX of a stored column identifier, as the driver's natural
    * objects (Number for numerics, Timestamp for timestamps). Identifiers
    * come from the catalog but are still escaped (quote doubling) —
    * a name containing the quote character must not break, or rewrite,
    * the statement (ADVICE r16). Quoting is dialect-split (ANSI `"` on
    * Derby/Postgres, backtick on default-mode MySQL) — both are tried.
    * None on an empty table (NULL endpoints) or any SQL error. */
  private def minMax(conn: java.sql.Connection, name: String,
      col: String): Option[(AnyRef, AnyRef)] = {
    val attempts = Seq(
      s"SELECT MIN(${ansiQuoted(col)}), MAX(${ansiQuoted(col)}) FROM ${ansiQuoted(name)}",
      s"SELECT MIN(${backtickQuoted(col)}), MAX(${backtickQuoted(col)}) FROM ${backtickQuoted(name)}")
    attempts.view.map { sql =>
      try {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(sql)
          try {
            if (rs.next()) {
              val (lo, hi) = (rs.getObject(1), rs.getObject(2))
              if (lo == null || hi == null) Some(None) // empty table
              else Some(Some((lo.asInstanceOf[AnyRef], hi.asInstanceOf[AnyRef])))
            } else Some(None)
          } finally rs.close()
        } finally st.close()
      } catch { case _: java.sql.SQLException => None } // wrong dialect quote
    }.collectFirst { case Some(b) => b }.flatten
  }

  /** Estimated stripe count from cheap dialect SIZE statistics (VERDICT
    * r16 task 7), or None where the dialect offers none. Two shapes:
    *  - MySQL: `information_schema.TABLES.TABLE_ROWS` (the InnoDB row
    *    estimate — free, no scan) → rows / [[autoPartitionTargetRows]].
    *  - Derby: `SYSCS_DIAG.SPACE_TABLE` allocated bytes (page counts from
    *    the space catalog — free, no scan) →
    *    bytes / [[autoPartitionTargetBytes]].
    * Estimates size the stripe COUNT only — the read bounds always come
    * from the exact min/max probe — so stale stats cost balance, never
    * rows. Memoized via the enclosing [[derivedPartitioning]] memo. */
  private def statsStripes(conn: java.sql.Connection, name: String): Option[Int] = {
    def sq(s: String) = "'" + s.replace("'", "''") + "'"
    def ceilDiv(n: Long, d: Long) = ((n + d - 1) / d).toInt
    def query(sql: String, target: Long): Option[Int] =
      try {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(sql)
          try {
            if (rs.next()) {
              val n = rs.getLong(1)
              if (rs.wasNull() || n <= 0L) None else Some(math.max(1, ceilDiv(n, target)))
            } else None
          } finally rs.close()
        } finally st.close()
      } catch { case _: java.sql.SQLException => None } // not this dialect
    val mysql = query(
      s"SELECT TABLE_ROWS FROM information_schema.TABLES WHERE TABLE_NAME = ${sq(name)} " +
        "AND TABLE_SCHEMA = DATABASE()", autoPartitionTargetRows)
    mysql.orElse {
      val schema = schemaPattern.getOrElse(
        try Option(conn.getSchema).getOrElse("APP")
        catch { case _: java.sql.SQLException | _: AbstractMethodError => "APP" })
      query(
        "SELECT SUM(NUMALLOCATEDPAGES * PAGESIZE) FROM " +
          s"TABLE(SYSCS_DIAG.SPACE_TABLE(${sq(schema)}, ${sq(name)})) t",
        autoPartitionTargetBytes)
    }
  }

  /** S3 made LIVE: `DatabaseMetaData.getPrimaryKeys` — the portable form
    * of the reference's `information_schema.KEY_COLUMN_USAGE` query
    * (`utils/util.py:2-18`). Composite keys take the first column by
    * KEY_SEQ (the reference's `fetchone`). Cached per table name: keys
    * are DDL-stable, and the cycle must not pay one metadata roundtrip
    * per table per poll. */
  def primaryKey(name: String): Option[String] = {
    val cached = pkCache.get(name)
    if (cached != null) return cached
    // a transient metadata failure (catalog lock timeout under load)
    // degrades to the caller's orderCol fallback and is NOT cached —
    // the next poll retries the lookup
    try pool.withConnection(primaryKeyOn(_, name))
    catch { case _: java.sql.SQLException => None }
  }
  private def primaryKeyOn(conn: java.sql.Connection, name: String): Option[String] = {
    val cached = pkCache.get(name)
    if (cached != null) return cached
    val rs = conn.getMetaData.getPrimaryKeys(null, schemaPattern.orNull, name)
    val cols = scala.collection.mutable.ArrayBuffer[(Short, String)]()
    while (rs.next()) cols += rs.getShort("KEY_SEQ") -> rs.getString("COLUMN_NAME")
    rs.close()
    val pk = cols.sortBy(_._1).headOption.map(_._2)
    pkCache.put(name, pk)
    pk
  }
  // values are the Option itself, so "no PK" (None) caches too
  private val pkCache = new java.util.concurrent.ConcurrentHashMap[String, Option[String]]()

  /** The stored identifier of `wanted` in `name`'s catalog entry
    * (case-insensitive — callers say "ts", identifier-folding catalogs
    * store "TS"; quoting the caller's casing verbatim would silently
    * never match). Cached per (table, column): columns are DDL-stable
    * modulo the drift path, and a mostly-quiet fleet must not pay a
    * `getColumns` catalog walk per table per tick (ADVICE r16) — the
    * steady-state probe cost is the single MAX query. A DROP of the
    * change column mid-flight makes the cached-name MAX fail → None →
    * the cycle's full path reads the post-drop schema and classifies
    * the table, so the cache can delay only the fast path, never
    * correctness. A NEGATIVE result ("no such column") expires after
    * [[ProbeMemoMillis]] (ADVICE r17): a table that GAINS the change
    * column after its first probe — ADD-direction drift, or a table
    * created empty then altered — must not stay classified columnless
    * forever, paying the full-scan path every tick; positive results
    * stay cached for the instance's life (a DROP self-heals through the
    * failed-MAX fallback above). */
  private def resolveColumn(conn: java.sql.Connection, name: String,
      wanted: String): Option[String] = {
    val key = (name, wanted.toLowerCase)
    val now = System.nanoTime()
    val cached = colCache.get(key)
    if (cached != null &&
        (cached._1.isDefined || now - cached._2 < ProbeMemoMillis * 1000000L))
      return cached._1
    val rs = conn.getMetaData.getColumns(null, schemaPattern.orNull, name, "%")
    var stored: String = null
    while (rs.next() && stored == null) {
      val c = rs.getString("COLUMN_NAME")
      if (c.equalsIgnoreCase(wanted)) stored = c
    }
    rs.close()
    val resolved = Option(stored)
    colCache.put(key, (resolved, now))
    resolved
  }
  private val colCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (Option[String], Long)]()

  /** One `SELECT MAX(changeCol)` on a pooled connection — an indexed
    * endpoint lookup when the change column is indexed, and even unindexed
    * a database-side scan beats shipping the rows to a Spark aggregate.
    * Exact by construction (the database computes it).
    *
    * The caller's `changeCol` resolves against the catalog first
    * ([[resolveColumn]], cached — steady-state ticks pay only the MAX
    * query, not a metadata walk). An unknown column answers None — the
    * cycle falls back to its full path, which classifies the table as
    * non-CDC. None likewise on any SQL error. */
  override def changeMax(name: String, changeCol: String): Option[Option[java.sql.Timestamp]] =
    // best-effort end to end: a lock timeout inside the METADATA walk
    // (getColumns reads the system catalogs, contended under fleet load —
    // FleetProbe r17 at T=1000 unpooled) must answer unknown exactly like
    // a failed MAX, so the cycle falls back to its full path instead of
    // failing the table on an optimization
    try pool.withConnection { conn =>
      resolveColumn(conn, name, changeCol).flatMap { stored =>
        val attempts = Seq(
          s"SELECT MAX(${ansiQuoted(stored)}) FROM ${ansiQuoted(name)}",
          s"SELECT MAX(${backtickQuoted(stored)}) FROM ${backtickQuoted(name)}")
        attempts.view.map { sql =>
          try {
            val st = conn.createStatement()
            try {
              val rs = st.executeQuery(sql)
              try { rs.next(); Some(Option(rs.getTimestamp(1))) }
              finally rs.close()
            } finally st.close()
          } catch { case _: java.sql.SQLException => None }
        }.collectFirst { case Some(b) => b }
      }
    } catch { case _: java.sql.SQLException => None }
}
