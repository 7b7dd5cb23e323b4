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
}

/** Shared JDBC plumbing for the source bindings and the JDBC watermark
  * store — one place for the credential split so pooling or options land
  * everywhere at once. */
private[graft] object JdbcConnections {
  def connect(url: String, user: String, password: String): java.sql.Connection =
    if (user.isEmpty) java.sql.DriverManager.getConnection(url)
    else java.sql.DriverManager.getConnection(url, user, password)
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
  * @param maxAutoPartitions cap on derived stripes per scan */
final case class JdbcSource(
    url: String,
    user: String = "",
    password: String = "",
    schemaPattern: Option[String] = None,
    partitioning: Map[String, (String, Long, Long, Int)] = Map.empty,
    autoPartitionMinRange: Long = 1000000L,
    autoPartitionTargetRows: Long = 250000L,
    maxAutoPartitions: Int = 32) extends CdcSource {

  /** `SHOW TABLES` via the portable JDBC metadata surface: base TABLEs
    * only (no views/system tables), one short-lived metadata connection —
    * the reference opens a fresh connection per poll the same way
    * (`utils/mysql_connect.py:5-17`). */
  def listTables(): Seq[String] = {
    val conn = JdbcConnections.connect(url, user, password)
    try {
      val rs = conn.getMetaData.getTables(null, schemaPattern.orNull, "%", Array("TABLE"))
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (rs.next()) out += rs.getString("TABLE_NAME")
      rs.close()
      out.toSeq.sorted
    } finally conn.close()
  }

  def table(spark: SparkSession, name: String): DataFrame = {
    val (pc, lo, hi, np) = partitioning.get(name)
      .map(p => (Some(p._1), Some(p._2), Some(p._3), p._4))
      .orElse(derivedPartitioning(name)
        .map(p => (Some(p._1), Some(p._2), Some(p._3), p._4)))
      .getOrElse((None, None, None, 1))
    Tables.normalizeTimestamps(
      Tables.jdbc(spark, url, name, user, password, pc, lo, hi, np))
  }

  /** Auto-ranged read spec for a table with no static `partitioning`
    * entry: (pkColumn, min, max, stripes), or None when the table has no
    * numeric PK or its key range is under [[autoPartitionMinRange]]
    * (small tables keep the reference's single-connection shape — a
    * partition setup would cost more than it buys). The probe is one
    * indexed min/max lookup on a short-lived connection, memoized for
    * [[ProbeMemoMillis]]: CDC tables GROW between polls so the spec must
    * refresh each poll, but within ONE cycle the same table is read
    * twice (the measured-width re-scan) and must not pay a second
    * connection — stale-within-a-cycle bounds are harmless because
    * boundedDeltaScan pins the sunk row interval regardless. Range math
    * is BigInt: a hash-keyed BIGINT PK can legally span nearly the whole
    * Long line, where `hi - lo` alone overflows. */
  private[graft] def derivedPartitioning(name: String): Option[(String, Long, Long, Int)] = {
    val now = System.nanoTime()
    val cached = probeMemo.get(name)
    if (cached != null && now - cached._2 < ProbeMemoMillis * 1000000L) return cached._1
    val spec = primaryKey(name).flatMap { pk =>
      val conn = JdbcConnections.connect(url, user, password)
      try {
        // pk and name come from the catalog (stored case), so quoted
        // identifiers resolve; quoting itself is dialect-split (ANSI `"`
        // on Derby/Postgres, backtick on default-mode MySQL) — try both
        val attempts = Seq(
          s"""SELECT MIN("$pk"), MAX("$pk") FROM "$name"""",
          s"SELECT MIN(`$pk`), MAX(`$pk`) FROM `$name`")
        val bounds = attempts.view.map { sql =>
          try {
            val st = conn.createStatement()
            try {
              val rs = st.executeQuery(sql)
              val b =
                if (rs.next()) (rs.getObject(1), rs.getObject(2)) match {
                  case (lo: Number, hi: Number) => Some((lo.longValue(), hi.longValue()))
                  case _ => None // empty table (NULL min/max) or non-numeric PK
                }
                else None
              rs.close()
              Some(b)
            } finally st.close()
          } catch { case _: java.sql.SQLException => None }
        }.collectFirst { case Some(b) => b }.flatten
        bounds.flatMap { case (lo, hi) =>
          val range = BigInt(hi) - BigInt(lo) + 1
          if (range < autoPartitionMinRange) None
          else {
            val stripes = ((range + autoPartitionTargetRows - 1) / autoPartitionTargetRows)
              .min(maxAutoPartitions).toInt
            Some((pk, lo, hi, math.max(2, stripes)))
          }
        }
      } finally conn.close()
    }
    probeMemo.put(name, (spec, now))
    spec
  }
  private val probeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (Option[(String, Long, Long, Int)], Long)]()
  /** Spec memo lifetime — longer than one cycle's two scans of a table,
    * far shorter than any poll cadence. */
  private val ProbeMemoMillis = 30000L

  /** S3 made LIVE: `DatabaseMetaData.getPrimaryKeys` — the portable form
    * of the reference's `information_schema.KEY_COLUMN_USAGE` query
    * (`utils/util.py:2-18`). Composite keys take the first column by
    * KEY_SEQ (the reference's `fetchone`). Cached per table name: keys
    * are DDL-stable, and the cycle must not pay one metadata connection
    * per table per poll. */
  def primaryKey(name: String): Option[String] = {
    val cached = pkCache.get(name)
    if (cached != null) return cached
    val conn = JdbcConnections.connect(url, user, password)
    val pk =
      try {
        val rs = conn.getMetaData.getPrimaryKeys(null, schemaPattern.orNull, name)
        val cols = scala.collection.mutable.ArrayBuffer[(Short, String)]()
        while (rs.next()) cols += rs.getShort("KEY_SEQ") -> rs.getString("COLUMN_NAME")
        rs.close()
        cols.sortBy(_._1).headOption.map(_._2)
      } finally conn.close()
    pkCache.put(name, pk)
    pk
  }
  // values are the Option itself, so "no PK" (None) caches too
  private val pkCache = new java.util.concurrent.ConcurrentHashMap[String, Option[String]]()

  /** One `SELECT MAX(changeCol)` on a short-lived connection — an indexed
    * endpoint lookup when the change column is indexed, and even unindexed
    * a database-side scan beats shipping the rows to a Spark aggregate.
    * Exact by construction (the database computes it).
    *
    * The caller's `changeCol` is resolved against the catalog FIRST
    * (`getColumns`, case-insensitive — callers say "ts", identifier-
    * folding catalogs store "TS"; quoting the caller's casing verbatim
    * would silently never match and leave the fast path dead while still
    * paying the probe). An unknown column answers None — the cycle falls
    * back to its full path, which classifies the table as non-CDC. None
    * likewise on any SQL error. */
  override def changeMax(name: String, changeCol: String): Option[Option[java.sql.Timestamp]] = {
    val conn = JdbcConnections.connect(url, user, password)
    try {
      // resolve the stored column identifier (same surface primaryKey uses)
      val rsCols = conn.getMetaData.getColumns(null, schemaPattern.orNull, name, "%")
      var stored: String = null
      while (rsCols.next() && stored == null) {
        val c = rsCols.getString("COLUMN_NAME")
        if (c.equalsIgnoreCase(changeCol)) stored = c
      }
      rsCols.close()
      if (stored == null) return None
      val attempts = Seq(
        s"""SELECT MAX("$stored") FROM "$name"""",
        s"SELECT MAX(`$stored`) FROM `$name`")
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
    } finally conn.close()
  }
}
