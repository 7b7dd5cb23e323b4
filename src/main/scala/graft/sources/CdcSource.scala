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
}

/** Directory-of-parquet binding ([[Tables.listTables]]/[[Tables.table]]).
  * Parquet carries no constraint metadata, so PKs are the static fixture
  * config ([[Tables.fixturePrimaryKeys]]). */
final case class DirSource(dir: String) extends CdcSource {
  def listTables(): Seq[String] = Tables.listTables(dir)
  def table(spark: SparkSession, name: String): DataFrame = Tables.table(spark, dir, name)
  def primaryKey(name: String): Option[String] = Tables.primaryKey(name)
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
  *                   lowerBound, upperBound, numPartitions). Tables
  *                   without an entry read on one connection — correct,
  *                   and exactly the reference's single-connection shape
  *                   (`controller/controller.py:25-27`); at scale every
  *                   big table should carry an entry so the scan splits
  *                   into bounded per-partition queries. */
final case class JdbcSource(
    url: String,
    user: String = "",
    password: String = "",
    schemaPattern: Option[String] = None,
    partitioning: Map[String, (String, Long, Long, Int)] = Map.empty) extends CdcSource {

  /** `SHOW TABLES` via the portable JDBC metadata surface: base TABLEs
    * only (no views/system tables), one short-lived metadata connection —
    * the reference opens a fresh connection per poll the same way
    * (`utils/mysql_connect.py:5-17`). */
  def listTables(): Seq[String] = {
    val conn =
      if (user.isEmpty) java.sql.DriverManager.getConnection(url)
      else java.sql.DriverManager.getConnection(url, user, password)
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
      .getOrElse((None, None, None, 1))
    Tables.normalizeTimestamps(
      Tables.jdbc(spark, url, name, user, password, pc, lo, hi, np))
  }

  /** S3 made LIVE: `DatabaseMetaData.getPrimaryKeys` — the portable form
    * of the reference's `information_schema.KEY_COLUMN_USAGE` query
    * (`utils/util.py:2-18`). Composite keys take the first column by
    * KEY_SEQ (the reference's `fetchone`). Cached per table name: keys
    * are DDL-stable, and the cycle must not pay one metadata connection
    * per table per poll. */
  def primaryKey(name: String): Option[String] = {
    val cached = pkCache.get(name)
    if (cached != null) return cached
    val conn =
      if (user.isEmpty) java.sql.DriverManager.getConnection(url)
      else java.sql.DriverManager.getConnection(url, user, password)
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
}
