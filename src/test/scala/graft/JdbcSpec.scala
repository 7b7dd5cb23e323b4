package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.{DriverManager, Timestamp}

/** S1 live-JDBC path (`utils/mysql_connect.py:5-17`) against an embedded
  * in-memory Derby database (no network, ships with Spark): partitioned
  * reads split the scan into bounded per-partition queries, and the CDC
  * predicate (S5, `service_layer/service.py:52-54`) is pushed into the
  * database — the engine-side equivalents of the reference's
  * WHERE-in-SQL-string "pushdown" and single unbounded fetchall. */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE events_src (event_id BIGINT NOT NULL, ts TIMESTAMP, payload VARCHAR(64))")
      val ps = conn.prepareStatement("INSERT INTO events_src VALUES (?, ?, ?)")
      (1 to 200).foreach { i =>
        ps.setLong(1, i.toLong)
        ps.setTimestamp(2, Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"))
        ps.setString(3, s"p$i")
        ps.addBatch()
      }
      ps.executeBatch()
      ()
    } finally conn.close()
  }

  test("partitioned JDBC read: bounded per-partition queries, full row parity") {
    seeded
    val df = Tables.jdbc(spark, url, "events_src", user = "", password = "",
      partitionColumn = Some("event_id"),
      lowerBound = Some("1"), upperBound = Some("201"), numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4) // 4 bounded queries, not one fetchall
    assert(df.count() == 200)
    val ids = df.select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.head == 1L && ids.last == 200L && ids.length == 200)
  }

  test("CDC predicate pushes into the database (strict-> delta scan over JDBC)") {
    seeded
    val df = Tables.jdbc(spark, url, "events_src", user = "", password = "")
    val delta = df.where(col("event_id") > 150)
    assert(delta.count() == 50)
    val plan = delta.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("pushedfilters"), s"no pushdown marker in plan:\n$plan")
    assert(plan.contains("greaterthan(event_id,150)"),
      s"strict-> predicate not pushed to the source:\n$plan")
  }

  // --- MySQL dialect quirks (no live MySQL in this container; the
  // mappings are resolved through Spark's PUBLIC dialect registry, i.e.
  // exactly the code path a jdbc:mysql read takes) ------------------------

  test("mysql dialect: TINYINT/unsigned-width catalyst mappings never wrap") {
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types._
    val d = JdbcDialects.get(Tables.mysqlUrl("h", 3306, "db"))
    assert(d.getClass.getName.contains("MySQLDialect"),
      "a jdbc:mysql URL must resolve to the MySQL dialect")
    def md(signed: Boolean) =
      new MetadataBuilder().putBoolean("isSigned", signed).putLong("scale", 0)
    // TINYINT(1) with tinyInt1isBit=false arrives as Types.TINYINT:
    // signed → ByteType (pymysql ints), UNSIGNED → ShortType (0..255
    // can't wrap a signed byte)
    assert(d.getCatalystType(java.sql.Types.TINYINT, "TINYINT", 1, md(true)).contains(ByteType))
    assert(d.getCatalystType(java.sql.Types.TINYINT, "TINYINT UNSIGNED", 3, md(false)).contains(ShortType))
    // SMALLINT UNSIGNED (0..65535) widens to Int
    assert(d.getCatalystType(java.sql.Types.SMALLINT, "SMALLINT UNSIGNED", 5, md(false)).contains(IntegerType))
    // BIGINT (signed and unsigned) and INT UNSIGNED: the dialect returns
    // None, DELEGATING to Spark's generic JDBC mapping, which resolves
    // unsigned INT → LongType and unsigned BIGINT → DECIMAL(20,0) from
    // the same isSigned metadata — full-range 2^64-1 never wraps negative
    assert(d.getCatalystType(java.sql.Types.BIGINT, "BIGINT UNSIGNED", 20, md(false)).isEmpty)
    assert(d.getCatalystType(java.sql.Types.INTEGER, "INT UNSIGNED", 10, md(false)).isEmpty)
  }

  test("mysqlUrl pins zero-date, TINYINT(1), and timezone connection options") {
    val u = Tables.mysqlUrl("db.internal", 3306, "app")
    assert(u.startsWith("jdbc:mysql://db.internal:3306/app?"))
    // zero-dates → NULL (pymysql None): NULLs drop out of the watermark
    // MAX and the strict-> delta predicate instead of erroring the read
    assert(u.contains("zeroDateTimeBehavior=CONVERT_TO_NULL"))
    // TINYINT(1) stays numeric (ByteType), not a JDBC BIT/boolean
    assert(u.contains("tinyInt1isBit=false"))
    // server session pinned to the engine's UTC timestamp normalization
    assert(u.contains("connectionTimeZone=UTC"))
  }

  test("mysql dialect quotes identifiers with backticks (reserved-word tables)") {
    import org.apache.spark.sql.jdbc.JdbcDialects
    val d = JdbcDialects.get("jdbc:mysql://h:3306/db")
    assert(d.quoteIdentifier("order") == "`order`")
  }

  // --- auto-ranged partitioned reads (VERDICT r15 task 1) ------------------

  test("auto-ranged JDBC read: a big unconfigured table splits into derived " +
      "PK stripes; small tables and non-numeric PKs keep one connection") {
    import graft.sources.JdbcSource
    val u2 = "jdbc:derby:memory:graftjdbcauto;create=true"
    val conn = DriverManager.getConnection(u2)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE big_src (id BIGINT NOT NULL PRIMARY KEY, " +
        "ts TIMESTAMP, payload VARCHAR(64))")
      st.executeUpdate("CREATE TABLE small_src (id BIGINT NOT NULL PRIMARY KEY, " +
        "ts TIMESTAMP, payload VARCHAR(64))")
      st.executeUpdate("CREATE TABLE str_pk (name VARCHAR(32) NOT NULL PRIMARY KEY, " +
        "ts TIMESTAMP)")
      val ps = conn.prepareStatement("INSERT INTO big_src VALUES (?, ?, ?)")
      (1 to 1000).foreach { i =>
        ps.setLong(1, i.toLong)
        ps.setTimestamp(2, Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"))
        ps.setString(3, s"p$i"); ps.addBatch()
      }
      ps.executeBatch()
      val ps2 = conn.prepareStatement("INSERT INTO small_src VALUES (?, ?, ?)")
      (1 to 20).foreach { i =>
        ps2.setLong(1, i.toLong)
        ps2.setTimestamp(2, Timestamp.valueOf("2024-01-01 00:01:00"))
        ps2.setString(3, s"s$i"); ps2.addBatch()
      }
      ps2.executeBatch()
      ()
    } finally conn.close()

    // autoPartitionTargetBytes = 1: the size-stats cap (tested separately
    // below) must not shrink this test's key-range-derived stripe counts
    val auto = JdbcSource(u2, schemaPattern = Some("APP"),
      autoPartitionMinRange = 500L, autoPartitionTargetRows = 100L, maxAutoPartitions = 8,
      autoPartitionTargetBytes = 1L)
    // derived spec: PK from live metadata, bounds from one indexed min/max
    assert(auto.derivedPartitioning("BIG_SRC").contains(("ID", "1", "1000", 8)))
    assert(auto.derivedPartitioning("SMALL_SRC").isEmpty, "under-threshold table must not stripe")
    assert(auto.derivedPartitioning("STR_PK").isEmpty,
      "non-numeric PK + empty change column must not stripe")

    // the scan actually plans the derived stripes — not one fetchall
    val big = auto.table(spark, "BIG_SRC")
    assert(big.rdd.getNumPartitions == 8,
      s"expected 8 derived stripes, got ${big.rdd.getNumPartitions}")
    assert(auto.table(spark, "SMALL_SRC").rdd.getNumPartitions == 1)

    // row parity: striped read == single-connection read, including under
    // the pushed strict-> delta predicate
    val single = JdbcSource(u2, schemaPattern = Some("APP"),
      autoPartitionMinRange = Long.MaxValue)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
      df.select("ID", "PAYLOAD").collect()
        .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
    assert(rows(big) == rows(single.table(spark, "BIG_SRC")))
    val wm = Some(Timestamp.valueOf("2024-01-01 00:30:00"))
    assert(rows(graft.operators.Cdc.deltaScan(big, "TS", wm)) ==
      rows(graft.operators.Cdc.deltaScan(single.table(spark, "BIG_SRC"), "TS", wm)))
    // an explicit static entry still wins over auto-ranging
    val explicit = JdbcSource(u2, schemaPattern = Some("APP"),
      partitioning = Map("BIG_SRC" -> (("ID", 1L, 1001L, 3))),
      autoPartitionMinRange = 500L, autoPartitionTargetRows = 100L)
    assert(explicit.table(spark, "BIG_SRC").rdd.getNumPartitions == 3)

    // quiet-probe surface (r16): database-side MAX is exact; the caller's
    // column casing resolves against the folded catalog identifier (the
    // cycle says "ts", Derby stores "TS" — verbatim quoting would leave
    // the fast path silently dead); unknown column answers None so the
    // cycle falls back instead of skipping
    assert(auto.changeMax("BIG_SRC", "ts")
      .contains(Some(Timestamp.valueOf("2024-01-01 00:59:00"))))
    assert(auto.changeMax("BIG_SRC", "TS")
      .contains(Some(Timestamp.valueOf("2024-01-01 00:59:00"))))
    assert(auto.changeMax("BIG_SRC", "no_such_col").isEmpty)

    // a hash-keyed PK legally spans nearly the whole BIGINT line: the
    // range math must not overflow (it would fail the read outright)
    val c2 = DriverManager.getConnection(u2)
    try {
      val st2 = c2.createStatement()
      st2.executeUpdate("CREATE TABLE huge_pk (id BIGINT NOT NULL PRIMARY KEY, ts TIMESTAMP)")
      st2.executeUpdate(s"INSERT INTO huge_pk VALUES (37, TIMESTAMP('2024-01-01 00:00:00'))")
      st2.executeUpdate(s"INSERT INTO huge_pk VALUES (${Long.MaxValue - 1000L}, TIMESTAMP('2024-01-01 00:01:00'))")
      ()
    } finally c2.close()
    val hugeSpec = auto.derivedPartitioning("HUGE_PK")
    assert(hugeSpec.contains(("ID", "37", (Long.MaxValue - 1000L).toString, 8)),
      s"near-Long.MaxValue PK range must stripe at the cap, got $hugeSpec")
  }

  test("timestamp auto-ranging: a string-PK table crossing the time threshold " +
      "stripes on the change column with delta parity (VERDICT r16 task 2)") {
    import graft.sources.JdbcSource
    val u3 = "jdbc:derby:memory:graftjdbctsauto;create=true"
    val conn = DriverManager.getConnection(u3)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE uuid_src (id VARCHAR(36) NOT NULL PRIMARY KEY, " +
        "ts TIMESTAMP, payload VARCHAR(64))")
      val ps = conn.prepareStatement("INSERT INTO uuid_src VALUES (?, ?, ?)")
      // 300 rows across 3 days — past the (test-tightened) time threshold
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      (1 to 300).foreach { i =>
        ps.setString(1, f"row-$i%04d-like-a-uuid")
        ps.setTimestamp(2, new Timestamp(t0 + i * 864000L)) // ~3 days span
        ps.setString(3, s"p$i"); ps.addBatch()
      }
      ps.executeBatch()
      ()
    } finally conn.close()

    val auto = JdbcSource(u3, schemaPattern = Some("APP"),
      autoPartitionMinTimeRangeMillis = 3600000L, autoPartitionTimeStripes = 6,
      autoPartitionTargetBytes = 1L)
    // the PK path declines (VARCHAR), the change-column time path engages
    val spec = auto.derivedPartitioning("UUID_SRC")
    assert(spec.exists(s => s._1 == "TS" && s._4 == 6),
      s"string-PK table must stripe on the change column, got $spec")
    val striped = auto.table(spark, "UUID_SRC")
    assert(striped.rdd.getNumPartitions == 6,
      s"expected 6 time stripes, got ${striped.rdd.getNumPartitions}")

    // delta parity: striped read == single-connection read under the
    // pushed strict-> predicate (completeness cannot depend on bounds)
    val single = JdbcSource(u3, schemaPattern = Some("APP"),
      autoPartitionMinRange = Long.MaxValue,
      autoPartitionMinTimeRangeMillis = Long.MaxValue)
    assert(single.table(spark, "UUID_SRC").rdd.getNumPartitions == 1)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, String, Timestamp)] =
      df.select("ID", "PAYLOAD", "TS").collect()
        .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2))).sortBy(_._1).toSeq
    val wm = Some(new Timestamp(Timestamp.valueOf("2024-01-02 00:00:00").getTime))
    assert(rows(graft.operators.Cdc.deltaScan(striped, "TS", wm)) ==
      rows(graft.operators.Cdc.deltaScan(single.table(spark, "UUID_SRC"), "TS", wm)))
    assert(rows(striped) == rows(single.table(spark, "UUID_SRC")))

    // a short-lived table (span under the threshold) keeps one connection
    val strict = JdbcSource(u3, schemaPattern = Some("APP"),
      autoPartitionMinTimeRangeMillis = 7L * 86400000L)
    assert(strict.derivedPartitioning("UUID_SRC").isEmpty,
      "under-threshold time span must not stripe")
  }

  test("size-stats stripe cap (VERDICT r16 task 7): a sparse key space plans " +
      "fewer, fuller stripes than the key range alone suggests") {
    import graft.sources.JdbcSource
    val u5 = "jdbc:derby:memory:graftjdbcsparse;create=true"
    val conn = DriverManager.getConnection(u5)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE sparse_src (id BIGINT NOT NULL PRIMARY KEY, " +
        "ts TIMESTAMP, payload VARCHAR(64))")
      val ps = conn.prepareStatement("INSERT INTO sparse_src VALUES (?, ?, ?)")
      // 2000 rows scattered over a 10M key range (hash/snowflake-id shape)
      (1 to 2000).foreach { i =>
        ps.setLong(1, i * 5000L)
        ps.setTimestamp(2, Timestamp.valueOf("2024-01-01 00:01:00"))
        ps.setString(3, s"p$i"); ps.addBatch()
      }
      ps.executeBatch()
      ()
    } finally conn.close()

    // key range alone: 10M / 100 ⇒ capped at 8 mostly-empty stripes
    val dense = JdbcSource(u5, schemaPattern = Some("APP"),
      autoPartitionMinRange = 500L, autoPartitionTargetRows = 100L, maxAutoPartitions = 8,
      autoPartitionTargetBytes = 1L) // stats cap neutralized
    assert(dense.derivedPartitioning("SPARSE_SRC").exists(_._4 == 8))

    // with Derby's SPACE_TABLE allocated-bytes stats engaged (~270 KB for
    // 2000 rows), a 135 KB stripe target justifies only ~2 fuller stripes
    val statted = JdbcSource(u5, schemaPattern = Some("APP"),
      autoPartitionMinRange = 500L, autoPartitionTargetRows = 100L, maxAutoPartitions = 8,
      autoPartitionTargetBytes = 135L * 1024L)
    val spec = statted.derivedPartitioning("SPARSE_SRC")
    assert(spec.exists(s => s._4 >= 2 && s._4 < 8),
      s"size stats must shrink the sparse stripe count below the range cap, got $spec")
    // bounds stay the EXACT min/max — stats size only the count
    assert(spec.exists(s => s._2 == "5000" && s._3 == "10000000"))
    // parity: fewer stripes read the same rows
    assert(statted.table(spark, "SPARSE_SRC").count() == 2000L)
  }

  test("probe identifiers with quoting metacharacters are escaped, not broken " +
      "(ADVICE r16)") {
    import graft.sources.JdbcConnections
    assert(JdbcConnections.ansiQuoted("""evil"col""") == "\"evil\"\"col\"")
    assert(JdbcConnections.backtickQuoted("evil`col") == "`evil``col`")
    // end-to-end: a quoted-identifier table is probed correctly (Derby
    // stores the exact case+chars for delimited identifiers)
    val u4 = "jdbc:derby:memory:graftjdbcquote;create=true"
    val conn = DriverManager.getConnection(u4)
    try {
      val st = conn.createStatement()
      st.executeUpdate("""CREATE TABLE "odd""name" (id BIGINT NOT NULL PRIMARY KEY, ts TIMESTAMP)""")
      st.executeUpdate("""INSERT INTO "odd""name" VALUES (1, TIMESTAMP('2024-01-01 00:00:00'))""")
      ()
    } finally conn.close()
    val src = graft.sources.JdbcSource(u4, schemaPattern = Some("APP"))
    assert(src.changeMax("""odd"name""", "ts")
      .contains(Some(Timestamp.valueOf("2024-01-01 00:00:00"))),
      "a quote in a catalog-sourced identifier must not break the probe")
  }
}
