package graft

import graft.sources.JdbcConnections
import org.scalatest.funsuite.AnyFunSuite

/** The driver-side connection pool's stale-connection behavior (ADVICE
  * r17): on a client/server engine, idle sessions die server-side (MySQL
  * `wait_timeout`, restarts) while the client's `isClosed` stays false —
  * embedded Derby can't produce that state, so these tests register a
  * tiny delegating JDBC driver whose connections can be "killed" from the
  * outside: `isClosed` still false, `isValid` false, every real operation
  * throws. What must hold:
  *  - a warm connection idle past the validation threshold is
  *    liveness-checked on borrow and silently replaced;
  *  - a death the check can't see (threshold not reached — the
  *    validation-skip fast path) surfaces as an operation failure that is
  *    retried ONCE on a fresh connection, so the caller still succeeds;
  *  - a failure on a FRESH connection propagates (a real error is not
  *    staleness). */
class PoolSpec extends AnyFunSuite {

  test("borrow validates idle-past-threshold connections and replaces dead ones") {
    StaleProxyDriver.ensureRegistered()
    val url = s"jdbc:graftstale:memory:poolval_${System.nanoTime()};create=true"
    val pool = new JdbcConnections.Pool(url, "", "", maxIdle = 4,
      validateAfterMillis = 0L) // validate on every borrow
    assert(pool.withConnection(c => probe(c)) == 1)
    assert(pool.openedCount == 1)
    // warm reuse first — the pooled connection is alive and validated
    assert(pool.withConnection(c => probe(c)) == 1)
    assert(pool.openedCount == 1)

    StaleProxyDriver.killAll() // server restart: idle conn dies under us
    // the dead warm connection must be detected at borrow (isValid=false),
    // discarded, and replaced — the caller never sees the failure
    assert(pool.withConnection(c => probe(c)) == 1)
    assert(pool.openedCount == 2, "dead idle connection must be replaced by a fresh open")
    pool.drain()
  }

  test("an operation failing on a POOLED connection retries once on a fresh one; " +
      "a fresh connection's failure propagates") {
    StaleProxyDriver.ensureRegistered()
    val url = s"jdbc:graftstale:memory:poolretry_${System.nanoTime()};create=true"
    // huge threshold: borrow never validates — the death is only visible
    // when the operation itself fails (the race validation can't close)
    val pool = new JdbcConnections.Pool(url, "", "", maxIdle = 4,
      validateAfterMillis = Long.MaxValue / 2000000L)
    assert(pool.withConnection(c => probe(c)) == 1)
    StaleProxyDriver.killAll()
    var runs = 0
    val out = pool.withConnection { c => runs += 1; probe(c) }
    assert(out == 1 && runs == 2,
      s"stale pooled connection must be retried once on a fresh open (ran $runs times)")
    assert(pool.openedCount == 2)

    // idempotent-retry is for POOLED staleness only: an operation that
    // fails on a fresh connection is a real error and must propagate
    var freshRuns = 0
    intercept[java.sql.SQLException] {
      pool.withConnection { _ => freshRuns += 1; throw new java.sql.SQLException("real") }
    }
    assert(freshRuns == 2, "one pooled attempt + one fresh attempt, never more")
    pool.drain()
  }

  private def probe(c: java.sql.Connection): Int = {
    val st = c.createStatement()
    try {
      val rs = st.executeQuery("VALUES 1")
      try { rs.next(); rs.getInt(1) } finally rs.close()
    } finally st.close()
  }
}

/** Delegating JDBC driver for `jdbc:graftstale:<derby-rest>` whose
  * connections can be killed externally: after [[killAll]], previously
  * created connections answer `isClosed` false (the client never learned)
  * but `isValid` false, and every other call throws SQLState 08003 — the
  * observable shape of a server-side session kill. */
object StaleProxyDriver extends java.sql.Driver {
  private val epoch = new java.util.concurrent.atomic.AtomicLong(0L)
  @volatile private var registered = false

  def killAll(): Unit = { epoch.incrementAndGet(); () }

  def ensureRegistered(): Unit = synchronized {
    if (!registered) { java.sql.DriverManager.registerDriver(this); registered = true }
  }

  def acceptsURL(url: String): Boolean = url != null && url.startsWith("jdbc:graftstale:")

  def connect(url: String, info: java.util.Properties): java.sql.Connection = {
    if (!acceptsURL(url)) return null
    val real = java.sql.DriverManager.getConnection(
      "jdbc:derby:" + url.stripPrefix("jdbc:graftstale:"), info)
    val bornAt = epoch.get()
    java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.Connection]),
      (_: AnyRef, m: java.lang.reflect.Method, args: Array[AnyRef]) => {
        val a = if (args == null) Array.empty[AnyRef] else args // zero-arg calls pass null
        val dead = epoch.get() > bornAt
        def delegate(): AnyRef =
          try m.invoke(real, a: _*)
          catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }
        m.getName match {
          case "isClosed" if dead => java.lang.Boolean.FALSE // the lie that defines staleness
          case "isValid" if dead => java.lang.Boolean.FALSE
          case "close" | "toString" | "hashCode" | "equals" => delegate()
          case _ if dead =>
            throw new java.sql.SQLNonTransientConnectionException(
              "connection killed server-side", "08003")
          case _ => delegate()
        }
      }).asInstanceOf[java.sql.Connection]
  }

  def getMajorVersion: Int = 1
  def getMinorVersion: Int = 0
  def getPropertyInfo(url: String, info: java.util.Properties): Array[java.sql.DriverPropertyInfo] =
    Array.empty
  def jdbcCompliant(): Boolean = false
  def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}
