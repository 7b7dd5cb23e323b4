package graft

import graft.operators.{Cdc, JdbcWatermarkStore, ParquetWatermarkStore}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.{DriverManager, Timestamp}

/** [[graft.operators.WatermarkStore]] bindings (VERDICT r15 task 2): the
  * JDBC store keeps watermark state IN a live database the way the
  * reference does (`service_layer/service.py:35-46`, `INSERT … ON
  * DUPLICATE KEY UPDATE` into a `watermark` table in MySQL) — tested
  * against embedded Derby through the same portable transactional-upsert
  * path a `jdbc:mysql` URL takes. The parquet binding must behave
  * identically (it wraps the Cdc store functions CdcSpec already pins). */
class WatermarkStoreSpec extends AnyFunSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def freshStore(dbName: String): JdbcWatermarkStore =
    JdbcWatermarkStore(s"jdbc:derby:memory:$dbName;create=true")

  test("jdbc store: absent -> None; upsert creates the table and the row; " +
      "max-merge never moves a watermark backwards") {
    val store = freshStore("graftwms1")
    assert(store.get("t1").isEmpty)
    assert(store.readAll().isEmpty)
    store.update("t1", ts("2024-01-02 00:00:00"))
    assert(store.get("t1").contains(ts("2024-01-02 00:00:00")))
    // older commit is a no-op (crash-retry replay semantics)
    store.update("t1", ts("2024-01-01 00:00:00"))
    assert(store.get("t1").contains(ts("2024-01-02 00:00:00")))
    // newer commit advances
    store.update("t1", ts("2024-03-01 00:00:00"))
    assert(store.get("t1").contains(ts("2024-03-01 00:00:00")))
    store.update("t2", ts("2024-02-01 00:00:00"))
    assert(store.readAll() == Map(
      "t1" -> ts("2024-03-01 00:00:00"), "t2" -> ts("2024-02-01 00:00:00")))
    // a second binding over the same database sees the committed state
    // (the state survives the store object — it lives in the database)
    assert(JdbcWatermarkStore("jdbc:derby:memory:graftwms1").readAll().size == 2)
  }

  test("jdbc store: concurrent commits all land, same-key races resolve to max " +
      "(database row locks serialize writers ACROSS processes)") {
    val store = freshStore("graftwms2")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      // 24 distinct tables + 8 racing first-commits on one shared key
      val tasks =
        (1 to 24).map { i => () => store.update(s"c$i", ts("2024-02-01 00:00:00")) } ++
        (1 to 8).map { i => () => store.update("shared", ts(f"2024-03-0$i%d 00:00:00")) }
      tasks.map(t => pool.submit(new Runnable { def run(): Unit = t() }))
        .foreach(_.get())
    } finally pool.shutdown()
    val m = store.readAll()
    (1 to 24).foreach(i => assert(m.contains(s"c$i"), s"concurrent commit c$i lost"))
    assert(m("shared") == ts("2024-03-08 00:00:00"), "same-key race must resolve to max")
  }

  test("jdbc store: crash between staged write and commit rolls back — " +
      "pre-crash value stays readable, retry converges") {
    val store = freshStore("graftwms3")
    store.update("t1", ts("2024-01-02 00:00:00"))
    intercept[RuntimeException] {
      store.update("t1", ts("2024-05-01 00:00:00"),
        onBeforeCommit = () => throw new RuntimeException("injected crash pre-commit"))
    }
    assert(store.get("t1").contains(ts("2024-01-02 00:00:00")),
      "uncommitted transaction must roll back")
    // first-commit crash too: nothing half-inserted
    intercept[RuntimeException] {
      store.update("fresh", ts("2024-05-01 00:00:00"),
        onBeforeCommit = () => throw new RuntimeException("injected crash pre-commit"))
    }
    assert(store.get("fresh").isEmpty)
    store.update("t1", ts("2024-05-01 00:00:00"))
    assert(store.get("t1").contains(ts("2024-05-01 00:00:00")))
  }

  test("jdbc store: fractional-second watermarks survive exactly (no rounding — " +
      "a rounded-UP commit would make the next strict-> delta skip rows)") {
    val store = freshStore("graftwms4")
    val frac = Timestamp.valueOf("2024-01-01 00:04:00.700123")
    store.update("t1", frac)
    assert(store.get("t1").contains(frac),
      s"stored ${store.get("t1")} != committed $frac")
    // max-merge still compares at full precision
    store.update("t1", Timestamp.valueOf("2024-01-01 00:04:00.700122"))
    assert(store.get("t1").contains(frac))
    store.update("t1", Timestamp.valueOf("2024-01-01 00:04:00.700124"))
    assert(store.get("t1").contains(Timestamp.valueOf("2024-01-01 00:04:00.700124")))
  }

  test("cross-PROCESS serialization (VERDICT r16 task 5): a second JVM on the " +
      "same embedded store is REFUSED at the database boot lock — and the " +
      "first process's state is untouched by the attempt") {
    // On-disk (memory: databases are per-JVM by construction — a second
    // process would silently get a DIFFERENT empty database, proving
    // nothing). The parent boots the database first and holds it.
    val dbDir = s"${Files.createTempDirectory("graft_wms_xproc")}/db"
    val url = s"jdbc:derby:$dbDir;create=true"
    val store = JdbcWatermarkStore(url)
    store.update("t1", ts("2024-01-02 00:00:00"))

    // second JVM: graft.WmXProc hammers the same URL. Embedded Derby's
    // boot lock refuses the dual boot (XJ040 -> XSDB6) — the database
    // layer itself forbids a second process, which is the embedded
    // topology's cross-process story: there is no second process to
    // race. (The container ships no derbyclient/derbynet, so the TRUE
    // cross-process race needs a client/server engine; WmXProc's DONE
    // path is that ready-made harness — on a server URL the parent
    // asserts max-merge across both processes' commits.)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = "target/scala-2.13/classes:/opt/spark/jars/*"
    val pb = new ProcessBuilder(javaBin, "-cp", cp, "graft.WmXProc",
      s"jdbc:derby:$dbDir", "t1",
      ts("2024-06-01 00:00:00").getTime.toString, "5")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    proc.waitFor()
    val verdict = out.linesIterator.find(l =>
      l.startsWith("DONE:") || l.startsWith("REFUSED:")).getOrElse("")
    assert(verdict.startsWith("REFUSED:"), s"second JVM output:\n$out")
    assert(verdict.contains("XJ040") || verdict.contains("XSDB6"),
      s"expected Derby's dual-boot lock state, got: $verdict")

    // the refused attempt must not have perturbed the booted store; the
    // parent keeps committing through the same pooled connections
    assert(store.get("t1").contains(ts("2024-01-02 00:00:00")))
    store.update("t1", ts("2024-07-01 00:00:00"))
    assert(store.get("t1").contains(ts("2024-07-01 00:00:00")))
  }

  test("parquet binding is behavior-identical (same contract, Cdc store underneath)") {
    val state = Files.createTempDirectory("graft_wms_pq").toString
    val store = ParquetWatermarkStore(state)
    assert(store.get("t1").isEmpty)
    store.update("t1", ts("2024-01-02 00:00:00"))
    store.update("t1", ts("2024-01-01 00:00:00")) // max-merge no-op
    assert(store.get("t1").contains(ts("2024-01-02 00:00:00")))
    assert(store.readAll() == Map("t1" -> ts("2024-01-02 00:00:00")))
    // and it IS the Cdc store: the raw functions agree
    assert(Cdc.readWatermarkMap(state) == store.readAll())
  }
}
