package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Minimal HTTP surface over a running [[Engine]] — the literal analog of
  * the reference's Flask app object (`app.py:5-18`). The reference
  * registers ZERO routes (its only live behaviors are the scheduler thread
  * and the latent query path), so any listening endpoint is already a
  * superset; these four routes expose exactly the engine surfaces the
  * process owns, nothing speculative:
  *
  *  - `GET /health`     — `{"healthy":…,"consecutive_failures":…}` (the
  *    circuit-breaker state the poll loop maintains)
  *  - `GET /stats`      — sink index stats rows (`Engine.indexStats`)
  *  - `GET /watermarks` — per-table CDC watermarks (`Engine.watermarks`)
  *  - `GET /query?q=text[&k=10][&mode=auto|ivf|exact][&nprobe=N]` —
  *    `{"served_by":…,"rows":[…]}`. Routing: `mode=auto` (the default)
  *    serves from the persisted IVF index at the engine's conventional
  *    location when one exists, else an exact namespace scan; `mode=ivf`
  *    demands the index (400 if absent); `mode=exact` pins the exact
  *    scan. An explicit `nprobe` overrides mode and pins the sign-bucket
  *    sink path: `nprobe=0` the exact scan, `nprobe>0` that many
  *    multi-probe sign buckets (`Engine.searchSimilar`). `served_by`
  *    (`ivf` / `exact` / `simb`) makes the route taken — and therefore
  *    the approximation and its freshness — observable to the caller:
  *    the IVF path serves the snapshot of its last refresh, which the
  *    poll loop re-publishes each cycle that lands rows
  *    (`Engine.autoRefreshIvf`), so its staleness is bounded by the poll
  *    cadence.
  *
  * Responses are row objects from `Dataset.toJSON`; every route's row
  * count is bounded by construction (≤ bucket count, ≤ table count, ≤ k),
  * so the collect is driver-safe. Requests serialize on the dispatcher
  * thread (`setExecutor(null)`) — the same single-threaded model as the
  * reference's Flask dev server. The dispatcher runs CONCURRENTLY with
  * the owner's poll loop and takes NO lock: every store it reads
  * (vector-sink manifest, watermark pointer, IVF pointer) publishes by
  * atomic pointer flip with one-behind GC retention, so each request
  * resolves a consistent committed snapshot without blocking — or being
  * blocked by — a concurrent commit (ServeHttpSpec overlaps the two). */
final class ServeHttp(engine: Engine) {

  @volatile private var server: HttpServer = null

  /** Start listening; `port` 0 binds an ephemeral port. Returns the bound
    * port. */
  def start(port: Int): Int = {
    require(server == null, "already started")
    val s = HttpServer.create(new InetSocketAddress(port), 0)
    s.createContext("/health", (ex: HttpExchange) => respond(ex) { _ =>
      s"""{"healthy":${engine.healthy},"consecutive_failures":${engine.consecutiveFailures}}"""
    })
    s.createContext("/stats", (ex: HttpExchange) => respond(ex) { _ =>
      rowsJson(engine.indexStats())
    })
    s.createContext("/watermarks", (ex: HttpExchange) => respond(ex) { _ =>
      rowsJson(engine.watermarks())
    })
    s.createContext("/query", (ex: HttpExchange) => respond(ex) { params =>
      val q = params.getOrElse("q",
        throw new IllegalArgumentException("missing required param: q"))
      val k = params.get("k").map(_.toInt).getOrElse(10)
      val mode = params.getOrElse("mode", "auto")
      val (servedBy, rows) = params.get("nprobe").map(_.toInt) match {
        case Some(nprobe) =>
          (if (nprobe <= 0) "exact" else "simb",
            rowsJson(engine.searchSimilar(q, k, nprobe = nprobe)))
        case None => mode match {
          case "exact" => ("exact", rowsJson(engine.searchSimilar(q, k, nprobe = 0)))
          case "ivf" =>
            if (!engine.hasIvfIndex())
              throw new IllegalArgumentException("mode=ivf but no IVF index exists")
            ("ivf", rowsJson(engine.searchIvf(engine.ivfIndexDir(), q, k)))
          case "auto" =>
            if (engine.hasIvfIndex()) ("ivf", rowsJson(engine.searchIvf(engine.ivfIndexDir(), q, k)))
            else ("exact", rowsJson(engine.searchSimilar(q, k, nprobe = 0)))
          case other => throw new IllegalArgumentException(s"unknown mode: $other")
        }
      }
      s"""{"served_by":"$servedBy","rows":$rows}"""
    })
    s.setExecutor(null)
    s.start()
    server = s
    s.getAddress.getPort
  }

  def stop(): Unit = {
    val s = server
    server = null
    if (s != null) s.stop(0)
  }

  /** JSON array of the result's rows; callers only pass bounded-row
    * relations (scaladoc above). */
  private def rowsJson(df: org.apache.spark.sql.DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")

  private def respond(ex: HttpExchange)(body: Map[String, String] => String): Unit = {
    val (code, json) =
      try (200, body(queryParams(ex)))
      catch {
        case e: IllegalArgumentException => (400, errJson(e))
        case e: Exception => (500, errJson(e))
      }
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  private def errJson(e: Exception): String =
    s"""{"error":${escape(String.valueOf(e.getMessage))}}"""

  private def escape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def queryParams(ex: HttpExchange): Map[String, String] = {
    val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    raw.split('&').filter(_.nonEmpty).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(
          java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8"))
        case Array(k) => Some(java.net.URLDecoder.decode(k, "UTF-8") -> "")
        case _ => None
      }
    }.toMap
  }
}
