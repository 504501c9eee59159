package graft.streaming

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.streaming.StreamingQuery

/** M6: Kubernetes liveness/readiness probes — the deployment surface of
  * the reference (`src/probes/probes.go:14-81`, wired
  * `cmd/injector.go:24-32,52`), on the JDK's built-in HTTP server (no
  * dependency). Reference semantics preserved exactly:
  *
  *  - both checks default to FALSE until the app flips them
  *    (probes.go:22-30): a pod is neither alive nor ready before the
  *    stream is wired up;
  *  - a passing check answers 200 with an empty body, a failing one 500
  *    (probes.go:66-78);
  *  - liveness is a switch the process flips (`Alive`/`Dead`,
  *    probes.go:37-47); readiness delegates to a sink connectivity check
  *    (`recordDatabase.ReadinessCheck` pings ES,
  *    `src/elasticsearch/elasticsearch.go:142-150`) — injectable here so
  *    the offline harness probes a StreamingQuery and a live deployment
  *    probes the ES host.
  *
  * [[Probes.bind]] is the canonical wiring (cmd/injector.go:24-52):
  * liveness flips alive at startup, readiness tracks the streaming query
  * actually running — the Structured-Streaming analogue of "consumer
  * loop up + ES reachable".
  */
final class Probes(port: Int,
    livenessRoute: String = "/healthz",
    readinessRoute: String = "/readiness") {

  @volatile private var livenessCheck: () => Boolean = () => false
  @volatile private var readinessCheck: () => Boolean = () => false
  @volatile private var server: Option[HttpServer] = None

  def setLivenessCheck(fn: () => Boolean): Unit = livenessCheck = fn
  def setReadinessCheck(fn: () => Boolean): Unit = readinessCheck = fn
  def alive(): Unit = livenessCheck = () => true
  def dead(): Unit = livenessCheck = () => false
  def ready(): Unit = readinessCheck = () => true
  def unready(): Unit = readinessCheck = () => false

  /** Start serving; returns the bound port (pass port 0 for ephemeral). */
  def serve(): Int = {
    val s = HttpServer.create(new InetSocketAddress(port), 0)
    def handle(check: () => Boolean)(ex: HttpExchange): Unit = {
      val ok = try check() catch { case _: Exception => false }
      ex.sendResponseHeaders(if (ok) 200 else 500, -1L)
      ex.close()
    }
    s.createContext(livenessRoute, handle(() => livenessCheck()) _)
    s.createContext(readinessRoute, handle(() => readinessCheck()) _)
    s.start()
    server = Some(s)
    s.getAddress.getPort
  }

  def stop(): Unit = { server.foreach(_.stop(0)); server = None }

  /** Port actually bound (ephemeral when constructed with port 0);
    * requires [[serve]] to have been called.
    */
  def boundPort: Int = server.map(_.getAddress.getPort).getOrElse(
    throw new IllegalStateException("probes server not started"))

  /** Canonical wiring: alive once the stream is started, ready while the
    * query is active and healthy (`exception` empty) AND the sink ping
    * (when one is configured) answers — the reference's readiness IS an
    * ES ping (`recordDatabase.ReadinessCheck`,
    * elasticsearch.go:142-150), so a sink outage flips the pod unready
    * even while the query idles healthily between batches.
    */
  def bind(query: StreamingQuery,
      sinkPing: Option[() => Boolean] = None): Unit = {
    alive()
    setReadinessCheck(() => query.isActive && query.exception.isEmpty &&
      sinkPing.forall(p => p()))
  }
}
