package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.model.{EntityRef, EntityRegistry, Event, EventType, Payload}
import graft.model.Types.Args
import graft.runtime.{Client, EventTransport}
import graft.streaming.EventJson

/** HTTP serving layer over an entity runtime — the reference's FastAPI
  * client re-expressed on the JDK's built-in `com.sun.net.httpserver`
  * (zero added dependencies; the reference maps HTTP routes onto client
  * events the same way, `stateflow/client/fastapi/fastapi.py:25-147`:
  * one endpoint per entity method plus find + ping). Routes:
  *
  * {{{
  *   GET  /ping                        -> {"pong": true}
  *   POST /{entity}/create             body = JSON arg object
  *   GET  /{entity}/{key}/find         -> {"found": bool}
  *   GET  /{entity}/{key}/attr/{a}     -> {"value": ...}
  *   PUT  /{entity}/{key}/attr/{a}     body = {"value": ...}
  *   POST /{entity}/{key}/call/{m}     body = JSON arg object -> {"value": ...}
  *   POST /stateless/{fn}              body = JSON arg object -> {"value": ...}
  * }}}
  *
  * `attr`/`call`/`find` are literal path segments (the reference emits a
  * distinct static route per generated method; with a dynamic registry
  * the discriminator keeps attribute and method namespaces from
  * colliding). Values cross the boundary through [[EventJson]]'s
  * encode/decode — the same wire serde the Kafka bridge uses, so HTTP
  * and Kafka clients observe identical JSON value semantics.
  *
  * Status mapping: unknown entity/method/attr/fn -> 404, malformed JSON
  * -> 400, duplicate create / failed invocation -> 409, anything the
  * runtime rejects otherwise -> 500.
  *
  * The gateway is a protocol ADAPTER, deliberately thin: one
  * synchronized client per gateway (the LocalRuntime transport is
  * single-threaded by contract; the streaming runtime serializes in its
  * own ingress). Throughput characterization belongs to the YCSB
  * driver, not this layer.
  */
final class HttpGateway(
    registry: EntityRegistry,
    transport: EventTransport,
    port: Int = 0) {

  private val client = new Client(registry, transport)
  private val mapper = new ObjectMapper()
  private val lock = new Object
  private var n = 0
  private def eid(): String = lock.synchronized { n += 1; s"http$n" }
  // Concurrency split: request IO + JSON parse/serialize run on the
  // pool (many clients in flight), while every RUNTIME touch is
  // serialized here — the LocalRuntime transport is single-threaded by
  // contract, and the streaming runtime's send() pumps micro-batches
  // which must not interleave. The runtime is the throughput ceiling
  // either way (YCSB characterizes it); the pool removes the previous
  // one-request-at-a-time cap on everything around the runtime call.
  private def sync[A](f: => A): A = lock.synchronized(f)

  private val pool = java.util.concurrent.Executors.newFixedThreadPool(
    math.max(4, Runtime.getRuntime.availableProcessors() / 4),
    (r: Runnable) => {
      val t = new Thread(r, "graft-http")
      t.setDaemon(true)
      t
    })

  // TCP_NODELAY on the server's sockets: without it, Nagle +
  // delayed-ACK adds the classic ~40 ms stall per keep-alive
  // request/response on loopback (measured: p50 44 ms -> sub-ms).
  // The JDK server only exposes this via the system property, read at
  // server creation.
  System.setProperty("sun.net.httpserver.nodelay", "true")

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(pool)

  def start(): Unit = server.start()
  def stop(): Unit = { server.stop(0); pool.shutdown() }
  def boundPort: Int = server.getAddress.getPort

  private def reply(ex: HttpExchange, status: Int, body: ObjectNode): Unit = {
    val bytes = mapper.writeValueAsBytes(body)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def obj(kv: (String, Any)*): ObjectNode = {
    val o = mapper.createObjectNode()
    kv.foreach { case (k, v) => o.set[ObjectNode](k, EventJson.encodeValue(v)) }
    o
  }

  private def err(ex: HttpExchange, status: Int, msg: String): Unit =
    reply(ex, status, obj("error" -> msg))

  private def readArgs(ex: HttpExchange): Args = {
    val raw = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    if (raw.trim.isEmpty) Map.empty
    else EventJson.decodeValue(mapper.readTree(raw)) match {
      case m: Map[_, _] => m.map { case (k, v) => k.toString -> v }
      case other => throw new IllegalArgumentException(s"args must be a JSON object, got $other")
    }
  }

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).toList
    try {
      (method, parts) match {
        case ("GET", List("ping")) =>
          sync(transport.send(Event(eid(), "", "", EventType.Ping, Payload.Empty))) match {
            case Event(_, _, _, EventType.Pong, _) => reply(ex, 200, obj("pong" -> true))
            case other => err(ex, 500, s"unexpected ping reply: $other")
          }

        case ("POST", List("stateless", fn)) =>
          if (!registry.stateless.contains(fn)) err(ex, 404, s"unknown stateless fn: $fn")
          else reply(ex, 200, obj("value" -> sync(client.callStateless(fn, readArgs(ex)))))

        case ("POST", List(entity, "create")) =>
          if (!registry.byName.contains(entity)) err(ex, 404, s"unknown entity: $entity")
          else sync(client.create(entity, readArgs(ex))) match {
            case Right(ref) => reply(ex, 200, obj("entity" -> ref.entity, "key" -> ref.key))
            case Left(msg) => err(ex, 409, msg)
          }

        case ("GET", List(entity, key, "find")) =>
          if (!registry.byName.contains(entity)) err(ex, 404, s"unknown entity: $entity")
          else reply(ex, 200, obj("found" -> sync(client.find(EntityRef(entity, key)))))

        case ("GET", List(entity, key, "attr", attr)) =>
          if (!registry.byName.contains(entity)) err(ex, 404, s"unknown entity: $entity")
          else
            try reply(ex, 200, obj("value" -> sync(client.getAttr(EntityRef(entity, key), attr))))
            catch { case e: NoSuchElementException => err(ex, 404, e.getMessage) }

        case ("PUT", List(entity, key, "attr", attr)) =>
          if (!registry.byName.contains(entity)) err(ex, 404, s"unknown entity: $entity")
          else {
            val v = readArgs(ex).getOrElse("value",
              throw new IllegalArgumentException("body must be {\"value\": ...}"))
            sync(client.setAttr(EntityRef(entity, key), attr, v))
            reply(ex, 200, obj("ok" -> true))
          }

        case ("POST", List(entity, key, "call", m)) =>
          registry.byName.get(entity) match {
            case None => err(ex, 404, s"unknown entity: $entity")
            case Some(et) if !et.methods.contains(m)
                && !graft.flow.FlowRegistry.has(s"$entity.$m") =>
              err(ex, 404, s"unknown method: $entity.$m")
            case Some(_) =>
              try reply(ex, 200, obj("value" -> sync(client.call(EntityRef(entity, key), m, readArgs(ex)))))
              catch { case e: RuntimeException => err(ex, 409, e.getMessage) }
          }

        case _ => err(ex, 404, s"no route: $method ${ex.getRequestURI.getPath}")
      }
    } catch {
      case e: IllegalArgumentException => err(ex, 400, e.getMessage)
      case e: com.fasterxml.jackson.core.JacksonException => err(ex, 400, s"bad JSON: ${e.getMessage}")
      case e: Exception => err(ex, 500, e.toString)
    }
  }
}
