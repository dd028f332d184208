package graft.sinks

import java.io.{BufferedInputStream, ByteArrayOutputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable

/** In-process Confluent Schema Registry speaking the REST subset
  * pmacct's Avro path uses (`kafka_avro_schema_registry`,
  * CONFIG-KEYS:1885; the reference links libserdes, whose client runs
  * exactly these calls) — the sandbox stand-in for the env-blocked real
  * registry, in the [[RespMiniServer]]/[[KafkaMiniBroker]] mold:
  *
  *  - `POST /subjects/{subject}/versions` body `{"schema":"..."}` →
  *    `{"id":N}` — the same schema STRING registered twice (any
  *    subject) returns the same global id, the registry's dedupe
  *    contract;
  *  - `GET /schemas/ids/{id}` → `{"schema":"..."}` — the consumer-side
  *    resolution call;
  *  - `GET /subjects/{subject}/versions/latest` →
  *    `{"subject":...,"version":N,"id":N,"schema":"..."}`;
  *  - unknown id/subject → HTTP 404 with the Confluent error body
  *    (`{"error_code":40403,...}`).
  *
  * Plus the Confluent WIRE FORMAT for the framed Kafka message bodies:
  * magic 0x00 + big-endian u32 schema id + Avro binary
  * ([[SchemaRegistryMini.wrap]]/[[SchemaRegistryMini.unwrap]]).
  *
  * HTTP/1.1 subset: Content-Length bodies, connection close per
  * request — the shape libserdes' libcurl calls take. State survives a
  * stop/start cycle like the other minis (registry backends persist in
  * Kafka), so conn-loss lanes can drive down/up.
  */
final class SchemaRegistryMini {

  /** schema string -> global id (dedupe), insertion-ordered. */
  private val ids = mutable.LinkedHashMap[String, Int]()
  /** subject -> ordered version list of schema ids. */
  private val subjects = mutable.LinkedHashMap[String, mutable.Buffer[Int]]()

  private var server: ServerSocket = _
  @volatile private var running = false
  @volatile private var down = false
  private val conns = mutable.Set[Socket]()

  def start(port: Int = 0): Int = synchronized {
    if (server != null && !server.isClosed) { down = false; return server.getLocalPort }
    server = new ServerSocket()
    server.setReuseAddress(true)
    server.bind(new java.net.InetSocketAddress(
      InetAddress.getLoopbackAddress, port), 16)
    running = true
    down = false
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          if (down) sock.close()
          else {
            val t = new Thread(() => serve(sock), "schemareg-conn")
            t.setDaemon(true); t.start()
          }
        } catch { case _: Exception => () }
      }
    }, "schemareg-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()
    server.getLocalPort
  }

  def stop(): Unit = {
    down = true
    conns.synchronized {
      conns.foreach(s => try s.close() catch { case _: Exception => })
      conns.clear()
    }
  }

  def close(): Unit = synchronized {
    stop()
    running = false
    if (server != null) server.close()
  }

  private def serve(sock: Socket): Unit = {
    conns.synchronized { conns += sock }
    try {
      val in = new BufferedInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      // read request head
      val head = new ByteArrayOutputStream()
      var prev4 = 0
      var b = in.read()
      while (b >= 0 && prev4 != 0x0d0a0d0a) {
        head.write(b)
        prev4 = ((prev4 << 8) | b) & 0xffffffff
        b = if (prev4 != 0x0d0a0d0a) in.read() else -1
      }
      val headStr = new String(head.toByteArray, UTF_8)
      val lines = headStr.split("\r\n")
      val Array(method, path, _*) = lines(0).split(" "): @unchecked
      val clen = lines.drop(1).flatMap(_.split(":", 2) match {
        case Array(k, v) if k.equalsIgnoreCase("content-length") =>
          Some(v.trim.toInt)
        case _ => None
      }).headOption.getOrElse(0)
      val body = new Array[Byte](clen)
      var off = 0
      while (off < clen) {
        val n = in.read(body, off, clen - off)
        if (n < 0) throw new java.io.EOFException()
        off += n
      }
      val (status, respBody) = route(method, path,
        new String(body, UTF_8))
      val rb = respBody.getBytes(UTF_8)
      out.write((s"HTTP/1.1 $status\r\n" +
        "Content-Type: application/vnd.schemaregistry.v1+json\r\n" +
        s"Content-Length: ${rb.length}\r\n" +
        "Connection: close\r\n\r\n").getBytes(UTF_8))
      out.write(rb)
      out.flush()
    } catch { case _: Exception => () } finally {
      conns.synchronized { conns -= sock }
      try sock.close() catch { case _: Exception => }
    }
  }

  private def route(method: String, path: String, body: String)
      : (String, String) = synchronized {
    val PostVersions = "/subjects/([^/]+)/versions".r
    val GetById = "/schemas/ids/([0-9]+)".r
    val GetLatest = "/subjects/([^/]+)/versions/latest".r
    (method, path) match {
      case ("POST", PostVersions(subject)) =>
        SchemaRegistryMini.jsonField(body, "schema") match {
          case Some(schema) =>
            val id = ids.getOrElseUpdate(schema, ids.size + 1)
            val vs = subjects.getOrElseUpdate(subject, mutable.Buffer())
            if (!vs.contains(id)) vs += id
            ("200 OK", s"""{"id":$id}""")
          case None =>
            ("422 Unprocessable Entity",
              """{"error_code":42201,"message":"Invalid schema"}""")
        }
      case ("GET", GetById(idStr)) =>
        val id = idStr.toInt
        ids.find(_._2 == id) match {
          case Some((schema, _)) =>
            ("200 OK",
              s"""{"schema":${SchemaRegistryMini.jsonStr(schema)}}""")
          case None =>
            ("404 Not Found",
              """{"error_code":40403,"message":"Schema not found"}""")
        }
      case ("GET", GetLatest(subject)) =>
        subjects.get(subject).filter(_.nonEmpty) match {
          case Some(vs) =>
            val id = vs.last
            val schema = ids.find(_._2 == id).get._1
            ("200 OK",
              s"""{"subject":${SchemaRegistryMini.jsonStr(subject)},""" +
                s""""version":${vs.size},"id":$id,""" +
                s""""schema":${SchemaRegistryMini.jsonStr(schema)}}""")
          case None =>
            ("404 Not Found",
              """{"error_code":40401,"message":"Subject not found"}""")
        }
      case _ =>
        ("404 Not Found",
          """{"error_code":404,"message":"HTTP 404 Not Found"}""")
    }
  }
}

object SchemaRegistryMini {

  // ---- Confluent wire format (magic 0 + u32 schema id + avro body) ---

  def wrap(schemaId: Int, avro: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(5 + avro.length)
    out.put(0.toByte).putInt(schemaId).put(avro)
    out.array()
  }

  /** None on a missing/nonzero magic byte or a short frame. */
  def unwrap(frame: Array[Byte]): Option[(Int, Array[Byte])] =
    if (frame.length < 5 || frame(0) != 0) None
    else Some((java.nio.ByteBuffer.wrap(frame, 1, 4).getInt,
      java.util.Arrays.copyOfRange(frame, 5, frame.length)))

  // ---- minimal JSON string escape/extract (the two shapes the
  //      registry API uses; no JSON library in the dependency set) ----

  def jsonStr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  /** Extract a top-level string field from a JSON object (handles
    * escapes); None if absent or malformed. */
  def jsonField(json: String, field: String): Option[String] = {
    val key = "\"" + field + "\""
    var i = json.indexOf(key)
    if (i < 0) return None
    i += key.length
    while (i < json.length && (json(i) == ' ' || json(i) == ':')) i += 1
    if (i >= json.length || json(i) != '"') return None
    i += 1
    val b = new StringBuilder
    while (i < json.length && json(i) != '"') {
      if (json(i) == '\\' && i + 1 < json.length) {
        json(i + 1) match {
          case '"' => b.append('"'); i += 2
          case '\\' => b.append('\\'); i += 2
          case 'n' => b.append('\n'); i += 2
          case 'r' => b.append('\r'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'u' if i + 5 < json.length =>
            b.append(Integer.parseInt(
              json.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case c => b.append(c); i += 2
        }
      } else { b.append(json(i)); i += 1 }
    }
    if (i >= json.length) None else Some(b.toString)
  }

  // ---- client side (the libserdes calls, over plain sockets) ---------

  private def http(port: Int, request: String): (Int, String) = {
    val sock = new Socket(InetAddress.getLoopbackAddress, port)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      out.write(request.getBytes(UTF_8)); out.flush()
      val in = new BufferedInputStream(sock.getInputStream)
      val buf = new ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      val resp = new String(buf.toByteArray, UTF_8)
      val at = resp.indexOf("\r\n\r\n")
      val status = resp.split(" ", 3)(1).toInt
      (status, if (at < 0) "" else resp.substring(at + 4))
    } finally sock.close()
  }

  /** Register a schema under a subject; returns the global schema id. */
  def register(port: Int, subject: String, schemaJson: String): Int = {
    val body = s"""{"schema":${jsonStr(schemaJson)}}"""
    val (status, resp) = http(port,
      s"POST /subjects/$subject/versions HTTP/1.1\r\n" +
        "Host: localhost\r\n" +
        "Content-Type: application/vnd.schemaregistry.v1+json\r\n" +
        s"Content-Length: ${body.getBytes(UTF_8).length}\r\n\r\n" + body)
    require(status == 200, s"register failed: $status $resp")
    val idRe = """"id"\s*:\s*([0-9]+)""".r
    idRe.findFirstMatchIn(resp).map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"no id in $resp"))
  }

  /** Resolve a schema by global id (consumer side); None on 404. */
  def fetchById(port: Int, id: Int): Option[String] = {
    val (status, resp) = http(port,
      s"GET /schemas/ids/$id HTTP/1.1\r\nHost: localhost\r\n\r\n")
    if (status != 200) None else jsonField(resp, "schema")
  }

  /** Latest (version, id, schema) of a subject; None on 404. */
  def latest(port: Int, subject: String): Option[(Int, Int, String)] = {
    val (status, resp) = http(port,
      s"GET /subjects/$subject/versions/latest HTTP/1.1\r\n" +
        "Host: localhost\r\n\r\n")
    if (status != 200) None
    else {
      val num = (f: String) => (("\"" + f + "\"\\s*:\\s*([0-9]+)").r)
        .findFirstMatchIn(resp).map(_.group(1).toInt)
      for {
        v <- num("version"); id <- num("id")
        s <- jsonField(resp, "schema")
      } yield (v, id, s)
    }
  }
}
