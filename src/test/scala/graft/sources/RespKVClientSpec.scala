package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import graft.SparkTestBase

/** A minimal in-process RESP2 server (SET/GET/AUTH over a HashMap) — the
  * wire-level test double for [[RespKVClient]]: the client is exercised
  * over a real socket with real RESP framing, including the distributed
  * sink path where every partition opens its own connection.
  */
object FakeRespServer {

  class Handle(server: ServerSocket, val store: ConcurrentHashMap[String, String])
      extends AutoCloseable {
    def port: Int = server.getLocalPort
    override def close(): Unit = server.close()
  }

  def start(requiredPassword: Option[String] = None): Handle = {
    val server = new ServerSocket(0)
    val store = new ConcurrentHashMap[String, String]()
    val acceptor = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        new Thread(() => serve(sock, store, requiredPassword)).start()
      } catch { case _: Throwable => () } // server closed
    })
    acceptor.setDaemon(true)
    acceptor.start()
    new Handle(server, store)
  }

  private def serve(sock: Socket, store: ConcurrentHashMap[String, String],
      requiredPassword: Option[String]): Unit = {
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    def readLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != '\r' && c >= 0) { sb.append(c.toChar); c = in.read() }
      in.read() // \n
      sb.toString
    }
    def reply(s: String): Unit = { out.write(s.getBytes(UTF_8)); out.flush() }
    try while (true) {
      val head = readLine()
      if (head.isEmpty || head.charAt(0) != '*') return
      val n = head.substring(1).toInt
      val parts = (1 to n).map { _ =>
        val len = readLine().substring(1).toInt
        val buf = new Array[Byte](len)
        var off = 0
        while (off < len) {
          val r = in.read(buf, off, len - off)
          if (r < 0) return
          off += r
        }
        in.read(); in.read() // trailing \r\n
        new String(buf, UTF_8)
      }
      parts.head.toUpperCase match {
        case "SET" => store.put(parts(1), parts(2)); reply("+OK\r\n")
        case "GET" => Option(store.get(parts(1))) match {
          case Some(v) =>
            val b = v.getBytes(UTF_8)
            reply(s"$$${b.length}\r\n"); out.write(b); reply("\r\n")
          case None => reply("$-1\r\n")
        }
        case "AUTH" =>
          if (requiredPassword.forall(_ == parts(1))) reply("+OK\r\n")
          else reply("-ERR invalid password\r\n")
        case other => reply(s"-ERR unknown command '$other'\r\n")
      }
    } catch { case _: Throwable => () } finally sock.close()
  }
}

class RespKVClientSpec extends SparkTestBase {
  import spark.implicits._

  test("SET/GET round trip; missing key is None; values are UTF-8 safe") {
    val srv = FakeRespServer.start()
    try {
      val client = new RespKVClient("127.0.0.1", srv.port)
      try {
        client.set("features:u1", """{"day":"2024-01-01"}""")
        client.get("features:u1") shouldBe Some("""{"day":"2024-01-01"}""")
        client.get("features:nobody") shouldBe None
        // multi-byte payload: bulk framing is byte-length based
        client.set("k", "héllo 日本語 🎉")
        client.get("k") shouldBe Some("héllo 日本語 🎉")
        // embedded CR/LF must survive (bulk strings are binary-safe)
        client.set("crlf", "a\r\nb")
        client.get("crlf") shouldBe Some("a\r\nb")
      } finally client.close()
    } finally srv.close()
  }

  test("AUTH is sent on connect; a rejected password fails loudly at construction") {
    val srv = FakeRespServer.start(requiredPassword = Some("hunter2"))
    try {
      val client = new RespKVClient("127.0.0.1", srv.port, password = Some("hunter2"))
      try {
        client.set("k", "v")
        client.get("k") shouldBe Some("v")
      } finally client.close()
      // wrong password: constructor must raise with the server's message,
      // never connect un-authed and fail later with a confusing NOAUTH
      val ex = the[java.io.IOException] thrownBy
        new RespKVClient("127.0.0.1", srv.port, password = Some("wrong"))
      ex.getMessage should include("AUTH failed")
    } finally srv.close()
  }

  test("distributed KVSink writes through per-partition RESP connections") {
    val srv = FakeRespServer.start()
    try {
      val port = srv.port // capture a primitive, not the Handle, in the closure
      val rows = (1 to 50).map(i => (s"features:u$i", s"""{"n":"$i"}"""))
        .toDF("key", "value").repartition(8)
      KVSink.write(rows, () => new RespKVClient("127.0.0.1", port))
      srv.store.size() shouldBe 50
      srv.store.get("features:u17") shouldBe """{"n":"17"}"""
      // and the serving decode reads it back through the same client (the
      // bench payload lacks the daily-snapshot fields, so they decode None)
      val probe = new RespKVClient("127.0.0.1", port)
      try {
        val got = graft.serving.FeatureLookup.online(probe, "u17").get
        got.user_id shouldBe "u17"
        got.event_count_7d shouldBe None
      } finally probe.close()
    } finally srv.close()
  }

  test("kvSpecFrom honors the reference CLI's --redis-host/--redis-port flags") {
    graft.App.kvSpecFrom(Map("redis-host" -> "h")) shouldBe "redis:h:6379"
    graft.App.kvSpecFrom(Map("redis-host" -> "h", "redis-port" -> "7000")) shouldBe "redis:h:7000"
    graft.App.kvSpecFrom(Map("redis-host" -> "h", "redis-password" -> "pw")) shouldBe "redis:h:6379:pw"
    graft.App.kvSpecFrom(Map("kv" -> "redis:x:1")) shouldBe "redis:x:1"
    graft.App.kvSpecFrom(Map.empty) shouldBe "memory"
    // orphaned redis-* flags must not silently fall back to the in-JVM
    // store, and a conflicting --kv + --redis-host pair must abort
    an[IllegalArgumentException] should be thrownBy
      graft.App.kvSpecFrom(Map("redis-port" -> "6380"))
    an[IllegalArgumentException] should be thrownBy
      graft.App.kvSpecFrom(Map("kv" -> "memory", "redis-host" -> "h"))
  }

  test("kvFactory parses memory and redis specs, rejects malformed") {
    graft.App.kvFactory("memory")() shouldBe InMemoryKVStore
    val srv = FakeRespServer.start()
    try {
      val c = graft.App.kvFactory(s"redis:127.0.0.1:${srv.port}")()
      try { c.set("k", "v"); c.get("k") shouldBe Some("v") } finally c.close()
    } finally srv.close()
    an[IllegalArgumentException] should be thrownBy graft.App.kvFactory("redis:hostonly")
    // trailing colon (e.g. an empty shell variable) must be a parse error,
    // not a silent connection with no AUTH
    an[IllegalArgumentException] should be thrownBy graft.App.kvFactory("redis:h:6379:")
    an[IllegalArgumentException] should be thrownBy graft.App.kvFactory("dynamo")
  }
}
