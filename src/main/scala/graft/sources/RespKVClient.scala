package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Dependency-free Redis client: RESP2 over a plain JDK socket.
  *
  * The reference syncs through Jedis (reference: OnlineSyncPipeline.scala:
  * 76-99, build.sbt:11); this offline build can't resolve a driver jar, but
  * SET/GET don't need one — the Redis serialization protocol is a dozen
  * lines of framing. One instance = one connection = one partition of the
  * distributed [[KVSink]] (`() => new RespKVClient(host, port)` is the
  * executor-side factory; the class holds no Spark state and the factory
  * closure serializes as two primitives).
  *
  * Scope: exactly what the sync and serving paths use — `SET`, `GET`,
  * optional `AUTH` — against any RESP2 server. Replies are parsed by type
  * marker: simple string `+`, error `-`, integer `:`, bulk string `$`
  * (including the `$-1` null bulk for a missing key). Anything else (array
  * replies, RESP3 push frames) is outside the client's command surface and
  * raises rather than desyncs.
  */
class RespKVClient(host: String, port: Int, password: Option[String] = None,
    connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 10000) extends KVClient {

  private val socket = new Socket()
  // a failed connect (timeout, refused) or stream setup leaves a socket
  // holding an fd; per-partition factories retried across tasks would leak
  // one per attempt until GC — release it before rethrowing, like the AUTH
  // path below
  private val (out, in) =
    try {
      socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
      socket.setSoTimeout(readTimeoutMs)
      (new BufferedOutputStream(socket.getOutputStream),
        new BufferedInputStream(socket.getInputStream))
    } catch {
      case e: Throwable =>
        // a close() failure must not REPLACE the real connect error in
        // task logs — suppress it, like try-with-resources would
        try socket.close()
        catch { case c: Throwable => e.addSuppressed(c) }
        throw e
    }

  password.foreach { pw =>
    // any AUTH failure — a parsed -ERR OR an exchange that throws (server
    // closed the connection, read timeout) — must release the socket
    try command("AUTH", pw) match {
      case Right(_) => ()
      case Left(err) => throw new IOException(s"redis AUTH failed: $err")
    } catch { case e: Throwable => close(); throw e }
  }

  override def set(key: String, value: String): Unit =
    command("SET", key, value) match {
      case Right(_) => ()
      case Left(err) => throw new IOException(s"redis SET failed: $err")
    }

  override def get(key: String): Option[String] =
    command("GET", key) match {
      case Right(v) => v
      case Left(err) => throw new IOException(s"redis GET failed: $err")
    }

  override def close(): Unit = socket.close()

  /** Send one command as a RESP array of bulk strings; read one reply.
    * Right(payload) on success (None = null bulk), Left(message) on a
    * server `-ERR` reply.
    */
  private def command(parts: String*): Either[String, Option[String]] = {
    val sb = new StringBuilder
    sb.append('*').append(parts.length).append("\r\n")
    val head = sb.toString.getBytes(UTF_8)
    out.write(head)
    parts.foreach { p =>
      val bytes = p.getBytes(UTF_8)
      out.write(s"$$${bytes.length}\r\n".getBytes(UTF_8))
      out.write(bytes)
      out.write('\r'); out.write('\n')
    }
    out.flush()
    readReply()
  }

  private def readReply(): Either[String, Option[String]] = {
    val marker = in.read()
    if (marker < 0) throw new IOException("redis connection closed mid-reply")
    val line = readLine()
    marker.toChar match {
      case '+' => Right(Some(line))
      case ':' => Right(Some(line))
      case '-' => Left(line)
      case '$' =>
        val n = line.toInt
        if (n < 0) Right(None) // null bulk: key absent
        else {
          val buf = new Array[Byte](n)
          var off = 0
          while (off < n) {
            val r = in.read(buf, off, n - off)
            if (r < 0) throw new IOException("redis connection closed mid-bulk")
            off += r
          }
          expectCrLf()
          Right(Some(new String(buf, UTF_8)))
        }
      case other => throw new IOException(s"unsupported RESP reply type '$other'")
    }
  }

  /** Read up to CRLF (exclusive); the payload of a line-framed reply. */
  private def readLine(): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new IOException("redis connection closed mid-line")
      sb.append(c.toChar)
      c = in.read()
    }
    if (in.read() != '\n') throw new IOException("malformed RESP line terminator")
    sb.toString
  }

  private def expectCrLf(): Unit =
    if (in.read() != '\r' || in.read() != '\n')
      throw new IOException("malformed RESP bulk terminator")
}
