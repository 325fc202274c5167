package graft.sources

import java.net.{InetSocketAddress, Socket, SocketTimeoutException}
import java.nio.charset.StandardCharsets

/** JVM-side scalar twins of the [[graft.ops.Protocol]] Column combinators,
  * for code that runs outside a query plan (socket readers/sinks building
  * and checksumming frames on executors). Kept bit-identical to the
  * Column versions — WireProtocolSpec asserts equality on golden frames.
  */
object WireProtocol {

  /** Generic command checksum (etl_controller.py:387-418): XOR of all
    * bytes, XOR a command-class key, masked to 0x7F.
    */
  def xorChecksum(command: String): Char = {
    var x = 0
    command.foreach(c => x ^= c.toInt)
    val inner =
      if (command.startsWith("{") && command.endsWith("}"))
        command.substring(1, command.length - 1)
      else command
    val nParts = inner.split(",", -1).length
    val key =
      if (inner.startsWith("ABc") && inner.contains(",")) {
        if (nParts >= 4) 0x33 else 0x78
      } else if (inner.startsWith("*")) 0x48
      else if (inner.startsWith("ABM")) 0x3d
      else if (inner.startsWith("ABJ")) 0x47
      else if (inner == "AB?") 0x46
      else if (inner.startsWith("ABs,")) 0x06
      else 0
    ((x ^ key) & 0x7f).toChar
  }

  /** `{bare}` + generic checksum char (the `_send_command` framing). */
  def commandFrame(bare: String): String = {
    val framed = s"{$bare}"
    framed + xorChecksum(framed)
  }

  /** Route-command checksum (etl_controller.py:479-501): digit sum of
    * zero-padded OOO+III, +106, wrap >126 by −95.
    */
  def routeChecksum(out: Int, inp: Int): Char = {
    val s = f"$out%03d$inp%03d"
    val v = 106 + s.map(_ - '0').sum
    (if (v > 126) v - 95 else v).toChar
  }

  /** `{ABs,OOO,III}` + checksum char (output first). */
  def routeFrame(out: Int, inp: Int): String =
    f"{ABs,$out%03d,$inp%03d}" + routeChecksum(out, inp)
}

/** Real TCP transport speaking the reference's wire pattern
  * (etl_controller.py:421-461): one fresh connection per command — connect,
  * send the pre-checksummed frame, read until a `}` appears / the peer
  * closes / the read times out (silence is a legal reply) — then close.
  * Serializable by construction (host/port/timeouts only); safe to ship to
  * executors. There is no persistent connection to leak: every socket is
  * closed in the finally.
  */
class DeviceTransport(
    host: String, port: Int,
    connectTimeoutMs: Int = 2000, readTimeoutMs: Int = 1000)
    extends (String => Option[String]) with Serializable {

  override def apply(frame: String): Option[String] = {
    val sock = new Socket()
    try {
      sock.connect(new InetSocketAddress(host, port), connectTimeoutMs)
      sock.setSoTimeout(readTimeoutMs)
      val out = sock.getOutputStream
      out.write(frame.getBytes(StandardCharsets.US_ASCII))
      out.flush()
      val in = sock.getInputStream
      val buf = new Array[Byte](4096)
      val sb = new StringBuilder
      var done = false
      while (!done) {
        val n = try in.read(buf) catch { case _: SocketTimeoutException => -1 }
        if (n <= 0) done = true
        else {
          var i = 0
          while (i < n) { sb.append((buf(i) & 0x7f).toChar); i += 1 }
          if (sb.indexOf("}") >= 0) done = true
        }
      }
      if (sb.nonEmpty) Some(sb.toString) else None
    } finally sock.close()
  }
}
