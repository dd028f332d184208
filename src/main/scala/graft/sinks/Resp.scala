package graft.sinks

import java.io.ByteArrayOutputStream
import scala.collection.mutable

/** RESP (REdis Serialization Protocol, v2) codec — the wire under
  * pmacct's Redis health publishing (`src/redis_common.c:171-232`:
  * `SETEX <cluster>+<id>+<resource> <exp> <val>` via hiredis,
  * keepalive `PING` `redis_common.c:227`, keyspace
  * `process+<name>+<type>[+bgp|bmp|telemetry]`
  * `redis_common.c:281-335`, 3 s expiry refreshed every 1 s,
  * `redis_common.h:25-30`). The reference links hiredis; the protocol
  * itself is the public Redis spec: commands are arrays of bulk
  * strings (`*<n>\r\n` then `$<len>\r\n<bytes>\r\n` each), replies are
  * simple strings (`+OK\r\n`), errors (`-ERR ...\r\n`), integers
  * (`:<n>\r\n`), bulk or arrays.
  */
object Resp {
  val DefaultSep = "+"          // PM_REDIS_DEFAULT_SEP
  val DefaultExpTime = 3        // PM_REDIS_DEFAULT_EXP_TIME (secs)

  /** Encode one command (array of bulk strings). */
  def command(args: Seq[String]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = {
      val b = s.getBytes("UTF-8"); out.write(b, 0, b.length)
    }
    w(s"*${args.length}\r\n")
    args.foreach { a =>
      val b = a.getBytes("UTF-8")
      w(s"$$${b.length}\r\n"); out.write(b, 0, b.length); w("\r\n")
    }
    out.toByteArray
  }

  /** Encode a pipeline of commands into one request stream. */
  def pipeline(cmds: Seq[Seq[String]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    cmds.foreach { c => val b = command(c); out.write(b, 0, b.length) }
    out.toByteArray
  }

  /** Decode a request stream back into commands. Inline commands and
    * malformed framing stop the walk (raw socket bytes — never throw).
    */
  def decode(bytes: Array[Byte]): Seq[Seq[String]] = {
    val out = mutable.Buffer[Seq[String]]()
    var off = 0
    def line(from: Int): Option[(String, Int)] = {
      var i = from
      while (i + 1 < bytes.length &&
             !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= bytes.length) None
      else Some((new String(bytes, from, i - from, "UTF-8"), i + 2))
    }
    var bad = false
    while (!bad && off < bytes.length) {
      if (bytes(off) != '*') bad = true
      else line(off + 1) match {
        case Some((nStr, afterN)) =>
          nStr.toIntOption.filter(n => n >= 0 && n <= 1024) match {
            case Some(n) =>
              val args = mutable.Buffer[String]()
              var p = afterN
              var i = 0
              while (!bad && i < n) {
                if (p >= bytes.length || bytes(p) != '$') bad = true
                else line(p + 1) match {
                  case Some((lenStr, afterLen)) =>
                    lenStr.toIntOption.filter(l =>
                      l >= 0 && afterLen + l + 2 <= bytes.length) match {
                      case Some(l)
                          if bytes(afterLen + l) == '\r' &&
                             bytes(afterLen + l + 1) == '\n' =>
                        args += new String(bytes, afterLen, l, "UTF-8")
                        p = afterLen + l + 2
                      case _ => bad = true
                    }
                  case None => bad = true
                }
                i += 1
              }
              if (!bad) { out += args.toSeq; off = p }
            case None => bad = true
          }
        case None => bad = true
      }
    }
    out.toSeq
  }

  /** The health key for a daemon process, exactly as
    * `p_redis_set_int` builds it: `<cluster>+<id>+process+<name>+<type>`
    * plus an optional thread suffix (bgp/bmp/telemetry). */
  def healthKey(clusterName: String, clusterId: Int, name: String,
                tpe: String, thread: String = ""): String = {
    val base =
      s"$clusterName$DefaultSep$clusterId$DefaultSep" +
        s"process$DefaultSep$name$DefaultSep$tpe"
    if (thread.isEmpty) base else s"$base$DefaultSep$thread"
  }

  /** One daemon's health refresh at `tsSec`: SETEX key exp 1. */
  def healthRefresh(clusterName: String, clusterId: Int, name: String,
                    tpe: String, thread: String = "",
                    expTime: Int = DefaultExpTime): Seq[String] =
    Seq("SETEX", healthKey(clusterName, clusterId, name, tpe, thread),
      expTime.toString, "1")

  /** Replay a decoded SETEX/DEL command log (with per-command
    * timestamps) and return the keys still live at `atSec`: a key is
    * live when its last SETEX at t had t + exp > atSec and no later
    * DEL. This is the broker-side state the reference's monitoring
    * consumers read with KEYS (`redis_common.c:195-211`). */
  def liveKeys(log: Seq[(Long, Seq[String])], atSec: Long): Seq[String] = {
    val state = mutable.Map[String, Long]() // key -> expiry instant
    log.sortBy(_._1).foreach { case (ts, cmd) =>
      cmd match {
        case Seq("SETEX", key, exp, _*) =>
          exp.toLongOption.foreach(e => state(key) = ts + e)
        case Seq("SET", key, _*) => state(key) = Long.MaxValue
        case Seq("DEL", key) => state -= key
        case _ => ()
      }
    }
    state.collect { case (k, exp) if exp > atSec => k }.toSeq.sorted
  }
}
