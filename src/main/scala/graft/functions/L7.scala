package graft.functions

/** L7 helpers: control-channel parsers that predict spawned data flows
  * (conntrack FTP/RTSP/SIP helpers, `src/conntrack.c`,
  * docs/INTERNALS:360-408) and first-bytes payload classification (the
  * nDPI-shaped signature pass, `src/classifier.c:33`).
  *
  * Each parser extracts the (address, port) expectation a stateful
  * tracker would register so the matching data flow inherits the parent
  * class — q98 runs them inside the pipeline against an oracle.
  */
object L7 {

  private val FtpPasv =
    """227[^(]*\((\d+),(\d+),(\d+),(\d+),(\d+),(\d+)\)""".r.unanchored
  private val RtspPort = """client_port=(\d+)""".r.unanchored
  private val SipAudio = """m=audio\s+(\d+)\s""".r.unanchored

  /** FTP `227 Entering Passive Mode (h1,h2,h3,h4,p1,p2)` → (ip, port)
    * the client will connect to for the data channel. */
  def ftpPassive(text: String): Option[(Long, Int)] = text match {
    case FtpPasv(h1, h2, h3, h4, p1, p2) =>
      Some(((h1.toLong << 24) | (h2.toLong << 16) | (h3.toLong << 8)
        | h4.toLong, p1.toInt * 256 + p2.toInt))
    case _ => None
  }

  /** RTSP SETUP `Transport: ...;client_port=p-p'` → first RTP port. */
  def rtspClientPort(text: String): Option[Int] = text match {
    case RtspPort(p) => Some(p.toInt)
    case _ => None
  }

  /** SIP/SDP `m=audio <port> RTP/AVP ...` → RTP port. */
  def sipAudioPort(text: String): Option[Int] = text match {
    case SipAudio(p) => Some(p.toInt)
    case _ => None
  }

  /** First-bytes signature classification over the payload head: the
    * byte patterns are public protocol preambles. */
  def classifyPayload(head: Array[Byte]): String = {
    def startsWith(s: String): Boolean =
      head.length >= s.length &&
        s.indices.forall(i => head(i) == s.charAt(i).toByte)
    if (startsWith("GET ") || startsWith("POST ") || startsWith("PUT ") ||
      startsWith("HEAD ") || startsWith("HTTP/")) "http"
    else if (head.length >= 3 && (head(0) & 0xff) == 0x16 &&
      (head(1) & 0xff) == 0x03 && (head(2) & 0xff) <= 0x04) "tls"
    else if (startsWith("SSH-")) "ssh"
    else if (startsWith("RTSP/") || startsWith("SETUP ") ||
      startsWith("DESCRIBE ")) "rtsp"
    else if (startsWith("INVITE ") || startsWith("SIP/2.0")) "sip"
    else if (head.length >= 11 && (head(0) & 0xff) == 19 &&
      "BitTorrent".indices.forall(i =>
        head(i + 1) == "BitTorrent".charAt(i).toByte)) "bittorrent"
    else "unknown"
  }
}
