package graft.sinks

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** SCRAM-SHA-256 / SCRAM-SHA-512 (RFC 5802, RFC 7677) over Kafka's
  * SaslHandshake/SaslAuthenticate frames.
  *
  * The reference's librdkafka path advertises `sasl.mechanisms
  * SCRAM-SHA-256` / `SCRAM-SHA-512` (reference CONFIG-KEYS:1966-1990);
  * this is the clean-room challenge-response those options negotiate:
  *
  *   C: client-first  = gs2-header("n,,") n=<user>,r=<cnonce>
  *   S: server-first  = r=<cnonce+snonce>,s=<salt b64>,i=<iterations>
  *   C: client-final  = c=biws,r=<full nonce>,p=<proof b64>
  *   S: server-final  = v=<server signature b64>
  *
  * with SaltedPassword = Hi(password, salt, i) (PBKDF2 with HMAC-H),
  * ClientKey = HMAC(SaltedPassword, "Client Key"), StoredKey =
  * H(ClientKey), proof = ClientKey XOR HMAC(StoredKey, AuthMessage).
  * The broker stores only (salt, i, StoredKey, ServerKey) — it can
  * VERIFY a proof but never recover the password, and the client
  * authenticates the broker back through the `v=` signature.
  */
object Scram {

  /** Mechanism name → (Mac algo, MessageDigest algo). */
  private def algos(mechanism: String): (String, String) =
    mechanism match {
      case "SCRAM-SHA-256" => ("HmacSHA256", "SHA-256")
      case "SCRAM-SHA-512" => ("HmacSHA512", "SHA-512")
      case m => throw new IllegalArgumentException(s"not a SCRAM mech: $m")
    }

  def hmac(mechanism: String, key: Array[Byte],
           data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance(algos(mechanism)._1)
    mac.init(new SecretKeySpec(key, mac.getAlgorithm))
    mac.doFinal(data)
  }

  def hash(mechanism: String, data: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance(algos(mechanism)._2)
      .digest(data)

  /** Hi(str, salt, i) — RFC 5802 §2.2 (PBKDF2 with one block). */
  def hi(mechanism: String, password: Array[Byte], salt: Array[Byte],
         iterations: Int): Array[Byte] = {
    var u = hmac(mechanism, password,
      salt ++ Array[Byte](0, 0, 0, 1))
    val out = u.clone()
    var i = 1
    while (i < iterations) {
      u = hmac(mechanism, password, u)
      var j = 0
      while (j < out.length) { out(j) = (out(j) ^ u(j)).toByte; j += 1 }
      i += 1
    }
    out
  }

  /** What the broker stores per (user, mechanism) — RFC 5802 §3's
    * server-side authentication information. */
  final case class Credential(mechanism: String, salt: Array[Byte],
                              iterations: Int, storedKey: Array[Byte],
                              serverKey: Array[Byte])

  def credential(mechanism: String, password: String, salt: Array[Byte],
                 iterations: Int): Credential = {
    val salted = hi(mechanism, password.getBytes(UTF_8), salt, iterations)
    val clientKey = hmac(mechanism, salted, "Client Key".getBytes(UTF_8))
    val serverKey = hmac(mechanism, salted, "Server Key".getBytes(UTF_8))
    Credential(mechanism, salt, iterations,
      hash(mechanism, clientKey), serverKey)
  }

  /** `,`/`=` escaping for the n= attribute (RFC 5802 §5.1 saslname). */
  def saslName(user: String): String =
    user.replace("=", "=3D").replace(",", "=2C")
  def unSaslName(n: String): String =
    n.replace("=2C", ",").replace("=3D", "=")

  private def b64(b: Array[Byte]): String =
    Base64.getEncoder.encodeToString(b)
  private def unB64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  /** Parse `k=v,k=v` attribute lists (values may contain '='). */
  def attrs(msg: String): Map[Char, String] =
    msg.split(",", -1).iterator.filter(_.length >= 2)
      .filter(_.charAt(1) == '=')
      .map(p => p.charAt(0) -> p.substring(2)).toMap

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) { out(i) = (a(i) ^ b(i)).toByte; i += 1 }
    out
  }

  // ---------------- client side ----------------

  /** Client conversation state between the two SaslAuthenticate
    * round-trips. */
  final class Client(mechanism: String, user: String, password: String,
                     cnonce: String) {
    private val firstBare = s"n=${saslName(user)},r=$cnonce"
    private var serverSig: Array[Byte] = _

    def firstMessage: Array[Byte] = s"n,,$firstBare".getBytes(UTF_8)

    /** Consume server-first, produce client-final. Throws on a nonce
      * that does not extend ours (a MITM splice). */
    def finalMessage(serverFirst: Array[Byte]): Array[Byte] = {
      val sf = new String(serverFirst, UTF_8)
      val a = attrs(sf)
      val nonce = a('r')
      require(nonce.startsWith(cnonce) && nonce.length > cnonce.length,
        "server nonce must extend the client nonce")
      val salt = unB64(a('s'))
      val iter = a('i').toInt
      require(iter >= 1, "non-positive iteration count")
      val salted = hi(mechanism, password.getBytes(UTF_8), salt, iter)
      val clientKey =
        hmac(mechanism, salted, "Client Key".getBytes(UTF_8))
      val storedKey = hash(mechanism, clientKey)
      val withoutProof = s"c=biws,r=$nonce" // biws = b64("n,,")
      val authMessage =
        s"$firstBare,$sf,$withoutProof".getBytes(UTF_8)
      val proof = xor(clientKey, hmac(mechanism, storedKey, authMessage))
      serverSig = hmac(mechanism,
        hmac(mechanism, salted, "Server Key".getBytes(UTF_8)),
        authMessage)
      s"$withoutProof,p=${b64(proof)}".getBytes(UTF_8)
    }

    /** Verify server-final's v= — the broker proved it holds ServerKey
      * (mutual authentication). */
    def verifyServerFinal(serverFinal: Array[Byte]): Boolean = {
      val a = attrs(new String(serverFinal, UTF_8))
      a.get('v').exists(v =>
        java.security.MessageDigest.isEqual(unB64(v), serverSig))
    }
  }

  // ---------------- server side ----------------

  /** Per-connection server conversation. `step` consumes one client
    * message and returns either the reply bytes or an error. */
  final class Server(lookup: String => Option[Credential],
                     snonce: String) {
    private var expectFinal = false
    private var cred: Credential = _
    private var firstBare: String = _
    private var serverFirst: String = _
    private var fullNonce: String = _

    /** Returns Right(reply, authenticatedNow) or Left(error string). */
    def step(msg: Array[Byte]): Either[String, (Array[Byte], Boolean)] =
      try {
        if (!expectFinal) {
          val s = new String(msg, UTF_8)
          // gs2 header: we support no channel binding and no authzid
          if (!s.startsWith("n,,"))
            return Left("channel binding not supported")
          firstBare = s.substring(3)
          val a = attrs(firstBare)
          val user = unSaslName(a('n'))
          val cnonce = a('r')
          if (cnonce.isEmpty) return Left("empty nonce")
          cred = lookup(user).orNull
          if (cred == null) return Left("unknown user")
          fullNonce = cnonce + snonce
          serverFirst =
            s"r=$fullNonce,s=${b64(cred.salt)},i=${cred.iterations}"
          expectFinal = true
          Right((serverFirst.getBytes(UTF_8), false))
        } else {
          val s = new String(msg, UTF_8)
          val a = attrs(s)
          if (!a.get('c').contains("biws"))
            return Left("bad channel binding")
          if (!a.get('r').contains(fullNonce))
            return Left("nonce mismatch")
          val withoutProof = s.substring(0, s.lastIndexOf(",p="))
          val authMessage =
            s"$firstBare,$serverFirst,$withoutProof".getBytes(UTF_8)
          val proof = unB64(a('p'))
          val clientSig =
            hmac(cred.mechanism, cred.storedKey, authMessage)
          val clientKey = xor(proof, clientSig)
          if (!java.security.MessageDigest.isEqual(
              hash(cred.mechanism, clientKey), cred.storedKey))
            return Left("authentication failed")
          val v = b64(hmac(cred.mechanism, cred.serverKey, authMessage))
          Right((s"v=$v".getBytes(UTF_8), true))
        }
      } catch { case e: Exception => Left(s"malformed: ${e.getMessage}") }
  }
}
