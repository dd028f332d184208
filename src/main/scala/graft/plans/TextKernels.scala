package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the text-pipeline hot path (optimization r17).
  *
  * Every text/LM/dedup lane tokenizes with
  * `regexp_extract_all(lower(text), '[a-z0-9]+', 0)` and hashes tokens
  * with `conv(substring(md5(t), 1, 15), 16, 10)`. Both spellings are
  * semantically tiny but evaluate through heavyweight machinery — a
  * java.util.regex scan with per-match group extraction, and an
  * md5 → 32-char hex string → substring → base-16 parse chain with four
  * transient allocations per TOKEN. At 100 TB the tokenizer IS the
  * ingest inner loop, so both get first-class Catalyst expressions.
  *
  * Result parity is exact, not approximate:
  *
  *  - [[TokensAz09]] consumes the ALREADY-LOWERCASED string (callers
  *    keep their `lower(text)` argument) and emits maximal runs of the
  *    bytes [a-z0-9]. In UTF-8, bytes 0x30–0x39/0x61–0x7A only ever
  *    encode those ASCII characters (continuation bytes are ≥ 0x80,
  *    lead bytes of multi-byte sequences ≥ 0xC2), so a byte-level run
  *    scan produces exactly the match list of the regex `[a-z0-9]+` on
  *    any UTF-8 input — proven by the property test in PlanSpec.
  *  - [[Hash60]] returns the first 15 hex digits of the md5 as a LONG:
  *    the top 60 bits of the digest, i.e. the big-endian first 8 bytes
  *    shifted right by 4 — bit-identical to the conv() spelling, with
  *    zero intermediate strings.
  */
object TextKernels {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  @inline private def isTok(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** Runs of [a-z0-9] bytes — regexp_extract_all(s, '[a-z0-9]+', 0). */
  def toksAz09(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    var cnt = 0
    var i = 0
    while (i < n) { // pass 1: count runs (exact-size output array)
      if (isTok(b(i))) {
        cnt += 1
        i += 1
        while (i < n && isTok(b(i))) i += 1
      } else i += 1
    }
    val out = new Array[Any](cnt)
    var k = 0
    i = 0
    while (i < n) {
      if (isTok(b(i))) {
        val st = i
        i += 1
        while (i < n && isTok(b(i))) i += 1
        out(k) = UTF8String.fromBytes(b, st, i - st)
        k += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }

  /** Top 60 bits of md5(t) — cast(conv(substring(md5(t),1,15),16,10)
    * as bigint). 60 bits always fit positive in a signed long. */
  def hash60(t: UTF8String): Long = {
    val d = md5Local.get()
    d.reset()
    val dig = d.digest(t.getBytes)
    val hi =
      ((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
      ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
      ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
      ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
    hi >>> 4
  }
}

/** `graft_toks(loweredText)` — see [[TextKernels.toksAz09]]. */
case class TokensAz09(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_toks"

  protected override def nullSafeEval(s: Any): Any =
    TextKernels.toksAz09(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.toksAz09($c)")

  override protected def withNewChildInternal(
      newChild: Expression): TokensAz09 = copy(child = newChild)
}

/** `graft_hash60(token)` — see [[TextKernels.hash60]]. */
case class Hash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  protected override def nullSafeEval(t: Any): Any =
    TextKernels.hash60(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.hash60($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Hash60 = copy(child = newChild)
}
