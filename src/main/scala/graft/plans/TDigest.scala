package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.{ColumnBridge, ExpectsInputTypesBridge}
import org.apache.spark.sql.types.{DataType, LongType}

/** t-digest quantiles as a native Catalyst `TypedImperativeAggregate` —
  * the CENTROID-based quantile family next to the tree-based
  * [[QDigestAgg]] (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests", 2019; the MERGING-digest variant, which
  * is the shape that rides Spark's partial/final aggregation without
  * per-value state). Where the q-digest needs a bounded integer
  * universe [0, 2^bits), the t-digest is universe-free: centroids are
  * (sum, weight) pairs over the raw values, so any LONG column works
  * with no `bits` sizing decision.
  *
  * Buffering: values append to an unmerged buffer; at 8·δ values the
  * buffer sorts and merge-compresses into the centroid list (amortized
  * O(log) per value). Compression is the k0 scale function — a UNIFORM
  * per-centroid weight cap `ceil(2n/δ)` — which keeps ≥ δ/2 and (the
  * greedy fold) ≤ 2δ+1 centroids; `merge` concatenates centroid lists
  * in mean order and re-compresses (the paper's merging rule), so any
  * shuffle merge tree yields a valid digest of ≤ 2δ+1 centroids.
  *
  * `quantile(q)` walks centroids in mean order accumulating weight to
  * rank ceil(q·n) and returns floor(sum/weight) of the covering
  * centroid — integer floor of the centroid mean, so results are LONG
  * like the inputs. Because merged centroids can overlap in value
  * range, the worst-case rank error of a merging digest is weaker than
  * the single-pass bound; the gate contract this repo holds it to is
  * `6n/δ + 1` ranks (documented slack with StateSpec-fuzzed margin
  * across adversarial merge trees, vs the ~2n/δ typically observed),
  * the same conditional-count gating pattern as q265/q281.
  */
case class TDigestAgg(child: Expression, q: Double, delta: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigestAgg.Digest]
    with ExpectsInputTypesBridge {

  require(delta >= 16, "tdigest needs delta >= 16")
  require(q >= 0.0 && q <= 1.0, "quantile must be in [0, 1]")

  override def expectedInputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): TDigestAgg.Digest =
    new TDigestAgg.Digest(delta)

  override def update(buf: TDigestAgg.Digest,
                      input: InternalRow): TDigestAgg.Digest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TDigestAgg.Digest,
                     b2: TDigestAgg.Digest): TDigestAgg.Digest = {
    b1.mergeIn(b2); b1
  }

  override def eval(buf: TDigestAgg.Digest): Any = buf.quantile(q)

  override def serialize(buf: TDigestAgg.Digest): Array[Byte] =
    buf.serialized

  override def deserialize(bytes: Array[Byte]): TDigestAgg.Digest =
    TDigestAgg.Digest.deserialize(delta, bytes)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "tdigest_quantile"
}

object TDigestAgg {

  /** Mutable merging t-digest: centroid (sum, weight) arrays sorted by
    * mean, plus an unmerged value buffer. Means are compared as exact
    * rationals (sum1·w2 vs sum2·w1 — Math.multiplyHigh-free via
    * BigInt only on the rare overflow path) so ordering never depends
    * on floating-point rounding. */
  final class Digest(delta: Int) {
    private[TDigestAgg] var sums = new Array[Long](0)
    private[TDigestAgg] var weights = new Array[Long](0)
    private[TDigestAgg] var n = 0L
    private val pending = mutable.ArrayBuffer[Long]()

    /** mean(a) < mean(b) as exact rationals. */
    private def meanLt(s1: Long, w1: Long, s2: Long, w2: Long): Boolean =
      try math.multiplyExact(s1, w2) < math.multiplyExact(s2, w1)
      catch { case _: ArithmeticException =>
        BigInt(s1) * w2 < BigInt(s2) * w1 }

    def add(value: Long): Unit = {
      pending += value
      n += 1
      if (pending.size >= 8 * delta) flush()
    }

    /** Fold the pending values + existing centroids into a fresh
      * compressed centroid list (ascending mean, k0 uniform cap). */
    private[TDigestAgg] def flush(): Unit = {
      if (pending.isEmpty) return
      val vs = pending.toArray
      java.util.Arrays.sort(vs)
      pending.clear()
      // merge-walk: singletons from vs, centroids from (sums, weights)
      val outS = mutable.ArrayBuffer[Long]()
      val outW = mutable.ArrayBuffer[Long]()
      val cap = wcap
      var i = 0 // vs cursor
      var j = 0 // centroid cursor
      var curS = 0L
      var curW = 0L
      def push(s: Long, w: Long): Unit = {
        if (curW > 0 && curW + w <= cap) { curS += s; curW += w }
        else {
          if (curW > 0) { outS += curS; outW += curW }
          curS = s; curW = w
        }
      }
      while (i < vs.length || j < sums.length) {
        val takeValue = j >= sums.length || (i < vs.length &&
          !meanLt(sums(j), weights(j), vs(i), 1L))
        if (takeValue) { push(vs(i), 1L); i += 1 }
        else { push(sums(j), weights(j)); j += 1 }
      }
      if (curW > 0) { outS += curS; outW += curW }
      sums = outS.toArray
      weights = outW.toArray
    }

    /** k0 uniform centroid weight cap for the current n. */
    private def wcap: Long = math.max(1L, (2L * n + delta - 1) / delta)

    def mergeIn(other: Digest): Unit = {
      other.flush()
      flush()
      n += other.n
      // concatenate in mean order, then re-compress under the cap of
      // the COMBINED n (the merging-digest rule)
      val ts = mutable.ArrayBuffer[Long]()
      val tw = mutable.ArrayBuffer[Long]()
      var i = 0
      var j = 0
      while (i < sums.length || j < other.sums.length) {
        val takeMine = j >= other.sums.length || (i < sums.length &&
          !meanLt(other.sums(j), other.weights(j), sums(i), weights(i)))
        if (takeMine) { ts += sums(i); tw += weights(i); i += 1 }
        else { ts += other.sums(j); tw += other.weights(j); j += 1 }
      }
      val cap = wcap
      val outS = mutable.ArrayBuffer[Long]()
      val outW = mutable.ArrayBuffer[Long]()
      var curS = 0L
      var curW = 0L
      var k = 0
      while (k < ts.length) {
        if (curW > 0 && curW + tw(k) <= cap) {
          curS += ts(k); curW += tw(k)
        } else {
          if (curW > 0) { outS += curS; outW += curW }
          curS = ts(k); curW = tw(k)
        }
        k += 1
      }
      if (curW > 0) { outS += curS; outW += curW }
      sums = outS.toArray
      weights = outW.toArray
    }

    /** floor-mean of the centroid covering rank ceil(q·n); null on an
      * empty digest. */
    def quantile(q: Double): Any = {
      flush()
      if (n == 0) return null
      val target = math.max(1L, math.ceil(q * n).toLong)
      var cum = 0L
      var i = 0
      while (i < sums.length) {
        cum += weights(i)
        if (cum >= target) return Math.floorDiv(sums(i), weights(i))
        i += 1
      }
      Math.floorDiv(sums(sums.length - 1), weights(weights.length - 1))
    }

    def size: Int = { flush(); sums.length }

    def serialized: Array[Byte] = {
      flush()
      val out = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(out)
      d.writeLong(n)
      d.writeInt(sums.length)
      var i = 0
      while (i < sums.length) {
        d.writeLong(sums(i)); d.writeLong(weights(i)); i += 1
      }
      d.flush()
      out.toByteArray
    }
  }

  object Digest {
    def deserialize(delta: Int, bytes: Array[Byte]): Digest = {
      val d = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val dig = new Digest(delta)
      dig.n = d.readLong()
      val m = d.readInt()
      dig.sums = new Array[Long](m)
      dig.weights = new Array[Long](m)
      (0 until m).foreach { i =>
        dig.sums(i) = d.readLong(); dig.weights(i) = d.readLong()
      }
      dig
    }
  }
}

object TDigest {
  /** `tdigest_quantile(c, q, delta)` aggregate column: the q-th
    * quantile of a LONG column within the documented `6n/δ + 1` rank
    * contract (see [[TDigestAgg]]). */
  def apply(c: Column, q: Double, delta: Int): Column =
    ColumnBridge.column(
      TDigestAgg(ColumnBridge.expression(c), q, delta)
        .toAggregateExpression())
}
