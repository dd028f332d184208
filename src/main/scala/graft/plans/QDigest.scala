package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.{ColumnBridge, ExpectsInputTypesBridge}
import org.apache.spark.sql.types.{DataType, LongType}

/** Q-digest quantiles as a native Catalyst `TypedImperativeAggregate` —
  * the in-repo replacement for `percentile_approx` in the sketch
  * family (bloom q61, HLL q90, CMS q263, Misra–Gries q278): a
  * DETERMINISTIC mergeable summary over the bounded integer universe
  * [0, 2^bits) (Shrivastava, Buragohain, Agrawal, Suri: "Medians and
  * Beyond", SenSys 2004). Where KLL/t-digest lean on randomness or
  * heuristic centroid bounds, the q-digest's guarantee is worst-case
  * and survives ANY merge tree: a rank query errs by at most
  * `bits/k · n` — exactly the partial/final aggregation shape Spark
  * runs at 100 TB, with O(k·bits) state per group instead of a
  * value-cardinality shuffle.
  *
  * Structure: sparse counts over the implicit complete binary tree in
  * heap numbering (root 1, node x → children 2x/2x+1, leaves
  * 2^bits..2^(bits+1)-1). COMPRESS walks bottom-up folding any family
  * whose combined count fits under floor(n/k) into the parent — each
  * fold smears at most floor(n/k) ranks one level up, and a value's
  * count can smear at most once per level, giving the bits/k·n bound.
  * MERGE is nodewise count addition + compress (the paper's merge).
  * Values clamp into the universe; pick `bits` to cover the domain.
  *
  * The rank query walks nodes ordered by (hi, lo) of their value
  * ranges — the paper's post-order — accumulating counts until the
  * target rank, reporting the node's high endpoint.
  */
case class QDigestAgg(child: Expression, q: Double, k: Int,
                      bits: Int = 20,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QDigestAgg.Digest]
    with ExpectsInputTypesBridge {

  require(k >= 8, "qdigest needs k >= 8")
  require(q >= 0.0 && q <= 1.0, "quantile must be in [0, 1]")
  require(bits >= 1 && bits <= 40, "universe bits must be in [1, 40]")

  override def expectedInputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): QDigestAgg.Digest =
    new QDigestAgg.Digest(k, bits)

  override def update(buf: QDigestAgg.Digest,
                      input: InternalRow): QDigestAgg.Digest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: QDigestAgg.Digest,
                     b2: QDigestAgg.Digest): QDigestAgg.Digest = {
    b1.mergeIn(b2); b1
  }

  override def eval(buf: QDigestAgg.Digest): Any = buf.quantile(q)

  override def serialize(buf: QDigestAgg.Digest): Array[Byte] =
    buf.serialized

  override def deserialize(bytes: Array[Byte]): QDigestAgg.Digest =
    QDigestAgg.Digest.deserialize(k, bits, bytes)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "qdigest_quantile"
}

object QDigestAgg {

  /** Mutable q-digest state: sparse node counts + total. */
  final class Digest(k: Int, bits: Int) {
    private[QDigestAgg] val counts = mutable.HashMap[Long, Long]()
    private[QDigestAgg] var n = 0L
    private val leafBase = 1L << bits
    private val maxValue = (1L << bits) - 1

    def add(value: Long): Unit = {
      val v = math.min(math.max(value, 0L), maxValue)
      val id = leafBase + v
      counts(id) = counts.getOrElse(id, 0L) + 1L
      n += 1
      // amortized cap: compress when the sparse map outgrows the
      // digest's size budget (3k is the paper's post-compress bound)
      if (counts.size > 6 * k) compress()
    }

    def mergeIn(other: Digest): Unit = {
      other.counts.foreach { case (id, c) =>
        counts(id) = counts.getOrElse(id, 0L) + c
      }
      n += other.n
      compress()
    }

    /** Fold every family whose combined count fits under floor(n/k)
      * into its parent, bottom-up (the q-digest property). */
    def compress(): Unit = {
      val budget = n / k
      if (budget <= 0) return
      var level = bits
      while (level >= 1) {
        val lo = 1L << level
        val hi = lo << 1
        val ids = counts.keysIterator
          .filter(id => id >= lo && id < hi).toArray
        java.util.Arrays.sort(ids)
        var i = 0
        while (i < ids.length) {
          val id = ids(i)
          if (counts.contains(id)) {
            val sib = id ^ 1L
            val parent = id >>> 1
            val fam = counts.getOrElse(id, 0L) +
              counts.getOrElse(sib, 0L) + counts.getOrElse(parent, 0L)
            if (fam <= budget) {
              counts.remove(id)
              counts.remove(sib)
              if (fam > 0) counts(parent) = fam
            }
          }
          i += 1
        }
        level -= 1
      }
    }

    /** The paper's rank query: nodes ordered by (hi, lo) of their
      * covered value ranges, counts accumulated to the target rank;
      * null (None → Spark null) on an empty digest. */
    def quantile(q: Double): Any = {
      if (n == 0) return null
      val target = math.max(1L, math.ceil(q * n).toLong)
      // (hi, lo, count) per node
      val nodes = counts.iterator.map { case (id, c) =>
        val depth = 63 - java.lang.Long.numberOfLeadingZeros(id)
        val span = bits - depth
        val lo = (id - (1L << depth)) << span
        val hi = lo + (1L << span) - 1
        (hi, lo, c)
      }.toArray
      java.util.Arrays.sort(nodes,
        implicitly[Ordering[(Long, Long, Long)]])
      var cum = 0L
      var i = 0
      while (i < nodes.length) {
        cum += nodes(i)._3
        if (cum >= target) return nodes(i)._1
        i += 1
      }
      nodes(nodes.length - 1)._1
    }

    def size: Int = counts.size

    def serialized: Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(out)
      d.writeLong(n)
      d.writeInt(counts.size)
      counts.foreach { case (id, c) => d.writeLong(id); d.writeLong(c) }
      d.flush()
      out.toByteArray
    }
  }

  object Digest {
    def deserialize(k: Int, bits: Int, bytes: Array[Byte]): Digest = {
      val d = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val dig = new Digest(k, bits)
      dig.n = d.readLong()
      val m = d.readInt()
      (0 until m).foreach { _ =>
        val id = d.readLong(); dig.counts(id) = d.readLong()
      }
      dig
    }
  }
}

object QDigest {
  /** `qdigest_quantile(c, q, k)` aggregate column: the q-th quantile
    * of a LONG column within `bits/k · n` ranks (see [[QDigestAgg]]). */
  def apply(c: Column, q: Double, k: Int, bits: Int = 20): Column =
    ColumnBridge.column(
      QDigestAgg(ColumnBridge.expression(c), q, k, bits)
        .toAggregateExpression())
}
