package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.{ColumnBridge, ExpectsInputTypesBridge}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog as a native Catalyst `TypedImperativeAggregate` — the
  * in-repo replacement for `approx_count_distinct` in the sketch
  * family (bloom q61, CMS q263, Misra–Gries q278, q-digest q281,
  * t-digest q287): Flajolet et al. 2007 dense registers with the
  * linear-counting small-range correction (the 64-bit-hash variant
  * needs no large-range correction). `2^p` one-byte registers,
  * update = register max on the leading-zero rank of the hash suffix,
  * merge = elementwise max — the partial/final shuffle carries a
  * fixed `m`-byte blob per group regardless of stream size, which is
  * the whole 100 TB story.
  *
  * The hash is an in-repo 64-bit mix (FNV-1a over the bytes, then the
  * splitmix64 finalizer) so the sketch has zero dependencies and the
  * estimate is reproducible across engines that reimplement it.
  */
case class HllAgg(child: Expression, p: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with ExpectsInputTypesBridge {

  require(p >= 4 && p <= 18, "hll precision must be in [4, 18]")

  override def expectedInputTypes: Seq[DataType] = Seq(StringType)

  private def m: Int = 1 << p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(regs: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = HllAgg.hash64(v.asInstanceOf[UTF8String].getBytes)
      val idx = (h >>> (64 - p)).toInt
      val w = h << p
      val rank = (if (w == 0) 64 - p
        else java.lang.Long.numberOfLeadingZeros(w)) + 1
      if ((regs(idx) & 0xff) < rank) regs(idx) = rank.toByte
    }
    regs
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(regs: Array[Byte]): Any = {
    val mm = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < mm) {
      val r = regs(i) & 0xff
      sum += java.lang.Math.scalb(1.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha =
      if (mm == 16) 0.673
      else if (mm == 32) 0.697
      else if (mm == 64) 0.709
      else 0.7213 / (1.0 + 1.079 / mm)
    val e = alpha * mm * mm / sum
    val est =
      if (e <= 2.5 * mm && zeros > 0) mm * math.log(mm.toDouble / zeros)
      else e
    math.round(est)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "hll_distinct"
}

object HllAgg {
  /** FNV-1a 64 over the bytes, then splitmix64's avalanche — a
    * dependency-free 64-bit hash with the uniform tail HLL ranks
    * need. */
  def hash64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }
}

object Hll {
  /** `hll_distinct(c, p)` aggregate column: approximate distinct count
    * with the standard ~1.04/√(2^p) relative error (see [[HllAgg]]). */
  def apply(c: Column, p: Int): Column =
    ColumnBridge.column(
      HllAgg(ColumnBridge.expression(c), p).toAggregateExpression())
}
