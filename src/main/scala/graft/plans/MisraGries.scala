package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graft.{ColumnBridge, ExpectsInputTypesBridge}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters as a native Catalyst
  * `TypedImperativeAggregate` — the DETERMINISTIC-bound counter
  * summary next to the hash sketches (bloom q61, HLL q90, CMS q263,
  * KLL-style quantiles q265): at most `k-1` counters, and after N
  * items every element with true frequency > N/k is GUARANTEED present
  * with an estimate that under-counts by at most N/k (never over).
  * Unlike CMS the bound is one-sided and collision-free.
  *
  * Mergeability is the 100 TB story (Agarwal et al., "Mergeable
  * Summaries", PODS 2012): partial summaries combine by adding counts
  * and then subtracting the k-th largest total from every counter —
  * the same error bound survives arbitrary merge trees, which is
  * exactly the partial/final shape Spark's aggregation runs. The
  * buffer serializes as (count, entries) for the shuffle.
  *
  * Result: `map<string, bigint>` of surviving items → estimates.
  */
case class MisraGriesAgg(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with ExpectsInputTypesBridge {

  require(k >= 2, "misra_gries needs k >= 2")

  // Mis-typed calls fail at ANALYSIS time, not with a runtime
  // ClassCastException in update()'s UTF8String cast.
  override def expectedInputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf(item) = c + 1
        case None =>
          if (buf.size < k - 1) buf(item) = 1L
          else {
            // decrement-all: the classic MG step — every counter pays
            // one, zeros evicted (amortized O(1) per item: each
            // decrement round is funded by k prior increments)
            val dead = mutable.Buffer[String]()
            buf.keysIterator.foreach { key =>
              val n = buf(key) - 1
              if (n == 0) dead += key else buf(key) = n
            }
            dead.foreach(buf.remove)
          }
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    b2.foreach { case (item, c) =>
      b1(item) = b1.getOrElse(item, 0L) + c
    }
    if (b1.size > k - 1) {
      // subtract the k-th largest count from everything (PODS 2012
      // merge rule); at most k-1 counters survive by construction
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val kth = counts(counts.length - k) // k-th largest
      val dead = mutable.Buffer[String]()
      b1.keysIterator.foreach { key =>
        val n = b1(key) - kth
        if (n <= 0) dead += key else b1(key) = n
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toSeq.sortBy(_._1)
    ArrayBasedMapData(
      entries.map(e => UTF8String.fromString(e._1)).toArray,
      entries.map(_._2).toArray)
  }

  override def serialize(buf: mutable.HashMap[String, Long])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val bytes = item.getBytes("UTF-8")
      d.writeInt(bytes.length); d.write(bytes); d.writeLong(c)
    }
    d.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, Long] = {
    val d = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = d.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = d.readInt()
      val b = new Array[Byte](len)
      d.readFully(b)
      buf(new String(b, "UTF-8")) = d.readLong()
    }
    buf
  }

  override def dataType: DataType = MapType(StringType, LongType)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "misra_gries"
}

object MisraGries {
  /** `misra_gries(c, k)` aggregate column: map of heavy-hitter
    * candidates → under-estimates (see [[MisraGriesAgg]]). */
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
