package graft.maps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership (SURVEY §2.4 "bloom filters", reference
  * `src/filters/bloom.c` — BGP blackhole membership checks).
  *
  * Uses Catalyst's own BloomFilterAggregate / BloomFilterMightContain
  * (the machinery behind runtime row-level filtering) through the
  * [[ColumnBridge]]: build the sketch with one aggregation over the dim,
  * ship the serialized bytes inside the plan, probe with a codegen'd
  * might_contain on xxhash64 of the column. No false negatives; false
  * positive rate set by `numBits`.
  */
object Bloom {

  /** Build a serialized bloom sketch of `c` over `df`. */
  def build(df: DataFrame, c: Column, expectedItems: Long = 100000L,
            numBits: Long = 800000L): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(c)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    df.select(ColumnBridge.column(agg)).head().getAs[Array[Byte]](0)
  }

  /** Membership probe against a built sketch. */
  def mightContain(sketch: Array[Byte], c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      ColumnBridge.expression(xxhash64(c))))
}
