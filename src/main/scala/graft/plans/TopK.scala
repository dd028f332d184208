package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col

/** Two-phase top-k-per-key (pmacct client `-T bytes,N` per group;
  * `src/pmacct.c:102` sorts client-side — here it is a distributed
  * operator designed for the 100 TB shape).
  *
  * Spark's idiomatic `row_number().over(Window.partitionBy(...))` plan
  * shuffles EVERY row to its key's reducer and sorts there. This operator
  * instead keeps a bounded heap per key inside each scan partition
  * (map-side pruning, like `TakeOrderedAndProject` but per key), so only
  * `O(#keys × k)` candidate rows reach the shuffle; an identical pruning
  * pass after repartitioning by key yields the exact result. Results
  * match the window plan exactly when `(orderCol desc, tiebreakCol asc)`
  * is a total order.
  *
  * Built from Dataset primitives (mapPartitions + repartition) — no
  * custom physical node needed; the plan stays AQE-compatible.
  */
object TopK {

  /** Exact top-k rows per key by `orderCol` DESC, ties broken by
    * `tiebreakCol` ASC. Both must be LongType; key columns are compared
    * as plain values. */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
             tiebreakCol: String, k: Int): DataFrame = {
    val schema = df.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    val ordIdx = schema.fieldIndex(orderCol)
    val tieIdx = schema.fieldIndex(tiebreakCol)
    implicit val enc = Encoders.row(schema)

    // min-heap: weakest candidate on top, evicted when a better row lands.
    // Compare with Long.compare (not negation): negating Long.MinValue
    // overflows to itself and would rank that row strongest.
    val ordering: Ordering[Row] = new Ordering[Row] {
      def compare(a: Row, b: Row): Int = {
        val c = java.lang.Long.compare(b.getLong(ordIdx), a.getLong(ordIdx))
        if (c != 0) c
        else java.lang.Long.compare(a.getLong(tieIdx), b.getLong(tieIdx))
      }
    }
    def prune(it: Iterator[Row]): Iterator[Row] = {
      val heaps = mutable.Map[Seq[Any], mutable.PriorityQueue[Row]]()
      it.foreach { r =>
        val key = keyIdx.map(r.get)
        val h = heaps.getOrElseUpdate(key,
          mutable.PriorityQueue.empty(ordering))
        h.enqueue(r)
        if (h.size > k) h.dequeue() // drop current weakest
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }

    val partial = df.mapPartitions(prune)   // map-side: <= k rows/key/part
    partial.repartition(keyCols.map(col): _*)
      .mapPartitions(prune)                 // exact: all candidates co-located
  }
}
