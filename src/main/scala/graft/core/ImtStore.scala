package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** In-memory aggregate table with the IMT plugin's client operations
  * (SURVEY §2.9): continuous upsert-merge of new aggregates, full/partial
  * queries via Spark SQL, `-r` reset-counters and `-e` erase
  * (`src/imt_plugin.c`, `src/server.c`; reset served on next update,
  * docs/INTERNALS:246-249).
  *
  * Storage is LSM-shaped so an upsert costs O(batch), never O(table):
  * each batch pre-aggregates (map-side combine over its own keys only)
  * into a cached DELTA; the queryable view is base ⊎ deltas merged by
  * key, evaluated lazily at query time; every `compactEvery` upserts the
  * log folds into a new base generation (amortized O(table / K) per
  * upsert). This is the same write/read/compact split a state store or
  * Delta MERGE gives on a cluster — nothing rescans the table on the
  * write path.
  */
final class ImtStore(spark: SparkSession, name: String,
                     keys: Seq[String], counters: Seq[String],
                     compactEvery: Int = 8) {

  private var base: Option[DataFrame] = None
  private val deltas = mutable.Buffer[DataFrame]()

  /** Cached generations currently alive (base + pending deltas) —
    * observability hook for the storage-flat spec. */
  def generations: Int = base.size + deltas.size

  private def mergeByKey(df: DataFrame): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(counters.head).as(counters.head),
        counters.tail.map(c => sum(c).as(c)): _*)

  private def view: Option[DataFrame] = {
    val parts = base.toSeq ++ deltas
    if (parts.isEmpty) None
    else if (parts.size == 1) Some(parts.head)
    else Some(mergeByKey(parts.reduce(_ unionByName _)))
  }

  private def publishView(): Unit =
    view.foreach(_.createOrReplaceTempView(name))

  /** Merge a batch of aggregates: counters accumulate per key
    * (Accumulate_Counters, src/imt_plugin.h:145) — including duplicate
    * keys WITHIN the very first batch. Work done here is proportional to
    * THIS batch: only the batch aggregate materializes; the base is
    * untouched until compaction. */
  def upsert(batch: DataFrame): Unit = {
    val d = mergeByKey(batch).cache()
    d.count() // materialize the delta only — O(batch)
    deltas += d
    if (deltas.size >= compactEvery) compact()
    publishView()
  }

  /** Fold base + deltas into one compacted generation. */
  private def compact(): Unit = {
    val parts = base.toSeq ++ deltas
    if (parts.nonEmpty) {
      val merged = mergeByKey(parts.reduce(_ unionByName _)).cache()
      merged.count() // materialize before dropping predecessors
      parts.foreach(_.unpersist())
      base = Some(merged)
      deltas.clear()
    }
  }

  /** `pmacct -s` / `-c ... -M ...` queries are plain SQL on the view. */
  def query(sql: String): DataFrame = spark.sql(sql)

  def table: DataFrame = view.getOrElse(spark.emptyDataFrame)

  /** `-r`: zero all counters, keep keys (an explicit client op — the one
    * operation that legitimately touches every key). */
  def reset(): Unit = {
    compact()
    base = base.map { cur =>
      val zeroed = cur.select(keys.map(col) ++
        counters.map(c => lit(0L).as(c)): _*).cache()
      zeroed.count()
      cur.unpersist()
      zeroed
    }
    publishView()
  }

  /** `-e`: drop the table contents (schema survives for later upserts). */
  def erase(): Unit = {
    compact()
    base = base.map { cur =>
      val empty = cur.limit(0).cache()
      empty.count()
      cur.unpersist()
      empty
    }
    publishView()
  }
}
