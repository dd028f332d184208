package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.text.TextOps._

/** Materialized per-document signature tables — the 100 TB production
  * shape for every operator that consumes token shingles.
  *
  * A real pipeline computes (doc_id, token count, shingle-hash set,
  * minhash band keys) ONCE and every consumer — near-dup pair finding
  * (q38), keep-list (q72), incremental probe (q74), clustering (q85),
  * length-blocked Jaccard (q40), sequence packing (q103),
  * decontamination (q104) — reads that table; nothing re-runs the
  * tokenize→shingle→md5→minhash chain. This cache is that table, scoped
  * per (session, dataset).
  *
  * Two details make it actually single-pass:
  *  - the fill is EAGER (`count()`): a lazily-persisted table read by
  *    two self-join legs is computed once per leg, because concurrently
  *    scheduled stages all miss the not-yet-filled cache;
  *  - rows are spread across all cores BEFORE the chain runs: the raw
  *    table is one input split locally, and the chain is CPU-bound. At
  *    100 TB the scan has thousands of splits and the repartition moves
  *    raw text once, pre-explosion — noise.
  */
object SigTable {

  /** Distinct 3-token shingle hashes (MinHash input). Shingles, not raw
    * tokens: with a small vocabulary raw-token sets are near-identical
    * corpus-wide and LSH buckets degenerate to O(n²) candidates. */
  val hsExpr: String = let1(sparkToks, t =>
    s"array_distinct(transform(${sparkShingles(t)}, " +
      s"g -> ${sparkTokHash("g")} % $P))")
  // ^ tokens bound ONCE per row (optimization r17): the previous
  // spelling passed the tokenizer expression textually into
  // sparkShingles, whose slice() sits under the per-shingle lambda —
  // the whole tokenize pass re-ran per SHINGLE.

  // All 8 minhash signatures in one fold ((2k+3)h + (97k+11), the same
  // constants as TextOps.minhashA/B); 4 band keys derived from ONE
  // generator input, so the chain runs once per doc, not per signature.
  private val sigsArr =
    s"""transform(sequence(0, 7), k -> array_min(
        transform(hs, h -> ((2 * k + 3) * h + (97 * k + 11)) % $P)))"""
  /** 4-element band-key array over a bound `hs` column (public: the
    * streaming near-dup operator computes bands per arriving doc). */
  val bandExpr: String = let1(sigsArr, sg =>
    s"""transform(sequence(0, 3), b -> concat_ws('_', b,
        element_at($sg, 2 * b + 1), element_at($sg, 2 * b + 2)))""")
  private val bandArr = bandExpr

  private val cache =
    scala.collection.concurrent.TrieMap[(Int, String), DataFrame]()

  /** (doc_id, n_toks, hs, bks) per document, cached and materialized. */
  def sigs(s: SparkSession, d: String): DataFrame =
    cache.getOrElseUpdate((System.identityHashCode(s), d), {
      val df = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .selectExpr("doc_id", s"size($sparkToks) as n_toks",
          s"$hsExpr as hs")
        .selectExpr("doc_id", "n_toks", "hs", s"$bandArr as bks")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // eager fill — see Scaladoc
      df
    })

  /** Band-exploded view (cheap explode over the cached table). */
  def bands(s: SparkSession, d: String): DataFrame =
    sigs(s, d).selectExpr("doc_id", "hs", "explode(bks) as bk")

  /** The verified near-dup PAIR table (banded candidates, shingle
    * Jaccard >= 0.9, a < b) — the second table a production dedup
    * pipeline materializes: keep-list (q72) and clustering (q85) both
    * consume it, so the banded self-join runs once, not per consumer.
    * (q74 deliberately does NOT read it: its point is the incremental
    * batch-probes-index shape, which never sees a full self-join.)
    */
  private val pairCache =
    scala.collection.concurrent.TrieMap[(Int, String), DataFrame]()
  def pairs90(s: SparkSession, d: String): DataFrame =
    pairCache.getOrElseUpdate((System.identityHashCode(s), d), {
      val b = bands(s, d)
      val df = b.as("x").join(b.as("y"),
          col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
        .filter(expr("size(array_intersect(x.hs, y.hs)) / " +
          "cast(size(array_union(x.hs, y.hs)) as double)") >= 0.9)
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // eager fill, same reason as sigs
      df
    })
}
