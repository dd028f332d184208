package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pro-rating: a flow spanning k history bins contributes its counters to
  * each bin proportionally to the overlap duration
  * (reference: `src/plugin_common.c:258-266,459-466`,
  * `sql_common.c:876-905`; `nfacctd_pro_rating` CONFIG-KEYS:2027-2039).
  *
  * Spark-first shape: a generator — `explode(sequence(bin0, bin1))` — turns
  * each flow row into one row per overlapped bin, all inside whole-stage
  * codegen, shuffle-free until the downstream groupBy. At 100 TB this is
  * the right plan: the explode multiplies rows *before* the aggregation
  * shuffle, so map-side partial aggregation collapses the blowup back down
  * within each scan partition.
  *
  * Weighted counters use pure integer arithmetic — floor(counter * overlap
  * / duration) — matching pmacct's own integer counter math and making the
  * result bit-identical on any engine and any shuffle order. (The sub-unit
  * remainder per bin is dropped, as in the reference.)
  */
object ProRating {

  /** Add `bin_start` (epoch seconds) and per-bin weighted counter columns.
    *
    * @param t0u  flow start, epoch micros (inclusive)
    * @param t1u  flow end, epoch micros (exclusive; == t0u means instant)
    * @param binSeconds history bin width
    * @param counters (outputName, sourceColumn) counters to pro-rate
    */
  def explodeBins(df: DataFrame, t0u: Column, t1u: Column, binSeconds: Long,
                  counters: Seq[(String, Column)]): DataFrame = {
    val usB = binSeconds * 1000000L
    def idx(c: Column): Column = ((c - (c % usB)) / usB).cast("long")
    // end-exclusive: a flow ending exactly on a boundary does not touch the
    // next bin; instant flows land wholly in their start bin.
    val lastIdx = idx(greatest(t0u, t1u - 1))
    val withBin = df
      .withColumn("__bin", explode(sequence(idx(t0u), lastIdx)))
      .withColumn("bin_start", col("__bin") * binSeconds)
    val dur = t1u - t0u
    val binLo = col("__bin") * usB
    val binHi = binLo + usB
    val overlap = least(t1u, binHi) - greatest(t0u, binLo)
    val weighted = counters.foldLeft(withBin) { case (d, (name, src)) =>
      // floor((src * overlap) / dur) in exact integer math: subtract the
      // remainder first so the double division is of an exact multiple
      // (< 2^53) and therefore exact.
      val prod = src * overlap
      d.withColumn(name,
        when(dur === 0, src)
          .otherwise(((prod - (prod % dur)) / dur).cast("long")))
    }
    weighted.drop("__bin")
  }

}
