package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables}
import graft.core.AggregatePlanner.sumScaled

/** The pmacct core aggregation semantics (SURVEY §2.5, §2.8, §2.9) expressed
  * over the driver test tables.
  *
  * pmacct's one aggregation shape is: project to key primitives, hash-group,
  * accumulate SUM counters / bit-OR flags / min-max stitch timestamps
  * (reference: `src/acct.c:42-122`, `src/plugin_common.c:229`,
  * `docs/INTERNALS:192-254`). Spark expresses each as a declarative
  * `groupBy(..).agg(..)` — partial (map-side) aggregation, whole-stage
  * codegen and AQE partition coalescing come free from Catalyst, which is
  * exactly the two-level plugin-cache + SQL-merge design pmacct hand-rolls.
  *
  * Numeric note: counters that are DOUBLE in the test tables are summed as
  * scaled-integer LONGs (`AggregatePlanner.sumScaled`: floor(value*10^k),
  * then LONG sum) so results are order-independent (a 1000-executor shuffle
  * must not change the answer) AND engine-portable — IEEE multiply + floor
  * are bit-identical in Spark and DuckDB, whereas double→DECIMAL casts
  * carry engine-specific rounding modes that diverge on half-ULP
  * boundaries. Columns named `sum_*` are in units of 10^-k.
  */
object CoreAggQueries {

  val all: Seq[Q] = Seq(

    // aggregate: <k1>,<k2> — "comma = AND", single flat GROUP BY
    // (docs/INTERNALS:33-38).
    Q("q01_agg_base",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumScaled(col("l_quantity"), 2).as("sum_qty"),
          sumScaled(col("l_extendedprice"), 2).as("sum_price"),
          count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, l_linestatus,
              CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
                AS sum_qty,
              CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                AS sum_price,
              count(*) AS n
              FROM lineitem GROUP BY l_returnflag, l_linestatus"""),
      doc = "flat hash aggregation over chosen key primitives"),

    // aggregate: none — grand-total single row (CONFIG-KEYS:92-93).
    Q("q02_agg_none",
      (s, d) => Tables.lineitem(s, d)
        .groupBy()
        .agg(
          count(lit(1)).as("n"),
          sumScaled(col("l_quantity"), 2).as("sum_qty")),
      Some("""SELECT count(*) AS n,
              CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
                AS sum_qty
              FROM lineitem"""),
      doc = "aggregate: none — single global aggregate row"),

    // sum_host / sum_as: account each record under BOTH its src and dst
    // value (P_sum_host_insert, src/plugin_common.c:710-759). Spark: explode
    // the (src,dst) pair pre-aggregation — one shuffle, no self-union scan.
    Q("q03_sum_entity",
      (s, d) => Tables.lineitem(s, d)
        .select(
          explode(array(col("l_partkey"), col("l_suppkey"))).as("entity"),
          col("l_quantity"))
        .groupBy("entity")
        .agg(
          sumScaled(col("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n")),
      Some("""SELECT entity,
              CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
                AS sum_qty,
              count(*) AS n
              FROM (SELECT l_partkey AS entity, l_quantity FROM lineitem
                    UNION ALL
                    SELECT l_suppkey AS entity, l_quantity FROM lineitem)
              GROUP BY entity"""),
      doc = "sum_* double-accounting via explode(array(src,dst))"),

    // tcp_flags accumulation: OR of all flags seen until flush
    // (CONFIG-KEYS:144-150; tcp_flags_handler src/pkt_handlers.c:1606).
    Q("q04_bitor_flags",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("bit_or(l_linenumber)").as("flags_or"),
          expr("bit_and(l_linenumber)").as("flags_and"),
          count(lit(1)).as("n")),
      Some("""SELECT l_returnflag,
              bit_or(l_linenumber) AS flags_or,
              bit_and(l_linenumber) AS flags_and,
              count(*) AS n
              FROM lineitem GROUP BY l_returnflag"""),
      doc = "bit_or accumulation (pmacct tcp_flags semantics)"),

    // *_history temporal binning, day granularity with roundoff
    // (P_eval_historical_acct, src/plugin_common.c:983-1010).
    Q("q05_history_day",
      (s, d) => Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sumScaled(col("value"), 4).as("sum_value")),
      Some("""SELECT CAST(ts AS DATE) AS day, event_type,
              count(*) AS n_events,
              CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
                AS sum_value
              FROM events GROUP BY 1, 2"""),
      doc = "temporal binning: day-aligned history bins"),

    // *_history fine bins: 5-minute bins keyed on epoch-aligned start
    // (kafka_history: 5m; bin alignment CONFIG-KEYS:1419-1432).
    Q("q06_history_5m",
      (s, d) => Tables.events(s, d)
        .groupBy(
          expr("(unix_timestamp(ts) div 300) * 300").as("bin_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sumScaled(col("value"), 4).as("sum_value")),
      Some("""SELECT CAST(floor(epoch(ts)/300)*300 AS BIGINT) AS bin_start,
              event_type, count(*) AS n_events,
              CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
                AS sum_value
              FROM events GROUP BY 1, 2"""),
      doc = "temporal binning: 5-minute epoch-aligned bins"),

    // Calendar-aligned history roundoff: week and month bins
    // (sql_history_roundoff w/M, CONFIG-KEYS:1419-1432).
    Q("q80_history_calendar",
      (s, d) => Tables.events(s, d)
        .groupBy(
          expr("unix_timestamp(date_trunc('week', ts))").as("week_start"),
          expr("unix_timestamp(date_trunc('month', ts))").as("month_start"))
        .agg(count(lit(1)).as("n"),
          sumScaled(col("value"), 4).as("sum_value")),
      Some("""SELECT CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS week_start,
              CAST(epoch(date_trunc('month', ts)) AS BIGINT) AS month_start,
              count(*) AS n,
              CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
                AS sum_value
              FROM events GROUP BY 1, 2"""),
      doc = "calendar roundoff bins: week + month history"),

    // Stitching: per aggregate keep timestamp_min/timestamp_max
    // (P_set_stitch/P_update_stitch, src/plugin_common.c:1080-1097).
    Q("q07_stitch",
      (s, d) => Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          expr("min(unix_micros(ts))").as("ts_min_us"),
          expr("max(unix_micros(ts))").as("ts_max_us"),
          count(lit(1)).as("n_events")),
      Some("""SELECT user_id,
              min(epoch_us(ts)) AS ts_min_us,
              max(epoch_us(ts)) AS ts_max_us,
              count(*) AS n_events
              FROM events GROUP BY user_id"""),
      doc = "stitching: timestamp_min/timestamp_max per aggregate"),

    // preprocess minp/minb: HAVING >= N after aggregation
    // (src/preprocess.c:395-425).
    Q("q08_having_min",
      (s, d) => Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          sumScaled(col("value"), 4).as("sum_value"))
        // threshold 100 units = 1_000_000 in 10^-4 scaled units
        .where(col("n_events") >= 5 && col("sum_value") >= 1000000L),
      Some("""SELECT user_id, count(*) AS n_events,
              CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
                AS sum_value
              FROM events GROUP BY user_id
              HAVING count(*) >= 5
                 AND sum(CAST(floor(value * 10000) AS BIGINT)) >= 1000000"""),
      doc = "preprocess minp/minb: HAVING floor on aggregates"),

    // Top-N: client-side `pmacct -T bytes,50` (src/pmacct.c:102) →
    // ORDER BY .. LIMIT with a deterministic tiebreak.
    Q("q09_topk",
      (s, d) => Tables.events(s, d)
        .groupBy("user_id")
        .agg(sumScaled(col("value"), 4).as("sum_value"))
        .orderBy(col("sum_value").desc, col("user_id").asc)
        .limit(10),
      Some("""SELECT user_id,
              CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
                AS sum_value
              FROM events GROUP BY user_id
              ORDER BY sum_value DESC, user_id ASC LIMIT 10"""),
      doc = "top-N by counter with deterministic tiebreak"),

    // IMT client exact-match query: -c k1,k2 -M v1,v2 (src/server.c:64;
    // QUICKSTART:889-928) — point predicate, no re-aggregation.
    Q("q10_match_exact",
      (s, d) => Tables.events(s, d)
        .where(col("event_type") === "click" && col("user_id") % 100 === 7)
        .select(
          col("event_id"), col("user_id"),
          expr("unix_micros(ts)").as("ts_us"), col("value")),
      Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
              FROM events
              WHERE event_type = 'click' AND user_id % 100 = 7"""),
      doc = "interactive exact-match lookup (pmacct -M)")
  )
}
