package graft.operators

import org.apache.spark.sql.functions._
import graft.core._
import graft.maps.{KeepLists, PreTagMap}
import graft.maps.PreTagMap.TagRule

/** Engine-level pmacct semantics (SURVEY §2.5, §2.7, §2.4) driven through
  * [[graft.core.FlowView]] so every path is DuckDB-oracle checkable:
  * windowed flow aggregation via [[graft.core.AggregatePlanner]],
  * pro-rating, preprocess resampling (fss/fsrc/usrf/adjb), keep-list
  * remapping, pre_tag_map chains, and multi-version source multiplexing.
  */
object EngineQueries {

  private def flows(s: org.apache.spark.sql.SparkSession, d: String) =
    FlowView.fromEvents(Tables.events(s, d))

  val all: Seq[Q] = Seq(

    // The flagship pmacct pipeline shape: filter → project → groupBy(keys +
    // history bin) → fixed counter set (SURVEY §3.1 "Spark shape").
    Q("q11_flow_agg",
      (s, d) => {
        val f = flows(s, d)
        AggregatePlanner.plan(f, FlowPlan(
          keys = Seq("ip_proto" -> col("ip_proto"), "port_dst" -> col("port_dst")),
          counters = AggregatePlanner.flowCounters(
            col("bytes"), col("packets"), col("tcp_flags"),
            col("t0u"), col("t1u")),
          filter = Some(col("bytes") > 1000L),
          history = Some("bin_start" ->
            SecondsHistory(3600).binOfMicros(col("t0u")))))
      },
      Some(FlowView.cte(
        """SELECT ((t0u - t0u % 3600000000) // 3600000000) * 3600 AS bin_start,
           ip_proto, port_dst,
           CAST(sum(bytes) AS BIGINT) AS bytes,
           CAST(sum(packets) AS BIGINT) AS packets,
           count(*) AS flows, bit_or(tcp_flags) AS tcp_flags,
           min(t0u) AS ts_min_us, max(t1u) AS ts_max_us
           FROM flows WHERE bytes > 1000
           GROUP BY bin_start, ip_proto, port_dst""")),
      doc = "AggregateSpec plan: keys + history bin + full counter set"),

    // Pro-rating across 5-minute bins (src/plugin_common.c:258-266).
    Q("q12_prorate_5m",
      (s, d) => ProRating.explodeBins(flows(s, d),
          col("t0u"), col("t1u"), 300,
          Seq("bytes_w" -> col("bytes"), "packets_w" -> col("packets")))
        .groupBy("bin_start", "ip_proto")
        .agg(sum("bytes_w").as("bytes_w"), sum("packets_w").as("packets_w"),
          count(lit(1)).as("n")),
      Some(s"""WITH flows AS (${FlowView.sql}), exploded AS (
            SELECT f.*, unnest(generate_series(t0u // 300000000,
                   greatest(t0u, t1u - 1) // 300000000)) AS __bin
            FROM flows f)
          SELECT __bin * 300 AS bin_start, ip_proto,
            CAST(sum(CASE WHEN t1u = t0u THEN bytes
                 ELSE (bytes * (least(t1u, (__bin+1)*300000000) -
                       greatest(t0u, __bin*300000000))) // (t1u - t0u)
                 END) AS BIGINT) AS bytes_w,
            CAST(sum(CASE WHEN t1u = t0u THEN packets
                 ELSE (packets * (least(t1u, (__bin+1)*300000000) -
                       greatest(t0u, __bin*300000000))) // (t1u - t0u)
                 END) AS BIGINT) AS packets_w,
            count(*) AS n
          FROM exploded GROUP BY bin_start, ip_proto"""),
      doc = "pro-rating: flows split across bins weighted by overlap"),

    // fss sample-and-hold (src/preprocess.c:549-580).
    Q("q13_fss",
      (s, d) => Preprocess.fss(flows(s, d), col("bytes"), col("event_id"),
          250000L)
        .select(col("event_id"), col("bytes"), col("bytes_est")),
      Some(FlowView.cte(
        s"""SELECT event_id, bytes, greatest(bytes, 250000) AS bytes_est
            FROM flows
            WHERE CAST(bytes AS DOUBLE) >=
                  (${Preprocess.detUniformSql("event_id")}) * 250000""")),
      doc = "fss: Duffield sample-and-hold with unbiased boost"),

    // fsrc priority sampling (src/preprocess.c:582-660).
    Q("q14_fsrc",
      (s, d) => Preprocess.fsrc(flows(s, d), col("bytes"), col("event_id"), 50)
        .select(col("event_id"), col("bytes"), col("bytes_est")),
      Some({
        val u = Preprocess.detUniformSql("event_id")
        s"""WITH flows AS (${FlowView.sql}), ranked AS (
              SELECT event_id, bytes,
                CAST(bytes AS DOUBLE) / ($u) AS __z,
                row_number() OVER (ORDER BY CAST(bytes AS DOUBLE) / ($u) DESC,
                                   event_id ASC) AS __rn
              FROM flows)
            SELECT event_id, bytes,
              greatest(CAST(bytes AS DOUBLE),
                       coalesce((SELECT __z FROM ranked WHERE __rn = 51), 0.0))
                AS bytes_est
            FROM ranked WHERE __rn <= 50"""
      }),
      doc = "fsrc: priority sampling top-m with tau renormalization"),

    // usrf ×k then adjb +N/packet (CONFIG-KEYS:1660-1674), aggregated.
    Q("q15_scale_counters",
      (s, d) => {
        val scaled = Preprocess.adjb(
          Preprocess.usrf(flows(s, d), 4L, "bytes"), 14L)
        scaled.groupBy("ip_proto")
          .agg(sum("bytes").as("bytes"), sum("packets").as("packets"),
            count(lit(1)).as("n"))
      },
      Some(FlowView.cte(
        """SELECT ip_proto, CAST(sum(bytes * 4 + packets * 14) AS BIGINT) AS bytes,
           CAST(sum(packets) AS BIGINT) AS packets, count(*) AS n
           FROM flows GROUP BY ip_proto""")),
      doc = "usrf/adjb counter renormalization"),

    // ports_file keep-list remap (CONFIG-KEYS:1114).
    Q("q16_ports_remap",
      (s, d) => flows(s, d)
        .groupBy(KeepLists.remapPorts(col("port_dst"), Seq(80L, 443L, 53L))
          .as("port_dst"))
        .agg(sum("bytes").as("bytes"), count(lit(1)).as("n")),
      Some(FlowView.cte(
        """SELECT CASE WHEN port_dst IN (80, 443, 53) THEN port_dst
                  ELSE 0 END AS port_dst,
           CAST(sum(bytes) AS BIGINT) AS bytes, count(*) AS n
           FROM flows GROUP BY 1""")),
      doc = "ports_file: out-of-list values collapse to bucket 0"),

    // pre_tag_map first-match chain + pre_tag_filter
    // (src/pretag.c:56; CONFIG-KEYS:2234-2326).
    Q("q17_pretag",
      (s, d) => {
        val rules = Seq(
          TagRule(col("port_dst") === 80L && col("bytes") > 100000L, 100L),
          TagRule(col("ip_proto") === 17L, 200L),
          TagRule(col("port_dst") === 443L, 300L))
        flows(s, d)
          .withColumn("tag", PreTagMap.tagColumn(rules))
          .filter(PreTagMap.tagFilter(col("tag"), Seq(100L, 200L, 300L)))
          .groupBy("tag")
          .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"))
      },
      Some(FlowView.cte(
        """SELECT tag, count(*) AS n, CAST(sum(bytes) AS BIGINT) AS bytes FROM (
             SELECT CASE WHEN port_dst = 80 AND bytes > 100000 THEN 100
                         WHEN ip_proto = 17 THEN 200
                         WHEN port_dst = 443 THEN 300
                         ELSE 0 END AS tag, bytes
             FROM flows)
           WHERE tag IN (100, 200, 300) GROUP BY tag""")),
      doc = "pre_tag_map first-match rule chain + tag filter"),

    // Exact distinct-flow counting per history bin (pmacctd's `flows`
    // counter tracks distinct 5-tuples, docs/INTERNALS:340-357): exact
    // COUNT(DISTINCT tuple) — Spark plans it as a partial-dedup expand,
    // the exact-semantics counterpart of approx_count_distinct.
    Q("q89_distinct_flows",
      (s, d) => flows(s, d)
        .groupBy(SecondsHistory(3600).binOfMicros(col("t0u"))
          .as("bin_start"))
        .agg(count(lit(1)).as("n_records"),
          countDistinct(col("ip_src"), col("ip_dst"), col("port_src"),
            col("port_dst"), col("ip_proto")).as("n_flows"),
          sum("bytes").as("bytes")),
      Some(FlowView.cte(
        """SELECT ((t0u - t0u % 3600000000) // 3600000000) * 3600
             AS bin_start,
           count(*) AS n_records,
           count(DISTINCT (ip_src, ip_dst, port_src, port_dst, ip_proto))
             AS n_flows,
           CAST(sum(bytes) AS BIGINT) AS bytes
           FROM flows GROUP BY 1""")),
      doc = "exact distinct-flow counter per history bin"),

    // Approximate distinct flows (documented deviation, SURVEY §7 hard
    // part (e)): HLL sketch — engine-specific, so no SQL oracle; the
    // driver records the weaker rows-only check. q89 is the exact path.
    // The HLL estimate is engine-specific, so the gate is a TOLERANCE
    // BAND verified in-engine: each bin computes both the sketch and the
    // exact count, and the query emits how many bins drift beyond ±5%.
    // The oracle asserts the bin inventory and ZERO violations — if the
    // sketch (rsd 0.01 → ~1% typical error) ever degrades, the row goes
    // red instead of silently passing rows-only.
    Q("q90_approx_flows",
      // r17 (guide §2.3, aggregate before you shuffle): countDistinct
      // next to a rsd-0.01 HLL made the partial agg allocate a ~2.7k-
      // long HLL buffer PER (bin, tuple) Expand group — ~600k wide
      // buffers. Two-level agg instead: distinct tuples first (narrow
      // buffers), then per-bin HLL over the deduped tuples — register
      // maxima are duplicate-insensitive, so the estimate (and the
      // whole output) is bit-identical, in one scan. Measured
      // 3.75 s -> ~0.6 s solo.
      (s, d) => flows(s, d)
        .groupBy(SecondsHistory(3600).binOfMicros(col("t0u"))
          .as("bin_start"),
          col("ip_src"), col("ip_dst"), col("port_src"),
          col("port_dst"), col("ip_proto"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("bin_start")
        .agg(sum("cnt").as("n_records"),
          approx_count_distinct(
            concat_ws("|", col("ip_src"), col("ip_dst"), col("port_src"),
              col("port_dst"), col("ip_proto")), 0.01).as("n_approx"),
          count(lit(1)).as("n_exact"))
        .groupBy()
        .agg(count(lit(1)).as("n_bins"),
          sum("n_records").as("n_records"),
          // band = max(±5%, ±5 flows): tiny bins get an absolute floor,
          // real bins the relative one
          sum(when(abs(col("n_approx") - col("n_exact")) >
            greatest(col("n_exact") * 0.05, lit(5.0)), 1L)
            .otherwise(0L)).as("n_violations")),
      Some(FlowView.cte(
        """SELECT count(*) AS n_bins, CAST(sum(nr) AS BIGINT) AS n_records,
           CAST(0 AS BIGINT) AS n_violations
           FROM (SELECT ((t0u - t0u % 3600000000) // 3600000000) * 3600
                   AS bin_start, count(*) AS nr
                 FROM flows GROUP BY 1)""")),
      doc = "approximate flows counter (HLL) gated by a ±5% tolerance band"),

    // q90's sketch as FIRST-CLASS code: the native HyperLogLog
    // TypedImperativeAggregate (plans/Hll) replaces the
    // approx_count_distinct dependency — dense 2^12 registers,
    // register-max merges through Spark's partial/final shuffle,
    // linear-counting small-range correction, in-repo 64-bit hash.
    // Same per-bin tolerance gate as q90 (max(±5%, ±5): σ at p=12 is
    // ~1.6%), plus the SQL surface via hll_distinct(col, 12).
    Q("q293_hll_native",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        flows(s, d)
          // same two-level shape as q90 (r17): registers are
          // duplicate-insensitive, output bit-identical
          .groupBy(SecondsHistory(3600).binOfMicros(col("t0u"))
            .as("bin_start"),
            col("ip_src"), col("ip_dst"), col("port_src"),
            col("port_dst"), col("ip_proto"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy("bin_start")
          .agg(sum("cnt").as("n_records"),
            graft.plans.Hll(
              concat_ws("|", col("ip_src"), col("ip_dst"),
                col("port_src"), col("port_dst"), col("ip_proto")), 12)
              .as("n_approx"),
            count(lit(1)).as("n_exact"))
          .groupBy()
          .agg(count(lit(1)).as("n_bins"),
            sum("n_records").as("n_records"),
            sum(when(abs(col("n_approx") - col("n_exact")) >
              greatest(col("n_exact") * 0.05, lit(5.0)), 1L)
              .otherwise(0L)).as("n_violations"))
      },
      Some(FlowView.cte(
        """SELECT count(*) AS n_bins, CAST(sum(nr) AS BIGINT) AS n_records,
           CAST(0 AS BIGINT) AS n_violations
           FROM (SELECT ((t0u - t0u % 3600000000) // 3600000000) * 3600
                   AS bin_start, count(*) AS nr
                 FROM flows GROUP BY 1)""")),
      doc = "native HyperLogLog aggregate gated by the q90 tolerance " +
        "band — the sketch family fully in-repo"),

    // Multi-version source multiplexing: v5-shaped and v9-shaped decoder
    // outputs unioned by name with missing-column fill (SURVEY §2.8;
    // tests/110-IPFIXv10-NFv9-multiple-sources).
    Q("q18_union_sources",
      (s, d) => {
        val f = flows(s, d)
        val v5 = f.filter(col("ip_proto") === 6L)
          .select(col("event_id"), col("ip_src"), col("port_dst"),
            col("bytes"), col("packets"))
        val v9 = f.filter(col("ip_proto") === 17L)
          .select(col("port_dst"), col("bytes"), col("packets"),
            col("ip_src"), col("event_id"),
            col("tcp_flags").as("flow_label"))
        v5.unionByName(v9, allowMissingColumns = true)
          .groupBy("port_dst")
          .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"),
            count(col("flow_label")).as("n_labeled"))
      },
      Some(FlowView.cte(
        """SELECT port_dst, count(*) AS n, CAST(sum(bytes) AS BIGINT) AS bytes,
           count(flow_label) AS n_labeled FROM (
             SELECT port_dst, bytes, CAST(NULL AS BIGINT) AS flow_label
             FROM flows WHERE ip_proto = 6
             UNION ALL
             SELECT port_dst, bytes, tcp_flags AS flow_label
             FROM flows WHERE ip_proto = 17)
           GROUP BY port_dst""")),
      doc = "unionByName multiplexing of per-version decoder outputs")
  )
}
