package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{FlowView, Q, Salt, Tables}
import graft.maps.{Bloom, Dims}

/** Scale-mechanics operators: salted two-phase aggregation (hot-key
  * skew), bloom pre-filtering (exact-verified, so oracle-checkable), and
  * the L7 classification hook (SURVEY §2.10; nDPI's payload inspection is
  * pluggable — the port/proto heuristic here is the `class` primitive's
  * cheap path, cf. `src/classifier.c` first-k-packets giveup).
  */
object ScaleQueries {

  private def flows(s: org.apache.spark.sql.SparkSession, d: String) =
    FlowView.fromEvents(Tables.events(s, d))

  /** L7 class heuristic over (proto, ports). */
  def l7Class(proto: org.apache.spark.sql.Column,
              portSrc: org.apache.spark.sql.Column,
              portDst: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(proto === 6 && (portDst === 80 || portSrc === 80), "http")
      .when(proto === 6 && (portDst === 443 || portSrc === 443), "tls")
      .when(proto === 6 && (portDst === 8443 || portSrc === 8443), "tls-alt")
      .when(proto === 6 && (portDst === 25 || portSrc === 25), "smtp")
      .when(proto === 17 && (portDst === 53 || portSrc === 53), "dns")
      .otherwise("unknown")

  val all: Seq[Q] = Seq(

    // Salted two-phase aggregation: identical results to the direct
    // groupBy (the oracle IS the direct plan), different shuffle layout —
    // a hot port no longer lands on one reducer.
    Q("q59_salted_agg",
      (s, d) => Salt.aggregate(flows(s, d), Seq("port_dst"),
        col("event_id"), 8, Seq(
          Salt.sum2("bytes", col("bytes")),
          Salt.count2("n"),
          Salt.bitOr2("flags", col("tcp_flags")),
          Salt.min2("ts_min_us", col("t0u")))),
      Some(FlowView.cte(
        """SELECT port_dst, CAST(sum(bytes) AS BIGINT) AS bytes,
           count(*) AS n, bit_or(tcp_flags) AS flags,
           min(t0u) AS ts_min_us
           FROM flows GROUP BY port_dst""")),
      doc = "skew-tolerant salted aggregation (== direct plan results)"),

    // L7 classification primitive (class column) + per-class accounting.
    Q("q60_classify",
      (s, d) => flows(s, d)
        .withColumn("class",
          l7Class(col("ip_proto"), col("port_src"), col("port_dst")))
        .groupBy("class")
        .agg(count(lit(1)).as("n"), sum("bytes").as("bytes")),
      Some(FlowView.cte(
        """SELECT CASE
             WHEN ip_proto = 6 AND (port_dst = 80 OR port_src = 80)
               THEN 'http'
             WHEN ip_proto = 6 AND (port_dst = 443 OR port_src = 443)
               THEN 'tls'
             WHEN ip_proto = 6 AND (port_dst = 8443 OR port_src = 8443)
               THEN 'tls-alt'
             WHEN ip_proto = 6 AND (port_dst = 25 OR port_src = 25)
               THEN 'smtp'
             WHEN ip_proto = 17 AND (port_dst = 53 OR port_src = 53)
               THEN 'dns'
             ELSE 'unknown' END AS class,
           count(*) AS n, CAST(sum(bytes) AS BIGINT) AS bytes
           FROM flows GROUP BY 1""")),
      doc = "L7 classification hook (port heuristic; payload pluggable)"),

    // Bloom pre-filter + exact verify: the production bloom pattern
    // (cheap codegen probe drops most non-members, exact semi-join
    // confirms). Results are exact, so the oracle checks that the sketch
    // produced NO false negatives over the whole fact table.
    Q("q61_bloom_prefilter",
      (s, d) => {
        val allowed = Dims.allowList(s)
        val sketch = Bloom.build(allowed, col("exporter"), 64L, 4096L)
        flows(s, d).withColumn("exporter", col("ip_src") % 16)
          .filter(Bloom.mightContain(sketch, col("exporter")))
          .join(broadcast(allowed), Seq("exporter"), "left_semi")
          .groupBy()
          .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"))
      },
      Some(s"""WITH flows AS (SELECT *, ip_src % 16 AS exporter
              FROM (${FlowView.sql})), ${Dims.allowSql}
            SELECT count(*) AS n, CAST(sum(bytes) AS BIGINT) AS bytes
            FROM flows WHERE exporter IN (SELECT exporter FROM allow_list)"""),
      doc = "bloom membership pre-filter with exact verify"),

    // Classify-then-reassign (docs/INTERNALS:360-408; classifier giveup
    // budget): a flow's class is decided from its first 3 records; counters
    // accumulated while the class was still unknown are retro-applied to
    // the final class. Keyed-state iteration in Spark; the oracle derives
    // the same first-3 decision with window functions.
    Q("q67_classify_retro",
      (s, d) => {
        val sp = s
        import sp.implicits._
        val keyed = flows(s, d).select(
            ((col("ip_src") % 256) * 2048 + col("port_dst") * 2 +
              (col("ip_proto") % 2)).as("fkey"),
            l7Class(col("ip_proto"), col("port_src"), col("port_dst"))
              .as("cls"),
            col("t0u"), col("event_id"), col("bytes"))
          .as[(Long, String, Long, Long, Long)]
        keyed.groupByKey(_._1).mapGroups { (fkey, it) =>
          val evs = it.toIndexedSeq.sortBy(e => (e._3, e._4))
          val decided = evs.take(3).map(_._2).find(_ != "unknown")
            .getOrElse("unknown") // giveup after budget
          (decided, evs.size.toLong, evs.map(_._5).sum)
        }.toDF("class", "n_records", "bytes")
          .groupBy("class")
          .agg(count(lit(1)).as("n_flows"), sum("n_records").as("n_records"),
            sum("bytes").as("bytes"))
      },
      Some(FlowView.cte(
        """SELECT kclass AS class, count(*) AS n_flows,
           CAST(sum(nr) AS BIGINT) AS n_records,
           CAST(sum(b) AS BIGINT) AS bytes
           FROM (
             SELECT fkey,
               coalesce(arg_min(cls, rn)
                 FILTER (WHERE cls <> 'unknown' AND rn <= 3), 'unknown')
                 AS kclass,
               count(*) AS nr, sum(bytes) AS b
             FROM (
               SELECT fkey, cls, bytes, row_number() OVER
                   (PARTITION BY fkey ORDER BY t0u, event_id) AS rn
               FROM (
                 SELECT (ip_src % 256) * 2048 + port_dst * 2 +
                     (ip_proto % 2) AS fkey,
                   CASE
                     WHEN ip_proto = 6 AND (port_dst = 80 OR port_src = 80)
                       THEN 'http'
                     WHEN ip_proto = 6 AND (port_dst = 443 OR port_src = 443)
                       THEN 'tls'
                     WHEN ip_proto = 6 AND (port_dst = 8443 OR port_src = 8443)
                       THEN 'tls-alt'
                     WHEN ip_proto = 6 AND (port_dst = 25 OR port_src = 25)
                       THEN 'smtp'
                     WHEN ip_proto = 17 AND (port_dst = 53 OR port_src = 53)
                       THEN 'dns'
                     ELSE 'unknown' END AS cls,
                   t0u, event_id, bytes
                 FROM flows))
             GROUP BY fkey)
           GROUP BY 1""")),
      doc = "classification retro-applied to pre-decision counters"),

    // Distributed top-k per key: bounded-heap map-side pruning, shuffle
    // O(#keys x k) candidates, exact final pass — vs the window plan that
    // shuffles and sorts every row. Oracle is that window plan.
    Q("q70_topk_perkey",
      (s, d) => graft.plans.TopK.perKey(
        flows(s, d).select("port_dst", "event_id", "bytes"),
        Seq("port_dst"), "bytes", "event_id", 3)
        .orderBy(col("port_dst"), col("bytes").desc, col("event_id")),
      Some(FlowView.cte(
        """SELECT port_dst, event_id, bytes FROM (
             SELECT port_dst, event_id, bytes, row_number() OVER
               (PARTITION BY port_dst ORDER BY bytes DESC, event_id ASC)
               AS rn
             FROM flows)
           WHERE rn <= 3""")),
      doc = "two-phase bounded-heap top-k per key"),

    // SQL-surface function library: formatters + named-table LPM callable
    // from plain SQL text (registry/extension injection, SURVEY §2.11/§4).
    Q("q71_sql_functions",
      (s, d) => {
        graft.functions.GraftFunctions.registerLpmTable("networks",
          new graft.plans.Lpm.Table(16, Dims.networkPrefixes))
        graft.functions.GraftFunctions.register(s)
        flows(s, d).createOrReplaceTempView("flows_fn")
        s.sql("""SELECT graft_proto_name(ip_proto) AS proto,
                 graft_lpm(ip_src, 'networks') AS asn_src,
                 count(*) AS n, CAST(sum(bytes) AS BIGINT) AS bytes
                 FROM flows_fn GROUP BY 1, 2""")
      },
      Some(FlowView.cte(
        s"""SELECT CASE ip_proto WHEN 6 THEN 'tcp' WHEN 17 THEN 'udp'
              ELSE CAST(ip_proto AS VARCHAR) END AS proto,
            (SELECT n.asn FROM (SELECT * FROM (VALUES
              ${graft.maps.Dims.networkPrefixes.map { case (b, l, a) =>
                s"($a, $b, $l)" }.mkString(", ")})
              AS t(asn, base, len)) n
             WHERE ((f.ip_src >> (16 - n.len)) << (16 - n.len)) = n.base
             ORDER BY n.len DESC LIMIT 1) AS asn_src,
            count(*) AS n, CAST(sum(bytes) AS BIGINT) AS bytes
            FROM flows f GROUP BY 1, 2""")),
      doc = "SQL-registered function library incl. named-table LPM")
  )
}
