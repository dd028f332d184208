package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{FlowView, Q, Tables}

/** Primitive-family coverage (SURVEY §1.1/§1.3): the MPLS/tunnel structs
  * and the BGP attribute encodings (as_path / communities as bounded
  * strings AND as arrays — `as_path_encode_as_array`,
  * `bgp_comms_encode_as_array`, `mpls_label_stack_encode_as_array`,
  * CONFIG-KEYS:1745-1784). Values are derived deterministically from the
  * flow view, mirrored in the oracle; what is exercised is the array
  * encode/decode expression surface and grouping on derived primitives.
  */
object PrimitiveQueries {

  private def flows(s: org.apache.spark.sql.SparkSession, d: String) =
    FlowView.fromEvents(Tables.events(s, d))

  val all: Seq[Q] = Seq(

    // MPLS label stack + VXLAN VNI: stack as "pos-label" array encoding
    // joined to its string form (mpls_label_stack_encode_as_array).
    Q("q65_mpls_tunnel",
      (s, d) => flows(s, d)
        .withColumn("label_top", col("event_id") % 1048576)
        .withColumn("label_bot", (col("event_id") * 7) % 1048576)
        .withColumn("vni", col("ip_src") % 16777216)
        .withColumn("stack_str", expr(
          """array_join(transform(array(label_top, label_bot),
             (l, i) -> concat(cast(i as string), '-', cast(l as string))),
             ',')"""))
        .groupBy((col("label_top") % 64).as("label_bucket"),
          (col("vni") % 32).as("vni_bucket"))
        .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"),
          max("stack_str").as("stack_sample")),
      Some(FlowView.cte(
        """SELECT (event_id % 1048576) % 64 AS label_bucket,
           (ip_src % 16777216) % 32 AS vni_bucket,
           count(*) AS n, CAST(sum(bytes) AS BIGINT) AS bytes,
           max(concat('0-', CAST(event_id % 1048576 AS VARCHAR),
             ',1-', CAST((event_id * 7) % 1048576 AS VARCHAR)))
             AS stack_sample
           FROM flows GROUP BY 1, 2""")),
      doc = "MPLS label stack + tunnel VNI primitives, array encoding"),

    // as_path / communities: string and array encodings; filter on
    // community membership, group on path length.
    Q("q66_bgp_attrs",
      (s, d) => flows(s, d)
        .withColumn("as_path", expr(
          """concat('64500 ', cast(ip_dst % 100 + 64600 as string),
             CASE WHEN ip_dst % 3 = 0
               THEN concat(' ', cast(ip_dst % 50 + 64800 as string))
               ELSE '' END)"""))
        .withColumn("comms", expr(
          """concat('64500:', cast(ip_dst % 8 as string), ' 64500:',
             cast(port_dst as string))"""))
        .filter(expr("array_contains(split(comms, ' '), '64500:80')") ||
          expr("array_contains(split(comms, ' '), '64500:53')"))
        .groupBy(expr("size(split(as_path, ' '))").as("path_len"))
        .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"),
          countDistinct(expr("element_at(split(as_path, ' '), -1)"))
            .as("n_origins")),
      Some(FlowView.cte(
        """SELECT len(string_split(as_path, ' ')) AS path_len,
           count(*) AS n, CAST(sum(bytes) AS BIGINT) AS bytes,
           count(DISTINCT list_extract(string_split(as_path, ' '),
             len(string_split(as_path, ' ')))) AS n_origins
           FROM (
             SELECT bytes,
               concat('64500 ', CAST(ip_dst % 100 + 64600 AS VARCHAR),
                 CASE WHEN ip_dst % 3 = 0
                   THEN concat(' ', CAST(ip_dst % 50 + 64800 AS VARCHAR))
                   ELSE '' END) AS as_path,
               concat('64500:', CAST(ip_dst % 8 AS VARCHAR), ' 64500:',
                 CAST(port_dst AS VARCHAR)) AS comms
             FROM flows)
           WHERE list_contains(string_split(comms, ' '), '64500:80')
              OR list_contains(string_split(comms, ' '), '64500:53')
           GROUP BY 1""")),
      doc = "as_path/communities string+array encodings, membership filter"),

    // mpls_vpn_rd precedence: flow_to_rd map > per-record RD > option RD
    // > vrf id (NF_mpls_vpn_rd_handler, src/pkt_handlers.c:2221;
    // CONFIG-KEYS:133-137). Candidates derived with deterministic nulls;
    // the map is the (exporter, iface) dimension.
    Q("q68_rd_precedence",
      (s, d) => {
        val f = flows(s, d)
          .withColumn("exporter", col("ip_src") % 16)
          .withColumn("iface", col("ip_dst") % 4)
          // map rd only for ifaces 0/1 on even exporters
          .withColumn("rd_map",
            when(col("exporter") % 2 === 0 && col("iface") < 2,
              concat(lit("0:64500:"), col("iface"))))
          .withColumn("rd_flow",
            when(col("event_id") % 3 === 0,
              concat(lit("0:64501:"), col("event_id") % 8)))
          .withColumn("rd_option",
            when(col("event_id") % 2 === 0,
              concat(lit("0:64502:"), col("exporter"))))
          .withColumn("rd_vrf", concat(lit("vrfid:"), col("iface")))
        f.withColumn("mpls_vpn_rd",
            coalesce(col("rd_map"), col("rd_flow"), col("rd_option"),
              col("rd_vrf")))
          .withColumn("rd_origin",
            when(col("rd_map").isNotNull, "map")
              .when(col("rd_flow").isNotNull, "flow")
              .when(col("rd_option").isNotNull, "option")
              .otherwise("vrf"))
          .groupBy("rd_origin")
          .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"),
            countDistinct("mpls_vpn_rd").as("n_rds"))
      },
      Some(FlowView.cte(
        """SELECT rd_origin, count(*) AS n,
           CAST(sum(bytes) AS BIGINT) AS bytes,
           count(DISTINCT mpls_vpn_rd) AS n_rds
           FROM (
             SELECT bytes,
               coalesce(rd_map, rd_flow, rd_option, rd_vrf) AS mpls_vpn_rd,
               CASE WHEN rd_map IS NOT NULL THEN 'map'
                    WHEN rd_flow IS NOT NULL THEN 'flow'
                    WHEN rd_option IS NOT NULL THEN 'option'
                    ELSE 'vrf' END AS rd_origin
             FROM (
               SELECT bytes, event_id,
                 CASE WHEN (ip_src % 16) % 2 = 0 AND ip_dst % 4 < 2
                   THEN concat('0:64500:', CAST(ip_dst % 4 AS VARCHAR)) END
                   AS rd_map,
                 CASE WHEN event_id % 3 = 0
                   THEN concat('0:64501:', CAST(event_id % 8 AS VARCHAR)) END
                   AS rd_flow,
                 CASE WHEN event_id % 2 = 0
                   THEN concat('0:64502:', CAST(ip_src % 16 AS VARCHAR)) END
                   AS rd_option,
                 concat('vrfid:', CAST(ip_dst % 4 AS VARCHAR)) AS rd_vrf
               FROM flows))
           GROUP BY 1""")),
      doc = "mpls_vpn_rd source precedence (map > flow > option > vrf)"),

    // bgp_peer_src_as_map fallback: peer_src_as from the reverse BGP
    // lookup when available, else from the (exporter, iface) map
    // (CONFIG-KEYS:2902-2920 — map used "when not from BGP").
    Q("q69_peer_src_as_fallback",
      (s, d) => {
        import graft.maps.Dims
        import graft.plans.Lpm
        val netTable = new Lpm.Table(16, Dims.networkPrefixes)
        flows(s, d)
          .withColumn("exporter", col("ip_src") % 16)
          .withColumn("as_bgp", Lpm.lpm(col("ip_src"), netTable))
          .withColumn("as_map", lit(64900L) + col("exporter") % 4)
          .withColumn("peer_src_as", coalesce(col("as_bgp"), col("as_map")))
          .withColumn("src", when(col("as_bgp").isNotNull, "bgp")
            .otherwise("map"))
          .groupBy("src", "peer_src_as")
          .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"))
      },
      Some(s"""WITH flows AS (${FlowView.sql}), ${graft.maps.Dims.networksSql}
            SELECT CASE WHEN as_bgp IS NOT NULL THEN 'bgp' ELSE 'map' END
              AS src,
              coalesce(as_bgp, 64900 + (ip_src % 16) % 4) AS peer_src_as,
              count(*) AS n, CAST(sum(bytes) AS BIGINT) AS bytes
            FROM (
              SELECT bytes, ip_src,
                (SELECT n.asn FROM networks n
                 WHERE ((f.ip_src >> (16 - n.len)) << (16 - n.len)) = n.base
                 ORDER BY n.len DESC LIMIT 1) AS as_bgp
              FROM flows f)
            GROUP BY 1, 2"""),
      doc = "peer_src_as: BGP reverse lookup with map fallback"),

    // MPLS path delay (pkt_mpls_primitives path_delay_{avg,min,max}_usec,
    // src/network.h:634-640; NF_path_delay_*_usec_handler,
    // src/pkt_handlers.h:126-128): per-label-top delay statistics in
    // microseconds. avg is emitted as an exact (sum, n) pair — the
    // scaled-integer convention — so parity never depends on float
    // division; a consumer derives the mean.
    Q("q122_mpls_pathdelay",
      (s, d) => flows(s, d)
        .withColumn("label_top", lit(16L) + col("ip_dst") % 8)
        .withColumn("delay_us", col("t1u") - col("t0u"))
        .groupBy("label_top")
        .agg(count(lit(1)).as("n"),
          min("delay_us").as("delay_min_us"),
          max("delay_us").as("delay_max_us"),
          sum("delay_us").as("delay_sum_us")),
      Some(FlowView.cte(
        """SELECT 16 + ip_dst % 8 AS label_top, count(*) AS n,
           min(t1u - t0u) AS delay_min_us,
           max(t1u - t0u) AS delay_max_us,
           CAST(sum(t1u - t0u) AS BIGINT) AS delay_sum_us
           FROM flows GROUP BY 1""")),
      doc = "MPLS path delay min/max/sum per top label"),

    // SRv6 segment list (srv6_seg_ipv6_list, src/network.h:564-565,
    // NF9_srhSegmentIPv6ListSection=497 src/nfv9_template.h:188,
    // NF_srv6_segment_ipv6_list_handler src/pkt_handlers.h:118): the one
    // reference primitive that is a LIST of addresses per record
    // (MAX 16 entries, serialized as a JSON/Avro array —
    // plugin_cmn_json.h:40). Derived SRH of 1-3 segments per flow,
    // exploded and aggregated per segment — the explode is the Spark
    // shape for array-primitive group-bys at scale (no per-row loops).
    Q("q123_srv6_seglist",
      (s, d) => flows(s, d)
        .withColumn("nseg", lit(1L) + col("ip_dst") % 3)
        .withColumn("seg", explode(expr(
          """transform(sequence(1, nseg),
             i -> concat(cast(i as string), ':',
                         cast((ip_dst + i) % 4096 as string)))""")))
        .groupBy("seg")
        .agg(count(lit(1)).as("n"), sum("bytes").as("bytes")),
      Some(FlowView.cte(
        """SELECT seg, count(*) AS n, CAST(sum(bytes) AS BIGINT) AS bytes
           FROM (
             SELECT unnest(list_transform(range(1, (1 + ip_dst % 3) + 1),
                      i -> i || ':' || ((ip_dst + i) % 4096))) AS seg,
                    bytes
             FROM flows)
           GROUP BY 1""")),
      doc = "SRv6 segment-list array primitive, exploded aggregation"),

    // bgp_src_local_pref_map / bgp_src_med_map (CONFIG-KEYS:2949-2985;
    // examples/lpref.map.example; pretag_src_local_pref_handler,
    // src/pretag_handlers.c:2220): rules match on (exporter, input
    // iface); a rule's id is either a hard-coded value or the literal
    // 'bgp' keyword, which falls through to a reverse (source-side)
    // RIB lookup — and flows with NO matching rule take the
    // bgp_src_*_type default, also the RIB. Both attributes resolve in
    // one pass: the rule table is arithmetic here, the RIB probe is
    // the plan-resident LPM expression (no joins, no shuffle).
    Q("q172_src_lpref_med",
      (s, d) => {
        import graft.maps.Dims
        import graft.plans.Lpm
        val netTable = new Lpm.Table(16, Dims.networkPrefixes)
        flows(s, d)
          .withColumn("exporter", col("ip_src") % 16)
          .withColumn("iface", col("port_src") % 4)
          .withColumn("has_rule",
            (col("exporter") + col("iface")) % 5 =!= 0)
          .withColumn("rule_bgp", col("exporter") % 3 === 0)
          .withColumn("as_bgp", Lpm.lpm(col("ip_src"), netTable))
          .withColumn("lp_bgp", coalesce(col("as_bgp") % 500, lit(100L)))
          .withColumn("med_bgp", coalesce(col("as_bgp") % 300, lit(0L)))
          .withColumn("src", when(col("has_rule") && !col("rule_bgp"),
              "map").when(col("has_rule"), "bgp").otherwise("default"))
          .withColumn("lp", when(col("src") === "map",
            lit(50L) + col("exporter") * 4 + col("iface"))
            .otherwise(col("lp_bgp")))
          .withColumn("med", when(col("src") === "map",
            lit(10L) + col("iface")).otherwise(col("med_bgp")))
          .groupBy("src", "lp", "med")
          .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"))
      },
      Some(s"""WITH flows AS (${FlowView.sql}),
            ${graft.maps.Dims.networksSql},
            t AS (SELECT bytes, ip_src % 16 AS exporter,
                port_src % 4 AS iface,
                (SELECT n.asn FROM networks n
                 WHERE ((f.ip_src >> (16 - n.len)) << (16 - n.len))
                   = n.base
                 ORDER BY n.len DESC LIMIT 1) AS as_bgp
              FROM flows f),
            r AS (SELECT bytes, exporter, iface,
                coalesce(as_bgp % 500, 100) AS lp_bgp,
                coalesce(as_bgp % 300, 0) AS med_bgp,
                CASE WHEN (exporter + iface) % 5 != 0
                       AND exporter % 3 != 0 THEN 'map'
                     WHEN (exporter + iface) % 5 != 0 THEN 'bgp'
                     ELSE 'default' END AS src
              FROM t)
            SELECT src,
              CASE WHEN src = 'map' THEN 50 + exporter * 4 + iface
                   ELSE lp_bgp END AS lp,
              CASE WHEN src = 'map' THEN 10 + iface
                   ELSE med_bgp END AS med,
              count(*) AS n, CAST(sum(bytes) AS BIGINT) AS bytes
            FROM r GROUP BY 1, 2, 3"""),
      doc = "src local-pref/MED maps: rule, 'bgp' keyword, RIB default")
  )
}
