package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{FlowView, ImtStore, Q, Tables}
import graft.maps.PreTagMap
import graft.maps.PreTagMap.TagRule

/** Late-round parity queries: label tagging/filtering, sequence-loss
  * estimation, IMT merge correctness against the oracle, and the
  * shared-scan multi-plugin fan-out shape.
  */
object ParityQueries {

  private def flows(s: org.apache.spark.sql.SparkSession, d: String) =
    FlowView.fromEvents(Tables.events(s, d))


  val all: Seq[Q] = Seq(

    // pre_tag_map labels + pre_tag_label_filter (CONFIG-KEYS:2327;
    // evaluate_labels_v2 src/plugin_hooks.c:452): string labels instead
    // of numeric tags, filter on label membership.
    Q("q81_label_filter",
      (s, d) => {
        val rules = Seq(
          TagRule(col("port_dst") === 80L, 0L, label = Some("web")),
          TagRule(col("port_dst") === 443L, 0L, label = Some("web-tls")),
          TagRule(col("ip_proto") === 17L, 0L, label = Some("errors")))
        flows(s, d)
          .withColumn("label", PreTagMap.labelColumn(rules))
          .filter(col("label").isin("web", "errors"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"))
      },
      Some(FlowView.cte(
        """SELECT label, count(*) AS n, CAST(sum(bytes) AS BIGINT) AS bytes
           FROM (SELECT bytes,
             CASE WHEN port_dst = 80 THEN 'web'
                  WHEN port_dst = 443 THEN 'web-tls'
                  WHEN ip_proto = 17 THEN 'errors'
                  ELSE '' END AS label
             FROM flows)
           WHERE label IN ('web', 'errors') GROUP BY label""")),
      doc = "pre_tag label chain + label filter"),

    // Sequence-loss estimation (xflow_status jumps → estimated lost
    // records: sum of positive seqno gaps per exporter).
    Q("q82_seqno_loss",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("exporter").orderBy("t0u", "event_id")
        flows(s, d).withColumn("exporter", col("ip_src") % 16)
          .withColumn("delta", col("event_id") - lag("event_id", 1).over(w))
          .groupBy("exporter")
          .agg(count(lit(1)).as("n"),
            sum(when(col("delta") > 1, col("delta") - 1).otherwise(0L))
              .as("est_lost"))
      },
      Some(FlowView.cte(
        """SELECT exporter, count(*) AS n,
           CAST(sum(CASE WHEN delta > 1 THEN delta - 1 ELSE 0 END)
             AS BIGINT) AS est_lost
           FROM (SELECT ip_src % 16 AS exporter,
             event_id - lag(event_id) OVER (PARTITION BY ip_src % 16
               ORDER BY t0u, event_id) AS delta
             FROM flows)
           GROUP BY exporter""")),
      doc = "per-exporter sequence-loss estimation"),

    // IMT store merge correctness: two partial flushes upserted into the
    // in-memory table equal one full aggregation (the oracle) — the
    // plugin-cache partial + final-merge contract (docs/INTERNALS:257-295).
    Q("q83_imt_merge",
      (s, d) => {
        val f = flows(s, d)
        def agg(part: org.apache.spark.sql.DataFrame) = part
          .groupBy("ip_proto", "port_dst")
          .agg(sum("bytes").as("bytes"), count(lit(1)).as("n"))
        val store = new ImtStore(s, "q83_imt",
          Seq("ip_proto", "port_dst"), Seq("bytes", "n"))
        store.upsert(agg(f.filter(col("event_id") % 2 === 0)))
        store.upsert(agg(f.filter(col("event_id") % 2 === 1)))
        store.query(
          "SELECT ip_proto, port_dst, CAST(bytes AS BIGINT) AS bytes, n " +
            "FROM q83_imt")
      },
      Some(FlowView.cte(
        """SELECT ip_proto, port_dst, CAST(sum(bytes) AS BIGINT) AS bytes,
           count(*) AS n
           FROM flows GROUP BY 1, 2""")),
      doc = "IMT partial-flush merge equals full aggregation"),

    // pre_tag_map recirculation (CONFIG-KEYS:2234-2311): after the first
    // tagging pass the map is re-evaluated once with the tag available —
    // second-pass rules match on the pass-1 tag.
    Q("q86_pretag_recirculate",
      (s, d) => {
        val pass1 = Seq(
          TagRule(col("port_dst") === 80L, 10L),
          TagRule(col("port_dst") === 443L, 20L))
        val tagged = flows(s, d)
          .withColumn("tag", PreTagMap.tagColumn(pass1))
        val pass2 = Seq(
          TagRule(col("tag") === 10L && col("bytes") > 500000L, 100L),
          TagRule(col("tag") === 20L, 200L),
          TagRule(col("tag") === 0L && col("ip_proto") === 17L, 300L))
        tagged
          .withColumn("tag2", PreTagMap.tagColumn(pass2))
          .groupBy("tag", "tag2")
          .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"))
      },
      Some(FlowView.cte(
        """SELECT tag,
           CASE WHEN tag = 10 AND bytes2 > 500000 THEN 100
                WHEN tag = 20 THEN 200
                WHEN tag = 0 AND proto = 17 THEN 300
                ELSE 0 END AS tag2,
           count(*) AS n, CAST(sum(bytes2) AS BIGINT) AS bytes
           FROM (
             SELECT CASE WHEN port_dst = 80 THEN 10
                         WHEN port_dst = 443 THEN 20 ELSE 0 END AS tag,
               bytes AS bytes2, ip_proto AS proto
             FROM flows)
           GROUP BY 1, 2""")),
      doc = "pre_tag_map recirculation: second pass matches pass-1 tag"),

    // Shared-scan multi-plugin fan-out (exec_plugins src/plugin_hooks.c:
    // 398): one decoded stream feeds N differently-filtered/aggregated
    // plugin outputs, here unioned with a plugin id column.
    Q("q84_plugin_fanout",
      (s, d) => {
        val f = flows(s, d)
        val p1 = f.filter(col("ip_proto") === 6L).groupBy("port_dst")
          .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"))
          .withColumn("plugin", lit("tcp_acct"))
        val p2 = f.filter(col("bytes") > 500000L).groupBy("port_dst")
          .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"))
          .withColumn("plugin", lit("heavy_hitters"))
        val p3 = f.groupBy("port_dst")
          .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"))
          .withColumn("plugin", lit("all_acct"))
        p1.unionByName(p2).unionByName(p3)
      },
      Some(FlowView.cte(
        """SELECT port_dst, count(*) AS n, CAST(sum(bytes) AS BIGINT)
             AS bytes, 'tcp_acct' AS plugin
           FROM flows WHERE ip_proto = 6 GROUP BY port_dst
           UNION ALL
           SELECT port_dst, count(*) AS n, CAST(sum(bytes) AS BIGINT)
             AS bytes, 'heavy_hitters' AS plugin
           FROM flows WHERE bytes > 500000 GROUP BY port_dst
           UNION ALL
           SELECT port_dst, count(*) AS n, CAST(sum(bytes) AS BIGINT)
             AS bytes, 'all_acct' AS plugin
           FROM flows GROUP BY port_dst""")),
      doc = "shared-scan fan-out to multiple plugin outputs"),

    // pre_tag_map 'filter' key (examples/pretag.map.example:107-110,
    // 258): a rule's MATCH criterion is a libpcap expression evaluated
    // against the packet — the mechanism the lpref.map docs point at
    // for MAC/L2-based direction inference. Here the map's filters
    // compile through the same plans/BpfFilter the aggregate_filter
    // path uses, composed with an 'in' interface key, first-match-wins
    // like every pretag chain. A compiler or precedence defect
    // re-tags whole rule populations.
    Q("q192_pretag_bpf",
      (s, d) => {
        import graft.plans.BpfFilter
        val f = flows(s, d).withColumn("iface", col("port_src") % 4)
        val fields = BpfFilter.Fields(
          ipSrc = col("ip_src"), ipDst = col("ip_dst"),
          portSrc = col("port_src"), portDst = col("port_dst"),
          proto = col("ip_proto"), bytes = col("bytes"),
          packets = col("packets"))
        // set_tag=10 filter='udp and dst port 53'
        // set_tag=20 in=1 filter='tcp and dst port 443'
        // set_tag=30 filter='not tcp'
        val r1 = BpfFilter.compile("udp and dst port 53", fields)
        val r2 = BpfFilter.compile("tcp and dst port 443", fields) &&
          col("iface") === 1L
        val r3 = BpfFilter.compile("not tcp", fields)
        f.withColumn("tag",
            when(r1, 10L).when(r2, 20L).when(r3, 30L).otherwise(0L))
          .groupBy("tag")
          .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"))
      },
      Some(FlowView.cte(
        """SELECT CASE
             WHEN ip_proto = 17 AND port_dst = 53 THEN 10
             WHEN ip_proto = 6 AND port_dst = 443
                  AND port_src % 4 = 1 THEN 20
             WHEN ip_proto != 6 THEN 30
             ELSE 0 END AS tag,
           count(*) AS n, CAST(sum(bytes) AS BIGINT) AS bytes
           FROM flows GROUP BY 1""")),
      doc = "pre_tag_map filter key: BPF-compiled rules, first-match-wins"),

    // maps_refresh + SIGUSR2 (CONFIG-KEYS): map files reload at
    // runtime without restart — records processed before the reload
    // instant carry the OLD map's tags, records after carry the NEW
    // map's. Relationally that is an as-of versioned dimension: two
    // rule generations with a validity boundary at the reload instant
    // (the data midpoint here), applied per record time. Tag
    // populations split exactly at the boundary; a wrong-era
    // application moves whole groups.
    Q("q193_maps_reload",
      (s, d) => {
        val f = flows(s, d).withColumn("exporter", col("ip_src") % 16)
        val bounds = f.groupBy().agg(
          min("t0u").as("tmin"), max("t0u").as("tmax"))
        f.crossJoin(broadcast(bounds))
          .withColumn("reload_t",
            expr("tmin + (tmax - tmin) div 2"))
          .withColumn("era",
            when(col("t0u") < col("reload_t"), 1L).otherwise(2L))
          .withColumn("tag",
            when(col("era") === 1L, // map v1: only https tagged
              when(col("port_dst") === 443L,
                lit(100L) + col("exporter") % 4).otherwise(0L))
            .otherwise(              // map v2: https+alt, new id plan
              when(col("port_dst").isin(443L, 8443L),
                lit(200L) + col("exporter") % 8).otherwise(0L)))
          .groupBy("era", "tag")
          .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"))
      },
      Some(FlowView.cte(
        """SELECT era, tag, count(*) AS n,
             CAST(sum(bytes) AS BIGINT) AS bytes
           FROM (
             SELECT CASE WHEN t0u < (SELECT min(t0u) +
                 (max(t0u) - min(t0u)) // 2 FROM flows) THEN 1 ELSE 2
               END AS era,
               port_dst, ip_src % 16 AS exporter, bytes, t0u
             FROM flows) f
           CROSS JOIN LATERAL (SELECT CASE
             WHEN era = 1 AND port_dst = 443
               THEN 100 + exporter % 4
             WHEN era = 2 AND port_dst IN (443, 8443)
               THEN 200 + exporter % 8
             ELSE 0 END AS tag) t
           GROUP BY 1, 2""")),
      doc = "maps_refresh/SIGUSR2: as-of versioned map application"),

    // print_markers / kafka_markers (CONFIG-KEYS): every purge batch
    // brackets its records with purge_init/purge_close messages
    // carrying writer id and entry counts, so a consumer can detect
    // truncated batches. The producer emits the marked JSON stream
    // per 5-minute purge; the CONSUMER side re-parses every message
    // (from_json over the union schema) and reconciles each batch's
    // data count against its close marker — the integrity check the
    // markers exist for.
    Q("q194_print_markers",
      (s, d) => {
        val f = flows(s, d)
          .withColumn("bin", expr("t0u div 300000000"))
        val data = f.select(col("bin"), to_json(struct(
          lit("data").as("type"), col("bin"), col("port_dst"),
          col("bytes"))).as("msg"))
        val markers = f.groupBy("bin")
          .agg(count(lit(1)).as("entries"))
          .select(col("bin"), to_json(struct(
            lit("purge_close").as("type"), col("bin"),
            col("entries"),
            concat(lit("w"), (col("bin") % 8).cast("string"))
              .as("writer_id"))).as("msg"))
        val stream = data.union(markers)
        val sch = org.apache.spark.sql.types.StructType.fromDDL(
          "type STRING, bin BIGINT, port_dst BIGINT, " +
          "bytes BIGINT, entries BIGINT, writer_id STRING")
        stream.select(from_json(col("msg"), sch).as("m"))
          .select(col("m.type").as("tp"), col("m.bin").as("bin"),
            col("m.entries").as("entries"))
          .groupBy("bin")
          .agg(
            sum(when(col("tp") === "data", 1L).otherwise(0L))
              .as("n_data"),
            max(when(col("tp") === "purge_close", col("entries")))
              .as("close_entries"))
          .withColumn("writer_id",
            concat(lit("w"), (col("bin") % 8).cast("string")))
          .groupBy("writer_id")
          .agg(count(lit(1)).as("n_batches"),
            sum("n_data").as("entries"),
            sum(when(col("n_data") === col("close_entries"), 1L)
              .otherwise(0L)).as("n_reconciled"))
      },
      Some(FlowView.cte(
        """SELECT 'w' || CAST((t0u // 300000000) % 8 AS VARCHAR)
             AS writer_id,
           count(DISTINCT t0u // 300000000) AS n_batches,
           count(*) AS entries,
           count(DISTINCT t0u // 300000000) AS n_reconciled
           FROM flows GROUP BY 1""")),
      doc = "print/kafka markers: purge_close entry counts reconciled"),

    // sql_table_version v1-v9 legacy schemas (CONFIG-KEYS:1301-1327;
    // sql/pmacct-create-db_v{1..9}.mysql; versioning rules
    // sql/README.mysql:66-140): anyone migrating existing pmacct SQL
    // consumers depends on the EXACT legacy column mapping — v1 has no
    // tag column, v2-v8 write it as agent_id, v9 as tag; below v6 the
    // AS numbers land IN the host columns; v8 renames src_port ->
    // port_src. Each version's render is summarized as (column list,
    // tag sum, host-column sum, row count) and the oracle hard-codes
    // the reference's own schema column lists — a mapping drift breaks
    // the string, a folding drift breaks the sums.
    Q("q201_sql_table_version",
      (s, d) => {
        import graft.sinks.SqlSchema
        val canonical = flows(s, d).select(
          (col("ip_dst") % 16).as("tag"),
          (lit(64000L) + col("ip_src") % 32).as("as_src"),
          (lit(64000L) + col("ip_dst") % 32).as("as_dst"),
          col("ip_src"), col("ip_dst"), col("port_src"), col("port_dst"),
          col("tcp_flags"), col("ip_proto"),
          (col("tcp_flags") % 4).as("tos"),
          col("packets"), col("bytes"))
        val sp = s
        import sp.implicits._
        // ONE corpus pass computes every sum any schema version picks
        // (six per-version agg branches were six scans of the same
        // parquet in one plan — PlanAudit's repeated-scan rule); the
        // per-version projections still build, because their COLUMN
        // surface is the gated artifact, and inspecting p.columns is
        // schema-only (no execution). Which sum each version's ip_src
        // carries (the raw host vs the v<6 AS fold) derives from
        // SqlSchema's own column registry, not a hard-coded list.
        val a = canonical.agg(count(lit(1)).as("n"),
          sum(col("tag")).as("sum_tag"),
          sum(col("as_src")).as("sum_as_fold"),
          sum(col("ip_src")).as("sum_ip"),
          sum(col("port_src")).as("sum_port")).head()
        Seq(1, 2, 5, 6, 8, 9).map { v =>
          val p = SqlSchema.project(canonical, v, asAccounting = true)
          val names = SqlSchema.columnsFor(v, asAccounting = true)
            .map(_._2)
          val hasTag = p.columns.contains("tag") ||
            p.columns.contains("agent_id")
          val folded = !names.contains("as_src") // v<6: ip_src IS the AS
          require(p.columns.contains("port_src") ||
            p.columns.contains("src_port"), s"v$v lost the port column")
          (v.toLong, names.mkString(","), a.getLong(0),
            if (hasTag) a.getLong(1) else 0L,
            if (folded) a.getLong(2) else a.getLong(3),
            a.getLong(4))
        }.toDF("version", "cols", "n", "sum_tag", "sum_host_src",
          "sum_port_src")
      },
      Some(FlowView.cte(
        """SELECT v.version,
             CASE v.version
               WHEN 1 THEN 'mac_src,mac_dst,ip_src,ip_dst,src_port,dst_port,ip_proto,packets,bytes'
               WHEN 2 THEN 'agent_id,mac_src,mac_dst,vlan,ip_src,ip_dst,src_port,dst_port,ip_proto,packets,bytes'
               WHEN 5 THEN 'agent_id,class_id,mac_src,mac_dst,vlan,ip_src,ip_dst,src_port,dst_port,ip_proto,tos,packets,bytes,flows'
               WHEN 6 THEN 'agent_id,class_id,mac_src,mac_dst,vlan,as_src,as_dst,ip_src,ip_dst,src_port,dst_port,ip_proto,tos,packets,bytes,flows'
               WHEN 8 THEN 'agent_id,class_id,mac_src,mac_dst,vlan,as_src,as_dst,ip_src,ip_dst,port_src,port_dst,tcp_flags,ip_proto,tos,packets,bytes,flows'
               WHEN 9 THEN 'tag,class_id,mac_src,mac_dst,vlan,as_src,as_dst,ip_src,ip_dst,port_src,port_dst,tcp_flags,ip_proto,tos,packets,bytes,flows'
             END AS cols,
             count(*) AS n,
             CAST(CASE WHEN v.version = 1 THEN 0
               ELSE sum(ip_dst % 16) END AS BIGINT) AS sum_tag,
             CAST(CASE WHEN v.version < 6
               THEN sum(64000 + ip_src % 32)
               ELSE sum(ip_src) END AS BIGINT) AS sum_host_src,
             CAST(sum(port_src) AS BIGINT) AS sum_port_src
           FROM flows, (SELECT unnest([1, 2, 5, 6, 8, 9]) AS version) v
           GROUP BY 1, 2""")),
      doc = "sql_table_version v1-v9 legacy column mapping + AS folding"),

    // sql_use_copy (CONFIG-KEYS:1502-1514; pgsql_plugin.c:699
    // copy_clause, :851 COPY-IN + PQputCopyData): the PostgreSQL bulk
    // path renders each purge as ONE `COPY t (...) FROM STDIN
    // DELIMITER ','` statement plus raw delimiter-joined text lines.
    // The gate renders the aggregated flow cache per partition (the
    // sink's foreachPartition shape), PARSES the wire body back, and
    // re-aggregates — the round-trip totals must equal the base table's,
    // and every line must carry exactly the declared column count.
    Q("q256_sql_pg_copy",
      (s, d) => {
        import graft.sinks.SqlBulk
        val sp = s
        import sp.implicits._
        val cols = Seq("ip_src", "ip_dst", "port_dst", "ip_proto",
          "packets", "bytes")
        val cache = flows(s, d)
          .groupBy("ip_src", "ip_dst", "port_dst", "ip_proto")
          .agg(sum("packets").as("packets"), sum("bytes").as("bytes"))
        val stmt = SqlBulk.pgCopyStatement("acct", cols)
        val lines = cache
          .as[(Long, Long, Long, Long, Long, Long)]
          .mapPartitions { it =>
            it.map(r => SqlBulk.pgCopyLine(
              Seq(r._1, r._2, r._3, r._4, r._5, r._6)))
          }
        val parsed = lines.map { l =>
          val a = SqlBulk.parsePgCopyLine(l)
          (a.length.toLong, a(2).toLong, a(4).toLong, a(5).toLong)
        }.toDF("arity", "port_dst", "packets", "bytes")
        val rt = parsed
          .groupBy(col("port_dst").cast("string").as("key"))
          .agg(count(lit(1)).as("n"), sum("bytes").as("v"))
          .select(lit("rt").as("kind"), col("key"), col("n"), col("v"))
        val pk = parsed
          .groupBy(col("port_dst").cast("string").as("key"))
          .agg(count(lit(1)).as("n"), sum("packets").as("v"))
          .select(lit("rt_pkts").as("kind"), col("key"), col("n"),
            col("v"))
        val form = parsed.agg(count(lit(1)).as("n"),
            count(when(col("arity") =!= cols.length, 1)).as("v"))
          .select(lit("copy_stmt").as("kind"), lit(stmt).as("key"),
            col("n"), col("v"))
        rt.unionByName(pk).unionByName(form)
      },
      Some(FlowView.cte(
        """, c AS (SELECT ip_src, ip_dst, port_dst, ip_proto,
             CAST(sum(packets) AS BIGINT) AS packets,
             CAST(sum(bytes) AS BIGINT) AS bytes
           FROM flows GROUP BY 1, 2, 3, 4)
           SELECT 'rt' AS kind, CAST(port_dst AS VARCHAR) AS key,
             count(*) AS n, CAST(sum(bytes) AS BIGINT) AS v
           FROM c GROUP BY 2
           UNION ALL
           SELECT 'rt_pkts', CAST(port_dst AS VARCHAR),
             count(*), CAST(sum(packets) AS BIGINT)
           FROM c GROUP BY 2
           UNION ALL
           SELECT 'copy_stmt',
             'COPY acct (ip_src, ip_dst, port_dst, ip_proto, packets, bytes) FROM STDIN DELIMITER '',''',
             count(*), 0 FROM c""")),
      doc = "sql_use_copy: PostgreSQL COPY wire-form round-trip"),

    // sql_multi_values (CONFIG-KEYS:1520-1530; mysql_plugin.c:360-407):
    // the MySQL bulk path packs row tuples into multi-values INSERT
    // statements bounded by a byte budget, flushing on overflow. The
    // gate packs per partition with a deliberately tight 512-byte
    // buffer (so every partition flushes many statements), parses the
    // statements back, re-aggregates, and counts two violation classes
    // the packing contract forbids: statements over budget and
    // statements not bearing the INSERT header. SqlBulkSpec pins the
    // exact packing sequence on a hand-built fixture.
    Q("q257_sql_mysql_multi",
      (s, d) => {
        import graft.sinks.SqlBulk
        val sp = s
        import sp.implicits._
        val cols = Seq("ip_src", "ip_dst", "port_dst", "ip_proto",
          "packets", "bytes")
        val bufBytes = 512
        val header = SqlBulk.mysqlInsertHeader("acct", cols)
        val cache = flows(s, d)
          .groupBy("ip_src", "ip_dst", "port_dst", "ip_proto")
          .agg(sum("packets").as("packets"), sum("bytes").as("bytes"))
        val stmts = cache
          .as[(Long, Long, Long, Long, Long, Long)]
          .mapPartitions { it =>
            SqlBulk.mysqlMultiValues("acct", cols,
              it.map(r => Seq(r._1, r._2, r._3, r._4, r._5, r._6)),
              bufBytes)
          }
        val parsed = stmts.flatMap { st =>
          val over = if (st.length > bufBytes) 1L else 0L
          val badHdr = if (st.startsWith(header)) 0L else 1L
          SqlBulk.parseMysqlMultiValues(st).map { t =>
            (t(2).toLong, t(4).toLong, t(5).toLong, over, badHdr)
          }
        }.toDF("port_dst", "packets", "bytes", "over", "bad_hdr")
        val rt = parsed
          .groupBy(col("port_dst").cast("string").as("key"))
          .agg(count(lit(1)).as("n"), sum("bytes").as("v"))
          .select(lit("rt").as("kind"), col("key"), col("n"), col("v"))
        val pk = parsed
          .groupBy(col("port_dst").cast("string").as("key"))
          .agg(count(lit(1)).as("n"), sum("packets").as("v"))
          .select(lit("rt_pkts").as("kind"), col("key"), col("n"),
            col("v"))
        val form = parsed.agg(count(lit(1)).as("n"),
            (sum("over") + sum("bad_hdr")).as("v"))
          .select(lit("insert_hdr").as("kind"), lit(header).as("key"),
            col("n"), col("v"))
        rt.unionByName(pk).unionByName(form)
      },
      Some(FlowView.cte(
        """, c AS (SELECT ip_src, ip_dst, port_dst, ip_proto,
             CAST(sum(packets) AS BIGINT) AS packets,
             CAST(sum(bytes) AS BIGINT) AS bytes
           FROM flows GROUP BY 1, 2, 3, 4)
           SELECT 'rt' AS kind, CAST(port_dst AS VARCHAR) AS key,
             count(*) AS n, CAST(sum(bytes) AS BIGINT) AS v
           FROM c GROUP BY 2
           UNION ALL
           SELECT 'rt_pkts', CAST(port_dst AS VARCHAR),
             count(*), CAST(sum(packets) AS BIGINT)
           FROM c GROUP BY 2
           UNION ALL
           SELECT 'insert_hdr',
             'INSERT INTO acct (ip_src, ip_dst, port_dst, ip_proto, packets, bytes) VALUES',
             count(*), 0 FROM c""")),
      doc = "sql_multi_values: MySQL multi-INSERT packing round-trip")
  )
}
