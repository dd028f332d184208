package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{ImtStore, Salt}
import graft.maps.Bloom
import graft.plans.Lpm

class StateSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("ImtStore: upsert merges counters, reset zeroes, erase empties") {
    val store = new ImtStore(spark, "imt_test", Seq("k"), Seq("bytes", "n"))
    store.upsert(Seq(("a", 10L, 1L), ("b", 20L, 1L)).toDF("k", "bytes", "n"))
    store.upsert(Seq(("a", 5L, 2L)).toDF("k", "bytes", "n"))
    val merged = store.query("SELECT k, bytes, n FROM imt_test ORDER BY k")
      .as[(String, Long, Long)].collect().toSeq
    assert(merged == Seq(("a", 15L, 3L), ("b", 20L, 1L)))

    store.reset()
    val zeroed = store.query("SELECT sum(bytes) FROM imt_test")
      .as[Long].head()
    assert(zeroed == 0L && store.table.count() == 2)

    store.erase()
    assert(store.table.count() == 0)
  }

  test("q316 logreg: the trained filter beats the majority baseline") {
    // the oracle pins the exact arithmetic; THIS pins the quality
    // contract — full-batch GD with the scaled bias must actually
    // learn the length rule, not collapse to the class prior
    val rows = SparkEntry.queries("q316_logreg_trainer")(
      spark, "/root/testdata/sf0.001").collect()
    val accs = rows.filter(_.getString(0) == "acc")
    val n = accs.map(_.getLong(2)).sum
    val correct = accs.map(_.getLong(3)).sum
    val majority = {
      import graft.core.Tables
      val y = Tables.documents(spark, "/root/testdata/sf0.001")
        .selectExpr("CAST(n_chars > 300 AS INT) AS y")
        .groupBy("y").count().as[(Int, Long)].collect().toMap
      math.max(y.getOrElse(0, 0L), y.getOrElse(1, 0L))
    }
    assert(correct > majority,
      s"acc $correct/$n does not beat majority $majority/$n")
    assert(correct * 10 >= n * 8, s"acc $correct/$n below 0.8")
  }

  test("salted aggregation equals direct aggregation") {
    val df = (1 to 500).map(i => (i % 7L, i.toLong, i * 3L))
      .toDF("k", "id", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("v"), count(lit(1)).as("n"), min("id").as("mn"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val salted = Salt.aggregate(df, Seq("k"), col("id"), 16, Seq(
      Salt.sum2("v", col("v")), Salt.count2("n"), Salt.min2("mn", col("id"))))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(salted == direct)
  }

  test("bloom filter: no false negatives, rejects most non-members") {
    val members = (1L to 100L).map(i => i * 37L)
    val dim = members.toDF("v")
    val sketch = Bloom.build(dim, col("v"), 100L, 4096L)
    val probe = (1L to 100L).map(i => i * 37L) ++ (1L to 1000L).map(_ + 500000L)
    val got = probe.toDF("v")
      .withColumn("hit", Bloom.mightContain(sketch, col("v")))
      .as[(Long, Boolean)].collect()
    val memberSet = members.toSet
    assert(got.filter(r => memberSet(r._1)).forall(_._2)) // no false negs
    val fp = got.filter(r => !memberSet(r._1)).count(_._2)
    assert(fp < 100) // loose FP bound at 4096 bits / 100 items
  }

  test("TopK.perKey equals the window-rank plan") {
    import graft.plans.TopK
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(3)
    val df = Seq.fill(2000)((rnd.nextInt(10).toLong, rnd.nextLong().abs,
      rnd.nextInt(100).toLong)).toDF("k", "id", "v")
    val viaTopK = TopK.perKey(df, Seq("k"), "v", "id", 5)
      .select("k", "id", "v").as[(Long, Long, Long)].collect().toSet
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("k", "id", "v")
      .as[(Long, Long, Long)].collect().toSet
    assert(viaTopK == viaWindow)
  }

  test("salted aggregation preserves bit_or and max merges") {
    val df = (1 to 300).map(i => (i % 5L, i.toLong, (i % 8).toLong))
      .toDF("k", "id", "flags")
    val direct = df.groupBy("k")
      .agg(bit_or(col("flags")).as("f"), max(col("id")).as("m"))
      .as[(Long, Long, Long)].collect().toSet
    val salted = Salt.aggregate(df, Seq("k"), col("id"), 8, Seq(
      Salt.bitOr2("f", col("flags")), Salt.max2("m", col("id"))))
      .as[(Long, Long, Long)].collect().toSet
    assert(salted == direct)
  }

  test("BPF precedence: and binds tighter than or") {
    import graft.plans.BpfFilter
    val df = Seq(
      (6L, 80L, 10L),   // tcp — passes via left arm
      (17L, 53L, 10L),  // udp+53 but small bytes — needs both right terms
      (17L, 53L, 999L), // udp+53+big — passes via right arm
      (17L, 80L, 999L)) // udp wrong port — fails
      .toDF("ip_proto", "port_dst", "bytes")
    val f = BpfFilter.Fields(lit(0L), lit(0L), lit(0L), col("port_dst"),
      col("ip_proto"), col("bytes"), lit(1L))
    // tcp or (dst port 53 and bytes > 100)
    val got = df.filter(BpfFilter.compile(
      "tcp or dst port 53 and bytes > 100", f)).count()
    assert(got == 2)
  }

  test("ImtStore accepts upserts again after erase") {
    val store = new ImtStore(spark, "imt_test2", Seq("k"), Seq("n"))
    store.upsert(Seq(("a", 1L)).toDF("k", "n"))
    store.erase()
    store.upsert(Seq(("b", 2L), ("b", 3L)).toDF("k", "n"))
    val got = store.query("SELECT k, n FROM imt_test2")
      .as[(String, Long)].collect().toSet
    assert(got == Set(("b", 5L))) // batch rows merge per key on upsert
  }

  test("ImtStore upsert is O(batch): deltas accumulate, compaction folds") {
    val store = new ImtStore(spark, "imt_lsm", Seq("k"), Seq("n"),
      compactEvery = 4)
    (1 to 3).foreach(_ =>
      store.upsert(Seq(("a", 1L), ("b", 2L)).toDF("k", "n")))
    // the write path materialized three batch-sized deltas and never
    // rebuilt a base generation — per-upsert work ∝ batch, not table
    assert(store.generations == 3)
    store.upsert(Seq(("a", 1L)).toDF("k", "n")) // 4th delta → compaction
    assert(store.generations == 1)
    val got = store.query("SELECT k, n FROM imt_lsm ORDER BY k")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 4L), ("b", 6L)))
    // post-compaction reads merge base + fresh deltas
    (1 to 2).foreach(_ => store.upsert(Seq(("c", 5L)).toDF("k", "n")))
    assert(store.generations == 3)
    val got2 = store.query("SELECT k, n FROM imt_lsm ORDER BY k")
      .as[(String, Long)].collect().toSeq
    assert(got2 == Seq(("a", 4L), ("b", 6L), ("c", 10L)))
  }

  test("VersionedStore: bounded storage, latest-wins reads across " +
      "compaction") {
    import graft.core.VersionedStore
    val path = java.nio.file.Files.createTempDirectory("vstore")
      .resolve("s").toString
    val vs = new VersionedStore(spark, path, Seq("k"), compactEvery = 3)
    // 10 flushes re-emitting totals for the same 4 keys
    (1 to 10).foreach { v =>
      vs.append(Seq(("a", v * 10L), ("b", v * 20L), ("c", v * 30L),
        ("d", v * 40L)).toDF("k", "n"), v.toLong)
    }
    val got = vs.latest().as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 100L, "b" -> 200L, "c" -> 300L, "d" -> 400L))
    // bounded: base holds one version per key; delta holds at most
    // (compactEvery - 1) flushes — NOT 10 flushes × 4 keys = 40 rows
    assert(vs.storedRows() <= 4 * 3,
      s"store grew with history: ${vs.storedRows()} rows")
    // keys absent from later flushes must survive compaction
    vs.append(Seq(("e", 1L)).toDF("k", "n"), 11L)
    vs.compact(12L)
    val after = vs.latest().as[(String, Long)].collect().toMap
    assert(after("a") == 100L && after("e") == 1L && after.size == 5)
  }

  test("LPM default route (len 0) catches uncovered space") {
    val t = new Lpm.Table(16, Seq((0L, 0, 999L), (0L, 1, 1L)))
    assert(t.lookup(100L) == 1L)      // /1 beats default
    assert(t.lookup(40000L) == 999L)  // default route fallback
  }

  test("ImtStore groups duplicate keys within the very first batch") {
    val store = new ImtStore(spark, "imt_test3", Seq("k"), Seq("n"))
    store.upsert(Seq(("a", 1L), ("a", 2L), ("b", 4L)).toDF("k", "n"))
    val got = store.query("SELECT k, n FROM imt_test3 ORDER BY k")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 3L), ("b", 4L)))
  }

  test("TopK ranks Long.MinValue weakest (no negation overflow)") {
    import graft.plans.TopK
    val df = Seq((1L, Long.MinValue, 1L), (1L, 5L, 2L), (1L, 7L, 3L))
      .toDF("k", "v", "id")
    val got = TopK.perKey(df, Seq("k"), "v", "id", 2)
      .as[(Long, Long, Long)].collect().map(_._2).toSet
    assert(got == Set(5L, 7L)) // MinValue must be pruned, not kept
  }

  test("BpfFilter raises ParseError on malformed net spec") {
    import graft.plans.BpfFilter
    val f = BpfFilter.Fields(lit(0L), lit(0L), lit(0L), lit(0L),
      lit(0L), lit(0L), lit(1L))
    val e = intercept[BpfFilter.ParseError] {
      BpfFilter.compile("net abc/4", f)
    }
    assert(e.getMessage.contains("abc/4"))
  }

  test("L7 parsers: FTP 227, RTSP client_port, SIP m=audio, signatures") {
    import graft.functions.L7
    assert(L7.ftpPassive("227 Entering Passive Mode (192,168,1,9,4,1).")
      == Some(((192L << 24) | (168L << 16) | (1L << 8) | 9L, 1025)))
    assert(L7.ftpPassive("150 Opening data connection").isEmpty)
    assert(L7.rtspClientPort(
      "Transport: RTP/AVP;unicast;client_port=8000-8001") == Some(8000))
    assert(L7.sipAudioPort("v=0\r\nm=audio 49170 RTP/AVP 0\r\n")
      == Some(49170))
    assert(L7.classifyPayload("GET / HTTP/1.1".getBytes) == "http")
    assert(L7.classifyPayload(Array[Byte](0x16, 0x03, 0x01, 0, 0)) == "tls")
    assert(L7.classifyPayload("SSH-2.0-x".getBytes) == "ssh")
    assert(L7.classifyPayload(
      (Array(19.toByte) ++ "BitTorrent protocol".getBytes)) == "bittorrent")
    assert(L7.classifyPayload(Array[Byte](1, 2, 3)) == "unknown")
  }

  test("L7 breadth: SMTP/QUIC/DNS signatures, SNI, giveup budget") {
    import graft.functions.L7
    assert(L7.classifyPayload("220 mx.example ESMTP\r\n".getBytes) == "smtp")
    assert(L7.classifyPayload(
      Array[Byte](0xc3.toByte, 0, 0, 0, 1, 9)) == "quic")
    // QUIC needs the fixed bit AND a known version
    assert(L7.classifyPayload(
      Array[Byte](0xc3.toByte, 9, 9, 9, 9, 0)) == "unknown")
    val dns = Array[Byte](0x12, 0x34, 0x01, 0x00, 0, 1, 0, 0, 0, 0, 0, 0,
      3, 'w', 'w', 'w', 0, 0, 1, 0, 1)
    assert(L7.classifyPayload(dns) == "dns")
    // a DNS RESPONSE (QR=1) must not match the query heuristic
    val resp = dns.clone(); resp(2) = 0x81.toByte
    assert(L7.classifyPayload(resp) == "unknown")
    // SNI round-trips through the ClientHello encoder, and the parser
    // survives truncation at every byte boundary without throwing
    val ch = L7.clientHello("svc.example.org")
    assert(L7.classifyPayload(ch) == "tls")
    assert(L7.tlsSni(ch) == Some("svc.example.org"))
    (0 until ch.length).foreach(n =>
      L7.tlsSni(java.util.Arrays.copyOf(ch, n)))
    // second signature family: NTP/SNMP/STUN/DHCP
    val ntp = new Array[Byte](48); ntp(0) = 0x23
    assert(L7.classifyPayload(ntp) == "ntp")
    assert(L7.classifyPayload(java.util.Arrays.copyOf(ntp, 47))
      == "unknown") // NTP is length-exact
    assert(L7.classifyPayload(
      Array[Byte](0x30, 0x26, 0x02, 0x01, 0x00, 0x04)) == "snmp")
    val stun = new Array[Byte](20)
    stun(1) = 1; stun(4) = 0x21; stun(5) = 0x12
    stun(6) = 0xa4.toByte; stun(7) = 0x42
    assert(L7.classifyPayload(stun) == "stun")
    val dhcp = new Array[Byte](244)
    dhcp(0) = 1; dhcp(1) = 1; dhcp(2) = 6
    dhcp(236) = 0x63; dhcp(237) = 0x82.toByte
    dhcp(238) = 0x53; dhcp(239) = 0x63
    assert(L7.classifyPayload(dhcp) == "dhcp")
    dhcp(237) = 0 // no magic cookie -> not DHCP
    assert(L7.classifyPayload(dhcp) == "unknown")
    // giveup budget: match on packet 3 is found, on packet 4 is not
    val noise = Array[Byte](0, 1, 2, 3)
    val hit = "GET / HTTP/1.1".getBytes
    assert(L7.classifyFlow(Iterator(noise, noise, hit, noise), 3)
      == ("http", 3))
    assert(L7.classifyFlow(Iterator(noise, noise, noise, hit), 3)
      == ("giveup", 3))
    assert(L7.classifyFlow(Iterator(noise), 3) == ("giveup", 1))
  }

  test("bucketed tables co-locate the join: no shuffle on either side") {
    // the §9 at-rest knob made concrete: facts bucketed by exporter join
    // a bucketed dim with ZERO Exchange operators — the co-location that
    // at 100 TB removes the dominant shuffle entirely
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket")
    spark.sql("DROP TABLE IF EXISTS bkt_flows")
    spark.sql("DROP TABLE IF EXISTS bkt_rates")
    val flows = (1 to 2000).map(i => (i % 16L, i.toLong, i * 10L))
      .toDF("exporter", "event_id", "bytes")
    val rates = (0 until 16).map(e => (e.toLong, 1L + e % 4))
      .toDF("exporter", "rate")
    flows.write.bucketBy(8, "exporter").sortBy("exporter")
      .option("path", s"$dir/flows").saveAsTable("bkt_flows")
    rates.write.bucketBy(8, "exporter").sortBy("exporter")
      .option("path", s"$dir/rates").saveAsTable("bkt_rates")
    val joined = spark.table("bkt_flows")
      .hint("merge") // force SMJ so bucketing (not broadcast) is proven
      .join(spark.table("bkt_rates"), "exporter")
      .groupBy("exporter")
      .agg(sum(col("bytes") * col("rate")).as("renorm"))
    val total = joined.agg(sum("renorm")).as[Long].head()
    val expected = (1 to 2000).map(i => i * 10L * (1L + (i % 16) % 4)).sum
    assert(total == expected)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed join must not shuffle either side")
    spark.sql("DROP TABLE IF EXISTS bkt_flows")
    spark.sql("DROP TABLE IF EXISTS bkt_rates")
  }

  test("query inventory: unique names, oracle coverage, naming scheme") {
    val inv = SparkEntry.inventory
    val names = inv.map(_.name)
    assert(names.distinct.size == names.size,
      "duplicate query names would silently shrink the driver map")
    assert(SparkEntry.queries.size == inv.size)
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")))
    // every query must be oracle-gated (rows-only rows read as red)
    val unGated = inv.filter(_.oracle.isEmpty).map(_.name)
    assert(unGated.isEmpty, s"queries without oracle: $unGated")
  }

  test("dedup loop hygiene: q74/q85 leave executor storage flat") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val d = "/root/testdata/sf0.001"
    SparkEntry.queries("q74_incremental_dedup")(spark, d).count()
    SparkEntry.queries("q85_dedup_clusters")(spark, d).count()
    val after = spark.sparkContext.getPersistentRDDs.size
    // Intentional residents: the two shared SigTable materializations
    // (signature table + verified pair table) and q85's 1-row result.
    // Every band index leg and label-loop generation must be unpersisted.
    assert(after <= before + 3,
      s"persistent RDDs grew $before -> $after: a loop generation leaked")
    // The real leak test is idempotency: a re-run must reuse the shared
    // tables and free its own loop state, adding at most its 1-row result.
    SparkEntry.queries("q74_incremental_dedup")(spark, d).count()
    SparkEntry.queries("q85_dedup_clusters")(spark, d).count()
    val again = spark.sparkContext.getPersistentRDDs.size
    assert(again <= after + 1,
      s"persistent RDDs grew $after -> $again on re-run: generation leak")
  }

  test("SigRules: every family's sample classifies back to itself") {
    import graft.functions.SigRules
    // the data-driven table must be shadow-free over its own corpus:
    // every family, many seeds — one mis-ordered or over-greedy rule
    // flips a label
    SigRules.sampleFamilies.foreach { f =>
      (0L until 200L).foreach { seed =>
        val got = SigRules.classify(SigRules.default,
          SigRules.sample(f, seed * 7919 + 13))
        assert(got == f, s"family $f seed $seed classified as $got")
      }
    }
    // junk stays unknown
    assert(SigRules.classify(SigRules.default,
      Array[Byte](1, 2, 3)) == "unknown")
    assert(SigRules.classify(SigRules.default,
      Array.empty[Byte]) == "unknown")

    // QUIC version negotiation: version 0 accepted with only the
    // long-header bit fixed — but the version list must be non-empty
    // whole 4-byte entries and the cid lengths in-range
    import graft.functions.L7
    def vn(tail: Array[Byte], dl: Int = 4): Array[Byte] =
      Array[Byte](0x85.toByte, 0, 0, 0, 0, dl.toByte) ++
        Array.fill[Byte](dl)(7) ++ Array[Byte](3, 1, 2, 3) ++ tail
    assert(L7.looksQuic(vn(Array[Byte](0, 0, 0, 1))))
    assert(!L7.looksQuic(vn(Array.empty)))           // no versions
    assert(!L7.looksQuic(vn(Array[Byte](0, 0, 1)))) // ragged list
    assert(!L7.looksQuic(vn(Array[Byte](0, 0, 0, 1), dl = 21)))
    // NBNS walk: a name byte outside the 'A'..'P' nibble alphabet or
    // a non-NB qtype fails — the old length-byte-only rule passed both
    val good = SigRules.sample("netbios", 5L)
    assert(SigRules.classify(SigRules.default, good) == "netbios")
    val badName = good.clone(); badName(20) = 'z'.toByte
    assert(SigRules.classify(SigRules.default, badName) != "netbios")
    val badType = good.clone(); badType(47) = 0x10
    assert(SigRules.classify(SigRules.default, badType) != "netbios")
  }

  test("SigRules: the map-file text form round-trips the whole table") {
    import graft.functions.SigRules
    val lines = SigRules.render(SigRules.default)
    // structural identity: order, labels, every predicate
    assert(SigRules.parse(lines) == SigRules.default)
    // comments/blank lines are skipped like every other map loader
    assert(SigRules.parse("! comment" +: "" +: lines)
      == SigRules.default)
    // escaping survives hostile label/ascii content
    val hairy = Seq(SigRules.Rule("we ird%proto",
      Seq(SigRules.Pred.Ascii("GET /a b%c|d+e:f\r\n", 3),
        SigRules.Pred.AnyOf(Seq(
          Seq(SigRules.Pred.Ascii("x y")),
          Seq(SigRules.Pred.B(0, 0xff), SigRules.Pred.MinLen(9)))))))
    assert(SigRules.parse(SigRules.render(hairy)) == hairy)
    // unknown heuristic names fail fast, not silently drop
    intercept[IllegalArgumentException] {
      SigRules.parse(Seq("proto=x heur:nope"))
    }
  }

  test("SigRules: classify never throws on arbitrary or truncated bytes") {
    import graft.functions.SigRules
    // every heuristic indexes into the payload head; a missing bounds
    // guard is an executor-killing ArrayIndexOutOfBounds on real
    // traffic. Fuzz: deterministic pseudo-random payloads of every
    // length 0..64, plus every family sample truncated at every point.
    val rnd = new scala.util.Random(0xda7a)
    (0 until 2000).foreach { _ =>
      val h = Array.fill[Byte](rnd.nextInt(65))(rnd.nextInt().toByte)
      SigRules.classify(SigRules.default, h) // must not throw
    }
    SigRules.sampleFamilies.foreach { f =>
      val full = SigRules.sample(f, 42L)
      (0 to full.length).foreach { n =>
        SigRules.classify(SigRules.default, full.take(n))
      }
    }
  }

  // Soak analogue of tests 208/305 (the reference asserts RSS < 100 MiB
  // over ~8 min of repeated BMP load, 208_test.py:34-36): replaying the
  // SAME load segment N times must leave every live-state size exactly
  // where cycle 1 left it — RIB entries and interned attr classes flat,
  // the cumulative stats counter advancing by a constant per-cycle delta.
  // Direct JVM-level twin of the gated q253/q254 invariant, with the
  // absolute sizes asserted (bounded, nonzero) rather than projected.
  test("BMP soak: collector state flat across identical load cycles") {
    import graft.operators.GoldenReplay
    import graft.sources.Pcap
    import java.nio.file.{Files, Paths}
    val dir = "/root/reference/tests/208-BMP-mem-leak-test"
    val srcs = GoldenReplay.soakSrcs(s"$dir/traffic-reproducer-configs")
    def bySrc(name: String) = GoldenReplay.tcpReassembleBySrc(
      Pcap.read(Files.readAllBytes(Paths.get(s"$dir/$name"))),
      dport = 1790).toMap
    val init = bySrc("bmp-multi-sources-init.pcap")
    val pu = bySrc("bmp-multi-sources-peer-up.pcap")
    val rm = bySrc("bmp-multi-sources-route-monitoring.pcap")
    val st = bySrc("bmp-multi-sources-stats.pcap")
    val cycles = 5
    var checked = 0
    var statsSeen = 0
    srcs.toSeq.sorted.foreach { src =>
      def seg(m: Map[String, Array[Byte]]) =
        m.getOrElse(src, Array.emptyByteArray)
      val load = seg(rm) ++ seg(st)
      val segments = (seg(init) ++ seg(pu)) +: Seq.fill(cycles)(load)
      val sizes = scala.collection.mutable.Buffer[(Int, Int, Int)]()
      GoldenReplay.bmpAttrRows(Array.emptyByteArray, src, mode = "state",
        segments = segments, cycleSizes = sizes)
      val cyc = sizes.drop(1)
      assert(cyc.size == cycles)
      // flat and nonzero: the load cycles carry real routes whose
      // re-announcement must upsert, not accumulate
      assert(cyc.map(_._1).distinct.size == 1 && cyc.head._1 > 0,
        s"$src RIB sizes ${cyc.map(_._1)}")
      assert(cyc.map(_._2).distinct.size == 1 && cyc.head._2 > 0,
        s"$src attr-intern sizes ${cyc.map(_._2)}")
      // constant per-cycle delta (some routers — the v6 pair — carry no
      // stats in the capture, so 0 is a valid constant)
      val deltas = sizes.map(_._3).sliding(2).map(w => w(1) - w(0)).toSeq
      assert(deltas.distinct.size == 1 && deltas.head >= 0,
        s"$src stats deltas $deltas")
      if (deltas.head > 0) statsSeen += 1
      checked += 1
    }
    assert(checked == 9) // 7 v4 + 2 v6 reproducer-selected routers
    assert(statsSeen > 0) // the load cycles do exercise the stats path
  }

  test("MisraGries: MG guarantee under updates, merges, and Spark agg") {
    import graft.plans.{MisraGries, MisraGriesAgg}
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String

    // deterministic zipf-ish stream: token t_i with weight ~ 1/(i+1)
    def stream(n: Int, seed: Long): Seq[String] = {
      var s = seed
      (0 until n).map { _ =>
        s = s * 6364136223846793005L + 1442695040888963407L
        val u = ((s >>> 33) % 1000).toInt
        val t = if (u < 300) 0 else if (u < 500) 1 else if (u < 620) 2
          else if (u < 700) 3 else 4 + (u % 40)
        s"t$t"
      }
    }
    val k = 8
    val data = stream(20000, 42L)
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size.toLong

    def checkInvariants(summary: Map[String, Long]): Unit = {
      assert(summary.size <= k - 1, s"${summary.size} counters")
      exact.foreach { case (item, c) =>
        if (c > n / k)
          assert(summary.contains(item), s"heavy $item ($c) missing")
      }
      summary.foreach { case (item, est) =>
        val c = exact.getOrElse(item, 0L)
        assert(est <= c, s"$item overcounted: $est > $c")
        assert(c - est <= n / k, s"$item bound: $c - $est > ${n / k}")
      }
    }

    val agg = MisraGriesAgg(BoundReference(0, StringType,
      nullable = true), k)
    def run(items: Seq[String]) = {
      val b = agg.createAggregationBuffer()
      items.foreach(i => agg.update(b,
        InternalRow(UTF8String.fromString(i))))
      b
    }
    // sequential updates
    checkInvariants(run(data).toMap)
    // arbitrary merge tree incl. serialize round-trips (the shuffle)
    val parts = data.grouped(3000).map(run).toSeq
    val merged = parts.map(p => agg.deserialize(agg.serialize(p)))
      .reduce(agg.merge)
    checkInvariants(merged.toMap)

    // Spark end-to-end over shuffled partitions
    val spark = SparkSuite.spark
    import spark.implicits._
    val m = data.toDF("tok").repartition(7)
      .agg(MisraGries(org.apache.spark.sql.functions.col("tok"), k))
      .head().getAs[Map[String, Long]](0)
    checkInvariants(m)
  }

  test("Kmv: merge-tree bit-invariance, estimator bands, Spark, SQL") {
    import graft.plans.{Kmv, KmvAgg}
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String

    val k = 1024
    val agg = KmvAgg(BoundReference(0, StringType, nullable = true), k)
    def run(items: Iterator[String]) = {
      val b = agg.createAggregationBuffer()
      items.foreach(s =>
        agg.update(b, InternalRow(UTF8String.fromString(s))))
      b
    }
    def sketch(b: java.util.TreeSet[java.lang.Long]): Seq[Long] = {
      import scala.jdk.CollectionConverters._
      b.asScala.toSeq.map(_.longValue())
    }
    def estimate(s: Seq[Long]): Double =
      if (s.size < k) s.size.toDouble
      else (k - 1).toDouble * 9.223372036854776e18 / s.last.toDouble
    // sub-k input: the sketch IS the full hash set (exact)
    val small = run((1 to 500).iterator.map("v" + _))
    assert(small.size == 500 && estimate(sketch(small)) == 500.0)
    // estimator band on a large stream with duplicates: the observed
    // error for a FIXED hash is deterministic; 1/sqrt(k-2) ~ 3.1%,
    // assert within 4 sigma
    val exact = 120000
    val big = run((1 to 400000).iterator.map(i => "k" + (i % exact)))
    val err = math.abs(estimate(sketch(big)) - exact) / exact
    assert(err <= 4.0 / math.sqrt(k - 2.0), s"kmv error $err")
    // merge-tree BIT-invariance: k smallest distinct values cannot
    // depend on arrival or merge order
    val single = sketch(big)
    Seq(7, 13).foreach { parts =>
      val chunks = (0 until parts).map(j =>
        run((1 to 400000).iterator.filter(_ % parts == j)
          .map(i => "k" + (i % exact))))
      val folded = chunks.map(c => agg.deserialize(agg.serialize(c)))
        .reduce(agg.merge)
      assert(sketch(folded) == single, s"merge tree $parts diverged")
    }
    // empty → empty array
    assert(agg.eval(agg.createAggregationBuffer())
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .numElements() == 0)

    // Spark end-to-end + SQL + type gate; union/Jaccard downstream as
    // plain array expressions over two sketches
    val spark = SparkSuite.spark
    import spark.implicits._
    // consecutive pairs send the SAME user to each group: A and B
    // hold identical 9000-user sets (9000 is even, so `i % 9000`
    // would parity-split them into disjoint halves)
    val df = (1 to 60000).map { i =>
      (if (i % 2 == 0) "A" else "B", "u" + ((i / 2) % 9000))
    }.toDF("grp", "u").repartition(7)
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("kmv_probe")
    val two = spark.sql(
      s"""SELECT grp, kmv_sketch(u, $k) AS s FROM kmv_probe GROUP BY 1""")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // A sees even i -> u(i%9000) even+odd both? i even -> i%9000 spans
    // all residues; exact per group = 9000, union = 9000
    val estA = estimate(two("A"))
    assert(math.abs(estA - 9000) / 9000 <= 4.0 / math.sqrt(k - 2.0))
    val union = (two("A") ++ two("B")).distinct.sorted.take(k)
    val uEst = estimate(union)
    assert(math.abs(uEst - 9000) / 9000 <= 4.0 / math.sqrt(k - 2.0))
    val jacc = union.count(h =>
      two("A").contains(h) && two("B").contains(h)).toDouble / union.size
    assert(jacc >= 0.85, s"jaccard of identical sets measured $jacc")
    val mistyped = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT kmv_sketch(t, 64) FROM VALUES (7) AS x(t)")
        .collect())
    assert(mistyped.getMessage.toLowerCase.contains("type"))
  }

  test("Hll: error contract under merges, linear counting, Spark, SQL") {
    import graft.plans.{Hll, HllAgg}
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String

    val p = 12
    val agg = HllAgg(BoundReference(0, StringType, nullable = true), p)
    def run(items: Iterator[String]): Array[Byte] = {
      val b = agg.createAggregationBuffer()
      items.foreach(s => agg.update(b, InternalRow(UTF8String.fromString(s))))
      b
    }
    // band: 4σ at σ = 1.04/sqrt(2^p) ≈ 1.63% — generous enough to be
    // deterministic for these fixed streams, tight enough to mean HLL
    def check(est: Long, exact: Long): Unit = {
      val band = math.max(5.0, 4 * 1.04 / math.sqrt(1 << p) * exact)
      assert(math.abs(est - exact) <= band, s"est $est vs $exact ± $band")
    }
    // small range: linear counting exact-ish
    check(agg.eval(run((1 to 100).iterator.map("v" + _)))
      .asInstanceOf[Long], 100)
    // large range + duplicates
    val big = run((1 to 300000).iterator.map(i => "k" + (i % 120000)))
    check(agg.eval(big).asInstanceOf[Long], 120000)
    // merge tree == single-pass (register max is exact under merge)
    val parts = (0 until 8).map(j =>
      run((1 to 300000).iterator.filter(_ % 8 == j)
        .map(i => "k" + (i % 120000))))
    val merged = parts.map(x => agg.deserialize(agg.serialize(x)))
      .reduce(agg.merge)
    assert(agg.eval(merged) == agg.eval(big),
      "merged registers must equal the single-pass registers")
    // empty → 0
    assert(agg.eval(agg.createAggregationBuffer()) == 0L)

    // Spark end-to-end + SQL surface + type gate
    val spark = SparkSuite.spark
    import spark.implicits._
    val df = (1 to 50000).map(i => "u" + (i % 20000)).toDF("v")
      .repartition(7)
    check(df.agg(Hll(org.apache.spark.sql.functions.col("v"), p))
      .head().getLong(0), 20000)
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("hll_probe")
    check(spark.sql(s"SELECT hll_distinct(v, $p) FROM hll_probe")
      .head().getLong(0), 20000)
    val mistyped = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT hll_distinct(t, 12) FROM VALUES (7) AS x(t)")
        .collect())
    assert(mistyped.getMessage.toLowerCase.contains("type"))
  }

  test("TDigest: rank contract under adversarial merge trees, Spark, SQL") {
    import graft.plans.{TDigest, TDigestAgg}
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.LongType

    def stream(n: Int, seed: Long): Seq[Long] = {
      var s = seed
      (0 until n).map { _ =>
        s = s * 6364136223846793005L + 1442695040888963407L
        val u = (s >>> 33) % 10000000L
        if (u % 3 == 0) u % 1000 else u // heavy head, long tail
      }
    }
    val delta = 400
    def agg(q: Double) = TDigestAgg(BoundReference(0, LongType,
      nullable = true), q, delta)
    def run(q: Double, items: Seq[Long]) = {
      val a = agg(q)
      val b = a.createAggregationBuffer()
      items.foreach(i => a.update(b, InternalRow(i)))
      b
    }
    // the gate's contract (6n/δ + 1) must hold with MARGIN across
    // adversarial merge trees: left-fold, balanced, skewed chunk
    // sizes, several seeds — the merging digest's observed error
    // should sit well inside the documented slack
    var worstFrac = 0.0
    Seq(7L, 21L, 99L).foreach { seed =>
      val data = stream(40000, seed)
      val sorted = data.sorted.toIndexedSeq
      val n = data.size.toLong
      val slack = 6L * n / delta + 1
      def check(v: Long, q: Double): Unit = {
        val target = math.max(1L, math.ceil(q * n).toLong)
        val le = sorted.count(_ <= v).toLong
        val lt = sorted.count(_ < v).toLong
        assert(le >= target - slack && lt <= target + slack,
          s"seed=$seed q=$q v=$v rank [$lt, $le] vs $target ± $slack")
        val err = math.max(0L,
          math.max(target - le, lt - target)).toDouble / n
        worstFrac = math.max(worstFrac, err)
      }
      Seq(0.01, 0.5, 0.9, 0.99).foreach { q =>
        val a = agg(q)
        check(run(q, data).quantile(q).asInstanceOf[Long], q)
        // left-fold of uneven chunks incl. serialize round-trips
        val parts = Seq(17000, 9000, 6000, 4000, 2500, 1000, 500)
        var at = 0
        val chunks = parts.map { sz =>
          val c = run(q, data.slice(at, at + sz)); at += sz; c
        }
        assert(at == data.size)
        val folded = chunks.map(c => a.deserialize(a.serialize(c)))
          .reduce(a.merge)
        check(folded.quantile(q).asInstanceOf[Long], q)
        assert(folded.size <= 3 * delta,
          s"digest grew to ${folded.size} centroids")
        // balanced tree
        def tree(cs: Seq[TDigestAgg.Digest]): TDigestAgg.Digest =
          if (cs.size == 1) cs.head
          else tree(cs.grouped(2).map {
            case Seq(x, y) => a.merge(x, y)
            case Seq(x) => x
          }.toSeq)
        val balanced = tree(data.grouped(5000).map(run(q, _)).toSeq)
        check(balanced.quantile(q).asInstanceOf[Long], q)
      }
    }
    // the documented slack is not vacuous: observed error stays well
    // inside it (6/δ = 1.5%; typical merging-digest error ~2/δ)
    assert(worstFrac <= 3.0 / delta,
      s"observed rank error $worstFrac exceeds 3/delta margin")
    // empty digest → null
    assert(agg(0.5).eval(agg(0.5).createAggregationBuffer()) == null)

    // Spark end-to-end over shuffled partitions + the SQL surface
    val spark = SparkSuite.spark
    import spark.implicits._
    val data = stream(40000, 7L)
    val sorted = data.sorted.toIndexedSeq
    val slack = 6L * data.size / delta + 1
    def checkSpark(v: Long, q: Double): Unit = {
      val target = math.max(1L, math.ceil(q * data.size).toLong)
      val le = sorted.count(_ <= v).toLong
      val lt = sorted.count(_ < v).toLong
      assert(le >= target - slack && lt <= target + slack)
    }
    val df = data.toDF("v").repartition(7)
    checkSpark(df.agg(TDigest(org.apache.spark.sql.functions.col("v"),
      0.9, delta)).head().getLong(0), 0.9)
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("tdigest_probe")
    checkSpark(spark.sql(
      s"SELECT tdigest_quantile(v, 0.9D, $delta) FROM tdigest_probe")
      .head().getLong(0), 0.9)
    val mistyped = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT tdigest_quantile(t, 0.5D, 64) FROM " +
        "VALUES ('a') AS x(t)").collect())
    assert(mistyped.getMessage.toLowerCase.contains("type"))
  }

  test("QDigest: rank-error contract under updates, merges, Spark, SQL") {
    import graft.plans.{QDigest, QDigestAgg}
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.LongType

    // skewed deterministic stream over [0, 2^20)
    def stream(n: Int, seed: Long): Seq[Long] = {
      var s = seed
      (0 until n).map { _ =>
        s = s * 6364136223846793005L + 1442695040888963407L
        val u = (s >>> 33) % 1048576L
        if (u % 3 == 0) u % 1000 else u // heavy head, long tail
      }
    }
    val k = 512 // slack ≈ 2% of n: the bound is genuinely exercised
    val bits = 20
    val data = stream(50000, 7L)
    val sorted = data.sorted.toIndexedSeq
    val n = data.size.toLong
    val slack = n * bits / k + 1

    def checkQuantile(v: Long, q: Double): Unit = {
      val target = math.max(1L, math.ceil(q * n).toLong)
      val le = sorted.count(_ <= v).toLong
      val lt = sorted.count(_ < v).toLong
      assert(le >= target - slack && lt <= target + slack,
        s"q=$q v=$v rank window [$lt, $le] vs target $target ± $slack")
    }

    def agg(q: Double) = QDigestAgg(BoundReference(0, LongType,
      nullable = true), q, k, bits)
    def run(q: Double, items: Seq[Long]) = {
      val a = agg(q)
      val b = a.createAggregationBuffer()
      items.foreach(i => a.update(b, InternalRow(i)))
      b
    }
    Seq(0.01, 0.5, 0.9, 0.99).foreach { q =>
      // sequential
      checkQuantile(run(q, data).quantile(q).asInstanceOf[Long], q)
      // arbitrary merge tree incl. serialize round-trips (the shuffle)
      val a = agg(q)
      val parts = data.grouped(7000).map(run(q, _)).toSeq
      val merged = parts.map(p => a.deserialize(a.serialize(p)))
        .reduce(a.merge)
      checkQuantile(merged.quantile(q).asInstanceOf[Long], q)
      // post-compress size bound: 3k nodes (the paper's bound; the
      // amortized cap keeps intermediate state ≤ 6k)
      merged.compress()
      assert(merged.size <= 3 * k, s"digest size ${merged.size}")
    }
    // empty digest → null
    assert(agg(0.5).eval(agg(0.5).createAggregationBuffer()) == null)

    // Spark end-to-end over shuffled partitions + the SQL surface
    val spark = SparkSuite.spark
    import spark.implicits._
    val df = data.toDF("v").repartition(7)
    val viaCol = df.agg(QDigest(org.apache.spark.sql.functions.col("v"),
      0.9, k)).head().getLong(0)
    checkQuantile(viaCol, 0.9)
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("qdigest_probe")
    val viaSql = spark.sql(
      s"SELECT qdigest_quantile(v, 0.9D, $k) FROM qdigest_probe")
      .head().getLong(0)
    checkQuantile(viaSql, 0.9)
    val mistyped = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT qdigest_quantile(t, 0.5D, 64) FROM " +
        "VALUES ('a') AS x(t)").collect())
    assert(mistyped.getMessage.toLowerCase.contains("type"))

    // the optional 4th SQL arg widens the universe: values above the
    // 20-bit default would clamp to 2^20-1; bits=24 keeps them exact
    val big = spark.sql("SELECT qdigest_quantile(v, 0.5D, 64, 24) " +
      "FROM VALUES (5000000L), (5000000L), (5000000L) AS x(v)")
      .head().getLong(0)
    assert(big == 5000000L, s"bits=24 median $big")
    val clamped = spark.sql("SELECT qdigest_quantile(v, 0.5D, 64) " +
      "FROM VALUES (5000000L), (5000000L), (5000000L) AS x(v)")
      .head().getLong(0)
    assert(clamped == (1L << 20) - 1, s"default-bits clamp $clamped")
  }

  // The soak invariants at 10x the FIXTURE cycle counts (the
  // graft.soak.mult scale q253/q254 expose): flat state across 100 BMP
  // cycles x 9 routers and 3000 BGP cycles x 4 routers proves the
  // upsert/intern machinery doesn't merely look flat at the fixture's
  // small N — and the whole 10x replay must stay inside a strict
  // wall-clock budget (decode-once + per-cycle replay keeps cost
  // linear in cycles, never in cycles x parse).
  test("soak invariants hold at 10x fixture cycles within budget") {
    import graft.operators.GoldenReplay
    import graft.sources.Pcap
    import java.nio.file.{Files, Paths}
    val t0 = System.nanoTime()

    // BMP (test 208): fixture 10 -> 100 cycles
    locally {
      val dir = "/root/reference/tests/208-BMP-mem-leak-test"
      val cycles =
        GoldenReplay.soakCycles(s"$dir/traffic-reproducer-configs") * 10
      val srcs = GoldenReplay.soakSrcs(s"$dir/traffic-reproducer-configs")
      def bySrc(name: String) = GoldenReplay.tcpReassembleBySrc(
        Pcap.read(Files.readAllBytes(Paths.get(s"$dir/$name"))),
        dport = 1790).toMap
      val init = bySrc("bmp-multi-sources-init.pcap")
      val pu = bySrc("bmp-multi-sources-peer-up.pcap")
      val rm = bySrc("bmp-multi-sources-route-monitoring.pcap")
      val st = bySrc("bmp-multi-sources-stats.pcap")
      srcs.toSeq.sorted.foreach { src =>
        def seg(m: Map[String, Array[Byte]]) =
          m.getOrElse(src, Array.emptyByteArray)
        val load = seg(rm) ++ seg(st)
        val segments =
          (seg(init) ++ seg(pu)) +: Seq.fill(cycles)(load)
        val sizes = scala.collection.mutable.Buffer[(Int, Int, Int)]()
        GoldenReplay.bmpAttrRows(Array.emptyByteArray, src,
          mode = "state", segments = segments, cycleSizes = sizes)
        val cyc = sizes.drop(1)
        assert(cyc.size == cycles)
        assert(cyc.map(_._1).distinct.size == 1 && cyc.head._1 > 0,
          s"$src RIB not flat at 10x")
        assert(cyc.map(_._2).distinct.size == 1 && cyc.head._2 > 0,
          s"$src attr intern not flat at 10x")
        val deltas = sizes.map(_._3).sliding(2).map(w => w(1) - w(0)).toSeq
        assert(deltas.distinct.size == 1, s"$src stats not linear at 10x")
      }
    }

    // BGP (test 305): fixture 300 -> 3000 cycles
    locally {
      val dir = "/root/reference/tests/305-BGP-mem-leak-test"
      val cycles =
        GoldenReplay.soakCycles(s"$dir/traffic-reproducer-configs") * 10
      val srcs = GoldenReplay.soakSrcs(s"$dir/traffic-reproducer-configs")
      def bySrc(name: String) = GoldenReplay.tcpReassembleBySrc(
        Pcap.read(Files.readAllBytes(Paths.get(s"$dir/$name"))),
        dport = 179).toMap
      val open = bySrc("bgp-multi-sources-open.pcap")
      val upd = bySrc("bgp-multi-sources-update-keepalive.pcap")
      srcs.toSeq.sorted.foreach { src =>
        def seg(m: Map[String, Array[Byte]]) =
          m.getOrElse(src, Array.emptyByteArray)
        val segments = seg(open) +: Seq.fill(cycles)(seg(upd))
        val sizes = scala.collection.mutable.Buffer[(Int, Int, Int)]()
        GoldenReplay.bgpRibRows(Array.emptyByteArray,
          segments = segments, cycleSizes = sizes)
        val cyc = sizes.drop(1)
        assert(cyc.size == cycles)
        assert(cyc.map(_._1).distinct.size == 1 && cyc.head._1 > 0,
          s"$src RIB not flat at 10x")
        assert(cyc.map(_._2).distinct.size == 1 && cyc.head._2 > 0,
          s"$src attr classes not flat at 10x")
        val deltas = sizes.map(_._3).sliding(2).map(w => w(1) - w(0)).toSeq
        assert(deltas.distinct.size == 1, s"$src updates not linear at 10x")
      }
    }

    val secs = (System.nanoTime() - t0) / 1e9
    // budget guards the QUADRATIC failure mode (cycles x parse would
    // read minutes); it must not flake under suite-parallel load —
    // solo the replay runs ~35-50 s, under the full 28-suite parallel
    // run it has been measured at 63.6 s (r14), hence 2x headroom
    assert(secs < 120.0, f"10x soak took $secs%.1f s — state machine " +
      "cost is no longer linear in cycles")
  }

  // The SPARK-side twin of the two soak tests above (VERDICT r10 #4):
  // the reference's 208/305 leak checks gate the DAEMON's RSS under
  // repeated identical load (208_test.py memory_utilization_max_MiB);
  // the engine's RSS analog is the streaming STATE STORE. Keyed by
  // (router, prefix) — the RIB shape a collector holds — six identical
  // announce cycles must leave StateOperatorProgress.numRowsTotal flat
  // (an upsert, never an append) and the provider's reported state
  // memory bounded (versions are retained, so "bounded", not "equal").
  test("mem-leak analogs through Spark state stores: rows flat, " +
    "memory bounded across 6 identical cycles (tests 208 + 305)") {
    import graft.operators.GoldenReplay
    import graft.sources.{BgpMsg, BmpMsg, Pcap}
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val T = "/root/reference/tests"

    def attrsOf(u: BgpMsg.Update): Long =
      (u.origin, u.asPath, u.nextHop, u.nextHop6, u.med, u.localPref,
        u.communities, u.largeCommunities).hashCode().toLong
    def rows(router: String, u: BgpMsg.Update)
        : Seq[(String, String, Long, Boolean)] = {
      val a = attrsOf(u)
      u.nlri.map(r => (router, s"4:$r", a, false)) ++
        u.nlri6.map(r => (router, s"6:$r", a, false)) ++
        // VPN/labeled keys EXCLUDE the label: a withdraw carries the
        // 0x800000 marker there, and must still remove the announce's
        // entry (the (afi, safi, rd, prefix) key bgpRibRows also uses)
        u.nlriVpn.map(r => (router,
          s"v4:${r.rdType}:${r.rdAdmin}:${r.rdVal}:${r.prefix}/${r.plen}",
          a, false)) ++
        u.nlriVpn6.map(r => (router,
          s"v6:${r.rdType}:${r.rdAdmin}:${r.rdVal}:${r.hi}:${r.lo}/${r.plen}",
          a, false)) ++
        u.nlriLab.map(r => (router, s"l4:${r.prefix}/${r.plen}", a,
          false)) ++
        u.nlriLab6.map(r => (router, s"l6:${r.hi}:${r.lo}/${r.plen}", a,
          false)) ++
        u.withdrawn.map(r => (router, s"4:$r", 0L, true)) ++
        u.withdrawn6.map(r => (router, s"6:$r", 0L, true)) ++
        u.withdrawnVpn.map(r => (router,
          s"v4:${r.rdType}:${r.rdAdmin}:${r.rdVal}:${r.prefix}/${r.plen}",
          0L, true)) ++
        u.withdrawnVpn6.map(r => (router,
          s"v6:${r.rdType}:${r.rdAdmin}:${r.rdVal}:${r.hi}:${r.lo}/${r.plen}",
          0L, true)) ++
        u.withdrawnLab.map(r => (router, s"l4:${r.prefix}/${r.plen}", 0L,
          true)) ++
        u.withdrawnLab6.map(r => (router, s"l6:${r.hi}:${r.lo}/${r.plen}",
          0L, true))
    }

    // 208: BMP route-monitoring per router (TCP port 1790)
    val bmpLoad = GoldenReplay.tcpReassembleBySrc(
      Pcap.read(Files.readAllBytes(Paths.get(s"$T/208-BMP-mem-leak-test/" +
        "bmp-multi-sources-route-monitoring.pcap"))), dport = 1790)
      .flatMap { case (src, stream) =>
        BmpMsg.decodeStream(stream).collect {
          case BmpMsg.RouteMonitoring(peer, u) =>
            rows(s"bmp/$src/${peer.peerAddr}", u)
        }.flatten
      }
    // 305: raw BGP updates per router (TCP port 179)
    val bgpLoad = GoldenReplay.tcpReassembleBySrc(
      Pcap.read(Files.readAllBytes(Paths.get(s"$T/305-BGP-mem-leak-test/" +
        "bgp-multi-sources-update-keepalive.pcap"))), dport = 179)
      .flatMap { case (src, stream) =>
        BgpMsg.decodeStream(stream).flatMap(u => rows(s"bgp/$src", u))
      }
    val load = (bmpLoad ++ bgpLoad).toSeq
    assert(load.nonEmpty && load.exists(!_._4))
    assert(load.exists(_._1.startsWith("bmp/")) &&
      load.exists(_._1.startsWith("bgp/")))

    val mem = MemoryStream[(String, String, Long, Boolean)](spark)
    val rib = mem.toDS()
      .groupByKey { case (router, prefix, _, _) => (router, prefix) }
      .flatMapGroupsWithState[Long, Int](OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        (_: (String, String),
         it: Iterator[(String, String, Long, Boolean)],
         st: GroupState[Long]) =>
          it.foreach { case (_, _, attrs, withdraw) =>
            if (withdraw) { if (st.exists) st.remove() }
            else st.update(attrs)
          }
          Iterator.single(1)
      }
    val q = rib.writeStream.format("memory").queryName("rib_soak")
      .outputMode("update").start()
    val rowTotals = scala.collection.mutable.Buffer[Long]()
    val memBytes = scala.collection.mutable.Buffer[Long]()
    try {
      for (_ <- 0 until 6) {
        mem.addData(load)
        q.processAllAvailable()
        val so = q.lastProgress.stateOperators
        assert(so.nonEmpty)
        rowTotals += so(0).numRowsTotal
        memBytes += so(0).memoryUsedBytes
      }
    } finally q.stop()
    // rows: FLAT and nonzero — a leak (append instead of upsert, or a
    // cycle-dependent key) grows this every cycle
    assert(rowTotals.distinct.size == 1 && rowTotals.head > 0,
      s"state rows not flat: $rowTotals")
    // memory: bounded — the provider retains a version window, so the
    // honest assertion is no-growth-trend, not equality
    assert(memBytes.max <= math.max(memBytes.min, 1L) * 3,
      s"state memory grows: $memBytes")
    assert(memBytes.last <= memBytes.head * 2,
      s"state memory trend: $memBytes")
  }

  test("SniApps: longest-suffix hostname resolution on label boundaries") {
    import graft.functions.{L7, SniApps}
    // every q326 gate vector resolves through the FULL inspection
    // path: ClientHello bytes → rule table says tls → SNI → app
    SniApps.gateVectors.foreach { case (host, want) =>
      val hello = L7.clientHello(host)
      assert(L7.classifyPayload(hello) == "tls", host)
      val sni = L7.tlsSni(hello)
      assert(sni.contains(host), host)
      assert(sni.flatMap(SniApps.app).getOrElse("tls") == want,
        s"$host -> ${sni.flatMap(SniApps.app)}, want $want")
    }
    // longest suffix specializes: gmail/gdrive over google.com
    assert(SniApps.app("mail.google.com").contains("gmail"))
    assert(SniApps.app("imap.mail.google.com").contains("gmail"))
    assert(SniApps.app("maps.google.com").contains("google"))
    // label-boundary anchoring in both directions
    assert(SniApps.app("fakenetflix.com").isEmpty)
    assert(SniApps.app("netflix.com.evil.example").isEmpty)
    assert(SniApps.app("NETFLIX.COM").contains("netflix")) // case-fold
    assert(SniApps.app("netflix.com.").contains("netflix")) // FQDN dot
    assert(SniApps.app("example.invalid").isEmpty)
    assert(SniApps.app("").isEmpty)
  }
}
