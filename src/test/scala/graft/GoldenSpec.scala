package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FlowView, Tables}
import graft.functions.Formatters
import graft.maps.PreTagMap
import graft.maps.PreTagMap.TagRule

/** Golden-output test in the reference's style (SURVEY §5: replay fixture
  * → aggregate → serialized JSON diffed against a committed golden with
  * volatile fields masked — `th.set_ignored_fields(['stamp_inserted'...])`
  * in `tests/101-.../101_test.py:25-29`).
  *
  * The pipeline exercises the F1 output shape: formatted fields, tagging,
  * the fixed counter set, epoch.usec timestamp composition, plus a
  * deliberately volatile `stamp_inserted` that the comparison masks.
  * Bless mode: if the golden file is absent it is written and the test
  * passes; the committed file keeps subsequent runs honest.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private val goldenPath =
    Paths.get("src/test/resources/golden/flow-agg-00.jsonl")

  private val volatileFields = Seq("stamp_inserted")

  private def mask(line: String): String =
    volatileFields.foldLeft(line)((l, f) =>
      l.replaceAll("\"" + f + "\":\"[^\"]*\"", "\"" + f + "\":\"***\""))

  test("text-pipeline JSON matches committed golden") {
    import graft.text.TextOps
    val path = Paths.get("src/test/resources/golden/text-docs-00.jsonl")
    val out = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") % 17 === 0)
      .selectExpr("doc_id", "lang",
        s"${TextOps.sparkFingerprint} as fp",
        s"${TextOps.sparkQuality} as quality",
        s"${TextOps.sparkLangPredict(TextOps.sparkHps)} as predicted")
      .orderBy("doc_id")
    val lines = out.select(to_json(struct(out.columns.map(col): _*)))
      .collect().map(_.getString(0)).toSeq
    if (!Files.exists(path)) {
      Files.createDirectories(path.getParent)
      Files.writeString(path, lines.mkString("\n") + "\n")
      info(s"blessed new golden: $path (${lines.size} records)")
    } else {
      val golden = Files.readString(path).linesIterator
        .filter(_.nonEmpty).toSeq
      assert(lines == golden)
    }
  }

  test("aggregated flow JSON matches committed golden (volatile masked)") {
    val rules = Seq(
      TagRule(col("port_dst") === 80L, 100L),
      TagRule(col("ip_proto") === 17L, 200L))
    val out = FlowView.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
      .withColumn("tag", PreTagMap.tagColumn(rules))
      .groupBy(col("tag"), col("ip_proto"), col("port_dst"))
      .agg(count(lit(1)).as("flows"), sum("bytes").as("bytes"),
        sum("packets").as("packets"),
        min("t0u").as("t0u"), max("t1u").as("t1u"))
      .selectExpr(
        "tag",
        s"${Formatters.protoName("ip_proto")} as ip_proto",
        "port_dst", "flows", "bytes", "packets",
        s"${Formatters.tsCompose("t0u")} as timestamp_start",
        s"${Formatters.tsCompose("t1u")} as timestamp_end",
        "'nfacctd_kafka' as writer_id",
        "date_format(current_timestamp(), 'yyyy-MM-dd HH:mm:ss')" +
          " as stamp_inserted")
      .orderBy("tag", "ip_proto", "port_dst")
    val cols = out.columns.map(col)
    val lines = out.select(to_json(struct(cols: _*)).as("j"))
      .collect().map(_.getString(0)).toSeq

    if (!Files.exists(goldenPath)) {
      Files.createDirectories(goldenPath.getParent)
      Files.writeString(goldenPath, lines.mkString("\n") + "\n")
      info(s"blessed new golden: $goldenPath (${lines.size} records)")
    } else {
      val golden = Files.readString(goldenPath).linesIterator
        .filter(_.nonEmpty).toSeq
      assert(lines.size == golden.size,
        s"record count ${lines.size} != golden ${golden.size}")
      lines.zip(golden).zipWithIndex.foreach { case ((got, exp), i) =>
        assert(mask(got) == mask(exp), s"record $i diverged")
      }
    }
  }

  // ---- reference fixture replay (VERDICT r5 #1) -----------------------
  //
  // The four scenarios below decode the reference's OWN router pcaps
  // (tests/100/101/104/110) through Pcap -> NetFlowV9 -> the aggregate
  // planner and diff cell-by-cell against the reference's committed golden
  // output (output-flow-00.json), projecting exactly the non-volatile
  // fields its harness asserts (set_ignored_fields, 1xx_test.py:25).
  // Comparison is a symmetric except() on the same projection the DuckDB
  // oracle of q196-q199 uses — zero rows each way = exact match.

  private val refTests = "/root/reference/tests"

  private def goldenDf(testName: String) =
    spark.read.json(s"$refTests/$testName/output-flow-00.json")

  private def checkGolden(qName: String, testName: String,
                          project: org.apache.spark.sql.DataFrame =>
                            org.apache.spark.sql.DataFrame): Unit = {
    val got = SparkEntry.queries(qName)(spark, "/root/testdata/sf0.001")
    val exp = project(goldenDf(testName)).select(
      got.columns.sorted.map(col): _*)
    val gotS = got.select(got.columns.sorted.map(col): _*)
    assert(gotS.count() == exp.count(),
      s"$qName: row count ${gotS.count()} != golden ${exp.count()}")
    assert(gotS.exceptAll(exp).isEmpty && exp.exceptAll(gotS).isEmpty,
      s"$qName diverged from reference golden $testName")
  }

  private def baseProj(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("tcp_flags", concat_ws(",", col("tcp_flags")))
      .withColumn("mpls_label_stack", concat_ws(",", col("mpls_label_stack")))

  test("reference golden replay: 100-IPFIXv10-CISCO") {
    checkGolden("q196_golden_ipfix_cisco", "100-IPFIXv10-CISCO", baseProj)
  }

  test("reference golden replay: 101-NFv9-CISCO-cust_primitives") {
    checkGolden("q197_golden_nfv9_custom", "101-NFv9-CISCO-cust_primitives",
      df => baseProj(df)
        .withColumn("cp_vrf_id_ingress",
          col("custom_primitives.vrf_id_ingress"))
        .withColumn("cp_vrf_id_egress",
          col("custom_primitives.vrf_id_egress"))
        .withColumn("cp_mpls_tl_ipv4_address",
          col("custom_primitives.mpls_tl_ipv4_address"))
        .withColumn("cp_mpls_tl_prefix_length",
          col("custom_primitives.mpls_tl_prefix_length"))
        .withColumn("cp_mpls_tl_type",
          col("custom_primitives.mpls_tl_type")))
  }

  test("reference golden replay: 104-IPFIXv10-IPv6 sampling option") {
    checkGolden("q198_golden_ipfix_v6_sampling",
      "104-IPFIXv10-IPv6-CISCO-sampling_option",
      df => baseProj(df)
        .withColumn("cp_vrf_id_ingress",
          col("custom_primitives.vrf_id_ingress"))
        .withColumn("cp_vrf_id_egress",
          col("custom_primitives.vrf_id_egress"))
        .withColumn("label_nkey", col("label.nkey"))
        .withColumn("label_pkey", col("label.pkey")))
  }

  test("reference golden replay: 110 multiple sources") {
    checkGolden("q199_golden_multi_source",
      "110-IPFIXv10-NFv9-multiple-sources",
      df => baseProj(df)
        .withColumn("cp_vrf_id_ingress",
          col("custom_primitives.vrf_id_ingress"))
        .withColumn("cp_vrf_id_egress",
          col("custom_primitives.vrf_id_egress"))
        .withColumn("cp_mpls_tl_ipv4_address",
          col("custom_primitives.mpls_tl_ipv4_address"))
        .withColumn("cp_mpls_tl_prefix_length",
          col("custom_primitives.mpls_tl_prefix_length"))
        .withColumn("cp_mpls_tl_type",
          col("custom_primitives.mpls_tl_type"))
        .withColumn("label_nkey", col("label.nkey"))
        .withColumn("label_pkey", col("label.pkey")))
  }

  // Test 206's scenario axis (README "Scenarios"): the HA stand-by
  // queue's retention knobs applied to the SAME replayed feed. The
  // arrival timeline comes from the capture (segment completion times,
  // the enqueue stamps of ha.c:131-138); the knobs come from the
  // scenario conf files; the pop rule is ha.c:170-190 (front older than
  // timeout OR queue over max). The retained set must always be an
  // arrival-order SUFFIX, and the three configs carve three different
  // windows out of the one feed.
  test("206 HA scenarios: retention knobs bound the failover dump") {
    import graft.operators.GoldenReplay
    import graft.sources.Pcap
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    val dir = "/root/reference/tests/206-BMP-high-availability"
    val sf = Pcap.read(JFiles.readAllBytes(
      JPaths.get(s"$dir/traffic-00.pcap")))
    val msgs = GoldenReplay.bmpMessageTimes(sf, dport = 1790)
    assert(msgs.size == 295) // the full BMP feed
    val tEnd = msgs.map(_._2).max
    val base = GoldenReplay.haConf(s"$dir/nfacctd-00.conf")
    val s01 = GoldenReplay.haConf(s"$dir/scenario-01/nfacctd-00.conf")
    val s02 = GoldenReplay.haConf(s"$dir/scenario-02/nfacctd-00.conf")
    assert(base == ("nfacctd_bmp", 13, 15, 1000))
    assert(s01 == ("nfacctd_bmp", 0, 15, -1))
    assert(s02 == ("nfacctd_bmp", 0, 10, -1))
    val rBase = GoldenReplay.haRetained(msgs, tEnd, base._3, base._4)
    val r01 = GoldenReplay.haRetained(msgs, tEnd, s01._3, s01._4)
    val r02 = GoldenReplay.haRetained(msgs, tEnd, s02._3, s02._4)
    // 15 s window retains 104 of 295 (the pop rule is strictly
    // older-than, ha.c:178, so the age-exactly-15s message stays); the
    // 1000-message cap never binds on this feed, so base == scenario-01;
    // the 10 s window narrows to 77 — the semantic difference the
    // scenario axis exists to test
    assert(rBase.size == 104 && r01 == rBase, s"base=${rBase.size}")
    assert(r02.size == 77, s"s02=${r02.size}")
    // retention always keeps an arrival-order suffix
    assert(rBase == msgs.takeRight(rBase.size))
    assert(r02 == msgs.takeRight(r02.size))
    // the max-size rule alone pops oldest-first: a cap of 50 keeps the
    // NEWEST 50 regardless of age
    assert(GoldenReplay.haRetained(msgs, tEnd, base._3, 50) ==
      msgs.takeRight(50))
  }
}
