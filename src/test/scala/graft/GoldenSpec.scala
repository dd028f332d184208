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
}
