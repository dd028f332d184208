package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Replay/savefile source (SURVEY §2.1 `pcap_savefile_replay` /
  * `pcap_savefile_delay`, CONFIG-KEYS:484-524): the engine's replay knob
  * is the file stream source's `maxFilesPerTrigger` — each trigger
  * ingests a bounded slice of the recorded data, giving pmacct's
  * paced-replay semantics under Structured Streaming. */
class ReplaySpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("paced replay: maxFilesPerTrigger bounds each micro-batch") {
    val dir = Files.createTempDirectory("graft_replay").toString
    // three "capture files" of known sizes
    Seq(3, 5, 7).zipWithIndex.foreach { case (n, i) =>
      (0 until n).map(j => (i.toLong, j.toLong)).toDF("f", "v")
        .coalesce(1).write.parquet(s"$dir/part_$i")
    }
    val schema = spark.read.parquet(s"$dir/part_0").schema
    val batchSizes = scala.collection.mutable.Buffer[Long]()
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/part_*")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val c = b.count()
        if (c > 0) batchSizes.synchronized { batchSizes += c }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // each replayed batch carried exactly one capture file
    assert(batchSizes.sorted == Seq(3L, 5L, 7L))
  }
}
