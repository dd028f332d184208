package graft.multimodal

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables}

/** One document payload treated as an opaque media blob. */
final case class MediaIn(doc_id: Long, data: Array[Byte])

/** Stub "decoded" media metadata. */
final case class MediaMeta(doc_id: Long, n_bytes: Long, magic: Long,
                           checksum100: Long, n_frames: Long)

/** Multimodal column plumbing (builder brief): image/audio/video as opaque
  * `binary` columns + typed metadata, decoded in batch per partition.
  *
  * The Spark-side plumbing is real — binary encoding, typed Dataset,
  * per-partition batch iteration (the Scala analogue of `mapInPandas`
  * batches), output schema. The DECODE STEP IS A DETERMINISTIC STUB
  * (media codecs are not in this container): [[MultimodalQueries.decodeStub]]
  * computes fake metadata from raw bytes; a real deployment swaps in the
  * codec there without touching the pipeline shape.
  */
object MultimodalQueries {

  /** STUB decoder — replace with a real codec (e.g. image dims, audio
    * sample rate, frame extraction). Deterministic fake: header byte,
    * 100-byte prefix checksum, fixed-stride "frame" count. */
  def decodeStub(m: MediaIn): MediaMeta = {
    val n = m.data.length.toLong
    val magic = if (n > 0) m.data(0).toLong & 0xff else -1L
    var sum = 0L
    var i = 0
    while (i < math.min(100, m.data.length)) {
      sum += m.data(i) & 0xff; i += 1
    }
    MediaMeta(m.doc_id, n, magic, sum % 65536L, n / 256L)
  }

  val all: Seq[Q] = Seq(

    // Binary ingestion → per-partition batch decode → metadata aggregation.
    // The oracle recomputes the stub's arithmetic from the UTF-8 bytes
    // (the corpus is ASCII, so codepoints == bytes).
    Q("q51_multimodal_meta",
      (s, d) => {
        val sp = s
        import sp.implicits._
        val blobs = Tables.documents(s, d)
          .selectExpr("doc_id", "encode(text, 'UTF-8') as data")
          .as[MediaIn]
        blobs.mapPartitions(_.map(decodeStub)).toDF()
          .groupBy((col("doc_id") % 10).as("shard"))
          .agg(count(lit(1)).as("n_docs"), sum("n_bytes").as("total_bytes"),
            sum("checksum100").as("sum_checksum"),
            sum("n_frames").as("total_frames"),
            countDistinct("magic").as("n_magics"))
      },
      Some("""SELECT doc_id % 10 AS shard, count(*) AS n_docs,
              CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
              CAST(sum(CASE WHEN len(text) = 0 THEN 0 ELSE
                list_reduce([0] || list_transform(
                  range(1, least(100, len(text)) + 1),
                  i -> ord(substr(text, i, 1))), (a, x) -> a + x) % 65536
                END) AS BIGINT) AS sum_checksum,
              CAST(sum(octet_length(encode(text)) // 256) AS BIGINT)
                AS total_frames,
              count(DISTINCT CASE WHEN len(text) > 0
                THEN ord(substr(text, 1, 1)) ELSE -1 END) AS n_magics
              FROM documents GROUP BY 1"""),
      doc = "binary media plumbing with stubbed per-partition decode"),

    // Frame sampling: fan a media blob out into fixed-stride frames
    // (video frame-sample / audio chunk shape): generator over the frame
    // count, per-frame feature from the frame's bytes. The explode happens
    // BEFORE the aggregation shuffle so map-side partial agg collapses the
    // fan-out, same as pro-rating.
    Q("q75_frame_sample",
      (s, d) => Tables.documents(s, d)
        .selectExpr("doc_id",
          "encode(text, 'UTF-8') as data")
        .selectExpr("doc_id", "length(data) as n_bytes",
          // frame k covers bytes [k*256, (k+1)*256); partial tail kept
          "explode(sequence(0, int(ceil(length(data) / 256.0)) - 1))" +
            " as frame_id")
        .join(Tables.documents(s, d).select("doc_id", "text"), "doc_id")
        .selectExpr("doc_id", "frame_id",
          "substring(text, frame_id * 256 + 1, 256) as frame")
        .selectExpr("doc_id", "frame_id",
          "length(frame) as frame_len",
          "cast(conv(substring(md5(frame), 1, 8), 16, 10) as bigint) % 997" +
            " as feature")
        .groupBy()
        .agg(count(lit(1)).as("n_frames"),
          countDistinct("feature").as("n_features"),
          sum("frame_len").as("bytes_covered"),
          max("frame_id").as("max_frame")),
      Some("""SELECT count(*) AS n_frames,
              count(DISTINCT feature) AS n_features,
              CAST(sum(frame_len) AS BIGINT) AS bytes_covered,
              max(frame_id) AS max_frame
              FROM (
                SELECT doc_id, frame_id,
                  len(substr(text, frame_id * 256 + 1, 256)) AS frame_len,
                  ('0x' || substr(md5(substr(text, frame_id * 256 + 1, 256)),
                    1, 8))::BIGINT % 997 AS feature
                FROM (
                  SELECT doc_id, text,
                    unnest(range(0, CAST(ceil(len(text) / 256.0) AS BIGINT)))
                    AS frame_id
                  FROM documents))"""),
      doc = "fixed-stride frame sampling over binary media columns")
  )
}
