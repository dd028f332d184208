package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Sink adapters (SURVEY §2.2). Each pmacct backend maps to a Spark
  * writer; the frame/layout logic lives here and is unit-testable without
  * live brokers/databases (none exist in this container):
  *
  *  - kafka  → key/value JSON frame for `writeStream.format("kafka")`
  *             (`kafka_cache_purge` src/kafka_plugin.c:384; partition key
  *             CONFIG-KEYS:903)
  *  - print  → partitioned files with dynamic time tokens
  *             (`P_cache_purge` src/print_plugin.c:383; `sql_table`
  *             %Y%m%d tokens CONFIG-KEYS:1143-1229)
  *  - SQL    → UPDATE-then-INSERT upsert statements for foreachBatch JDBC
  *             (docs/INTERNALS:291-295)
  *  - tee    → deterministic receiver fan-out (src/tee_plugin/)
  */
object FlowSinks {

  /** Kafka frame: key = concat of partition-key columns, value = one JSON
    * object per aggregate row (plugin_cmn_json.c shape). The result only
    * needs `.writeStream.format("kafka")` + bootstrap options. */
  def kafkaFrame(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val valueCols = df.columns.toIndexedSeq.map(col)
    df.select(
      concat_ws("|", keyCols.map(col): _*).as("key"),
      to_json(struct(valueCols: _*)).as("value"))
  }

  /** Kafka frame with Avro message bodies (kafka_avro_schema_registry
    * CONFIG-KEYS:1885 minus the registry call: the schema id would ride
    * in the envelope; bodies are the same single-record Avro binary). */
  def kafkaAvroFrame(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    // key appended LAST so the value schema is exactly the payload
    // columns; the per-partition row encoder reads only those fields
    val keyed = df.withColumn("__key",
      concat_ws("|", keyCols.map(col): _*))
    val keyIdx = keyed.columns.length - 1
    val schemaJson = AvroSink.avroSchema(df.schema).toString
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.tuple(Encoders.STRING, Encoders.BINARY)
    keyed.mapPartitions { rows =>
      val enc1 = AvroSink.rowEncoder(schemaJson)
      rows.map(r => (r.getString(keyIdx), enc1(r)))
    }.toDF("key", "value")
  }

  /** Confluent schema-registry wire envelope (public format: magic 0x00
    * + 4-byte big-endian schema id + Avro body) — what
    * `kafka_avro_schema_registry` (CONFIG-KEYS:1885) producers emit; the
    * id comes from the registry's register call on the cluster. */
  def confluentEnvelope(avroBody: Array[Byte], schemaId: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(5 + avroBody.length)
    buf.put(0.toByte).putInt(schemaId).put(avroBody)
    buf.array()
  }

  /** The exact Kafka `writeStream` the cluster runs (kafka_cache_purge,
    * src/kafka_plugin.c:384: serialized cache rows produced to a topic
    * with a partition key). The spark-sql-kafka connector and a broker
    * exist only on the cluster — this builds the fully-wired writer; the
    * caller `.start()`s it where a broker exists. */
  def kafkaWriter(df: DataFrame, bootstrap: String, topic: String,
                  keyCols: Seq[String], checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    kafkaFrame(df, keyCols).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** print plugin with dynamic filenames: time-token directories become
    * partition columns — `%Y%m%d` ≙ `partitionBy(print_day)`. */
  def writePartitionedPrint(df: DataFrame, path: String,
                            tsCol: String, format: String = "json"): Unit =
    df.withColumn("print_day", date_format(col(tsCol), "yyyyMMdd"))
      .write.mode("append").partitionBy("print_day")
      .format(format).save(path)

  /** print_latest_file pointer maintenance (CONFIG-KEYS:1244-1260;
    * link_latest_output_file, src/util.c:489-537): after each flush the
    * pointer re-targets the newest output. The reference's NOTES pin the
    * contract to file-NAME ordering — "a file is reckon as latest if it
    * is lexicographically greater than an existing one" — which is also
    * the only deterministic rule when a distributed flush writes many
    * partitions in the same second, so the comparison here is on names,
    * not mtimes. The pointer is a symlink when the filesystem allows,
    * else a one-line text file holding the target path. */
  def linkLatestOutputFile(pointer: java.nio.file.Path,
                           candidate: java.nio.file.Path): Unit = {
    val current = readLatestPointer(pointer)
    val rewrite = current match {
      case Some(cur) =>
        candidate.getFileName.toString >= java.nio.file.Paths.get(cur)
          .getFileName.toString
      case None => true
    }
    if (rewrite) {
      java.nio.file.Files.deleteIfExists(pointer)
      try { java.nio.file.Files.createSymbolicLink(pointer, candidate); () }
      catch { case _: Exception =>
        java.nio.file.Files.writeString(pointer, candidate.toString); ()
      }
    }
  }

  /** Resolve the pointer: symlink target or text-file content; None when
    * the pointer does not exist yet. */
  def readLatestPointer(pointer: java.nio.file.Path): Option[String] =
    if (!java.nio.file.Files.exists(pointer,
        java.nio.file.LinkOption.NOFOLLOW_LINKS)) None
    else if (java.nio.file.Files.isSymbolicLink(pointer))
      Some(java.nio.file.Files.readSymbolicLink(pointer).toString)
    else Some(java.nio.file.Files.readString(pointer).trim)

  /** Offer every partition directory of a dynamic-name print table to the
    * latest pointer — the per-flush update the print plugin does for each
    * purged file (print_plugin.c:1463-1466). */
  def updateLatestPointer(tablePath: String,
                          pointer: java.nio.file.Path): Unit = {
    val dir = java.nio.file.Paths.get(tablePath)
    if (java.nio.file.Files.isDirectory(dir)) {
      val parts = java.nio.file.Files.list(dir).iterator()
      while (parts.hasNext) {
        val p = parts.next()
        if (p.getFileName.toString.startsWith("print_day="))
          linkLatestOutputFile(pointer, p)
      }
    }
  }

  /** UPDATE-then-INSERT upsert statement pair for one aggregate row
    * (sql_common.c:606 semantics: UPDATE counters by key; INSERT when no
    * row matched). Executed per batch inside `foreachBatch` against JDBC;
    * generation is pure so it is testable offline. */
  def upsertSql(table: String, keyCols: Seq[String],
                counterCols: Seq[String], row: Row): (String, String) = {
    def lit(v: Any): String = v match {
      case s: String => "'" + s.replace("'", "''") + "'"
      case other => String.valueOf(other)
    }
    def eq(c: String) = s"$c = ${lit(row.getAs[Any](c))}"
    val update = s"UPDATE $table SET " +
      counterCols.map(c => s"$c = $c + ${lit(row.getAs[Any](c))}")
        .mkString(", ") +
      " WHERE " + keyCols.map(eq).mkString(" AND ")
    val cols = keyCols ++ counterCols
    val insert = s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (" +
      cols.map(c => lit(row.getAs[Any](c))).mkString(", ") + ")"
    (update, insert)
  }

  /** Execute one aggregate row's UPDATE-then-INSERT pair on a live JDBC
    * statement (sql_common.c:606: UPDATE counters by key; INSERT when no
    * row matched). */
  def upsertExecute(st: java.sql.Statement, table: String,
                    keyCols: Seq[String], counterCols: Seq[String],
                    row: Row): Unit = {
    val (update, insert) = upsertSql(table, keyCols, counterCols, row)
    if (st.executeUpdate(update) == 0) { st.executeUpdate(insert); () }
  }

  /** Flush a micro-batch the sql-plugin way: distributed partial
    * aggregation happens upstream; the (tiny) aggregate rows flow through
    * ONE writer connection per flush (pmacct forks one writer,
    * docs/INTERNALS:285-290), each row as UPDATE-then-INSERT. */
  def sqlFlush(batch: DataFrame, url: String, table: String,
               keyCols: Seq[String], counterCols: Seq[String]): Unit =
    batch.coalesce(1).foreachPartition {
      (rows: Iterator[Row]) =>
        if (rows.nonEmpty) {
          val conn = java.sql.DriverManager.getConnection(url)
          try {
            val st = conn.createStatement()
            rows.foreach(r =>
              upsertExecute(st, table, keyCols, counterCols, r))
            st.close()
          } finally conn.close()
        }
    }

  /** Custom serializer hook (print_output_custom_lib,
    * CONFIG-KEYS:1838-1853, src/plugin_cmn_custom.c): a user-supplied
    * row→bytes function runs per partition — the dlopen'd C plugin's
    * Spark shape. Returns the serialized stream for any downstream
    * writer. */
  def customSerialize(df: DataFrame, fn: Row => String)
      : Dataset[String] = {
    implicit val enc = org.apache.spark.sql.Encoders.STRING
    df.mapPartitions(_.map(fn))
  }

  /** tee: replicate to N receivers with deterministic hash balancing;
    * returns the frame with its receiver assignment (the write side is a
    * `foreachBatch` fan-out or a Kafka topic per receiver). */
  def teeAssign(df: DataFrame, hashCol: String, receivers: Int): DataFrame =
    df.withColumn("receiver", pmod(xxhash64(col(hashCol)), lit(receivers)))
}
