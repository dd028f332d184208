package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.functions.col

/** Scale-safe session decode (the r5 verdict's de-weakening): replaces
  * `groupByKey(k).flatMapGroups { it.toIndexedSeq.sortBy(...) }` — which
  * buffers AND sorts the whole group in one task — with the classic
  * secondary-sort shape:
  *
  *   repartition(parts, key) . sortWithinPartitions(key, seq)
  *     . mapPartitions { mapRuns(...) }
  *
  * The shuffle's external sort delivers each partition ordered by
  * (key, seq) with spill-to-disk, and [[mapRuns]] walks consecutive
  * equal-key runs handing the session handler a LAZY sub-iterator — task
  * memory is O(record) + whatever running state the handler keeps (seen
  * sets, counters), never O(group). Per-session serial decode is inherent
  * (a TCP byte stream is ordered); what scales is the number of sessions,
  * so callers fan out over 64 keys.
  */
object SessionWalk {

  /** Shuffle the tuple dataset so each partition arrives sorted by its
    * first two columns — session key, then sequence (positional: `.as[T]`
    * keeps the source column names). */
  def sessions[T: Encoder](ds: Dataset[T], parts: Int = 64): Dataset[T] = {
    val c = ds.columns
    ds.repartition(parts, col(c(0)))
      .sortWithinPartitions(col(c(0)), col(c(1)))
  }

  /** Like [[sessions]] but sorted by EVERY column (key first) — for
    * handlers whose in-run order is a composite of several fields rather
    * than a single sequence column. */
  def sessionsAll[T: Encoder](ds: Dataset[T], parts: Int = 64)
      : Dataset[T] = {
    val c = ds.columns
    ds.repartition(parts, col(c(0)))
      .sortWithinPartitions(c.map(col).toIndexedSeq: _*)
  }

  /** Walk runs of equal keys over an already-sorted iterator. The handler
    * receives each run as a lazy sub-iterator it must consume before the
    * next run begins (any leftover is drained defensively). The handler's
    * result must not retain the sub-iterator. */
  def mapRuns[T, R](sorted: Iterator[T])(key: T => Long)(
      handle: (Long, Iterator[T]) => IterableOnce[R]): Iterator[R] =
    new Iterator[R] {
      private val buf = sorted.buffered
      private var out: Iterator[R] = Iterator.empty

      @annotation.tailrec
      private def advance(): Unit =
        if (!out.hasNext && buf.hasNext) {
          val k = key(buf.head)
          val run = new Iterator[T] {
            def hasNext: Boolean = buf.hasNext && key(buf.head) == k
            def next(): T =
              if (hasNext) buf.next() else Iterator.empty.next()
          }
          out = handle(k, run).iterator
          while (run.hasNext) run.next() // handler must not depend on rest
          advance()
        }

      def hasNext: Boolean = { advance(); out.hasNext }
      def next(): R = { advance(); out.next() }
    }

  /** Bounded wire accumulation: encoded messages append until the buffer
    * crosses `maxBytes`, then the chunk decodes as one contiguous stream
    * (chunk boundaries are message-aligned because only whole encoded
    * messages are written). Multi-message stream framing is still
    * exercised on every chunk, but task memory is O(chunk), not
    * O(session wire). */
  final class ChunkedWire(decodeChunk: Array[Byte] => Unit,
                          maxBytes: Int = 1 << 16) {
    private val buf = new java.io.ByteArrayOutputStream(maxBytes + 4096)
    def write(msg: Array[Byte]): Unit = {
      buf.write(msg, 0, msg.length)
      if (buf.size >= maxBytes) flush()
    }
    def flush(): Unit = if (buf.size > 0) {
      decodeChunk(buf.toByteArray)
      buf.reset()
    }
  }
}
