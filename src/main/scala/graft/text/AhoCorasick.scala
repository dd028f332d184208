package graft.text

/** Aho–Corasick multi-pattern matcher — the one-pass answer to
  * "scan every document against N banned phrases" (PII/contamination
  * scrubbing, nDPI-style payload keyword rules): O(text + matches) per
  * document regardless of pattern count, vs N substring scans.
  *
  * The automaton is built once (goto trie + BFS failure links + output
  * links, the classic 1975 construction) and is a plain serializable
  * value — it broadcasts to executors like a PreTagMap rule table, so
  * a 100 TB scan ships the patterns once per executor, not per task.
  *
  * Matching reports EVERY occurrence of every pattern, including
  * overlapping occurrences and patterns nested inside longer ones
  * (via the output chain) — the full Aho–Corasick contract.
  */
final class AhoCorasick private (
    // flat automaton: per state a sorted (char -> next) table
    private val transChars: Array[Array[Char]],
    private val transNext: Array[Array[Int]],
    private val fail: Array[Int],
    // per state: pattern indices ending here (own + via output links)
    private val outs: Array[Array[Int]],
    val patterns: Seq[String]) extends Serializable {

  private def step(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val i = java.util.Arrays.binarySearch(transChars(s), c)
      if (i >= 0) return transNext(s)(i)
      if (s == 0) return 0
      s = fail(s)
    }
    0
  }

  /** All matches as (patternIndex, endOffsetExclusive). */
  def scan(text: CharSequence): Iterator[(Int, Int)] = {
    var state = 0
    (0 until text.length).iterator.flatMap { i =>
      state = step(state, text.charAt(i))
      outs(state).iterator.map(p => (p, i + 1))
    }
  }

  /** Per-pattern occurrence counts over one text (dense, zeros kept). */
  def countAll(text: CharSequence): Array[Long] = {
    val c = new Array[Long](patterns.size)
    var state = 0
    var i = 0
    while (i < text.length) {
      state = step(state, text.charAt(i))
      val o = outs(state)
      var j = 0
      while (j < o.length) { c(o(j)) += 1; j += 1 }
      i += 1
    }
    c
  }
}

object AhoCorasick {

  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be nonempty")
    // trie
    val next = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map[Char, Int]())
    val ownOut = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Buffer[Int]())
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = next(s).getOrElseUpdate(c, {
          next += scala.collection.mutable.Map[Char, Int]()
          ownOut += scala.collection.mutable.Buffer[Int]()
          next.size - 1
        })
      }
      ownOut(s) += pi
    }
    val n = next.size
    val fail = new Array[Int](n)
    // BFS failure links; outputs accumulate along the failure chain
    val outs = Array.fill(n)(scala.collection.mutable.Buffer[Int]())
    (0 until n).foreach(s => outs(s) ++= ownOut(s))
    val queue = scala.collection.mutable.Queue[Int]()
    next(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      next(s).foreach { case (c, t) =>
        queue += t
        var f = fail(s)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(t) = if (next(f).contains(c) && next(f)(c) != t) next(f)(c)
                  else 0
        outs(t) ++= outs(fail(t))
      }
    }
    val tc = Array.tabulate(n) { s =>
      next(s).keys.toArray.sorted
    }
    val tn = Array.tabulate(n) { s =>
      tc(s).map(next(s))
    }
    new AhoCorasick(tc, tn, fail, outs.map(_.toArray.sorted), patterns)
  }
}
