package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.AhoCorasick

/** Aho–Corasick vs a brute-force indexOf oracle: every occurrence of
  * every pattern, including overlaps and nested patterns, on crafted
  * and fuzzed inputs. */
class AhoCorasickSpec extends AnyFunSuite {

  private def brute(patterns: Seq[String], text: String)
      : Map[Int, Seq[Int]] =
    patterns.zipWithIndex.map { case (p, pi) =>
      pi -> Iterator.iterate(text.indexOf(p))(i =>
        text.indexOf(p, i + 1)).takeWhile(_ >= 0)
        .map(_ + p.length).toSeq
    }.toMap

  test("nested and overlapping patterns all report") {
    val pats = Seq("he", "she", "his", "hers", "the")
    val ac = AhoCorasick.build(pats)
    val text = "ushers in the shed"
    val got = ac.scan(text).toSeq.groupBy(_._1)
      .map { case (p, xs) => p -> xs.map(_._2) }
    val want = brute(pats, text).filter(_._2.nonEmpty)
    assert(got == want)
    // 'ushers': she@4, he@4, hers@6 — the output-link chain
    assert(got(0).contains(4) && got(1).contains(4) && got(3).contains(6))
  }

  test("overlapping occurrences of a self-bordered pattern") {
    val ac = AhoCorasick.build(Seq("aba"))
    // 'ababa': matches ending at 3 and 5 (overlap via the border)
    assert(ac.scan("ababa").toSeq == Seq((0, 3), (0, 5)))
    assert(ac.countAll("ababa")(0) == 2L)
  }

  test("fuzz: counts match brute force on random small-alphabet text") {
    val pats = Seq("ab", "aba", "ba", "bb", "aab", "abab", "b")
    val ac = AhoCorasick.build(pats)
    var s = 12345L
    for (_ <- 0 until 200) {
      val text = new String(Array.fill(1 + (s % 60).toInt) {
        s = s * 6364136223846793005L + 1442695040888963407L
        ('a' + ((s >>> 33) % 2).toInt).toChar
      })
      s += 1
      val want = brute(pats, text).view.mapValues(_.size.toLong).toMap
      val got = ac.countAll(text)
      pats.indices.foreach(i =>
        assert(got(i) == want(i), s"pattern ${pats(i)} in '$text'"))
    }
  }

  test("no matches, empty text, unicode passthrough") {
    val ac = AhoCorasick.build(Seq("xyz", "zyx"))
    assert(ac.scan("").isEmpty)
    assert(ac.countAll("aaaa").forall(_ == 0))
    assert(ac.countAll("touché xyz ñ").apply(0) == 1)
    assertThrows[IllegalArgumentException] { AhoCorasick.build(Nil) }
    assertThrows[IllegalArgumentException] { AhoCorasick.build(Seq("")) }
  }

  test("automaton survives java serialization (broadcast contract)") {
    val ac = AhoCorasick.build(Seq("the", "he", "or"))
    val bo = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bo).writeObject(ac)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bo.toByteArray))
      .readObject().asInstanceOf[AhoCorasick]
    assert(back.countAll("the shore").toSeq ==
      ac.countAll("the shore").toSeq)
  }
}
