package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BPF-subset → Catalyst `Column` compiler (SURVEY §2.4 `aggregate_filter`,
  * CONFIG-KEYS:182-204; §4 custom inventory item 5).
  *
  * pmacct evaluates tcpdump-syntax BPF per record against the raw packet
  * (`evaluate_filters`, src/plugin_hooks.c:449). The engine's records are
  * already-decoded flows, so the filter compiles to a declarative Catalyst
  * predicate instead — it then participates in predicate pushdown and
  * whole-stage codegen like any other `filter()`.
  *
  * Grammar (the flow-field subset):
  * {{{
  *   expr  := term ('or' term)*
  *   term  := fact ('and' fact)*
  *   fact  := 'not' fact | '(' expr ')' | prim
  *   prim  := 'tcp' | 'udp'
  *          | dir? 'host' NUM | dir? 'port' NUM | dir? 'net' NUM '/' LEN
  *          | 'proto' NUM
  *          | ('bytes' | 'packets') ('<'|'<='|'>'|'>='|'='|'!=') NUM
  *   dir   := 'src' | 'dst'
  * }}}
  * Directionless host/port/net matches either side (tcpdump semantics).
  * `net` is longest-prefix arithmetic over the engine's 16-bit space.
  */
object BpfFilter {

  final case class ParseError(msg: String) extends RuntimeException(msg)

  /** Column bindings: which flow columns the BPF vocabulary refers to. */
  final case class Fields(
      ipSrc: Column, ipDst: Column,
      portSrc: Column, portDst: Column,
      proto: Column, bytes: Column, packets: Column,
      width: Int = 16)

  def compile(filter: String, f: Fields): Column =
    new Parser(tokenize(filter), f).parseAll()

  private def tokenize(s: String): List[String] =
    s.replace("(", " ( ").replace(")", " ) ")
      .split("\\s+").filter(_.nonEmpty).toList

  private final class Parser(var toks: List[String], f: Fields) {
    def parseAll(): Column = {
      val c = expr()
      if (toks.nonEmpty) throw ParseError(s"trailing tokens: $toks")
      c
    }

    private def peek: Option[String] = toks.headOption
    private def next(): String = toks match {
      case h :: t => toks = t; h
      case Nil => throw ParseError("unexpected end of filter")
    }
    private def expect(t: String): Unit = {
      val got = next()
      if (got != t) throw ParseError(s"expected '$t', got '$got'")
    }
    private def num(): Long = {
      val t = next()
      try t.toLong
      catch { case _: NumberFormatException =>
        throw ParseError(s"expected number, got '$t'") }
    }

    private def expr(): Column = {
      var c = term()
      while (peek.contains("or")) { next(); c = c || term() }
      c
    }
    private def term(): Column = {
      var c = fact()
      while (peek.contains("and")) { next(); c = c && fact() }
      c
    }
    private def fact(): Column = peek match {
      case Some("not") => next(); !fact()
      case Some("(") =>
        next(); val c = expr(); expect(")"); c
      case _ => prim()
    }

    private def net(ip: Column, base: Long, len: Int): Column = {
      val shift = f.width - len
      if (shift <= 0) ip === base
      else shiftleft(shiftright(ip, shift), shift) === ((base >> shift) << shift)
    }

    private def cmp(c: Column): Column = {
      val op = next()
      val n = num()
      op match {
        case "<" => c < n
        case "<=" => c <= n
        case ">" => c > n
        case ">=" => c >= n
        case "=" => c === n
        case "!=" => c =!= n
        case other => throw ParseError(s"bad comparator '$other'")
      }
    }

    private def prim(): Column = next() match {
      case "tcp" => f.proto === 6L
      case "udp" => f.proto === 17L
      case "proto" => f.proto === num()
      case "bytes" => cmp(f.bytes)
      case "packets" => cmp(f.packets)
      case "host" => val n = num(); f.ipSrc === n || f.ipDst === n
      case "port" => val n = num(); f.portSrc === n || f.portDst === n
      case "net" => val (b, l) = netSpec(); net(f.ipSrc, b, l) || net(f.ipDst, b, l)
      case "src" => next() match {
        case "host" => f.ipSrc === num()
        case "port" => f.portSrc === num()
        case "net" => val (b, l) = netSpec(); net(f.ipSrc, b, l)
        case other => throw ParseError(s"bad src qualifier '$other'")
      }
      case "dst" => next() match {
        case "host" => f.ipDst === num()
        case "port" => f.portDst === num()
        case "net" => val (b, l) = netSpec(); net(f.ipDst, b, l)
        case other => throw ParseError(s"bad dst qualifier '$other'")
      }
      case other => throw ParseError(s"unknown primitive '$other'")
    }

    /** `NUM/LEN` — tokenizer keeps it one token. */
    private def netSpec(): (Long, Int) = {
      val t = next()
      t.split("/") match {
        case Array(b, l) =>
          try (b.toLong, l.toInt)
          catch {
            case _: NumberFormatException =>
              throw ParseError(s"bad net spec '$t'")
          }
        case _ => throw ParseError(s"bad net spec '$t'")
      }
    }
  }
}
