package graft.maps

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** pre_tag_map — pmacct's first-match rule chain that stamps records with
  * tag/tag2/label (reference: `src/pretag.c:56` load, `struct id_entry`
  * `src/pretag.h:224-245`; jeq/stack semantics `docs/INTERNALS:411-419`;
  * CONFIG-KEYS:2234-2311).
  *
  * Spark-first design: the rule chain compiles to ONE nested
  * `when/otherwise` Column — a pure Catalyst expression that rides inside
  * whole-stage codegen, exactly like pmacct's `maps_index` avoids a linear
  * rule scan. No UDF, no join, no shuffle; at 100 TB this is a free
  * per-record projection.
  *
  * `jeq` (jump to labeled rule group) and `stack` (compose tags by sum/or)
  * are supported by compiling each labeled group to its own chain and
  * folding the groups: a record that matches a rule with `jeq=L` continues
  * evaluating at group L; `stack` merges the tags instead of replacing.
  */
object PreTagMap {

  /** One rule: predicate → tag [+label] [jeq to group][stack op]. */
  final case class TagRule(
      pred: Column,
      tag: Long,
      label: Option[String] = None,
      jeq: Option[String] = None,
      stack: Option[String] = None) // "sum" | "or"

  /** First-match tag over a flat chain (no jeq): nested CASE. */
  def tagColumn(rules: Seq[TagRule], default: Long = 0L): Column =
    rules.foldRight(lit(default)) { (r, acc) =>
      when(r.pred, lit(r.tag)).otherwise(acc)
    }

  /** First-match label (pre_tag_label_filter source, CONFIG-KEYS:2327). */
  def labelColumn(rules: Seq[TagRule], default: String = ""): Column =
    rules.foldRight(lit(default)) { (r, acc) =>
      when(r.pred, lit(r.label.getOrElse(""))).otherwise(acc)
    }

  /** Full chain with jeq/stack across named groups (docs/INTERNALS:411-419).
    * Groups evaluate in order; a matching rule with `jeq` sends the record
    * on to that group, composing tags when `stack` is set.
    */
  def tagWithGroups(groups: Seq[(String, Seq[TagRule])],
                    default: Long = 0L): Column = {
    // compile group -> (matchTag, jeqTarget, stackOp) then fold backwards:
    // the value of evaluating from group i is
    //   CASE match-in-group-i of rule r =>
    //     if r.jeq -> combine(r.tag, valueFrom(jeqGroup)) else r.tag
    //   else default
    val byName = groups.toMap
    def eval(name: String, seen: Set[String]): Column = {
      if (seen.contains(name)) lit(default)
      else byName.get(name) match {
        case None => lit(default)
        case Some(rules) =>
          rules.foldRight(lit(default)) { (r, acc) =>
            val value = r.jeq match {
              case Some(target) =>
                val cont = eval(target, seen + name)
                r.stack match {
                  case Some("sum") => lit(r.tag) + cont
                  case Some("or") => lit(r.tag).bitwiseOR(cont)
                  case _ => cont // plain jump: downstream tag wins
                }
              case None => lit(r.tag)
            }
            when(r.pred, value).otherwise(acc)
          }
      }
    }
    groups.headOption.map { case (n, _) => eval(n, Set.empty) }
      .getOrElse(lit(default))
  }

  /** pre_tag_filter: keep records whose tag is in the given set/ranges,
    * with negation (CONFIG-KEYS:2312-2326; evaluate_tags
    * src/plugin_hooks.c:450-451). */
  def tagFilter(tag: Column, keep: Seq[Long], negate: Boolean = false): Column =
    if (negate) !tag.isin(keep: _*) else tag.isin(keep: _*)
}
