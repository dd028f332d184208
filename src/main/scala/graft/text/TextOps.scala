package graft.text

/** Shared text-pipeline expression builders, emitted in BOTH dialects —
  * Spark SQL (consumed via `expr`/`selectExpr`) and DuckDB SQL (the
  * oracle) — from one definition site so the two stay in lockstep.
  *
  * Everything is deterministic integer/double arithmetic over md5 token
  * hashes: both engines produce identical md5 hex, identical 60-bit
  * integer reductions, and identical IEEE-754 sequential folds, so results
  * hash-match cell-for-cell. No UDFs anywhere — every expression is
  * Catalyst-codegen-able (and at 100 TB stays inside WholeStageCodegen).
  */
object TextOps {

  /** Word tokenizer: lowercase alnum runs. The Spark side runs the
    * native byte-run kernel ([[graft.plans.TokensAz09]], registered as
    * `graft_toks` by GraftFunctions) — exactly the match list of
    * `regexp_extract_all(lowered, '[a-z0-9]+', 0)` at a fraction of the
    * regex engine's cost (optimization r17; parity property-tested in
    * PlanSpec). */
  val sparkToks = "graft_toks(lower(text))"
  val duckToks = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  /** BPE-ish tokenizer: letter runs, digit runs, punct runs separately.
    * NOTE: Spark SQL string literals process backslash escapes (`\\s`),
    * DuckDB's standard-SQL literals do not (`\s`) — hence two spellings
    * of the same regex. */
  val sparkToksBpe =
    "regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]+', 0)"
  val duckToksBpe =
    "regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]+')"

  /** 60-bit token hash from the md5 hex prefix (identical in both).
    * Spark side is the native digest-prefix kernel `graft_hash60`
    * ([[graft.plans.Hash60]]) — the same top-60-bits-of-md5 value with
    * zero hex-string intermediates (optimization r17). */
  def sparkTokHash(t: String): String = s"graft_hash60($t)"
  def duckTokHash(t: String): String =
    s"(('0x' || substr(md5($t), 1, 15))::BIGINT)"

  /** Prime modulus for minhash/lang-class arithmetic. */
  val P = 1000003L

  /** Per-token hash array reduced mod P (with multiplicity). */
  val sparkHps = s"transform($sparkToks, t -> ${sparkTokHash("t")} % $P)"
  val duckHps = s"list_transform($duckToks, t -> ${duckTokHash("t")} % $P)"

  /** Minhash signature k over a distinct-hash array column `hs`:
    * min of the k-th universal hash (a_k h + b_k) mod P. */
  def minhashA(k: Int): Long = 2L * k + 3L
  def minhashB(k: Int): Long = 97L * k + 11L
  def sparkMinhash(hs: String, k: Int): String =
    s"array_min(transform($hs, h -> (${minhashA(k)} * h + ${minhashB(k)}) % $P))"
  def duckMinhash(hs: String, k: Int): String =
    s"list_min(list_transform($hs, h -> (${minhashA(k)} * h + ${minhashB(k)}) % $P))"

  /** Position-sensitive 47-bit document fingerprint:
    * XOR over tokens of (hash40 * position). The token array is bound
    * ONCE with [[let1]] — the previous spelling referenced the
    * tokenizer expression inside the per-element lambda, so the whole
    * tokenize pass re-ran per TOKEN (O(tokens) re-evaluations per row;
    * q35's plan showed three copies, one under the lambda —
    * optimization r17). */
  val sparkFingerprint: String = let1(sparkToks, t =>
    s"""aggregate(
        transform(sequence(1, size($t)),
          i -> (${sparkTokHash(s"element_at($t, i)")} % 1099511627776) * i),
        0L, (a, x) -> a ^ x)""")
  val duckFingerprint: String =
    s"""list_reduce(
        [0::BIGINT] || list_transform(range(1, len($duckToks) + 1),
          i -> (${duckTokHash(s"list_extract($duckToks, i)")} % 1099511627776) * i),
        (a, x) -> xor(a, x))"""

  /** Let-binding idiom: evaluate `bound` ONCE and reference it many times
    * in `body` — Catalyst's CollapseProject happily inlines expensive
    * aliases into every use site (q34 showed 40 tokenizer copies in the
    * plan), but a lambda variable is bound exactly once per row. */
  def let1(bound: String, body: String => String): String =
    s"element_at(transform(array($bound), __x -> ${body("__x")}), 1)"

  /** Language-ID heuristic: each token hashes into one of 5 marker
    * classes; predicted language = argmax class count (ties → first).
    * Stand-in for real char-n-gram profiles (the synthetic corpus shares
    * one vocabulary across langs); the *operator shape* — per-doc argmax
    * over class scores, no shuffle — is what carries to production.
    */
  val langs = Seq("en", "de", "es", "fr", "zh")
  private def langCase(s: Array[String]): String = {
    // argmax with first-wins tiebreak over s(0)..s(4)
    val branches = langs.indices.map { i =>
      val geAll = langs.indices.filter(_ > i).map(j => s"${s(i)} >= ${s(j)}")
      val gtPrev = langs.indices.filter(_ < i).map(j => s"${s(i)} > ${s(j)}")
      val cond = (gtPrev ++ geAll).mkString(" AND ")
      s"WHEN ${if (cond.isEmpty) "TRUE" else cond} THEN '${langs(i)}'"
    }
    s"CASE ${branches.mkString(" ")} ELSE '${langs.last}' END"
  }
  /** Spark side folds ONE histogram pass over the hash array, then binds
    * it with [[let1]] so the tokenizer+md5 chain runs once per row. */
  def sparkLangPredict(hps: String): String = {
    val hist =
      s"""aggregate($hps, array(0, 0, 0, 0, 0),
          (acc, h) -> transform(acc,
            (c, i) -> CASE WHEN h % 5 = i THEN c + 1 ELSE c END))"""
    let1(hist, s => langCase(
      langs.indices.map(i => s"element_at($s, ${i + 1})").toArray))
  }
  def duckLangPredict(hps: String): String =
    langCase(langs.indices.map(i =>
      s"len(list_filter($hps, h -> h % 5 = $i))").toArray)

  /** Quality score in [0,1]: length, stopword ratio, mean token length.
    * [[sparkQualityOf]] takes the token-array expression (or a bound
    * column) so a pipeline that tokenizes ONCE can reuse the pass. */
  private val stops = "('a', 'the', 'of', 'and', 'big', 'small')"
  def sparkQuality: String = sparkQualityOf(sparkToks)
  def sparkQualityOf(toks: String): String = let1(toks, t =>
    s"""round(
       0.4 * least(1.0, size($t) / 80.0)
     + 0.3 * (1.0 - cast(size(filter($t, tk -> tk IN $stops)) as double)
              / greatest(size($t), 1))
     + 0.3 * least(1.0,
         cast(aggregate(transform($t, tk -> length(tk)), 0, (a, x) -> a + x)
              as double) / greatest(size($t), 1) / 6.0), 6)""")
  def duckQuality: String =
    s"""round(
       0.4 * least(1.0, len($duckToks) / 80.0)
     + 0.3 * (1.0 - (len(list_filter($duckToks, t -> t IN $stops))::DOUBLE)
              / greatest(len($duckToks), 1))
     + 0.3 * least(1.0,
         (list_reduce([0] || list_transform($duckToks, t -> len(t)),
            (a, x) -> a + x)::DOUBLE) / greatest(len($duckToks), 1) / 6.0), 6)"""

  /** 3-token shingles (n-gram dedup unit). */
  def sparkShingles(toks: String): String =
    s"""transform(sequence(1, greatest(size($toks) - 2, 1)),
        i -> array_join(slice($toks, i, 3), ' '))"""
  def duckShingles(toks: String): String =
    s"""list_transform(range(1, greatest(len($toks) - 2, 1) + 1),
        i -> array_to_string($toks[i:i+2], ' '))"""
}
