package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column functions for large-scale training-data pipelines:
 * tokenization, character/word shingling, document fingerprinting,
 * quality scoring and n-gram-heuristic language identification.
 *
 * Everything here is a pure Catalyst `Column` expression (no UDFs), so it
 * stays inside whole-stage codegen and scales linearly over a 100 TB corpus:
 * each function is per-row, shuffle-free, and pushdown/pruning friendly.
 *
 * Reference analogues: the reference's scalar surface is compiled-in string
 * helpers (slug: Slug.scala:34-99; checksum: DeDupHelper.scala:7-10;
 * escape/clean: UserMetadataUpdater.scala:156-168) — we generalize the same
 * style (composed built-ins, no UDF) to the corpus-analysis functions a
 * training-data pipeline needs.
 */
object TextFunctions {

  /** Whitespace tokens of lowercased text. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(tokens(text))

  /** BPE-ish subword token count: runs of letters, runs of digits, and
    * single non-alphanumeric marks each count as one token (a deterministic
    * stand-in for a real BPE vocabulary; same regex dialect subset works in
    * Java regex and RE2 so oracles can reproduce it). */
  def subwordTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Normalized form used for fingerprinting/exact-dedup: lowercase,
    * punctuation stripped, whitespace collapsed. */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Exact-dedup checksum of the normalized text (reference analogue:
    * MD5 over composite business key, DeDupHelper.scala:7-10). */
  def contentChecksum(text: Column): Column =
    md5(normalized(text))

  /** Order-independent document fingerprint: md5 over the sorted set of
    * distinct normalized words — stable under word reordering, the cheap
    * "bag-of-words identity" used for near-exact clustering. */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(normalized(text), " ")))))

  /** Character k-shingles of the normalized text (MinHash input).
    * NOTE: the lambda references `normalized(text)` per element, so the
    * normalization regexes re-run PER SHINGLE — fine for tests/small data;
    * at scale use DedupOps.withCharShingles, which materializes the
    * normalized text as an attribute first. */
  def charShingles(text: Column, k: Int): Column = {
    val n = normalized(text)
    filter(
      transform(
        sequence(lit(1), greatest(length(n) - (k - 1), lit(1))),
        i => n.substr(i, lit(k))),
      s => length(s) === k)
  }

  /** Word w-shingles (w consecutive words joined by a space).
    * Same per-element re-evaluation caveat as [[charShingles]] — at scale
    * use DedupOps.withWordShingleSet. */
  def wordShingles(text: Column, w: Int): Column = {
    val ws = split(normalized(text), " ")
    filter(
      transform(sequence(lit(0), greatest(size(ws) - w, lit(0))),
        i => concat_ws(" ", slice(ws, i + 1, lit(w)))),
      s => size(split(s, " ")) === w)
  }

  /** Punctuation character ratio (quality signal). */
  def punctRatio(text: Column): Column = {
    val nPunct = length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))
    round(nPunct.cast("double") / greatest(length(text), lit(1)), 6)
  }

  /** Mean word length over whitespace tokens. */
  def meanWordLen(text: Column): Column = {
    val t = tokens(text)
    round(
      aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        greatest(size(t), lit(1)),
      6)
  }

  // Small inline stopword lexicons for the n-gram-heuristic language ID.
  // Deliberately tiny + inline so the exact same lists can be embedded in an
  // oracle SQL VALUES clause.
  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "is", "in", "it", "that", "for")
  val stopwordsFr: Seq[String] = Seq("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans")
  val stopwordsEs: Seq[String] = Seq("el", "la", "de", "y", "un", "una", "es", "que", "por", "los")
  val stopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von")

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, w => w.isInCollection(words)))

  /** Stopword hit-count for one language's lexicon. */
  def stopwordHits(text: Column, lang: String): Column = {
    val lex = lang match {
      case "en" => stopwordsEn
      case "fr" => stopwordsFr
      case "es" => stopwordsEs
      case "de" => stopwordsDe
      case other => throw new IllegalArgumentException(s"no lexicon for $other")
    }
    hits(tokens(text), lex)
  }

  /** Stopword ratio against the English lexicon (quality signal). */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    round(hits(t, stopwordsEn).cast("double") / greatest(size(t), lit(1)), 6)
  }

  /** Heuristic language ID: argmax of per-language stopword hits with a
    * fixed priority order (en > fr > es > de > unknown on ties), so the
    * prediction is fully deterministic and oracle-reproducible. */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val en = hits(t, stopwordsEn); val fr = hits(t, stopwordsFr)
    val es = hits(t, stopwordsEs); val de = hits(t, stopwordsDe)
    when(en === 0 && fr === 0 && es === 0 && de === 0, lit("und"))
      .when(en >= fr && en >= es && en >= de, lit("en"))
      .when(fr >= es && fr >= de, lit("fr"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Composite quality score in [0,1]: rewards mid-length documents with low
    * punctuation and a healthy stopword ratio. Deterministic arithmetic only. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / 50.0, lit(1.0))
    val punctScore = greatest(lit(1.0) - punctRatio(text) * 5.0, lit(0.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round(lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3, 6)
  }

  /** URL-safe slug (reference: Slug.makeSlug, Slug.scala:34-99 — trim,
    * lowercase, strip accents/specials, hyphen-join). Composed built-ins. */
  def slugify(s: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(trim(lower(s)), "[^a-z0-9\\s-]", ""),
        "[\\s-]+", "-"),
      "^-|-$", "")

  /** Polynomial rolling hash of the normalized text, base 31 mod 2^31-1 —
    * the classic Rabin-Karp document fingerprint, computed as a fold over
    * characters via `aggregate` (no UDF). */
  def rollingHash(text: Column): Column = {
    val mod = 2147483647L
    aggregate(
      split(normalized(text), ""),
      lit(0L),
      (acc, ch) => pmod(acc * 31L + coalesce(ascii(ch).cast("long"), lit(0L)), lit(mod)))
  }
}
