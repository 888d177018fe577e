package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: tokenization,
  * language ID, quality scoring, document fingerprinting. All pure
  * `Column` expression builders — fully distributed, codegen-friendly,
  * no UDFs — so they hold up inside a 100 TB scan.
  *
  * Determinism notes (these feed the DuckDB oracle):
  *  - arithmetic stays in int/long domains below overflow (ANSI mode on),
  *  - the rolling fingerprint is a polynomial hash mod 1e9+7 over 32-bit
  *    token hashes, so every intermediate fits comfortably in a long.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped. */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => length(t) > 0)

  /** PII patterns, written in the portable common subset of Java regex
    * and RE2 (character classes, bounded quantifiers, \b) so the DuckDB
    * oracle applies the IDENTICAL pattern — no lookaround, no
    * backreferences (RE2 has neither). */
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Regex  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact emails then IPv4s with typed placeholders — the scrub pass a
    * training pipeline runs before text ships. Order matters and is part
    * of the contract (emails are replaced first, so their host parts can
    * never be re-matched as dotted quads). */
  def scrubPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRegex, "<EMAIL>"),
      Ipv4Regex, "<IP>")

  /** Count of non-overlapping matches of a PII pattern. */
  def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword-boundary tokens: letter runs, digit runs, and single
    * punctuation marks each count as a token (the shape a byte-pair
    * pre-tokenizer produces). */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def bpeishTokenCount(c: Column): Column = size(bpeishTokens(c))

  /** Punctuation-character ratio (explicit class, identical in RE2/Java). */
  def punctRatio(c: Column): Column = {
    val punct = length(c) - length(regexp_replace(c, "[.,!?;:'\"()\\-]", ""))
    when(length(c) > 0, punct.cast("double") / length(c)).otherwise(lit(0.0))
  }

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(c: Column): Column = {
    val toks = tokens(c)
    val stops = filter(toks, t => t.isin(Stopwords.map(lit): _*))
    when(size(toks) > 0, size(stops).cast("double") / size(toks)).otherwise(lit(0.0))
  }

  /** Composite document-quality score in [0,1]:
    * length credit (saturating at 50 tokens), low punctuation, and a
    * stopword ratio near natural prose (penalize 0 and 1 extremes). */
  def qualityScore(c: Column): Column = {
    val lenCredit = least(tokenCount(c).cast("double") / 50.0, lit(1.0))
    val punctCredit = lit(1.0) - least(punctRatio(c) * 5.0, lit(1.0))
    val stopCredit = lit(1.0) - abs(stopwordRatio(c) - lit(0.3))
    lenCredit * 0.4 + punctCredit * 0.3 + stopCredit * 0.3
  }

  /** Language marker lexicons for the n-gram/marker language-ID heuristic.
    * Occurrences counted as substrings over the padded lowercase text. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" der ", " und ", " die ", " ist "),
    "en" -> Seq(" the ", " and ", " is ", " of "),
    "es" -> Seq(" el ", " de ", " que ", " la "),
    "fr" -> Seq(" le ", " et ", " les ", " des "),
    "zh" -> Seq("的", "是", "了", "在"))

  /** Substring occurrence count — identical semantics in Spark and any
    * SQL engine: (len(s) - len(replace(s, w, ''))) / len(w). */
  def occurrences(c: Column, w: String): Column =
    (length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(w), ""))) / w.length

  /** Per-language marker score. */
  def langScore(c: Column, lang: String): Column = {
    val padded = concat(lit(" "), lower(c), lit(" "))
    LangMarkers.toMap.apply(lang).map(occurrences(padded, _)).reduce(_ + _)
  }

  /** Predicted language: argmax of marker scores, ties resolved by
    * alphabetical language order (deterministic CASE chain). */
  def langId(c: Column): Column = {
    val langs = LangMarkers.map(_._1)
    val scores = langs.map(l => l -> langScore(c, l)).toMap
    langs.foldLeft(when(lit(false), lit(""))) { (acc, l) =>
      val isMax = langs.filterNot(_ == l)
        .map(o => scores(l) >= scores(o)).reduce(_ && _)
      acc.when(isMax, lit(l))
    }.otherwise(lit(langs.head))
  }

  /** Mean token length in characters (0.0 for token-less docs) — exact
    * integer-sum / integer-count division, so the double is bit-identical
    * across engines (no ln/exp involved). */
  def meanTokenLen(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks))
      .otherwise(lit(0.0))
  }

  /** Count of DISTINCT stopwords present (the Gopher "at least two stop
    * words" signal — repetitions of one stopword don't count). */
  def distinctStopwordCount(c: Column): Column =
    size(filter(array_distinct(tokens(c)), t => t.isin(Stopwords.map(lit): _*)))

  /** Common mojibake repairs (UTF-8 bytes decoded as cp1252/latin-1 —
    * the ftfy top table). Literal, ordered replacements: each key is a
    * distinct 2–3 char sequence, none a prefix of another, so chain
    * order is immaterial within the table ("à" mojibakes to Ã + NBSP —
    * the NBSP is the encoded byte, not punctuation, which is why the
    * entry repairs it here, before [[PunctNormalizations]] ever sees
    * it). Shared verbatim with the DuckDB oracle (the SQL is GENERATED
    * from this table). */
  val MojibakeFixes: Seq[(String, String)] = Seq(
    "â€™" -> "’", "â€˜" -> "‘", "â€œ" -> "“",
    // ” (U+201D) mojibakes to â€ + U+009D — the third byte (0x9D) is
    // unmapped in cp1252 and survives as the raw C1 control, which is
    // why this entry repairs it here, before [[stripControlChars]] eats
    // the 9D and strands a bare "â€" residue (round-14 advice). The
    // escape keeps the source file free of raw control bytes.
    "â€\u009d" -> "”",
    "â€“" -> "–", "â€”" -> "—", "â€¦" -> "…",
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¡" -> "á", "Ã³" -> "ó",
    "Ã±" -> "ñ", "Ã¼" -> "ü", "Ã¶" -> "ö", "Ã¤" -> "ä", "Ã " -> "à")

  /** Unicode punctuation → ASCII normalizations (curly quotes, dashes,
    * ellipsis, NBSP). Applied AFTER [[MojibakeFixes]], so a repaired
    * curly quote normalizes straight in the same pass. */
  val PunctNormalizations: Seq[(String, String)] = Seq(
    "’" -> "'", "‘" -> "'", "“" -> "\"", "”" -> "\"",
    "–" -> "-", "—" -> "-", "…" -> "...", " " -> " ")

  /** Literal (non-regex) replacement as a Column op — quoted pattern +
    * quoted replacement ≡ SQL replace(). */
  def replaceLit(c: Column, from: String, to: String): Column =
    regexp_replace(c, java.util.regex.Pattern.quote(from),
      java.util.regex.Matcher.quoteReplacement(to))

  /** C0 (keeps \t \n \r — whitespace handles them) + DEL + the full C1
    * block \x80-\x9F (round-14 advice: the earlier class stopped at DEL,
    * so mojibake-borne C1 controls like the U+009D of a broken ” slipped
    * through invisibly) — written as an explicit class identical in Java
    * regex/RE2 (\xhh is a code point in both). Runs AFTER
    * [[MojibakeFixes]], so repairs that consume a C1 byte (the â€+9D
    * entry) see it intact. */
  val ControlCharClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]"

  def fixMojibake(c: Column): Column =
    MojibakeFixes.foldLeft(c) { case (acc, (from, to)) => replaceLit(acc, from, to) }

  def normalizePunct(c: Column): Column =
    PunctNormalizations.foldLeft(c) { case (acc, (from, to)) => replaceLit(acc, from, to) }

  def stripControlChars(c: Column): Column =
    regexp_replace(c, ControlCharClass, "")

  /** Collapse whitespace runs to single spaces and trim. */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** The full cleanup pass a web corpus gets before anything else reads
    * it (the ftfy + C4 hygiene stage): mojibake repair → punctuation
    * normalization → control-char strip → whitespace collapse. Pure
    * Column expression chain — one projection, zero shuffle, codegen'd;
    * the ORDER is the contract (repair before normalize, so repaired
    * curly quotes straighten; control-strip before whitespace, so a
    * control char flanked by spaces collapses to one space). */
  def cleanText(c: Column): Column =
    normalizeWhitespace(stripControlChars(normalizePunct(fixMojibake(c))))

  private val FpPrime = 1000000007L

  /** 32-bit-domain token hash (xxhash64 truncated) — keeps the rolling
    * polynomial below long overflow under ANSI mode. */
  def tokenHash32(t: Column): Column = pmod(xxhash64(t), lit(4294967296L))

  /** Rolling polynomial document fingerprint:
    * fp = fold(tokens, 0, (acc, t) -> (acc*31 + h32(t)) mod 1e9+7).
    * Order-sensitive (a permuted document fingerprints differently). */
  def fingerprint(c: Column): Column =
    aggregate(tokens(c), lit(0L),
      (acc, t) => pmod(acc * 31 + tokenHash32(t), lit(FpPrime)))
}
