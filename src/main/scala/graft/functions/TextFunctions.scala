package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text scalar functions (SURVEY.md §2.3) as pure column expressions — no
  * UDFs, so every one of them stays inside whole-stage codegen and can be
  * pushed/pruned by Catalyst.
  *
  * F1/F2 reproduce the reference's two cleaning variants exactly:
  *  - F1 `clean_tweet_text` (utils.py:28-50): URLs removed, @user →
  *    [MENTION], #tag → [HASHTAG], whitespace collapsed, trimmed, lowercased.
  *  - F2 scraper `clean_text` (src/resilient_scraper.py:868-889): URLs →
  *    [LINK], @user → [MENTION], #tag → tag (keep the word), whitespace
  *    collapsed, trimmed, case preserved.
  */
object TextFunctions {

  // (?U) = Java UNICODE_CHARACTER_CLASS, making \s/\S/\w match what
  // Python's re does on str patterns (the reference's regexes,
  // utils.py:37-45): \S stops at NBSP, @\w+ eats accented handles, \s+
  // collapses ideographic spaces. Executed-reference goldens in
  // TextFunctionsSpec pin the divergent cases. The DuckDB oracle SQL
  // keeps RE2's ASCII classes — identical on the gate corpora, which are
  // verified pure-ASCII (pinned by TextFunctionsSpec's corpus scan).
  // Known residues vs CPython even under (?U): \w excludes
  // general-category-No chars Python counts as alphanumeric (e.g. '²')
  // and INCLUDES combining marks (Mn) Python's \w stops before — both
  // outside any plausible tweet handle; and \s excludes \x1c-\x1f (see
  // pyStrip).
  val UrlRe = "(?U)http\\S+|www\\S+|https\\S+"
  val MentionRe = "(?U)@\\w+"
  val HashtagRe = "(?U)#\\w+"

  /** The RE2 spelling of Unicode White_Space for DuckDB oracle SQL — the
    * single authority any oracle needing Python-strip parity must
    * interpolate (mirrors [[pyStrip]]'s Java `(?U)\s`). The SAME literal
    * parses to the SAME set under BOTH engines even though `\v` differs
    * (RE2: the VT char; Java: the vertical-whitespace class, whose extra
    * members x85/U+2028/U+2029 are listed anyway) — TextFunctionsSpec
    * pins the Java interpretation char-by-char against `(?U)\s`; the RE2
    * interpretation is exercised by every oracle run.
    */
  val PyWsRe2Class: String = """[\t\n\v\f\r\x{85}\x{2028}\x{2029}\p{Zs}]"""

  /** Python `str.strip()` parity: strip LEADING/TRAILING whitespace by the
    * Unicode White_Space property — `(?U)` makes Java's \s match what
    * Python's `.isspace()` does (tab, newline, CR, FF, VT, NBSP, U+3000…),
    * where Spark's `trim` strips ONLY ASCII spaces. Use this wherever the
    * reference gates on `text.strip()` over RAW text; after the cleaning
    * chains (F1/F2) collapse \s+ to ' ', plain trim is already exact.
    * Known residue: Python also treats \x1c-\x1f (file/group/record/unit
    * separators) as whitespace; Unicode does not — not worth a char class.
    */
  def pyStrip(text: Column): Column =
    regexp_replace(text, "(?U)^\\s+|\\s+$", "")

  /** F1: analysis-stage cleaning (utils.py:28-50). */
  def cleanTweetText(text: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, UrlRe, ""),
          MentionRe, "[MENTION]"),
        HashtagRe, "[HASHTAG]"),
      "(?U)\\s+", " ")))

  /** F2: scrape-stage cleaning (src/resilient_scraper.py:868-889). */
  def cleanTextScraper(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, UrlRe, "[LINK]"),
          MentionRe, "[MENTION]"),
        "(?U)#(\\w+)", "$1"),
      "(?U)\\s+", " "))

  /** Whitespace token count — scale-safe (a count, not a materialized
    * array). Native single-pass byte loop, == `regexp_count(text,
    * "\\S+")` (differential-pinned in TextStatsExprSpec; the regex form
    * measured 45× slower on the quality-gate hot path — see
    * [[org.apache.spark.sql.graft.TextStats]]).
    */
  def tokenCount(text: Column): Column =
    org.apache.spark.sql.graft.TextStatsExpr.tokenCount(text)

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, single
    * punctuation marks — the usual GPT-2-style pre-split shape.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** True iff `c` is in the ASCII regex word class `[A-Za-z0-9_]` — the
    * class Java's and RE2's `\b` boundary is defined against.
    */
  private def isAsciiWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Backslash-escape regex metacharacters so dictionary words can never
    * corrupt the pattern. Only true metacharacters are escaped (both Java
    * regex and RE2 accept these escapes); spaces, CJK, and accented chars
    * pass through.
    */
  private def escapeWord(w: String): String =
    w.flatMap { c =>
      if (".^$|?*+()[]{}\\".indexOf(c) >= 0) "\\" + c else c.toString
    }

  /** One regex matching any of `words`. A word sits behind `\b` boundaries
    * iff its FIRST and LAST characters are in the ASCII `\b` word class —
    * anchoring only depends on the edges, so multi-word phrases
    * ("terima kasih") and apostrophe words ("can't") keep their
    * boundaries, while CJK / accented-Latin words (`\b的\b`, `\bété\b`
    * can never anchor next to non-word-class chars) match as a bare
    * alternation. All words are metacharacter-escaped. Shared by the
    * Spark columns and the generated DuckDB oracle SQL (both Java regex
    * and RE2 accept this dialect) so the two always agree.
    */
  def hitPattern(words: Seq[String]): String = {
    val (wordy, other) = words.partition(w =>
      w.nonEmpty && isAsciiWordChar(w.head) && isAsciiWordChar(w.last))
    Seq(
      if (wordy.nonEmpty) Some("\\b(" + wordy.map(escapeWord).mkString("|") + ")\\b") else None,
      if (other.nonEmpty) Some("(" + other.map(escapeWord).mkString("|") + ")") else None
    ).flatten.mkString("|")
  }

  /** Count occurrences of any of `words` (see [[hitPattern]]). */
  def wordHits(text: Column, words: Seq[String]): Column =
    regexp_count(text, lit(hitPattern(words)))

  /** Tiny per-language stopword lists for the language-ID heuristic.
    * Ordered — ties resolve to the earlier entry (deterministic).
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "los", "las", "y", "es", "que", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "我", "在"))

  /** The language-ID argmax over per-language hit-count columns: first
    * language in priority order with the max count wins; zero hits
    * everywhere → "und". Shared by [[langId]] (counts inlined — one
    * Column, convenient) and by hot-path callers that materialize the
    * counts in their own projection first (each count is referenced 3-4x
    * here, so inlining re-evaluates the regexes that many times).
    */
  def langIdFromCounts(counts: Seq[(String, Column)]): Column = {
    val anyHit = counts.map(_._2).reduce(_ + _) > 0
    // lang_i wins iff its count >= every later count and > every earlier one
    // — equivalently, walking in priority order, the first with the max.
    val maxCount = counts.map(_._2).reduce((a, b) => greatest(a, b))
    val chain = counts.foldLeft(lit(null).cast("string")) { case (acc, (lang, c)) =>
      when(acc.isNotNull, acc).otherwise(when(c === maxCount, lit(lang)))
    }
    when(anyHit, chain).otherwise(lit("und"))
  }

  /** N-gram-heuristic language ID: argmax of stopword hits, first language
    * in [[LangStopwords]] order wins ties; no hits at all → "und"
    * (undetermined). Pure when-chain — codegen-friendly, broadcast-free.
    */
  def langId(text: Column): Column = {
    val lowered = lower(text)
    langIdFromCounts(LangStopwords.map { case (lang, words) =>
      lang -> wordHits(lowered, words)
    })
  }

  /** F4: tweet id from a status URL — the path element after `/status/`
    * (reference splits on '/' and indexes past 'status',
    * src/resilient_scraper.py:404-423).
    */
  def tweetIdFromUrl(href: Column): Column =
    regexp_extract(href, "/status/([^/?]+)", 1)

  /** F4: author handle — the path element before `/status/`. */
  def handleFromUrl(href: Column): Column =
    regexp_extract(href, "/([^/]+)/status/", 1)

  /** P6: keep only real status links (exclude photo/video hrefs), the
    * scraper's link filter (src/resilient_scraper.py:410).
    */
  def isStatusUrl(href: Column): Column =
    href.contains("/status/") &&
      !lower(href).contains("photo") && !lower(href).contains("video")

  /** F5: first digit run in a metric button text -> int, 0 when absent
    * (re.findall(r'\d+')[0] with a 0 default,
    * src/resilient_scraper.py:460-479). Deliberately ASCII \d: Python's
    * \d+int() would also read e.g. Arabic-Indic digits, but metric
    * buttons render ASCII and a (?U)\d match would cast to null here —
    * the 0 default already covers that path.
    */
  def countFromText(text: Column): Column =
    coalesce(nullif(regexp_extract(text, "\\d+", 0), lit("")).cast("int"), lit(0))

  /** F6: the classifier input cap (text[:512], utils.py:84-86). */
  def truncate512(text: Column): Column = substring(text, 1, 512)

  /** Punctuation character count (quality scoring input). Native
    * single-pass byte loop, == `regexp_count(text, "[^A-Za-z0-9\\s]")` —
    * the regex form is java.util.regex's worst case (a mostly-failing
    * single-char class: one anchored attempt PER POSITION) and alone
    * dominated the composed curation pipeline's wall time at 2 M docs
    * (104 s of 186 s). Differential-pinned in TextStatsExprSpec.
    */
  def punctCount(text: Column): Column =
    org.apache.spark.sql.graft.TextStatsExpr.punctCount(text)

  /** Quality heuristics à la pretraining-corpus filters: token count, mean
    * token length, punctuation ratio, stopword ratio.
    */
  def stopwordHits(text: Column): Column =
    wordHits(lower(text), LangStopwords.flatMap(_._2).filterNot(_.exists(_ > 127)))

  /** Unicode NFC canonicalization (native codegen expression — see
    * [[org.apache.spark.sql.graft.NfcNormalizeExpr]]): run this BEFORE
    * any dedup key, shingle, or fingerprint on corpora that mix
    * precomposed and combining-sequence text — byte-different renderings
    * of the same glyphs silently under-deduplicate.
    */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graft.NfcNormalizeExpr.nfc(text)

  /** PII patterns shared by [[redactPii]] and the DuckDB oracle generator —
    * one constant per category so the two engines can never drift. Each
    * pattern is restricted to the ASCII-class/RE2-compatible subset (no
    * lookaround, no Unicode classes) so Java regex and RE2 match the same
    * spans byte-for-byte.
    */
  val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIpRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PiiPhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** PII redaction — the scrub step a training corpus runs before anything
    * else sees the text: emails → [EMAIL], IPv4 literals → [IP],
    * NNN-NNN-NNNN phone numbers → [PHONE]. Order matters and is fixed:
    * emails first (an email never contains an IP/phone once replaced),
    * then IPs, then phones — the categories are disjoint under these
    * patterns so the cascade is confluent. A pure codegen'd projection;
    * zero shuffle at any scale.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, PiiEmailRe, "[EMAIL]"),
        PiiIpRe, "[IP]"),
      PiiPhoneRe, "[PHONE]")

  /** Rolling polynomial fingerprint over the document's characters
    * (Karp–Rabin style): fold (acc*31 + codepoint) mod 1e9+7, seeded with
    * the first codepoint. Expressed with higher-order array functions so it
    * is a single codegen'd projection, distributable at any scale.
    */
  def fingerprint(text: Column): Column = fingerprintWith(text, 31L)

  /** [[fingerprint]] with an explicit fold multiplier — two coprime
    * multipliers give two near-independent 30-bit hashes of the same
    * string, the building block of [[fingerprint60]].
    */
  def fingerprintWith(text: Column, mult: Long): Column = {
    // Spark's split can emit empty trailing strings (Java split semantics);
    // drop them so the fold sees exactly one element per character.
    val codes = transform(
      filter(split(text, ""), c => length(c) > 0),
      c => ascii(c).cast("long"))
    val p = lit(1000000007L)
    when(length(text) === 0, lit(0L)).otherwise(
      aggregate(
        slice(codes, lit(2), greatest(size(codes) - 1, lit(0))),
        element_at(codes, 1),
        (acc, x) => (acc * mult + x) % p))
  }

  /** 60-bit portable string hash: fold31 · 2^30 + fold37. A single
    * 30-bit KR fold is too narrow for Hamming-space fingerprinting — its
    * high bits are also biased (values < 1e9+7 < 2^30, so bit 29 is set
    * with p≈0.46 and every SimHash vote inherits the bias), which put
    * thousands of unrelated sf0.01 documents within Hamming 3 of each
    * other. Two coprime-multiplier folds are near-independent, the
    * combination stays under 2^60 (no ANSI overflow, exact in any SQL
    * engine's int64), and SimHash over it behaves like a real 60-bit
    * hash while remaining fully re-derivable in ANSI SQL.
    */
  def fingerprint60(text: Column): Column =
    fingerprintWith(text, 31L) * lit(1L << 30) + fingerprintWith(text, 37L)
}
