package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column combinators for large-scale corpus pipelines
  * (SURVEY.md §2.6 extensions; north star in BASELINE.json).
  *
  * Everything here is a composition of built-in codegen'd expressions —
  * no UDFs — so whole-stage codegen spans survive and the same math is
  * expressible in ANSI SQL for the DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace tokenizer (empty input → empty array, not [""]). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Word n-gram shingles over a PRE-TOKENIZED array column.
    *
    * Callers must materialize the token array in its own projection first
    * (`df.select(tokens(text).as("toks"))`) and pass `col("toks")`: Spark
    * evaluates higher-order-function lambda bodies interpreted, per element —
    * if the argument were the full `split(...)` subtree it would re-tokenize
    * once per shingle (observed: quadratic blowup, 2.2 s for 5k docs).
    * Referencing a bound attribute is O(1) per element. */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Word n-gram shingles from raw text — convenience form for single-pass
    * use; hot paths should tokenize once and use [[shinglesFromTokens]]. */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Portable 60-bit hash: first 15 hex chars of md5, as a positive long.
    * Chosen because DuckDB computes the identical value via
    * `CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)` — the foundation for
    * engine-independent MinHash/SimHash verification. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Token count (whitespace words). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-2-style pre-tokenizer regex, restricted to constructs RE2
    * (DuckDB) and java.util.regex evaluate identically: contractions,
    * letter runs, digit runs, single non-space symbols. A real BPE would
    * merge these pieces against a vocab; the PIECE COUNT is the standard
    * cheap proxy for "LLM tokens" in corpus statistics. */
  val bpePattern = "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** BPE-ish subword pieces (see [[bpePattern]]). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  /** BPE-ish token count — the whitespace count underestimates LLM token
    * budgets on punctuation/number-heavy text; this tracks them. */
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Canonical normalization shared by [[fingerprint]] and the winnowing
    * pipeline: lowercase, punctuation stripped, whitespace collapsed. */
  def normText(text: Column): Column =
    regexp_replace(
      regexp_replace(lower(trim(text)), "[^a-z0-9 ]", ""), " +", " ")

  /** PII scrubbing patterns, ordered: URLs first (they contain dots and
    * digit runs that would otherwise half-match the later patterns), then
    * emails, IPv4 addresses, long digit runs. Restricted to constructs
    * RE2 (DuckDB, `'g'` flag) and java.util.regex replace identically —
    * same discipline as [[bpePattern]] — so redacted corpora stay
    * oracle-checkable. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("url", "https?://\\S+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("num", "\\d{6,}", "<NUM>"))

  /** Replace every URL / email / IPv4 / long digit run with a typed
    * placeholder — the standard pre-training scrub pass. Pure
    * `regexp_replace` chain: codegen'd, streaming-safe, pushable. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, p, r)) =>
      regexp_replace(c, p, r)
    }

  /** Number of matches of one [[piiPatterns]] kind in `text` (count
    * BEFORE redacting: earlier patterns consume later ones' matches). */
  def piiCount(text: Column, kind: String): Column =
    size(regexp_extract_all(text,
      lit(piiPatterns.find(_._1 == kind)
        .getOrElse(throw new IllegalArgumentException(
          s"unknown pii kind $kind; know ${piiPatterns.map(_._1)}"))._2),
      lit(0)))

  /** Winnowing fingerprint (Schleimer/Wilkerson/Aiken rolling-hash
    * document fingerprinting), staged for Spark's interpreted HOF
    * lambdas: each stage's input MUST be a materialized column attribute
    * or the lambda re-evaluates the whole upstream subtree per element
    * (windowing over an unmaterialized gram array would re-hash every
    * gram per window — O(n²) md5 calls). Use as:
    * {{{
    * df.select(id, normText(text).as("norm"))
    *   .select(id, charGramHashes(col("norm"), 5).as("grams"))
    *   .select(id, windowMins(col("grams"), 4).as("fp"))
    * }}}
    * Two documents sharing long character runs share fingerprint mins,
    * robust to edits outside the run — the classic local-similarity
    * sketch (MOSS). All built-in expressions, DuckDB-reproducible. */
  def charGramHashes(norm: Column, k: Int): Column =
    // guard BEFORE sequence: Spark's sequence(1, 0) is the DESCENDING
    // range [1, 0], not empty — an unguarded short doc would emit bogus
    // grams (and crash slice() downstream)
    when(length(norm) >= k,
      transform(sequence(lit(1), length(norm) - (k - 1)),
        i => hash60(substring(norm, i, lit(k)))))
      .otherwise(array().cast("array<long>"))

  /** Sorted distinct window-minimum hashes (see [[charGramHashes]]). */
  def windowMins(grams: Column, w: Int): Column =
    when(size(grams) >= w,
      array_sort(array_distinct(transform(
        sequence(lit(1), size(grams) - (w - 1)),
        j => array_min(slice(grams, j, lit(w)))))))
      .otherwise(array().cast("array<long>"))

  /** Deterministic document fingerprint: md5 of [[normText]]. */
  def fingerprint(text: Column): Column = md5(normText(text))

  /** Lexicon hit count: how many tokens fall in `lexicon`. */
  def lexiconHits(text: Column, lexicon: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(lexicon: _*)))

  /** Marker lexicons for the heuristic language/domain classifier. Kept tiny
    * and deterministic; a production system would ship char-n-gram profiles
    * per language — same plan shape, bigger lexicons. */
  val langLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "y", "de", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  /** Heuristic language ID: argmax of lexicon hits with deterministic
    * priority tie-break (first lexicon wins ties); all-zero → "und". */
  def langId(text: Column): Column = {
    val scores = langLexicons.map { case (lang, lex) =>
      lang -> size(filter(tokens(text), t => t.isin(lex: _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Quality-score components: character/token counts, punctuation ratio,
    * stopword ratio, mean token length. Composite = weighted blend. */
  def qualityStruct(text: Column): Column = {
    val nChars = length(text)
    val toks = tokens(text)
    val nToks = size(toks)
    val punct = nChars - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))
    val stops = size(filter(toks,
      t => t.isin(langLexicons.flatMap(_._2): _*)))
    val avgLen = when(nToks > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / nToks.cast("double"))
      .otherwise(lit(0.0))
    struct(
      nChars.as("n_chars"),
      nToks.as("n_tokens"),
      round(punct.cast("double") / nChars.cast("double"), 6)
        .as("punct_ratio"),
      round(stops.cast("double") /
        when(nToks > 0, nToks).otherwise(lit(1)).cast("double"), 6)
        .as("stop_ratio"),
      round(avgLen, 6).as("avg_token_len"))
  }

  /** Required-stopword list for [[gopherStruct]]'s rule 7 (Rae et al.
    * 2021, appendix A1.1 — public). Occurrence-counted: a document
    * passes when its tokens include at least `minStops` hits from this
    * list, repeats included (the paper's phrasing admits either reading;
    * occurrence counting is pinned here and in the oracle SQL). */
  val gopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document-quality rule set (Rae et al. 2021, appendix
    * A1.1 — public heuristics), as one codegen'd struct column:
    *
    *   1. `n_tokens` in [`minWords`, `maxWords`]
    *   2. mean word length in [3, 10]
    *   3. symbol-to-word ratio (`#` chars + `...` runs) ≤ 0.1
    *   4. ≤ 90% of lines start with a bullet (`-`, `*`, `•`)
    *   5. ≤ 30% of lines end with an ellipsis (`...` or `…`)
    *   6. ≥ 80% of words contain an alphabetic character
    *   7. ≥ `minStops` occurrences of [[gopherStops]]
    *
    * `keep` is the conjunction. Pure built-in expressions (HOF filters
    * over a pre-tokenized array, `endswith`/`substr` line tests), so the
    * whole rule set stays inside whole-stage codegen and is expressible
    * verbatim in ANSI SQL for the oracle. Empty documents define every
    * ratio as 0 (and fail rules 1 and 7). Pass a MATERIALIZED token
    * array column (see [[shinglesFromTokens]] for why): lambdas
    * re-evaluate unmaterialized argument subtrees per element. */
  def gopherStruct(text: Column, toks: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minStops: Int = 2): Column = {
    val nToks = size(toks)
    val nToksD = nToks.cast("double")
    val meanLen = when(nToks > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / nToksD).otherwise(lit(0.0))
    val hashCnt = length(text) - length(regexp_replace(text, "#", ""))
    val ellipsisCnt = size(regexp_extract_all(text, lit("\\.\\.\\."), lit(0)))
    val symbolRatio = when(nToks > 0,
      (hashCnt + ellipsisCnt).cast("double") / nToksD).otherwise(lit(0.0))
    val lines = split(text, "\n")
    val nLinesD = size(lines).cast("double")
    val bulletFrac =
      size(filter(lines, l =>
        substring(ltrim(l), 1, 1).isin("-", "*", "•"))).cast("double") /
        nLinesD
    val ellipsisFrac =
      size(filter(lines, l =>
        endswith(rtrim(l), lit("...")) || endswith(rtrim(l), lit("…"))))
        .cast("double") / nLinesD
    val alphaFrac = when(nToks > 0,
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / nToksD)
      .otherwise(lit(0.0))
    val nStop = size(filter(toks, t => t.isin(gopherStops: _*)))
    val keep = nToks.between(minWords, maxWords) &&
      meanLen.between(3.0, 10.0) && symbolRatio <= 0.1 &&
      bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
      alphaFrac >= 0.8 && nStop >= minStops
    struct(
      nToks.cast("long").as("n_tokens"),
      round(meanLen, 6).as("mean_word_len"),
      round(symbolRatio, 6).as("symbol_ratio"),
      round(bulletFrac, 6).as("bullet_frac"),
      round(ellipsisFrac, 6).as("ellipsis_frac"),
      round(alphaFrac, 6).as("alpha_frac"),
      nStop.cast("long").as("n_stop"),
      keep.as("keep"))
  }

  /** Token-distribution Shannon entropy per document — the standard
    * repetition/boilerplate signal for training-data quality filtering
    * (low entropy = a few tokens dominate = likely spam or template).
    *
    * Distributed shape: explode → one (id, token) count shuffle → per-doc
    * combine. The token-count frame is tiny relative to the corpus (bounded
    * by vocabulary per doc), so the second aggregation is cheap; payload
    * text never shuffles. Emits `(idCol, n_tokens, entropy)`. */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cnt = df
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("n"))
    cnt.groupBy(col(idCol))
      .agg(sum(col("n")).as("t"),
        sum(col("n") * log(col("n"))).as("nlogn"))
      // H = -Σ (n/t)·ln(n/t) = ln t − (Σ n·ln n)/t : one pass, no join
      .select(col(idCol), col("t").cast("long").as("n_tokens"),
        round(log(col("t")) - col("nlogn") / col("t"), 6).as("entropy"))
  }

  /** Feature-hashed bag-of-words embedding (the "hashing trick",
    * Weinberger et al. 2009): each token lands in dimension
    * `hash60 & (d−1)` with sign from the next hash bit; per-occurrence
    * ±1 contributions sum per dimension. Deterministic, vocabulary-free,
    * and MAP-ONLY — so a 100-TB corpus embeds with zero shuffle. Inner
    * products approximate token-multiset similarity unbiasedly (the
    * signed trick cancels collision bias), which is what makes the
    * result a legitimate ANN/near-dup input where no trained embedding
    * exists. `d` must be a power of two (hash bits → dimension).
    *
    * The kernel is the native codegen'd
    * [[graft.expressions.HashedEmbedding]]: the former HOF fold
    * (`aggregate(tokens, zeros(d), (a,t) => transform(a, ...))`) rebuilt
    * the whole d-element accumulator per token — O(tokens × d)
    * interpreted-lambda allocations per row, 14.0 s of the sf0.1 bench
    * on q113 alone. The expression is one O(tokens + d) pass over a
    * mutable accumulator, bit-identical (exact ±1 integer sums, same
    * md5-derived 60-bit hash). Tokenization stays the Spark-side
    * [[tokens]] so trim/split semantics cannot drift. */
  def hashedEmbedding(text: Column, d: Int = 64): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.expressions.HashedEmbedding(
        org.apache.spark.sql.GraftSqlBridge.expression(tokens(text)), d))

  /** Single-pass named/common-numeric HTML entity decode — `&lt;`
    * `&gt;` `&quot;` `&apos;` `&#39;` `&#x27;` `&nbsp;` first, `&amp;`
    * LAST (standard single-pass order: `&amp;lt;` decodes to the
    * literal text `&lt;`, not to `<`). General numeric references
    * would need a computed chr() — a custom Expression if a corpus
    * ever measures them as material. */
  private[graft] def decodeEntities(c: Column): Column = {
    val named = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&#39;" -> "'", "&#x27;" -> "'", "&nbsp;" -> " ")
      .foldLeft(c) { case (acc, (k, v)) => regexp_replace(acc, k, v) }
    regexp_replace(named, "&amp;", "&")
  }

  /** Visible text of an HTML payload — the step between a crawl's
    * WARC blocks and every text operator downstream, as a pure
    * codegen'd `regexp_replace` chain (no UDF, no DOM library —
    * crawl HTML is malformed too often for a throwing parser):
    * comments, `<script>`/`<style>` blocks and the whole `<head>`
    * are removed (non-greedy, case-insensitive), remaining tags
    * become spaces, entities decode ([[decodeEntities]]), whitespace
    * collapses to single spaces. Known regex-extractor limits,
    * documented not hidden: an UNCLOSED script/style block leaves its
    * content as text, and numeric entity references beyond the
    * common quote forms stay literal. Map-only. */
  /** Comments and script/style blocks removed — shared by
    * [[htmlText]] and [[htmlTitle]] so a commented-out or
    * script-embedded `<title>` can never shadow the real one. */
  private def htmlPreClean(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComment,
      "(?is)<script[^>]*>.*?</script>", " ")
    regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
  }

  def htmlText(html: Column): Column = {
    val noHead = regexp_replace(htmlPreClean(html),
      "(?is)<head[^>]*>.*?</head>", " ")
    val noTags = regexp_replace(noHead, "(?s)<[^>]*>", " ")
    trim(regexp_replace(decodeEntities(noTags), "\\s+", " "))
  }

  /** The `<title>` of an HTML payload (entity-decoded, whitespace
    * collapsed), NULL when absent or empty. Extracted AFTER the
    * comment/script/style strip — a commented-out template title or
    * a `document.write('<title>…')` in a script must not win over
    * the real one. */
  def htmlTitle(html: Column): Column = {
    val t = trim(regexp_replace(decodeEntities(regexp_extract(
      htmlPreClean(html),
      "(?is)<title[^>]*>(.*?)</title>", 1)), "\\s+", " "))
    when(t =!= "", t)
  }

  /** HTML census over a table: (id, title, text, n_links, n_tags) —
    * the extraction pass a crawl pipeline runs on every fetched page
    * right after [[urlCensus]]/[[graft.operators.Multimodal.warcRecords]];
    * `n_links` (anchors) and `n_tags` (raw tag tokens) are the
    * cheap page-shape signals (boilerplate-heavy pages run high
    * tag-to-text). Map-only, all codegen'd regex. */
  def htmlCensus(df: DataFrame, idCol: String,
      htmlCol: String): DataFrame =
    df.select(col(idCol), htmlTitle(col(htmlCol)).as("title"),
      htmlText(col(htmlCol)).as("text"),
      regexp_count(col(htmlCol), lit("(?i)<a[\\s>]")).cast("long")
        .as("n_links"),
      regexp_count(col(htmlCol), lit("(?s)<[^>]*>")).cast("long")
        .as("n_tags"))

  /** Unicode SCRIPT composition of a text column — the page a
    * lexicon-based [[langId]] cannot see: a document whose CLAIMED
    * language is English but whose characters are 90% Han/Cyrillic/
    * Arabic is mislabeled (or mojibake) regardless of what any
    * stopword list says, and script mix drives tokenizer-fertility
    * and quality-gate decisions at corpus scale. Counts per script
    * family (Latin, Han, Cyrillic, Arabic, Devanagari, Kana =
    * Hiragana+Katakana, Hangul) plus decimal digits and the total
    * char count, all via codegen'd `regexp_count` over Java's
    * Unicode-script classes — eight passes of a per-char table
    * lookup, map-only; a single-pass native Expression (the
    * byte-entropy precedent) is the documented optimization if a
    * profile-heavy pipeline ever measures the passes. NULL text
    * reads NULL counts. `n_chars` counts UTF-16 units (Spark's
    * `length`) — an astral char counts 2 there while the script
    * counters count BMP chars; the script counts, not n_chars, are
    * the gating signal. */
  def scriptProfile(text: Column): Column = {
    def n(p: String) = regexp_count(text, lit(p)).cast("long")
    struct(
      n("\\p{IsLatin}").as("latin"),
      n("\\p{IsHan}").as("han"),
      n("\\p{IsCyrillic}").as("cyrillic"),
      n("\\p{IsArabic}").as("arabic"),
      n("\\p{IsDevanagari}").as("devanagari"),
      n("[\\p{IsHiragana}\\p{IsKatakana}]").as("kana"),
      n("\\p{IsHangul}").as("hangul"),
      n("\\p{Nd}").as("digit"),
      length(text).cast("long").as("n_chars"))
  }

  /** The script with the highest [[scriptProfile]] count — ties break
    * by the fixed order latin > han > cyrillic > arabic > devanagari
    * > kana > hangul (deterministic, and the tie case is a mixed-
    * script doc where any single label is arbitrary); NULL when no
    * scripted character occurs (digits/punct/whitespace only). */
  def dominantScript(profile: Column): Column = {
    val names = Seq("latin", "han", "cyrillic", "arabic",
      "devanagari", "kana", "hangul")
    val counts = names.map(profile.getField)
    val mx = greatest(counts: _*)
    names.zip(counts).foldLeft(
      when(mx.isNull || mx === 0, lit(null).cast("string"))) {
      case (acc, (nm, c)) => acc.when(c === mx, nm)
    }
  }

  /** [[scriptProfile]] + [[dominantScript]] over a table — the script
    * census next to [[langId]]: one row per doc with the eight counts
    * flattened and the dominant script label. Map-only. */
  def scriptCensus(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // materialize the struct once; dominant reads the bound attribute
    // so the eight regexp passes are not duplicated in the plan
    df.select(col(idCol), scriptProfile(col(textCol)).as("p"))
      .select(col(idCol), col("p.latin").as("latin"),
        col("p.han").as("han"), col("p.cyrillic").as("cyrillic"),
        col("p.arabic").as("arabic"),
        col("p.devanagari").as("devanagari"), col("p.kana").as("kana"),
        col("p.hangul").as("hangul"), col("p.digit").as("digit"),
        col("p.n_chars").as("n_chars"),
        dominantScript(col("p")).as("dominant"))
  }

  /** The RFC 3986 appendix-B URL split regex, component-tightened:
    * scheme must be a legal scheme token, the authority splits into
    * userinfo / host / port, the fragment is matched (and discarded
    * by every caller — [[urlNormalize]] drops it by contract). One
    * regex, all groups extracted with codegen'd `regexp_extract` —
    * no UDF, no java.net.URI (whose parser throws on the malformed
    * URLs a crawl is FULL of; a census must classify them, not die). */
  private val UrlRe =
    "^(?:([A-Za-z][A-Za-z0-9+.-]*):)?" + // 1 scheme
      "(?://(?:([^/?#@]*)@)?" + // 2 userinfo
      "(\\[[^\\]/?#]*\\]|[^/?#:]*)" + // 3 host (incl. [v6] literals)
      "(?::([0-9]+))?" + // 4 port
      "(?=[/?#]|$))?" + // authority must END cleanly: ':80abc' is
      // not a port-then-path, it is a malformed authority — the
      // whole URL then classifies unparseable instead of silently
      // fabricating a corrupted canonical key
      "([^?#]*)" + // 5 path
      "(?:\\?([^#]*))?" + // 6 query
      "(?:#.*)?$"

  private def grp(url: Column, i: Int): Column = {
    val g = regexp_extract(url, UrlRe, i)
    when(g =!= "", g)
  }

  /** URL components as a struct: (scheme, userinfo, host, port, path,
    * query) — lowercased scheme/host (the case-insensitive parts per
    * RFC 3986 §6.2.2.1; path and query stay case-significant), port as
    * a long, empty components NULL. Unparseable-as-absolute URLs
    * (no scheme or no host) read as NULL scheme/host with the whole
    * string in `path` — the classification signal, never a throw. */
  def urlParts(url: Column): Column = struct(
    lower(grp(url, 1)).as("scheme"),
    grp(url, 2).as("userinfo"),
    lower(grp(url, 3)).as("host"),
    grp(url, 4).cast("long").as("port"),
    grp(url, 5).as("path"),
    grp(url, 6).as("query"))

  /** Canonical URL — THE dedup key of a web-crawl pipeline (the same
    * page arrives as `HTTP://Example.com:80/a?b=2&a=1#frag` and
    * `http://example.com/a?a=1&b=2` across crawls; byte-identity
    * finds none of it). Normalization steps, each from RFC 3986 §6 or
    * standard crawler practice, each visible in the oracle:
    * lowercase scheme+host; DROP userinfo (credentials in a stored
    * key are a leak, and `u@host` vs `host` is the same resource);
    * drop the scheme's default port (http:80, https:443 — others
    * kept); empty path → `/`; SORT query parameters bytewise (order
    * is almost never significant, and unsorted order is the #1
    * false-non-dup source), dropping empty params (`a=1&&b=2`); drop
    * the fragment (client-side only). NULL when the URL has no
    * scheme or no host — a relative or garbage URL has no canonical
    * absolute form; count them, don't invent one. Pure built-ins +
    * array HOFs over the one regex split: map-only, codegen-friendly,
    * no java.net parsing that throws on crawl garbage. */
  def urlNormalize(url: Column): Column = {
    val p = urlParts(url)
    val scheme = p.getField("scheme")
    val host = p.getField("host")
    val port = p.getField("port")
    val keptPort = when(
      (scheme === "http" && port === 80L) ||
        (scheme === "https" && port === 443L), lit(null))
      .otherwise(port)
    val path = coalesce(p.getField("path"), lit(""))
    val normPath = when(path === "", "/").otherwise(path)
    val params = filter(split(p.getField("query"), "&"), x => x =!= "")
    val normQuery = when(size(params) > 0,
      array_join(array_sort(params), "&"))
    when(scheme.isNotNull && host.isNotNull, concat(
      scheme, lit("://"), host,
      when(keptPort.isNotNull, concat(lit(":"), keptPort))
        .otherwise(lit("")),
      normPath,
      when(normQuery.isNotNull, concat(lit("?"), normQuery))
        .otherwise(lit(""))))
  }

  /** URL census over a table: one row per URL with the parsed
    * components, the canonical form ([[urlNormalize]] — the dedup
    * key), the path depth (non-empty segments) and query-parameter
    * count, and `parseable` — false is the relative/garbage page a
    * crawl manifest always contains. Map-only; the downstream
    * canonical-URL dedup is one digest-only exact dedup over
    * `url_norm` (the [[graft.operators.Dedup.exact]] shape). */
  def urlCensus(df: DataFrame, idCol: String,
      urlCol: String): DataFrame = {
    val p = urlParts(col(urlCol))
    val segs = filter(split(coalesce(p.getField("path"), lit("")), "/"),
      x => x =!= "")
    val params = filter(split(p.getField("query"), "&"), x => x =!= "")
    df.select(col(idCol), p.as("p"),
        urlNormalize(col(urlCol)).as("url_norm"),
        coalesce(size(segs), lit(0)).cast("long").as("path_depth"),
        when(p.getField("query").isNull, 0L)
          .otherwise(size(params).cast("long")).as("n_params"))
      .select(col(idCol), col("p.scheme").as("scheme"),
        col("p.host").as("host"), col("p.port").as("port"),
        col("url_norm"), col("path_depth"), col("n_params"),
        (col("p.scheme").isNotNull && col("p.host").isNotNull)
          .as("parseable"))
  }
}
