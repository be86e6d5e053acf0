"""Text-analysis operators over the `documents` table — north-star
LLM-data-pipeline components (SURVEY.md §2.C, BASELINE.json
north_star): tokenization/term-frequency, per-document quality
scoring, token counting, deterministic fingerprinting, and an n-gram
language-ID heuristic. Everything stays JVM-side (split / explode /
higher-order array functions) — no Python UDFs on these hot paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lisp_batch_processor_spark.catalog import load
from lisp_batch_processor_spark.functions.numeric import (
    dratio, dround, sql_dratio, sql_dround,
)
from lisp_batch_processor_spark.registry import query

TOKEN_SPLIT_RE = "[^a-z0-9]+"
STOPWORDS = ("a", "the", "of", "and", "is", "to", "in")

_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def sql_ascii_lower(expr: str = "text") -> str:
    """DuckDB twin of ascii_lower for any SQL expression — one
    definition (mirrors the sql_cosine/sql_dot helper pattern) so
    oracles over columns other than a bare `text` can't hand-roll a
    drifting copy of the translate."""
    return f"translate({expr}, '{_ASCII_UPPER}', '{_ASCII_LOWER}')"


# The common bare-`text` instance used by the existing oracles.
SQL_ASCII_LOWER = sql_ascii_lower("text")


def ascii_lower(c: Column) -> Column:
    """ASCII-only lowercasing (A-Z -> a-z via translate), NOT
    locale/Unicode lower(): full vs simple Unicode case mappings
    differ between engines (Java lowers Turkish 'İ' to 'i' + a
    combining dot, utf8proc maps it simply), which desynchronizes
    tokenization cross-engine — caught by the randomized fuzz's
    unicode corpus. Non-ASCII letters are token SEPARATORS under
    TOKEN_SPLIT_RE regardless of case, so ASCII-only casing loses
    nothing, is locale-independent (no tr_TR surprises at 100 TB),
    and is bit-identical in every engine."""
    return F.translate(c, _ASCII_UPPER, _ASCII_LOWER)


def tokens_col(text: Column | str = "text") -> Column:
    """ASCII-lowercased tokens with empties removed — the shared
    tokenizer (see ascii_lower for why not full lower()).

    DuckDB twin: list_filter(regexp_split_to_array({SQL_ASCII_LOWER},
    '[^a-z0-9]+'), t -> t <> '').
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(ascii_lower(c), TOKEN_SPLIT_RE),
                    lambda t: t != "")


_SQL_TOKENS = (f"list_filter(regexp_split_to_array({SQL_ASCII_LOWER}, "
               "'[^a-z0-9]+'), t -> t <> '')")
_SQL_STOPWORDS = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"

# ---------------------------------------------------------------------------
# q_text_analysis — corpus term frequencies (top-k terms).
# ---------------------------------------------------------------------------

_Q_TEXT_ANALYSIS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, u.term
  FROM documents, unnest({_SQL_TOKENS}) AS u(term)
)
SELECT term,
       COUNT(*) AS term_freq,
       COUNT(DISTINCT doc_id) AS doc_freq
FROM toks
WHERE term NOT IN {_SQL_STOPWORDS}
GROUP BY term
ORDER BY term_freq DESC, term ASC
LIMIT 50
"""


@query("q_text_analysis", oracle=_Q_TEXT_ANALYSIS_ORACLE)
def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize -> stopword-filter -> corpus term/document frequencies
    -> top-50 terms with deterministic tie-break.

    Scale notes: explode + two-level agg; partial aggregation caps
    the shuffle at |vocabulary|, and the final top-k is
    TakeOrderedAndProject — no global sort of the term table.
    """
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(tokens_col()).alias("term"))
        .filter(~F.col("term").isin(*STOPWORDS))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("term_freq"),
             F.countDistinct("doc_id").alias("doc_freq"))
        .orderBy(F.col("term_freq").desc(), F.col("term").asc())
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q_text_quality — per-document quality scoring.
# ---------------------------------------------------------------------------

_Q_TEXT_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, source, n_chars, {_SQL_TOKENS} AS toks, text
  FROM documents
)
SELECT doc_id, lang, source,
  CAST(len(toks) AS INT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS INT) AS n_unique_tokens,
  {sql_dround(
      'CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)'
      ' / len(toks)', 6)} AS avg_token_len,
  {sql_dround(
      f'CAST(len(list_filter(toks, x -> x IN {_SQL_STOPWORDS}))'
      ' AS DOUBLE) / len(toks)', 6)} AS stopword_ratio,
  {sql_dround('CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)', 6)}
    AS unique_ratio,
  {sql_dround(
      "CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)"
      ' / length(text)', 6)} AS alpha_ratio
FROM t
WHERE len(toks) > 0
"""


@query("q_text_quality", oracle=_Q_TEXT_QUALITY_ORACLE)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals (length / stopword / uniqueness /
    alphabetic ratios) — the standard pre-training corpus filters,
    computed entirely with higher-order array functions.

    Scale notes: narrow (per-row) — no shuffle; at 100 TB this is a
    pure map stage that fuses with the scan.
    """
    docs = load(spark, sf_dir, "documents")
    toks = tokens_col()
    d = docs.withColumn("toks", toks).filter(F.size("toks") > 0)
    n = F.size("toks").cast("double")
    return d.select(
        "doc_id", "lang", "source",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_unique_tokens"),
        dround(
            F.aggregate("toks", F.lit(0).cast("bigint"),
                        lambda acc, x: acc + F.length(x)).cast("double") / n,
            6).alias("avg_token_len"),
        dround(F.size(F.filter("toks", lambda x: x.isin(*STOPWORDS)))
               .cast("double") / n, 6).alias("stopword_ratio"),
        dround(F.size(F.array_distinct("toks")).cast("double") / n, 6)
            .alias("unique_ratio"),
        dround(F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
               .cast("double") / F.length("text"), 6).alias("alpha_ratio"),
    )


# ---------------------------------------------------------------------------
# q_text_tokens — corpus token accounting per source.
# ---------------------------------------------------------------------------

_Q_TEXT_TOKENS_ORACLE = f"""
WITH t AS (SELECT source, len({_SQL_TOKENS}) AS n FROM documents),
s AS (
  SELECT source,
    COUNT(*) AS n_docs,
    CAST(SUM(n) AS BIGINT) AS total_tokens,
    CAST(MIN(n) AS BIGINT) AS min_tokens,
    CAST(MAX(n) AS BIGINT) AS max_tokens
  FROM t GROUP BY source
)
SELECT source, n_docs, total_tokens, min_tokens, max_tokens,
  {sql_dratio('total_tokens', 'n_docs')} AS avg_tokens
FROM s
"""


@query("q_text_tokens", oracle=_Q_TEXT_TOKENS_ORACLE)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting / budget accounting per source — the "how many
    tokens do we have" query every training-data pipeline runs.

    Scale notes: token counts are computed per-row (no explode) so
    the shuffle carries one row per document, then per-source
    partial aggregation; explode-free counting matters at 100 TB.
    avg_tokens is integer-exact (functions/numeric.dratio) for
    cross-engine hash identity.
    """
    docs = load(spark, sf_dir, "documents")
    d = docs.select("source", F.size(tokens_col()).cast("bigint").alias("n"))
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").alias("total_tokens"),
        F.min("n").alias("min_tokens"),
        F.max("n").alias("max_tokens"),
    )
    return agg.select(
        "source", "n_docs", "total_tokens", "min_tokens", "max_tokens",
        dratio("total_tokens", "n_docs").alias("avg_tokens"),
    )


# ---------------------------------------------------------------------------
# q_text_fingerprint — deterministic document fingerprinting.
# ---------------------------------------------------------------------------

_Q_TEXT_FINGERPRINT_ORACLE = f"""
WITH f AS (
  SELECT doc_id,
         md5(trim(regexp_replace({SQL_ASCII_LOWER}, '\\s+', ' ', 'g')))
           AS fingerprint
  FROM documents
)
SELECT doc_id, fingerprint,
       COUNT(*) OVER (PARTITION BY fingerprint) AS n_same
FROM f
"""


@query("q_text_fingerprint", oracle=_Q_TEXT_FINGERPRINT_ORACLE)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace/case-normalized MD5 document fingerprint plus a
    same-fingerprint count — exact-dup detection via content hash
    (the scalable first pass before MinHash, SURVEY.md north star).

    Scale notes: fingerprint is per-row; the dup count is one window
    shuffle on the 128-bit hash — uniformly distributed, no skew.
    """
    docs = load(spark, sf_dir, "documents")
    # ascii_lower, not lower(): Unicode case mappings differ across
    # engines (see tokens_col) and would fork the content hash.
    fp = F.md5(F.trim(F.regexp_replace(ascii_lower(F.col("text")),
                                       r"\s+", " ")))
    from pyspark.sql import Window
    w = Window.partitionBy("fingerprint")
    return (
        docs.select("doc_id", fp.alias("fingerprint"))
        .withColumn("n_same", F.count(F.lit(1)).over(w))
    )


# ---------------------------------------------------------------------------
# q_text_langid — n-gram/marker-token language-ID heuristic.
# ---------------------------------------------------------------------------

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "is"),
    "es": ("el", "la", "los", "de"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "les", "une", "est"),
}


def marker_score(words: tuple[str, ...]) -> Column:
    """Count of marker tokens in `toks`. NB: the lambda must take
    exactly one parameter — Spark maps a two-parameter lambda to the
    (element, index) form of filter()."""
    return F.size(F.filter("toks", lambda x: x.isin(*words)))


def _sql_marker_count(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return f"len(list_filter(toks, x -> x IN ({words})))"


_Q_TEXT_LANGID_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang AS labeled_lang, {_SQL_TOKENS} AS toks FROM documents
), s AS (
  SELECT doc_id, labeled_lang,
    {_sql_marker_count('en')} AS score_en,
    {_sql_marker_count('es')} AS score_es,
    {_sql_marker_count('de')} AS score_de,
    {_sql_marker_count('fr')} AS score_fr
  FROM t
)
SELECT doc_id, labeled_lang,
  CAST(score_en AS INT) AS score_en,
  CAST(score_es AS INT) AS score_es,
  CAST(score_de AS INT) AS score_de,
  CAST(score_fr AS INT) AS score_fr,
  CASE
    WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr
      THEN 'en'
    WHEN score_es >= score_de AND score_es >= score_fr THEN 'es'
    WHEN score_de >= score_fr THEN 'de'
    ELSE 'fr'
  END AS predicted_lang
FROM s
"""


@query("q_text_langid", oracle=_Q_TEXT_LANGID_ORACLE)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic with a deterministic
    priority tie-break (en > es > de > fr). The fixture corpus is
    synthetic same-vocabulary text, so this validates the operator's
    determinism and plumbing, not linguistic accuracy — accuracy
    property tests use constructed inputs (tests/test_text.py).

    Scale notes: per-row scoring over the token array — map-only.
    """
    docs = load(spark, sf_dir, "documents")
    d = docs.withColumn("toks", tokens_col())
    for lang, words in _LANG_MARKERS.items():
        d = d.withColumn(f"score_{lang}", marker_score(words))
    se, ss, sd, sf_ = (F.col("score_en"), F.col("score_es"),
                       F.col("score_de"), F.col("score_fr"))
    predicted = (
        F.when((se >= ss) & (se >= sd) & (se >= sf_), "en")
        .when((ss >= sd) & (ss >= sf_), "es")
        .when(sd >= sf_, "de")
        .otherwise("fr")
    )
    return d.select(
        "doc_id", F.col("lang").alias("labeled_lang"),
        "score_en", "score_es", "score_de", "score_fr",
        predicted.alias("predicted_lang"),
    )


# ---------------------------------------------------------------------------
# Repetition quality stats (Gopher-style) — within-document repetition
# signals the basic ratio filters above can't see.
# ---------------------------------------------------------------------------

def _word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams of a token array as space-joined strings; empty
    array when the doc has fewer than n tokens (no short-doc
    fallback — repetition stats must not invent a pseudo-gram).
    Same zip-of-shifted-slices build as dedup._shingles (one slice
    per shift, not per gram)."""
    sz = F.size(toks)
    win = sz - (n - 1)
    z = F.arrays_zip(*[F.slice(toks, i + 1, win) for i in range(n)])
    make = F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]))
    return F.when(sz >= n, make).otherwise(F.array().cast("array<string>"))


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", line_delim: str = "\n",
                     ngram_n: int = 2) -> DataFrame:
    """Per-document repetition signals in the style of the Gopher
    quality rules (Rae et al. 2021, published heuristics): documents
    dominated by repeated lines or by one repeated word n-gram are
    machine-generated boilerplate the per-token ratio filters
    (q_text_quality) cannot see.

    Returns one row per input document:
      - ``n_lines``, ``dup_line_frac``: fraction of line occurrences
        whose line appears more than once IN THIS DOC,
      - ``dup_line_char_frac``: same fraction weighted by line chars,
      - ``top_ngram``, ``top_ngram_char_frac``: the most frequent
        word-``ngram_n``-gram (ties broken by gram char length then
        lexicographically — deterministic) and the fraction of doc
        chars its occurrences cover (count x gram chars / doc chars),
      - ``symbol_word_ratio``: ('#' + '...' + unicode-ellipsis
        occurrences) per token.
    Docs with NULL text get NULL stats; fractions are NULL when their
    denominator is 0 (empty text / fewer than n tokens).

    Scale notes (100 TB): two explode -> groupBy legs, both keyed at
    (doc, line) / (doc, gram) grain — keys are finer than documents,
    so no hot key can form (a billion-fold repeated line still groups
    under its OWN doc only); the per-doc re-aggregations and the
    final joins are all on the doc id, so AQE co-partitions them.
    Everything is JVM-side; no Python in the path.
    """
    import re as _re

    did = F.col(id_col)
    base = docs.select(
        did, F.col(text_col).alias("_rs_text"),
        tokens_col(F.col(text_col)).alias("_rs_toks"))

    # Leg 1: within-doc duplicate lines.
    lines = base.select(
        did, F.explode(F.split("_rs_text", _re.escape(line_delim), -1))
                .alias("_rs_line"))
    per_line = (lines.groupBy(did, "_rs_line")
                .agg(F.count(F.lit(1)).alias("_c")))
    line_stats = (per_line
                  .withColumn("_len", F.length("_rs_line"))
                  .groupBy(did)
                  .agg(F.sum("_c").alias("n_lines"),
                       F.sum(F.when(F.col("_c") > 1, F.col("_c"))
                              .otherwise(0)).alias("_dup_lines"),
                       F.sum(F.col("_c") * F.col("_len"))
                        .alias("_line_chars"),
                       F.sum(F.when(F.col("_c") > 1,
                                    F.col("_c") * F.col("_len"))
                              .otherwise(0)).alias("_dup_line_chars")))

    # Leg 2: most frequent word n-gram.
    grams = base.select(
        did, F.explode(_word_ngrams(F.col("_rs_toks"), ngram_n))
                .alias("_rs_gram"))
    per_gram = (grams.groupBy(did, "_rs_gram")
                .agg(F.count(F.lit(1)).alias("_c")))
    top_gram = (per_gram.groupBy(did)
                .agg(F.max(F.struct(
                        F.col("_c").alias("c"),
                        F.length("_rs_gram").alias("glen"),
                        F.col("_rs_gram").alias("g"))).alias("_t")))

    frac = lambda num, den: F.when(den > 0, num.cast("double") / den)
    out = (docs.select(
               did, F.col(text_col).alias("_rs_text"),
               F.length(text_col).alias("_n_chars"),
               F.size(tokens_col(F.col(text_col))).alias("_n_words"),
               (F.regexp_count(F.col(text_col), F.lit("#"))
                + F.regexp_count(F.col(text_col), F.lit(r"\.\.\."))
                + F.regexp_count(F.col(text_col), F.lit("…")))
                   .alias("_n_sym"))
           .join(line_stats, id_col, "left")
           .join(top_gram, id_col, "left"))
    return out.select(
        id_col,
        F.col("n_lines"),
        frac(F.col("_dup_lines"), F.col("n_lines"))
            .alias("dup_line_frac"),
        frac(F.col("_dup_line_chars"), F.col("_line_chars"))
            .alias("dup_line_char_frac"),
        F.col("_t.g").alias("top_ngram"),
        frac(F.col("_t.c") * F.col("_t.glen"), F.col("_n_chars"))
            .alias("top_ngram_char_frac"),
        frac(F.col("_n_sym"), F.col("_n_words"))
            .alias("symbol_word_ratio"),
    )


# Published Gopher thresholds for the signals computed here (paper
# table A1; the n-gram bound is the n=2 row).
GOPHER_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_ngram_char_frac": 0.20,
    "symbol_word_ratio": 0.10,
}


def gopher_repetition_filter(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text",
                             thresholds: dict | None = None) -> DataFrame:
    """Attach a boolean ``keep`` column: True iff every repetition
    signal is at or under its threshold (defaults: the published
    Gopher bounds, GOPHER_THRESHOLDS). NULL signals (empty/NULL text)
    are treated as passing — emptiness is a length filter's job, not
    a repetition filter's. Returns (id_col, <signals>, keep)."""
    th = dict(GOPHER_THRESHOLDS)
    if thresholds:
        th.update(thresholds)
    stats = repetition_stats(docs, id_col=id_col, text_col=text_col)
    keep = F.lit(True)
    for name, bound in th.items():
        keep = keep & (F.col(name).isNull() | (F.col(name) <= bound))
    return stats.withColumn("keep", keep)


def boilerplate_lines(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", delim: str = "\n",
                      min_chars: int = 1, min_docs: int = 2,
                      top_k: int | None = None) -> DataFrame:
    """Mine the corpus's boilerplate: lines that recur across
    documents, with their document frequencies — the diagnostic that
    tells you what `dedup.line_dedup`'s ``min_repeat`` should be and
    WHAT it will remove before you run it (nav bars, cookie banners,
    license footers surface at the top of this table).

    Returns ``(line, n_docs, n_occurrences)`` for every line of at
    least ``min_chars`` characters appearing in at least ``min_docs``
    DISTINCT documents, ordered by (n_docs, n_occurrences) descending;
    ``top_k`` caps the result via TakeOrdered (no global sort
    materialization).

    Scale notes (100 TB): lines dedupe to (digest, doc) pairs FIRST
    (map-side-combined aggregate carrying one line sample — a
    billion-fold repeated banner arrives at the reducer as one row
    per map partition with its per-doc occurrence count), then a
    second hash-agg on the digest counts distinct docs as plain
    count(*) — the classic two-step that avoids count(DISTINCT)'s
    expand. Shuffles ship the 128-bit digest, not the line bytes.
    """
    import re as _re

    line = F.col("_bp_line")
    lines = (docs.select(
        F.col(id_col).alias("_bp_did"),
        F.explode(F.split(F.col(text_col), _re.escape(delim),
                          -1)).alias("_bp_line"))
        .filter(F.length(line) >= min_chars))
    per_doc = (lines
               .groupBy(F.md5(line).alias("_bp_key"), "_bp_did")
               .agg(F.first(line).alias("_bp_line"),
                    F.count(F.lit(1)).alias("_bp_occ")))
    agg = (per_doc.groupBy("_bp_key")
           .agg(F.first("_bp_line").alias("line"),
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("_bp_occ").alias("n_occurrences"))
           .filter(F.col("n_docs") >= min_docs)
           .select("line", "n_docs", "n_occurrences")
           .orderBy(F.desc("n_docs"), F.desc("n_occurrences"),
                    F.asc("line")))
    return agg.limit(top_k) if top_k is not None else agg


def hashed_feature_scores(docs: DataFrame, weights: DataFrame,
                          n_buckets: int = 1 << 20,
                          bias: float = 0.0,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Linear text classifier over hashed token features — the
    fasttext-style quality-scorer shape most corpus pipelines run
    between the cheap ratio filters (q_text_quality) and expensive
    model scoring: each token hashes into one of ``n_buckets``
    feature buckets, bucket weights come from the (small) ``weights``
    frame — columns ``(bucket, weight)``, trained wherever you train
    classifiers; this engine SCORES, it does not train — and
    ``score = sigmoid(bias + Σ weight[bucket(token)])`` over the
    token MULTISET (each occurrence counts, fasttext-style).

    Returns one row per doc: ``(id_col, n_tokens, score)`` —
    token-less docs score sigmoid(bias); NULL text stays NULL.

    The bucket hash is the engine-portable md5 convention (first 15
    hex chars as a 60-bit int, mod n_buckets) over the shared
    tokenizer — bit-replayable in Python/DuckDB, same trade-off as
    the MinHash family (xxhash64 is faster, not portable).

    Scale notes (100 TB): one token explode (map-side), one
    broadcast hash join against the weights frame (n_buckets-bounded
    — a few MB for 2^20 buckets; missing buckets coalesce to weight
    0), one map-side-combined per-doc SUM. Nothing Python, nothing
    driver-side; the classifier is exactly as scalable as a word
    count.
    """
    did = F.col("_hf_did")
    toks = (docs.select(
        F.col(id_col).alias("_hf_did"),
        F.explode_outer(tokens_col(text_col)).alias("_hf_tok")))
    bucketed = toks.withColumn(
        "_hf_bucket",
        F.when(F.col("_hf_tok").isNotNull(),
               F.conv(F.substring(F.md5("_hf_tok"), 1, 15), 16, 10)
                .cast("long") % n_buckets))
    w = F.broadcast(weights.select(
        F.col("bucket").alias("_hf_bucket"),
        F.col("weight").alias("_hf_w")))
    scored = (bucketed.join(w, "_hf_bucket", "left")
              .groupBy("_hf_did")
              .agg(F.count("_hf_tok").alias("n_tokens"),
                   F.sum(F.when(F.col("_hf_tok").isNotNull(),
                                F.coalesce("_hf_w", F.lit(0.0))))
                    .alias("_hf_raw")))
    logit = F.lit(float(bias)) + F.coalesce("_hf_raw", F.lit(0.0))
    orig = docs.select(F.col(id_col),
                       F.col(text_col).isNull().alias("_hf_null"))
    return (orig.join(scored, orig[id_col] == did, "left")
            .select(id_col,
                    F.when(F.col("_hf_null"), F.lit(None))
                     .otherwise(F.coalesce("n_tokens", F.lit(0)))
                     .alias("n_tokens"),
                    F.when(F.col("_hf_null"), F.lit(None))
                     .otherwise(F.lit(1.0)
                                / (F.lit(1.0) + F.exp(-logit)))
                     .alias("score")))


# ---------------------------------------------------------------------------
# Document chunking — the overlapping-token-window pass every
# embedding/RAG ingestion runs over a corpus before vectorizing.
# ---------------------------------------------------------------------------

def chunk_documents(docs: DataFrame, window: int = 64,
                    stride: int = 48, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split each document into overlapping windows of whitespace
    tokens: chunks start at 0, stride, 2*stride, ... up to the first
    start whose window reaches the document's end, so every token is
    covered, consecutive chunks overlap by (window - stride) tokens,
    and no chunk is a suffix-duplicate of its predecessor. Returns
    (id, chunk_idx, start_tok, n_tokens, chunk_text); (id, chunk_idx)
    is the stable chunk key downstream embedding tables join on.

    Tokens are ``\\s+`` splits of the trimmed text and chunk_text
    re-joins them with single spaces — intra-document whitespace runs
    are NOT preserved (the normalization every whitespace tokenizer
    implies; byte-exact reconstruction needs the span representation
    of `dedup.span_dedup` instead). NULL/whitespace-only documents
    produce no chunks.

    Scale notes: pure narrow column operations — one split, one
    bounded sequence (ceil(n/stride) starts), one posexplode, one
    slice per chunk; no shuffle, no UDF, fully codegen'd. Output row
    count is ~n_tokens/stride per doc, so downstream exchanges see
    amplification ~window/stride; chunk at the last pipeline stage
    before embedding, never before corpus-wide dedup.

    Replayed token-exactly by a pure-Python oracle in
    tests/test_text.py (same contract, `re.split`), plus crafted
    edges: empty, sub-window, exact-window, stride==window.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if not 1 <= stride <= window:
        raise ValueError(
            f"stride must be in [1, window={window}], got {stride}")
    # Filter boundary empties rather than trim(): Spark's trim strips
    # ASCII spaces only, so a leading tab/newline would survive and
    # \s+ splitting would emit a spurious empty first token (fuzz-
    # caught). Empty tokens can only arise at the boundaries, so the
    # filter is exactly Python's strip()-then-split semantics.
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda t: t != "")
    n = F.size(toks)
    # Last start: smallest multiple of stride with start+window >= n.
    s_max = (F.ceil(F.greatest(n - F.lit(window), F.lit(0))
                    / F.lit(stride)).cast("int") * stride)
    return (docs
            .filter(F.col(text_col).isNotNull() & (n > 0))
            .select(F.col(id_col), toks.alias("_ck_toks"),
                    F.posexplode(
                        F.sequence(F.lit(0), s_max, F.lit(stride)))
                     .alias("chunk_idx", "start_tok"))
            .select(id_col, "chunk_idx", "start_tok",
                    F.slice(F.col("_ck_toks"),
                            F.col("start_tok") + 1,
                            F.lit(window)).alias("_ck_chunk"))
            .select(id_col,
                    F.col("chunk_idx").cast("long"),
                    F.col("start_tok").cast("long"),
                    F.size("_ck_chunk").cast("long").alias("n_tokens"),
                    F.array_join("_ck_chunk", " ").alias("chunk_text")))


# ---------------------------------------------------------------------------
# Bigram LM quality scoring — the CCNet/KenLM-style "score documents
# by a reference-corpus language model" filter, as pure aggregations
# and joins.
# ---------------------------------------------------------------------------

def ngram_lm_train(corpus: DataFrame, text_col: str = "text"
                   ) -> tuple[DataFrame, DataFrame, int]:
    """Train a bigram language model over the reference corpus:
    returns (bigram counts (w1, w2, c12), unigram counts (w1, c1),
    vocab_size). Tokenization is the shared `tokens_col` (lowercased
    alnum runs), bigrams are within-document adjacent pairs.

    Persist the two count frames (bucketed by w1) and re-use across
    scoring runs; vocab_size is the only driver-side state (one
    count). Scale: two map-side-combined aggregations over the
    exploded token stream — the exact q_text_analysis shape. The
    returned frames are lazily checkpointed: the vocab count already
    materializes the unigram agg, and without the checkpoint every
    scoring join would re-run BOTH corpus aggregations from the raw
    text (measured 15 s → 3.5 s on the sf0.1 lifecycle).

    Durability note (cluster deployments): ``localCheckpoint``
    snapshots to EXECUTOR-LOCAL storage — losing an executor
    invalidates the model frames and fails the next scoring job
    (an availability cost only; retrain is deterministic). For
    long-lived models, write the two count frames to a bucketed
    table (`sources.writers.write_bucketed` on w1) and read them
    back instead — that is the persist-and-reuse path the first
    paragraph recommends anyway.
    """
    toked = corpus.withColumn("_lm_toks", tokens_col(F.col(text_col)))
    bi = (toked
          .select(F.explode(_bigrams_col("_lm_toks")).alias("bg"))
          .select("bg.w1", "bg.w2")
          .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
          .localCheckpoint(eager=False))
    uni = (toked
           .select(F.explode("_lm_toks").alias("w1"))
           .groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
           .localCheckpoint(eager=False))
    return bi, uni, uni.count()


def _bigrams_col(toks_col: str):
    """array<struct<w1,w2>> of adjacent pairs from a MATERIALIZED
    token-array column: zip the array with its own tail — one pass,
    no per-element re-evaluation. (The first formulation indexed the
    outer array with element_at inside a transform lambda; Catalyst
    re-evaluates a captured outer expression per element, turning an
    n-token doc into O(n²) tokenizer work — measured 3.5× slower on
    the sf0.1 train+score lifecycle.)"""
    t = F.col(toks_col)
    n1 = F.greatest(F.size(t) - 1, F.lit(0))
    return F.zip_with(
        F.slice(t, 1, n1), F.slice(t, 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))


def ngram_lm_score(docs: DataFrame, bigrams: DataFrame,
                   unigrams: DataFrame, vocab_size: int,
                   add_k: float = 1.0, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Score each document by the reference bigram model: mean
    add-k-smoothed log-probability of its bigrams,
    ``log((c12 + k) / (c1 + k·V))``, plus the derived perplexity
    ``exp(-avg_logp)`` — the quality-filter statistic (in-domain
    fluent text scores low-perplexity; gibberish and boilerplate
    score high). Documents with fewer than 2 tokens get NULL
    avg_logp/ppl and n_bigrams = 0 (NULL text keeps NULL counts).

    Unseen bigram -> c12 = 0; unseen w1 -> c1 = 0 (both smoothed,
    never -inf). Replayed in Python (Counter + math.log) in
    tests/test_text.py.

    Scale notes: one explode + two equi-joins against the count
    frames — broadcast when the model is small, hash-partitioned on
    the token key otherwise (bucket the persisted counts by w1/(w1,
    w2) to make scoring shuffle-free) — then one map-side-combined
    per-doc average. No UDFs; everything stays in codegen.
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if add_k <= 0:
        raise ValueError(f"add_k must be > 0, got {add_k}")
    doc_bi = (docs
              .withColumn("_lm_toks", tokens_col(F.col(text_col)))
              .select(F.col(id_col),
                      F.explode(_bigrams_col("_lm_toks")).alias("bg"))
              .select(id_col, "bg.w1", "bg.w2"))
    scored = (doc_bi
              .join(bigrams, ["w1", "w2"], "left")
              .join(unigrams, ["w1"], "left")
              .withColumn("_lm_lp", F.log(
                  (F.coalesce("c12", F.lit(0)) + F.lit(float(add_k)))
                  / (F.coalesce("c1", F.lit(0))
                     + F.lit(float(add_k) * vocab_size))))
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_bigrams"),
                   F.avg("_lm_lp").alias("avg_logp")))
    base = docs.select(F.col(id_col),
                       F.col(text_col).isNull().alias("_lm_null"))
    return (base.join(scored, id_col, "left")
            .select(id_col,
                    F.when(F.col("_lm_null"), F.lit(None))
                     .otherwise(F.coalesce("n_bigrams", F.lit(0)))
                     .alias("n_bigrams"),
                    F.col("avg_logp"),
                    F.exp(-F.col("avg_logp")).alias("ppl")))
