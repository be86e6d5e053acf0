"""Property tests for text operators on constructed inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.text import (
    _LANG_MARKERS,
    tokens_col,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tokenizer_drops_empties_and_lowercases(spark):
    df = _docs(spark, [(1, "Hello,  WORLD!! 42")])
    toks = df.select(tokens_col().alias("t")).first().t
    assert toks == ["hello", "world", "42"]


def test_tokenizer_empty_text(spark):
    df = _docs(spark, [(1, ""), (2, "...")])
    out = df.select(F.size(tokens_col()).alias("n")).collect()
    assert [r.n for r in out] == [0, 0]


def test_langid_detects_marker_languages(spark):
    from lisp_batch_processor_spark.operators import text as text_ops
    samples = {
        "en": "the cat is on the mat and the dog",
        "es": "el gato y la casa de los perros",
        "de": "der hund und die katze das haus",
        "fr": "le chat est une maison les chiens",
    }
    rows = [(i, t, lang, "src", len(t))
            for i, (lang, t) in enumerate(samples.items())]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.createOrReplaceTempView("_langid_docs")

    # run the same scoring logic via the public query on a temp dir is
    # heavier; instead reuse the marker scorer directly
    from lisp_batch_processor_spark.operators.text import marker_score
    d = df.withColumn("toks", tokens_col())
    for lang, words in _LANG_MARKERS.items():
        d = d.withColumn(f"score_{lang}", marker_score(words))
    rows = {r.lang: r for r in d.collect()}
    for lang in samples:
        scores = {l: rows[lang][f"score_{l}"] for l in _LANG_MARKERS}
        assert max(scores, key=lambda l: (scores[l], -ord(l[0]))) == lang, \
            (lang, scores)


def test_fingerprint_normalization_collapses_whitespace(spark):
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    df = _docs(spark, [(1, "Hello   World"), (2, "hello world "),
                       (3, "different")])
    out = [r.f for r in df.select(fp.alias("f")).collect()]
    assert out[0] == out[1] != out[2]
