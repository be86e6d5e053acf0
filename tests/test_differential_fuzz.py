"""Randomized differential testing of the document-dedup pipelines:
run the Spark implementation AND its DuckDB oracle on RANDOM corpora
with planted near-threshold duplicates, and require exact equality —
the same comparison the driver's gate makes, minus the blessed
fixture.

Why this exists: the fixture can mask real divergence. The round-4
MinHash fold bug (wrong Mersenne coefficient — a different hash
family than the oracle replays) passed the fixture gate because
exact-Jaccard verification confirmed the same final pairs from both
engines' (different) candidate sets. Random corpora with many pairs
sitting NEAR the LSH band thresholds make that kind of masking
vanishingly unlikely: any family drift flips some pair's candidacy
in one engine only, and the assignment hashes split.

Seeds are fixed so runs are reproducible; corpora include empty
docs, sub-shingle docs, case/whitespace/punctuation churn, exact
dups, and token-substitution variants whose Jaccard straddles the
0.7/0.8 thresholds, across multiple source blocks.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from lisp_batch_processor_spark import all_queries, oracles
from scripts.check_correctness import _rowset

# documents-shaped queries — the full fuzzy-dedup family, the
# exact-dup fingerprint, and the text-analysis stack (the corpus
# carries the full fixture schema incl. lang / n_chars, with
# unicode, emoji, CJK, and Turkish-casing docs planted).
FUZZ_QUERIES = (
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_ngram",
    "q_dedup_editdist",
    "q_dedup_connected",
    "q_text_fingerprint",
    "q_text_analysis",
    "q_text_quality",
    "q_text_tokens",
    "q_text_langid",
)


def _fuzz_corpus(seed: int, n_base: int = 50) -> list[tuple]:
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(150)] + ["the", "and", "data", "run"]
    sources = ["sA", "sB", "sC"]
    rows: list[tuple] = []
    doc_id = 0
    for _ in range(n_base):
        src = rng.choice(sources)
        toks = [rng.choice(vocab) for _ in range(rng.randint(0, 40))]
        rows.append((doc_id, src, " ".join(toks)))
        doc_id += 1
        # 0-2 variants: replace up to a third of the tokens, so pair
        # Jaccard lands all over [0.5, 1.0] — straddling the 0.7
        # (minhash) and 0.8 (ngram) thresholds where band-membership
        # disagreements between drifting hash families would show.
        for _ in range(rng.randint(0, 2)):
            v = list(toks)
            for _ in range(rng.randint(0, max(1, len(v) // 3))):
                if v:
                    v[rng.randrange(len(v))] = rng.choice(vocab)
            vsrc = src if rng.random() < 0.8 else rng.choice(sources)
            rows.append((doc_id, vsrc, " ".join(v)))
            doc_id += 1
    # Case/whitespace/punctuation churn (fingerprint + tokenizer
    # normalization paths), an exact dup pair, and unicode stress:
    # umlauts/ß, CJK (tokenizer strips all), emoji, Turkish dotted-I
    # casing (lower() corner), combining characters.
    extra = [
        "Hello, World!  multiple   spaces here",
        "hello world MULTIPLE spaces? here",
        rows[0][2],
        "Üppige Grüße aus München ß straße",
        "数据 处理 系统 大规模 训练",
        "emoji 😀 test 🚀 tokens remain ascii only",
        "İstanbul KIRMIZI ışık DİKKAT",
        "café combining acute vs café precomposed",
    ]
    for k, t in enumerate(extra):
        # Unicode docs get singleton sources: q_dedup_editdist is
        # source-blocked and Levenshtein UNITS differ by engine on
        # non-ASCII text (JVM UTF-16 code units vs DuckDB code
        # points — an emoji counts 2 vs 1), so cross-engine distance
        # parity is only defined where the units coincide. The
        # unblocked tokenizer-based queries (minhash/simhash/
        # fingerprint/text_*) still process these docs fully.
        src = rng.choice(["sA", "sB"]) if t.isascii() else f"sU{k}"
        rows.append((doc_id, src, t))
        doc_id += 1
    # Fixture schema order: (doc_id, text, lang, source, n_chars).
    langs = ["en", "de", "fr", "zh", None]
    return [(i, text, rng.choice(langs), src, len(text))
            for i, src, text in rows]


def test_fuzz_families_cover_every_oracled_query():
    """Completeness guard: every query with a DuckDB oracle belongs
    to exactly one fuzz family — a new oracled query must be added to
    a family (or this test names it)."""
    covered = (set(FUZZ_QUERIES) | {"q_multimodal_frames"}
               | set(EVENT_FUZZ_QUERIES) | set(VECTOR_FUZZ_QUERIES)
               | {"q_scalar_funcs", "q_json_map"}
               | set(RELATIONAL_FUZZ_QUERIES))
    assert set(oracles()) == covered, (
        f"unfuzzed oracled queries: {sorted(set(oracles()) - covered)}; "
        f"stale fuzz entries: {sorted(covered - set(oracles()))}")


SESSION_GAP_US = 30 * 60 * 1_000_000

# event-time queries over (event_id, ts, user_id, event_type, value):
# the batch event operators AND the streaming twins — the streaming
# engine itself runs against the random fixture through the same
# memory-sink harness the gate uses.
EVENT_FUZZ_QUERIES = (
    "q_event_sessionize",
    "q_join_asof",
    "q_join_range",
    "q_window_tumbling",
    "q_stream_sessions",
    "q_stream_dedup",
)


def _fuzz_events(seed: int, n_users: int = 12) -> list[tuple]:
    from datetime import datetime, timedelta

    rng = random.Random(seed)
    base = datetime(2025, 3, 1)
    types = ["click", "view", "error", "scroll"]
    rows: list[tuple] = []
    eid = 0
    for u in range(n_users):
        t_us = rng.randint(0, 3_600_000_000)
        # Some users get long bursts (> the 20-event session cap);
        # steps include 0 (same-instant ties), the EXACT session gap
        # (stays in-session: the `>` is strict), and gap+1 (splits).
        for _ in range(rng.randint(1, 55)):
            t_us += rng.choice([0, 0, 1, 999_983, SESSION_GAP_US,
                                SESSION_GAP_US + 1,
                                rng.randint(1, 2 * SESSION_GAP_US)])
            ty = rng.choice(types)
            rows.append((eid, base + timedelta(microseconds=t_us), u,
                         ty, rng.randint(0, 10_000) / 100, "{}"))
            eid += 1
            # As-of strictness: occasionally an error at the SAME
            # instant as the touch just emitted — the strict b.ts <
            # a.ts must not see it.
            if ty in ("click", "view") and rng.random() < 0.1:
                rows.append((eid, base + timedelta(microseconds=t_us),
                             u, "error", rng.randint(0, 10_000) / 100,
                             "{}"))
                eid += 1
    rng.shuffle(rows)  # file order must not matter
    return rows


@pytest.mark.parametrize("seed", [11, 42])
def test_event_queries_match_oracles_on_random_events(
        spark, tmp_path_factory, seed):
    rows = _fuzz_events(seed)
    d = tmp_path_factory.mktemp(f"evfuzz{seed}")
    (spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
     # One part file: the streaming twins' oracle equivalence needs
     # all data in one micro-batch, matching the gate fixture shape.
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{d}/events.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')")

    for name in EVENT_FUZZ_QUERIES:
        _assert_query_matches_oracle(spark, con, name, d, seed)


# vector queries over (vec_id, embedding, label): exact cosine
# threshold decisions and SRP bucket keys must be bit-identical.
VECTOR_FUZZ_QUERIES = (
    "q_dedup_embedding",
    "q_similarity_topk",
    "q_similarity_ann",
    "q_multimodal_cols",
)

EMBED_DIM = 64


def _fuzz_embeddings(seed: int, n: int = 120) -> list[tuple]:
    import math

    rng = random.Random(seed)

    def rand_vec():
        return [rng.gauss(0, 1) for _ in range(EMBED_DIM)]

    rows: list[tuple] = []
    vid = 0
    for _ in range(n):
        v = rand_vec()
        label = rng.randrange(5)
        rows.append((vid, v, label))
        vid += 1
        r = rng.random()
        if r < 0.15:
            # Exact duplicate (cos == 1 bit-for-bit).
            rows.append((vid, list(v), label))
            vid += 1
        elif r < 0.45:
            # Constructed cosine straddling the 0.99 dup threshold:
            # w = c*u + sqrt(1-c^2)*o with o orthogonal to v. Float32
            # storage perturbs the realized cosine a few ULP around
            # the target, so the >= 0.99 DECISION depends on both
            # engines computing the identical double.
            c = rng.choice([0.9899, 0.98995, 0.99, 0.99005, 0.9901])
            o = rand_vec()
            dv = sum(a * a for a in v) ** 0.5
            d = sum(a * b for a, b in zip(v, o)) / (dv * dv)
            o = [b - d * a for a, b in zip(v, o)]  # orthogonalize
            do = sum(a * a for a in o) ** 0.5
            w = [c * a / dv + math.sqrt(1 - c * c) * b / do
                 for a, b in zip(v, o)]
            rows.append((vid, w,
                         label if rng.random() < 0.8 else rng.randrange(5)))
            vid += 1
    # Zero vectors: norm 0 -> cosine 0/0 = NaN; both engines must
    # agree on how NaN meets >= thresholds and DESC ranking.
    rows.append((vid, [0.0] * EMBED_DIM, 0))
    rows.append((vid + 1, [0.0] * EMBED_DIM, 0))
    return rows


def _assert_query_matches_oracle(spark, con, name, sf_dir, seed):
    qs, osql = all_queries(), oracles()
    sdf = qs[name](spark, str(sf_dir))
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(osql[name])
    dcols = [dd[0] for dd in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), name
    assert len(srows) == len(drows), \
        f"{name} seed {seed}: spark {len(srows)} vs oracle {len(drows)}"
    a, b = _rowset(scols, srows), _rowset(dcols, drows)
    diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
    assert a == b, f"{name} seed {seed}: first diffs {diffs}"


@pytest.mark.parametrize("seed", [13, 61])
def test_scalar_and_json_queries_on_random_rows(
        spark, tmp_path_factory, seed):
    """q_scalar_funcs over random orders (NULLs, empty and unicode
    strings, regex non-matches, boundary dates, zero/huge prices) and
    q_json_map over random events props (malformed JSON, JSON null,
    array documents, quoted numbers, present-and-absent keys)."""
    from datetime import datetime, timedelta

    rng = random.Random(seed)
    d = tmp_path_factory.mktemp(f"scfuzz{seed}")

    statuses = ["O", "F", "P", "", "ø", None]
    prios = ["1-URGENT", "5-LOW", "2-HIGH PRIO", "URGENT", "", "9-",
             "1-URGENT EXTRA WORDS", None, "x-nope", "3-médium"]
    orders = []
    for i in range(120):
        day = datetime(1992, 1, 1) + timedelta(
            days=rng.randint(0, 365 * 40), seconds=rng.randint(0, 86399))
        price = rng.choice(
            [0.0, 0.005, 104729.991, rng.uniform(0, 1e7), None])
        orders.append((i, rng.randint(1, 50), rng.choice(statuses),
                       price, day, rng.choice(prios)))
    (spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate timestamp_ntz, "
                "o_orderpriority string")
     .coalesce(2).write.mode("overwrite").parquet(f"{d}/orders.parquet"))

    props_pool = ['{"k": 7}', '{"k":-13}', '{"k": 0}', '{}', "", "not json",
                  '{"k":', '{"k": null}', '{"k": 7, "missing": 1}',
                  '{"k":"9"}', "null", "[1,2]", ' {"k":3} ', None,
                  # VALID JSON, non-integer k: extraction succeeds but
                  # the int parse must yield NULL (try_cast), not an
                  # ANSI/strict-cast crash.
                  '{"k": "abc"}', '{"k": 1.5}', '{"k": 99999999999999}']
    events = []
    base = datetime(2025, 3, 1)
    for i in range(150):
        events.append((i, base + timedelta(seconds=i), rng.randint(0, 9),
                       "click", 1.0, rng.choice(props_pool)))
    (spark.createDataFrame(
        events, "event_id long, ts timestamp_ntz, user_id long, "
                "event_type string, value double, props string")
     .coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet"))

    con = duckdb.connect()
    for t in ("orders", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet/*.parquet')")
    for name in ("q_scalar_funcs", "q_json_map"):
        _assert_query_matches_oracle(spark, con, name, d, seed)


# relational / TPC-H family — every query over the 7-table world
# (plus events for the window/pivot rows). NULLs go in VALUE columns
# (balances, prices, quantities, segments, dates) while keys stay
# non-null (the TPC-H contract); dangling foreign keys and customers
# without orders arise naturally from independent sampling.
RELATIONAL_FUZZ_QUERIES = (
    "q_scan_project", "q_filter_pred", "q_dedup_exact",
    "q_pipeline_chain", "q_sort_limit", "q_set_ops", "q_join_inner",
    "q_join_semi_anti", "q_agg_groupby", "q_agg_distinct",
    "q_agg_quantiles", "q_rollup_cube", "q_window_rank",
    "q_window_running", "q_tpch_q3", "q_tpch_q5", "q_tpch_q17",
    "q_tpch_q18", "q_join_outer", "q_exists_decorrelated", "q_pivot",
    "q_skew_join", "q_skew_agg", "q_quality_audit", "q_status_rollup",
)


def _fuzz_tpch_world(spark, d, seed: int) -> None:
    from datetime import datetime, timedelta

    rng = random.Random(seed)

    def null_or(v, p=0.12):
        return None if rng.random() < p else v

    def day(lo=1992, hi=1998):
        return (datetime(lo, 1, 1)
                + timedelta(days=rng.randint(0, (hi - lo) * 365)))

    def write(name, rows, schema):
        (spark.createDataFrame(rows, schema).coalesce(2)
         .write.mode("overwrite").parquet(f"{d}/{name}.parquet"))

    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    write("region", [(i, regions[i]) for i in range(5)],
          "r_regionkey int, r_name string")
    write("nation", [(i, f"NATION_{i}", rng.randrange(5))
                     for i in range(25)],
          "n_nationkey int, n_name string, n_regionkey int")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY",
            "HOUSEHOLD"]
    write("customer",
          [(c, f"Customer#{c}", rng.randrange(25),
            null_or(round(rng.uniform(-999, 9999), 2)),
            null_or(rng.choice(segs)))
           for c in range(1, 61)],
          "c_custkey long, c_name string, c_nationkey int, "
          "c_acctbal double, c_mktsegment string")
    write("supplier",
          [(s, f"Supplier#{s}", rng.randrange(25),
            null_or(round(rng.uniform(-999, 9999), 2)))
           for s in range(1, 16)],
          "s_suppkey long, s_name string, s_nationkey int, "
          "s_acctbal double")
    types = ["ECONOMY", "MEDIUM", "PROMO", "SMALL", "STANDARD", "LARGE"]
    write("part",
          [(p, f"part {p}", f"Brand#{rng.randrange(1, 26)}",
            rng.choice(types), null_or(rng.randint(1, 50)),
            round(rng.uniform(1, 2000), 2))
           for p in range(1, 31)],
          "p_partkey long, p_name string, p_brand string, "
          "p_type string, p_size int, p_retailprice double")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"]
    write("orders",
          [(o, rng.randint(1, 70),  # custkeys 61-70 dangle
            rng.choice("OFP"),
            null_or(round(rng.uniform(1, 300000), 2)),
            null_or(day(), 0.06), rng.choice(prios))
           for o in range(1, 121)],
          "o_orderkey long, o_custkey long, o_orderstatus string, "
          "o_totalprice double, o_orderdate timestamp_ntz, "
          "o_orderpriority string")
    write("lineitem",
          [(rng.randint(1, 130), rng.randint(1, 30),  # orders 121-130 dangle
            rng.randint(1, 15), ln,
            null_or(float(rng.randint(1, 50))),
            round(rng.uniform(1, 90000), 2),
            round(rng.choice([0.0, 0.02, 0.05, 0.1]), 2),
            round(rng.choice([0.0, 0.04, 0.08]), 2),
            rng.choice("ANR"), rng.choice("OF"), day(1992, 1999))
           for ln in range(1, 8) for _ in range(70)],
          "l_orderkey long, l_partkey long, l_suppkey long, "
          "l_linenumber int, l_quantity double, l_extendedprice double, "
          "l_discount double, l_tax double, l_returnflag string, "
          "l_linestatus string, l_shipdate timestamp_ntz")
    base = datetime(2025, 3, 1)
    write("events",
          [(i, base + timedelta(seconds=i * 37), rng.randint(0, 9),
            rng.choice(["click", "view", "error", "scroll"]),
            null_or(rng.randint(0, 10_000) / 100), "{}")
           for i in range(200)],
          "event_id long, ts timestamp_ntz, user_id long, "
          "event_type string, value double, props string")


@pytest.mark.parametrize("seed", [3, 47])
def test_relational_queries_on_random_tpch(spark, tmp_path_factory, seed):
    d = tmp_path_factory.mktemp(f"tpchfuzz{seed}")
    _fuzz_tpch_world(spark, d, seed)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet/*.parquet')")
    for name in RELATIONAL_FUZZ_QUERIES:
        _assert_query_matches_oracle(spark, con, name, d, seed)


@pytest.mark.parametrize("seed", [5, 31])
def test_vector_queries_match_oracles_on_random_embeddings(
        spark, tmp_path_factory, seed):
    rows = _fuzz_embeddings(seed)
    d = tmp_path_factory.mktemp(f"vecfuzz{seed}")
    (spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
     .coalesce(2).write.mode("overwrite")
     .parquet(f"{d}/embeddings.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet/*.parquet')")

    for name in VECTOR_FUZZ_QUERIES:
        _assert_query_matches_oracle(spark, con, name, d, seed)


@pytest.mark.parametrize("seed", [7, 23])
def test_dedup_family_matches_oracles_on_random_corpus(
        spark, tmp_path_factory, seed):
    rows = _fuzz_corpus(seed)
    d = tmp_path_factory.mktemp(f"fuzz{seed}")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .coalesce(2).write.mode("overwrite")
     .parquet(f"{d}/documents.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')")

    for name in FUZZ_QUERIES:
        _assert_query_matches_oracle(spark, con, name, d, seed)

    # q_multimodal_frames is byte-level; its oracle is expressible
    # only for ASCII payloads (DuckDB md5 hashes VARCHAR, so byte
    # slices of non-UTF-8-safe payloads can't be hashed SQL-side —
    # the operator docstring documents the contract). Check it on
    # the ASCII subset of the corpus.
    d2 = tmp_path_factory.mktemp(f"fuzzascii{seed}")
    ascii_rows = [r for r in rows if r[1].isascii()]
    (spark.createDataFrame(
        ascii_rows, "doc_id long, text string, lang string, "
                    "source string, n_chars long")
     .coalesce(2).write.mode("overwrite")
     .parquet(f"{d2}/documents.parquet"))
    con2 = duckdb.connect()
    con2.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d2}/documents.parquet/*.parquet')")
    _assert_query_matches_oracle(spark, con2, "q_multimodal_frames",
                                 d2, seed)
