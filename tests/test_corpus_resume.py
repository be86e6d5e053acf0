"""Resume semantics of the corpus-assembly pipeline
(pipelines/corpus.py): completed stages are adopted from their
completion sidecars without touching a byte, incomplete stages rerun,
and a resumed run's artifacts are bit-identical to an uninterrupted
one's — the restart-point contract the staged layout exists for.
"""

from __future__ import annotations

import os
import shutil

import pytest

from lisp_batch_processor_spark.pipelines import assemble_corpus
from lisp_batch_processor_spark.pipelines.corpus import _STAGE_DONE

KW = dict(pack_budget=64, pack_buckets=2, salt="resume-v1")


def corpus(spark):
    def text(i):
        lines = []
        for j in range(3):
            lines.append(" ".join(
                f"w{(2 * (j * 4 + k)) % 8} u{i}x{j}x{k}"
                for k in range(4)))
        return "\n".join(lines)

    docs = spark.createDataFrame(
        [(i, f"https://d{i}.example.com/", text(i)) for i in range(1, 21)],
        "doc_id bigint, url string, text string")
    evals = spark.createDataFrame(
        [("benchmark only words never in corpus at all today forever",)],
        "text string")
    return docs, evals


def file_states(root: str) -> dict[str, tuple[int, float]]:
    """(size, mtime) of every file under root — the did-anything-touch
    -this probe."""
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime)
    return out


def train_order(spark, out):
    rows = spark.read.parquet(out.train_order_path).collect()
    return sorted((r.shuffle_key, r.pack_id, r.pos, r.doc_id,
                   r.n_tokens, r.text) for r in rows)


@pytest.fixture(scope="module")
def baseline(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("resume_base"))
    docs, evals = corpus(spark)
    out = assemble_corpus(spark, docs, evals, wd, **KW)
    return wd, out, train_order(spark, out), out.counters()


def test_resume_adopts_every_completed_stage(spark, baseline, tmp_path):
    wd0, out0, order0, counters0 = baseline
    wd = str(tmp_path / "w")
    shutil.copytree(wd0, wd)
    before = file_states(wd)
    docs, evals = corpus(spark)
    out = assemble_corpus(spark, docs, evals, wd, resume=True, **KW)
    # Nothing recomputed: every file byte-identical and untouched.
    assert file_states(wd) == before
    assert out.counters() == counters0
    assert train_order(spark, out) == order0


def test_resume_restarts_at_first_incomplete_stage(spark, baseline,
                                                   tmp_path):
    wd0, out0, order0, counters0 = baseline
    wd = str(tmp_path / "w")
    shutil.copytree(wd0, wd)
    # Simulate a crash inside stage 4: its sidecar never landed, and
    # stages 5-8 never ran.
    os.remove(os.path.join(wd, "04_near_dup", _STAGE_DONE))
    for d in ("05_quality", "06_split", "07_pack", "08_train_order"):
        shutil.rmtree(os.path.join(wd, d))
    sealed = {k: v for k, v in file_states(wd).items()
              if k.split(os.sep)[0] in
              ("00_meta", "01_url_dedup", "02_line_dedup",
               "03_span_dedup")}
    docs, evals = corpus(spark)
    out = assemble_corpus(spark, docs, evals, wd, resume=True, **KW)
    # Stages 1-3 + meta adopted untouched; 4-8 recomputed to the
    # exact artifacts of the uninterrupted run.
    after = file_states(wd)
    assert {k: v for k, v in after.items()
            if k in sealed} == sealed
    assert out.counters() == counters0
    assert train_order(spark, out) == order0


def _sealed(wd, dirs):
    return {k: v for k, v in file_states(wd).items()
            if k.split(os.sep)[0] in dirs}


@pytest.mark.slow
def test_knob_scoped_resume_reuses_stages_above_the_changed_knob(
        spark, baseline, tmp_path):
    """Filter iteration: changing `ppl_max` with resume=True adopts
    the dedup/near-dup stages untouched and recomputes exactly
    quality -> shuffle, landing on the same artifacts as a fresh run
    with the new knobs."""
    wd0, *_ = baseline
    wd = str(tmp_path / "w")
    shutil.copytree(wd0, wd)
    docs, evals = corpus(spark)
    keep = ("00_meta", "01_url_dedup", "02_line_dedup",
            "03_span_dedup", "04_near_dup")
    sealed = _sealed(wd, keep)
    kw2 = dict(KW, ppl_max=1e9)
    out = assemble_corpus(spark, docs, evals, wd, resume=True, **kw2)
    assert _sealed(wd, keep) == sealed          # dedup passes reused
    fresh = assemble_corpus(spark, docs, evals,
                            str(tmp_path / "fresh"), **kw2)
    assert out.counters() == fresh.counters()
    assert train_order(spark, out) == train_order(spark, fresh)


@pytest.mark.slow
def test_knob_scoped_resume_salt_change_recomputes_split_onward(
        spark, baseline, tmp_path):
    wd0, *_ = baseline
    wd = str(tmp_path / "w")
    shutil.copytree(wd0, wd)
    docs, evals = corpus(spark)
    keep = ("00_meta", "01_url_dedup", "02_line_dedup",
            "03_span_dedup", "04_near_dup", "05_quality")
    sealed = _sealed(wd, keep)
    kw2 = dict(KW, salt="OTHER")
    out = assemble_corpus(spark, docs, evals, wd, resume=True, **kw2)
    assert _sealed(wd, keep) == sealed  # stages 1-5 are salt-free
    fresh = assemble_corpus(spark, docs, evals,
                            str(tmp_path / "fresh"), **kw2)
    assert train_order(spark, out) == train_order(spark, fresh)


def test_knob_scoped_resume_upstream_change_recomputes_downstream(
        spark, baseline, tmp_path):
    """An upstream knob (span_window) invalidates its own stage AND
    everything after it through the fingerprint chain."""
    wd0, out0, *_ = baseline
    wd = str(tmp_path / "w")
    shutil.copytree(wd0, wd)
    docs, evals = corpus(spark)
    sealed = _sealed(wd, ("00_meta", "01_url_dedup", "02_line_dedup"))
    before_span = file_states(wd)[
        os.path.join("03_span_dedup", _STAGE_DONE)]
    kw2 = dict(KW, span_window=19)
    out = assemble_corpus(spark, docs, evals, wd, resume=True, **kw2)
    assert _sealed(wd, ("00_meta", "01_url_dedup",
                        "02_line_dedup")) == sealed
    assert file_states(wd)[
        os.path.join("03_span_dedup", _STAGE_DONE)] != before_span
    assert [s.name for s in out.stages] == \
        [s.name for s in out0.stages]


def test_torn_sidecar_reruns_the_stage(spark, baseline, tmp_path):
    wd0, out0, order0, counters0 = baseline
    wd = str(tmp_path / "w")
    shutil.copytree(wd0, wd)
    # A crash mid-sidecar-write leaves garbage — must read as absent,
    # not raise, and the stage must rerun.
    with open(os.path.join(wd, "08_train_order", _STAGE_DONE), "w") as f:
        f.write('{"name": "shuf')
    docs, evals = corpus(spark)
    out = assemble_corpus(spark, docs, evals, wd, resume=True, **KW)
    assert out.counters() == counters0
    assert train_order(spark, out) == order0
