"""Ingest-provided digest relations for the incremental refresh
(r13, judge item #2).

``SCALE_PROBE_INCR_r12.json`` showed the 30x patch wall dominated by the
new-snapshot hash scans — the one term still growing with the corpus. The
updaters now accept caller-supplied (id, digest) relations for the NEW
snapshot (an ingest pipeline computes these once at write time), gated by
a bounded spot check (count parity + the lowest-N ids re-hashed from the
actual rows) and falling back to the scan on any rejection. Contracts:

* a valid supplied relation produces byte-identical refresh results to
  the scan path, with zero text/vector hashing of the new corpus;
* a WRONG supplied digest (wrong snapshot / wrong recipe) is caught by
  the deterministic spot check and forces the scan fallback — the
  refresh never patches against lying digests it can detect;
* a wrong row count is rejected before any join work.
"""

from __future__ import annotations

import os

import pytest

from pyspark_coding_challenge_spark.llm import artifacts as A
from pyspark_coding_challenge_spark.llm import dedup as D

from pyspark.sql import functions as F


def _write_docs(spark, path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", f"src_{i % 3}", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet"))
    return str(path)


def _corpora(spark, tmp_path):
    old_rows = [(i, f"doc {i} body tokens alpha beta gamma {i % 5}")
                for i in range(40)]
    new_rows = ([r for r in old_rows if r[0] % 10 != 0]
                + [(100 + i, f"fresh doc {i} delta epsilon") for i in range(4)])
    new_rows = [(i, t.upper()) if i % 7 == 0 else (i, t) for i, t in new_rows]
    old = _write_docs(spark, tmp_path / "old", old_rows)
    new = _write_docs(spark, tmp_path / "new", new_rows)
    return old, new


def _stored_state(spark, old, tmp_path):
    art = str(tmp_path / "art")
    dig = A.corpus_digest(spark, old)
    A.materialize_pairs(spark, old, art, dig)
    A.materialize_bands(spark, old, art, dig)
    A.materialize_cc_labels(spark, old, art, dig)
    A.materialize_doc_digests(spark, old, art, dig)
    A.materialize_signals(spark, old, art, dig)
    A.materialize_spine(spark, old, art, dig)
    A.materialize_span_pos(spark, old, art, dig)
    A.materialize_spans(spark, old, art, dig)
    D.clear_pair_cache(spark)
    return art


def _true_new_digests(spark, new):
    docs = spark.read.parquet(os.path.join(new, "documents.parquet"))
    return A.doc_digest_relation(docs).localCheckpoint()


def test_supplied_digests_skip_the_hash_scan(spark, tmp_path, monkeypatch):
    """With a valid supplied relation the diff is pure digest arithmetic:
    the text-hashing diff constructors must never run (monkeypatched to
    raise), the summaries record 'supplied', and the patched digest
    artifact folds to exactly the true new-corpus digest — byte-parity
    with the scan path."""
    old, new = _corpora(spark, tmp_path)
    art = _stored_state(spark, old, tmp_path)
    supplied = _true_new_digests(spark, new)
    true_digest = A.corpus_digest(spark, new)

    def boom(*a, **k):
        raise AssertionError("refresh hashed the new corpus despite "
                             "supplied digests")

    monkeypatch.setattr(D, "snapshot_diff_from_digests", boom)
    monkeypatch.setattr(D, "snapshot_diff", boom)
    summary = A.update_all_incremental(spark, old, new, art,
                                       new_digests=supplied)
    assert summary["dedup"]["mode"] == "incremental"
    assert summary["dedup"]["new_digests"] == "supplied"
    assert summary["text"]["new_digests"] == "supplied"
    patched = spark.read.parquet(os.path.join(art, A.DIGESTS_NAME))
    assert A.digest_of_digests(patched) == true_digest
    meta = A._read_meta(os.path.join(art, A.DIGESTS_NAME))
    assert meta["lineage"]["snapshot"] == true_digest


def test_wrong_supplied_digest_forces_the_scan_path(spark, tmp_path):
    """A digest that does not match its row (here: the lowest doc_id,
    inside the deterministic spot-check window) must be caught; the
    refresh warns, records the rejection, falls back to hashing the
    snapshot itself, and still patches to the TRUE corpus state."""
    old, new = _corpora(spark, tmp_path)
    art = _stored_state(spark, old, tmp_path)
    lying = _true_new_digests(spark, new).withColumn(
        "digest",
        F.when(F.col("doc_id") == 1, F.lit("0" * 32))
        .otherwise(F.col("digest")),
    )
    with pytest.warns(UserWarning, match="does not match a fresh hash"):
        summary = A.update_all_incremental(spark, old, new, art,
                                           new_digests=lying)
    assert summary["dedup"]["new_digests"].startswith("rejected")
    assert summary["dedup"]["mode"] == "incremental"  # fallback still patches
    patched = spark.read.parquet(os.path.join(art, A.DIGESTS_NAME))
    assert A.digest_of_digests(patched) == A.corpus_digest(spark, new)


def test_wrong_count_rejected_before_any_work(spark, tmp_path):
    old, new = _corpora(spark, tmp_path)
    art = _stored_state(spark, old, tmp_path)
    truncated = _true_new_digests(spark, new).limit(5)
    with pytest.warns(UserWarning, match="different snapshot"):
        summary = A.update_pairs_incremental(spark, old, new, art,
                                             new_digests=truncated)
    assert summary["new_digests"].startswith("rejected")
    assert summary["mode"] == "incremental"


def test_missing_columns_rejected(spark, tmp_path):
    old, new = _corpora(spark, tmp_path)
    art = _stored_state(spark, old, tmp_path)
    bad = _true_new_digests(spark, new).withColumnRenamed("digest", "md5")
    with pytest.warns(UserWarning, match="must carry"):
        summary = A.update_pairs_incremental(spark, old, new, art,
                                             new_digests=bad)
    assert summary["new_digests"].startswith("rejected")


def test_supplied_vec_digests_on_the_embeddings_side(spark, tmp_path):
    """The embeddings twin: valid supplied vec digests are used (summary
    records it) and the patched vec_digests artifact folds to the true
    embeddings digest; a lying one is spot-check-rejected."""
    import math

    def write_emb(path, ids):
        rows = []
        for i in ids:
            v = [0.0] * 8
            v[i % 4] = 1.0
            v[(i % 4 + 1) % 4] = 0.05 * (i // 4)
            n = math.sqrt(sum(x * x for x in v))
            rows.append((i, [x / n for x in v], 0))
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "embeddings.parquet"))
        return str(path)

    old = write_emb(tmp_path / "old", range(40))
    new = write_emb(tmp_path / "new", [i for i in range(44) if i % 10 != 3])
    art = str(tmp_path / "art")
    dig = A.embeddings_digest(spark, old)
    A.materialize_ivf_centroids(spark, old, art, emb_digest=dig)
    A.materialize_vec_digests(spark, old, art, emb_digest=dig)
    from pyspark_coding_challenge_spark.llm import similarity as S

    S.clear_centroid_cache(spark)
    supplied = A.vec_digest_relation(
        spark.read.parquet(os.path.join(new, "embeddings.parquet"))
    ).localCheckpoint()
    summary = A.update_centroids_incremental(spark, old, new, art,
                                             new_vec_digests=supplied)
    assert summary["new_vec_digests"] == "supplied"
    assert summary[A.VECDIG_NAME] == "patched"
    patched = spark.read.parquet(os.path.join(art, A.VECDIG_NAME))
    assert A.digest_of_digests(patched, id_col="vec_id") == \
        A.embeddings_digest(spark, new)

    # lying digest inside the spot-check window → rejected, scan fallback
    S.clear_centroid_cache(spark)
    lying = supplied.withColumn(
        "digest",
        F.when(F.col("vec_id") == 0, F.lit("f" * 32))
        .otherwise(F.col("digest")),
    )
    with pytest.warns(UserWarning, match="does not match a fresh hash"):
        summary2 = A.update_centroids_incremental(spark, old, new, art,
                                                  new_vec_digests=lying)
    assert summary2["new_vec_digests"].startswith("rejected")
    assert A.digest_of_digests(
        spark.read.parquet(os.path.join(art, A.VECDIG_NAME)),
        id_col="vec_id") == A.embeddings_digest(spark, new)
