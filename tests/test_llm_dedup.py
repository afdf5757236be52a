"""Property tests for the non-SQL-oracled dedup operators (MinHash-LSH,
SimHash) — these pin the semantics the driver's rows-only check can't
(SURVEY §7 'hard parts': MinHash has no SQL oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_coding_challenge_spark.llm import dedup as D

DOC_SCHEMA = "doc_id BIGINT, text STRING"


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), schema=DOC_SCHEMA)


def _pairs(spark, texts, threshold=None):
    docs = _docs(spark, texts)
    cand = D.lsh_candidate_pairs(docs)
    verified = D.verify_jaccard(docs, cand)
    if threshold is not None:
        verified = verified.filter(F.col("jaccard") >= threshold)
    return {(r.doc_a, r.doc_b): r.jaccard for r in verified.collect()}


BASE = "the quick brown fox jumps over the lazy dog while rain falls on the green hills today"


def test_identical_docs_are_candidate_pairs_with_jaccard_one(spark):
    got = _pairs(spark, [BASE, BASE])
    assert got == {(0, 1): 1.0}


def test_near_identical_docs_found_high_jaccard(spark):
    variant = BASE.replace("green", "blue")
    got = _pairs(spark, [BASE, variant])
    assert (0, 1) in got
    assert 0.5 <= got[(0, 1)] < 1.0


def test_disjoint_docs_not_near_dups(spark):
    other = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"
    got = _pairs(spark, [BASE, other], threshold=D.JACCARD_THRESHOLD)
    assert got == {}


def test_minhash_signature_is_per_doc_constant_width(spark):
    sig = D.minhash_signatures(_docs(spark, [BASE, BASE + " extra words here"]))
    rows = sig.collect()
    assert len(rows) == 2
    assert all(len(r) == 1 + D.N_PERM for r in rows)
    # identical prefix doc shares most minhash coords with its superset
    a, b = (sorted(rows, key=lambda r: r.doc_id))
    shared = sum(1 for i in range(D.N_PERM) if a[f"m{i}"] == b[f"m{i}"])
    assert shared >= D.N_PERM // 2


def test_simhash_identical_zero_hamming_disjoint_large(spark):
    other = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"
    docs = _docs(spark, [BASE, BASE, other])
    sigs = {
        r.doc_id: r.sig
        for r in docs.select(
            "doc_id", D.simhash("split(lower(text), ' ')").alias("sig")
        ).collect()
    }
    assert sigs[0] == sigs[1]
    ham = bin(sigs[0] ^ sigs[2]).count("1")
    assert ham > 6  # far beyond the near-dup threshold


def test_simhash_near_identical_small_hamming(spark):
    variant = BASE.replace("green", "blue")
    docs = _docs(spark, [BASE, variant])
    sigs = [
        r.sig
        for r in docs.select(
            "doc_id", D.simhash("split(lower(text), ' ')").alias("sig")
        ).orderBy("doc_id").collect()
    ]
    ham = bin(sigs[0] ^ sigs[1]).count("1")
    assert 0 < ham <= 16


def test_lsh_never_pairs_doc_with_itself_or_duplicates_pairs(spark):
    texts = [BASE, BASE, BASE.replace("fox", "cat"), "unrelated words entirely different content"]
    cand = D.lsh_candidate_pairs(_docs(spark, texts)).collect()
    seen = set()
    for r in cand:
        assert r.doc_a < r.doc_b
        assert (r.doc_a, r.doc_b) not in seen
        seen.add((r.doc_a, r.doc_b))


@pytest.mark.parametrize("text", ["", "one", "one two"])
def test_docs_shorter_than_shingle_width_produce_no_signature(spark, text):
    sig = D.minhash_signatures(_docs(spark, [text]))
    assert sig.count() == 0
