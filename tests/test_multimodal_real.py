"""End-to-end REAL image decode through the production pipeline shape
(r5 verdict gap #3 / next-round item #4): real encoded bytes -> Arrow batch
-> PIL decode inside ``mapInPandas`` -> typed metadata rows, with the
corrupt-payload quarantine exercised in the same run.

Skipped wholesale when PIL is absent (this container ships no codec); the
registered slugs keep the deterministic fake decoder as the oracle path
either way."""

from __future__ import annotations

import io

import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from pyspark_coding_challenge_spark.llm.multimodal import (  # noqa: E402
    multimodal_decode_meta_real,
)


def _png_bytes(w: int, h: int, mode: str = "RGB") -> bytes:
    buf = io.BytesIO()
    Image.new(mode, (w, h), color=0).save(buf, format="PNG")
    return buf.getvalue()


def test_real_decode_end_to_end_with_quarantine(spark):
    rows = [
        (1, _png_bytes(17, 9)),
        (2, _png_bytes(3, 200, mode="L")),
        (3, _png_bytes(64, 64, mode="RGBA")),
        (4, b"\x89PNG\r\n\x1a\nthis is not a real png body"),  # corrupt
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, payload BINARY")
    got = {r.doc_id: r for r in multimodal_decode_meta_real(df).collect()}

    assert (got[1].fake_width, got[1].fake_height, got[1].channels) == (17, 9, 3)
    assert (got[2].fake_width, got[2].fake_height, got[2].channels) == (3, 200, 1)
    assert (got[3].fake_width, got[3].fake_height, got[3].channels) == (64, 64, 4)
    # corrupt payload is quarantined per-row, never aborts the task
    assert (got[4].fake_width, got[4].fake_height, got[4].channels) == (-1, -1, 0)
    assert got[4].n_bytes == len(rows[3][1])


def test_real_decode_plan_is_arrow_batched(spark):
    df = spark.createDataFrame([(1, _png_bytes(4, 4))], "doc_id BIGINT, payload BINARY")
    plan = (
        multimodal_decode_meta_real(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_real_decode_null_payload_is_quarantined(spark):
    """NULL payload rows must quarantine like corrupt ones, not abort the
    task (review finding r6) — the kernel null-guards its own input since
    it accepts arbitrary relations."""
    df = spark.createDataFrame(
        [(1, None), (2, _png_bytes(5, 5))], "doc_id BIGINT, payload BINARY"
    )
    got = {r.doc_id: r for r in multimodal_decode_meta_real(df).collect()}
    assert (got[1].n_bytes, got[1].first_byte, got[1].channels) == (0, -1, 0)
    assert (got[2].fake_width, got[2].fake_height) == (5, 5)
