"""Every registered slug vs its DuckDB oracle at sf0.001 — the same
comparison the driver's CORRECTNESS gate runs at sf0.01, kept fast enough for
the inner dev loop. Slugs without an oracle get a rows-only smoke check."""

from __future__ import annotations

import pytest

from pyspark_coding_challenge_spark import registry
from tests.oracle import assert_matches_oracle

SF_DIR = "/root/testdata/sf0.001"

_SLUGS = sorted(registry.queries())


@pytest.mark.parametrize("slug", _SLUGS)
def test_slug_matches_oracle(spark, slug):
    fn = registry.queries()[slug]
    sql = registry.oracle_sql().get(slug)
    # As of round 3 every slug has an oracle (the md5-fold hash and the
    # relational IVF training closed the last three gaps). A new no-oracle
    # slug fails here by default: rows-only checks are vacuous (round-2
    # verdict), so either write the oracle or add an explicit invariant
    # validator for the slug in this test.
    assert sql is not None, f"{slug}: no oracle registered — write one"
    assert_matches_oracle(fn(spark, SF_DIR), sql, SF_DIR)


def test_registry_holds_exactly_fifty_slugs():
    """The driver's correctness gate records at most 50 slugs; a 51st would
    silently fall outside the window (new capability -> merge it as a
    section of an existing slug, see plans/merge.py)."""
    assert len(_SLUGS) == 50, f"{len(_SLUGS)} slugs registered"


def test_every_query_output_is_driver_hashable(spark):
    """No registered query may emit array/struct/map columns — the driver's
    pandas canonicalizer crashes on non-scalar cells (the r1 failure)."""
    bad = {}
    for slug, fn in registry.queries().items():
        df = fn(spark, SF_DIR)
        nonscalar = [
            f.name for f in df.schema.fields
            if f.dataType.typeName() in ("array", "struct", "map")
        ]
        if nonscalar:
            bad[slug] = nonscalar
    assert not bad, f"non-scalar outputs would crash the driver gate: {bad}"
