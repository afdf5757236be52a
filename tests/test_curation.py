"""Semantic tests for corpus curation's cluster audit: the iterative
connected-components operator (consolidated in llm/dedup.py, shared by
curation's cluster section and the dedup_clusters slug) must produce
transitive closures — the property the greedy pair policy cannot, and the
one the DuckDB recursive-CTE oracle checks only end-to-end."""

from __future__ import annotations

from pyspark_coding_challenge_spark.llm.curation import connected_components

PAIR_SCHEMA = "doc_a BIGINT, doc_b BIGINT"


def _components(spark, pairs):
    df = spark.createDataFrame(pairs, schema=PAIR_SCHEMA)
    return {
        r.node: r.label for r in connected_components(df).collect()
    }


def test_chain_collapses_to_one_component_across_iterations(spark):
    # Diameter-4 path: hash-min needs several propagation rounds, so this
    # exercises the fixpoint loop, not just the first hop.
    got = _components(spark, [(5, 6), (6, 7), (7, 8), (8, 9)])
    assert got == {v: 5 for v in (5, 6, 7, 8, 9)}


def test_disjoint_components_keep_distinct_labels(spark):
    got = _components(spark, [(1, 2), (2, 3), (10, 11), (20, 21)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_cycle_and_duplicate_edges_converge(spark):
    got = _components(spark, [(1, 2), (2, 3), (3, 1), (1, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_transitivity_beats_greedy_pair_policy(spark):
    # Greedy drop-doc_b on pairs (1,2),(2,3) removes 2 and 3 separately and
    # never records that 1 and 3 are linked; components must.
    got = _components(spark, [(1, 2), (2, 3)])
    assert got[1] == got[3] == 1


def test_empty_pair_set_yields_empty_result(spark):
    empty = spark.createDataFrame([], schema=PAIR_SCHEMA)
    assert connected_components(empty).count() == 0
