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


def test_source_quantile_cut_keeps_top_fraction_per_source(spark, tmp_path):
    """Rank-based 75% cut: with 4 docs in a source, exactly ranks 1-3 keep
    (3*10000 <= 7500*4 but 4*10000 > 7500*4); stratification means a
    low-diversity source still keeps its own top docs."""
    from pyspark_coding_challenge_spark.llm.curation import source_quantile_cut

    rows = [
        # source A: descending lexical diversity 1.0, 0.75, 0.5, 0.25
        (1, "a b c d", "A", 0), (2, "a a b c", "A", 0),
        (3, "a a b b", "A", 0), (4, "a a a b", "A", 0),
        # source B: uniformly low diversity — still keeps its top 3 of 4
        (5, "x x x y", "B", 0), (6, "x x y x", "B", 0),
        (7, "y x x x", "B", 0), (8, "x y x x", "B", 0),
        # source C: singleton — the ceiling rule must keep it (a floor rule
        # keeps ceil->0 and silently erases every new/small source)
        (9, "q q q q", "C", 0),
    ]
    df = spark.createDataFrame(
        [(d, t, "en", s, n) for d, t, s, n in rows],
        schema="doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r.doc_id: r for r in source_quantile_cut(spark, str(tmp_path)).collect()}
    assert [got[d].src_rank for d in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert [got[d].keep for d in (1, 2, 3, 4)] == [1, 1, 1, 0]
    # source B: all lex_div equal (0.5) -> rank by doc_id; 5,6,7 keep
    assert [got[d].keep for d in (5, 6, 7, 8)] == [1, 1, 1, 0]
    # singleton source keeps its only doc
    assert (got[9].src_rank, got[9].n_source, got[9].keep) == (1, 1, 1)


def test_source_quantile_cut_null_text_ranks_last(spark, tmp_path):
    """r8 review finding (latent): a NULL text yields a NULL lexical
    diversity, which must rank LAST within its source (both engines'
    DESC NULLS LAST) — and the range shard must stay monotone with that
    order (an unfixed NULL predicate dropped the row into shard 0,
    shifting every other doc's rank by one). lex_div stays NULL in the
    output, matching the oracle."""
    from pyspark_coding_challenge_spark.llm.curation import source_quantile_cut
    from pyspark_coding_challenge_spark.llm.text import (
        clear_doc_signals_cache,
    )

    rows = [
        (1, "a b c d", "A", 0), (2, "a a b c", "A", 0),
        (3, None, "A", 0),      # NULL text — must rank 4th of 4
        (4, "a a b b", "A", 0),
    ]
    df = spark.createDataFrame(
        [(d, t, "en", s, n) for d, t, s, n in rows],
        schema="doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    clear_doc_signals_cache(spark)
    got = {r.doc_id: r for r in source_quantile_cut(spark, str(tmp_path)).collect()}
    assert [got[d].src_rank for d in (1, 2, 4, 3)] == [1, 2, 3, 4]
    assert got[3].lex_div is None
    assert [got[d].keep for d in (1, 2, 4, 3)] == [1, 1, 1, 0]
    clear_doc_signals_cache(spark)
