#!/usr/bin/env python
"""CLI for the cross-session artifact builder (llm/artifacts.py): land the
verified pair graph, shared-span relation, trained IVF quantizer, and token
spine as parquet artifacts a later job loads with ``load_all``/
``load_pairs``/... — or, with ``SPARK_GRAFT_ARTIFACT_DIR`` pointing at
``artifact_dir``, that every ``*_for_dir`` builder seeds from automatically.

Usage:
    python scripts/build_artifacts.py <sf_dir> <artifact_dir> [names...]

``names`` defaults to all five (verified_pairs shared_spans ivf_centroids
token_spine doc_signals). Exits non-zero on unknown names before any
Spark work.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    sf_dir, artifact_dir = sys.argv[1], sys.argv[2]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark_coding_challenge_spark.llm import artifacts as A

    builders = {
        A.PAIRS_NAME: A.materialize_pairs,
        A.SPANS_NAME: A.materialize_spans,
        A.CENTROIDS_NAME: A.materialize_ivf_centroids,
        A.SPINE_NAME: A.materialize_spine,
        A.SIGNALS_NAME: A.materialize_signals,
    }
    names = sys.argv[3:] or list(builders)
    unknown = [n for n in names if n not in builders]
    if unknown:
        print(f"unknown artifact names: {unknown}; choose from {list(builders)}",
              file=sys.stderr)
        raise SystemExit(2)

    from pyspark_coding_challenge_spark.session import get_spark

    spark = get_spark(app_name="build_artifacts")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        path = builders[n](spark, sf_dir, artifact_dir)
        print(f"{n}: {path}")
    spark.stop()


if __name__ == "__main__":
    main()
