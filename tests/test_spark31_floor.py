"""Spark 3.1 API-floor lint for the parity modules (r12 judge item #6).

BASELINE.md's round-12 note closed the Spark 3.x parity pin as a documented
API audit (floor: Spark 3.1) because this container cannot install a 3.x
venv. That audit was prose; nothing prevented a 3.2+/4.x-only API from
creeping into the audited modules unnoticed. This test turns the audit
into a gate: the six golden-suite parity modules are AST-scanned against a
maintained denylist of symbols introduced AFTER Spark 3.1 (plus the two
string-borne markers — the TIMESTAMP_NTZ type name and the
``nanosAsLong`` legacy conf — which appear as literals, not attributes).

``sources/readers.py`` is deliberately NOT covered: its
``canonicalize_ts`` shim is the audited, documented 3.3/3.4+ surface
(inert on classic TIMESTAMP parquet), per the BASELINE.md note.

The denylist is not exhaustive (nothing short of a real 3.1 venv is); it
covers the API families a Spark-4-era author would plausibly reach for.
Maintained: add entries when new post-3.1 APIs become habits.
"""

from __future__ import annotations

import ast
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "pyspark_coding_challenge_spark")

# the six audited parity modules (BASELINE.md round-12 note)
PARITY_MODULES = [
    "operators/actions.py",
    "operators/impressions.py",
    "operators/history.py",
    "operators/asof.py",
    "plans/training.py",
    "functions/arrays.py",
]

# symbols (pyspark.sql.functions members, DataFrame/GroupedData methods,
# type names) that do NOT exist in Spark 3.1 — version noted per entry
POST_31_SYMBOLS = {
    # 3.4
    "array_insert", "array_append", "array_compact", "melt", "unpivot",
    "applyInArrow", "TimestampNTZType",
    # 3.5
    "array_prepend", "any_value", "array_agg", "equal_null",
    "call_function", "first_value", "last_value", "to_varchar",
    "try_sum", "try_avg", "try_element_at", "try_add", "try_divide",
    "try_multiply", "try_subtract", "dropDuplicatesWithinWatermark",
    "approx_percentile", "ifnull", "isnotnull", "nullif", "nvl", "nvl2",
    # 4.x
    "parse_json", "try_parse_json", "VariantType", "to_variant_object",
    "variant_get", "transpose", "listagg", "randstr", "uniform",
    "dayname", "monthname", "is_variant_null", "schema_of_variant",
}

# markers that land as STRING literals, not attributes (case-insensitive
# substring match): the 3.4+ NTZ type name in casts/schemas and the 3.3+
# legacy nanos conf
POST_31_STRING_MARKERS = ("timestamp_ntz", "nanosaslong")


def _post_31_uses(source: str) -> list[str]:
    """Every post-3.1 symbol or string marker used in ``source`` —
    attributes (``F.array_insert``), bare names, call targets, and string
    constants; docstrings/comments never flag (AST sees code, and module/
    function docstrings are excluded from the constant scan by position)."""
    tree = ast.parse(source)
    hits: list[str] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Attribute) and node.attr in POST_31_SYMBOLS:
            hits.append(node.attr)
        elif isinstance(node, ast.Name) and node.id in POST_31_SYMBOLS:
            hits.append(node.id)
        elif isinstance(node, ast.Constant) and isinstance(node.value, str):
            low = node.value.lower()
            hits.extend(m for m in POST_31_STRING_MARKERS if m in low)
    # drop docstring false positives: a docstring is an Expr-statement
    # string at the head of a module/class/function body — re-scan without
    # them by comparing against the set found inside docstrings only
    doc_hits: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.Module, ast.ClassDef, ast.FunctionDef,
                             ast.AsyncFunctionDef)):
            doc = ast.get_docstring(node, clean=False)
            if doc:
                low = doc.lower()
                doc_hits.update(m for m in POST_31_STRING_MARKERS if m in low)
    return [h for h in hits if h not in doc_hits]


@pytest.mark.parametrize("rel", PARITY_MODULES)
def test_parity_module_stays_on_spark_31_apis(rel):
    path = os.path.join(PKG, rel)
    with open(path) as f:
        src = f.read()
    hits = _post_31_uses(src)
    assert hits == [], (
        f"{rel} uses post-Spark-3.1 API(s) {sorted(set(hits))} — the "
        "golden-suite parity modules are pinned to the 3.1 floor "
        "(BASELINE.md round-12 audit); rework with 3.1-era primitives "
        "or re-open the audit"
    )


def test_linter_flags_post_31_symbols():
    """The gate must be RED-capable: a module using a 4.x-only function,
    a 3.4 DataFrame method, or the NTZ type string is flagged; 3.1-era
    code is not. Docstrings citing the markers never flag."""
    assert _post_31_uses(
        "import pyspark.sql.functions as F\n"
        "x = F.array_insert(F.col('a'), 1, F.lit(0))\n"
    ) == ["array_insert"]
    assert _post_31_uses("df = df.unpivot('a', ['b'], 'k', 'v')\n") == ["unpivot"]
    assert _post_31_uses("y = col.cast('timestamp_ntz')\n") == ["timestamp_ntz"]
    assert _post_31_uses(
        "spark.conf.set('spark.sql.legacy.parquet.nanosAsLong', 'true')\n"
    ) == ["nanosaslong"]
    assert _post_31_uses(
        "def f():\n"
        "    '''handles TIMESTAMP_NTZ parquet via the reader shim'''\n"
        "    return 1\n"
    ) == []
    assert _post_31_uses(
        "import pyspark.sql.functions as F\n"
        "z = F.array_sort(F.col('a'))\n"  # 2.4 — allowed
    ) == []
