"""Differential oracle tests: every H-class declared query must match DuckDB
exactly at sf0.01 (mirrors the driver's t2 gate)."""

import pytest

from hadoop_copier_spark.queries import REGISTRY
from hadoop_copier_spark.testing import compare

# "alias" entries are the driver-window re-pointing (queries/aliases.py):
# same Query objects under sort-first names — skip them here or every
# aliased compare would run twice.
H_QUERIES = sorted(
    name for name, q in REGISTRY.items() if q.oracle and "alias" not in q.tags
)
P_QUERIES = sorted(
    name for name, q in REGISTRY.items() if not q.oracle and "alias" not in q.tags
)


@pytest.mark.parametrize("name", H_QUERIES)
def test_hash_matches_oracle(name, spark, sf_oracle, duck):
    q = REGISTRY[name]
    problems = compare(q.fn, q.oracle, spark, sf_oracle, con=duck)
    assert not problems, f"{name}: " + "\n".join(problems)


@pytest.mark.parametrize("name", P_QUERIES)
def test_p_query_runs(name, spark, sf_oracle):
    q = REGISTRY[name]
    df = q.fn(spark, sf_oracle)
    assert df.count() >= 0


def test_alias_window_fidelity():
    """The driver window (alphabetically-first 50 registry names) must be
    exactly the rotation aliases, each binding the IDENTICAL fn and oracle
    objects as its ledgered target (queries/aliases.py)."""
    from hadoop_copier_spark.queries.aliases import LEDGER as ledger, _alias_name

    assert len(ledger) == 50
    aliases = {n for n, q in REGISTRY.items() if "alias" in q.tags}
    window = set(sorted(REGISTRY)[:50])
    assert window == aliases == {_alias_name(t) for t in ledger}
    for target in ledger:
        alias = REGISTRY[_alias_name(target)]
        assert alias.fn is REGISTRY[target].fn
        assert alias.oracle is REGISTRY[target].oracle
