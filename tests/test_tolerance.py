"""T-class (numeric tolerance) and P-class (property) checks that are not
part of the hash contract (SURVEY §2b verification classes)."""

import math

from hadoop_copier_spark.queries import REGISTRY


def _rows_by_key(rows, key_idx=0):
    return {r[key_idx]: r for r in rows}


def test_stddev_corr_tolerance(spark, sf_oracle, duck):
    spark_rows = REGISTRY["xt_stddev_corr"].fn(spark, sf_oracle).collect()
    duck_rows = duck.execute(
        """SELECT l_returnflag,
                  stddev_pop(l_extendedprice) AS sd_pop,
                  stddev_samp(l_extendedprice) AS sd_samp,
                  var_pop(l_extendedprice) AS var_pop,
                  corr(l_quantity, l_extendedprice) AS corr_qp
           FROM lineitem GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    s, d = _rows_by_key([tuple(r) for r in spark_rows]), _rows_by_key(duck_rows)
    assert set(s) == set(d)
    for k in s:
        for a, b in zip(s[k][1:], d[k][1:]):
            assert math.isfinite(a) and math.isfinite(b)
            assert abs(a - b) <= 1e-6 * max(abs(a), abs(b), 1e-12), (k, a, b)


def test_approx_sketches_within_5pct(spark, sf_oracle):
    apx = {r["l_returnflag"]: r for r in REGISTRY["xp_approx_sketches"].fn(spark, sf_oracle).collect()}
    exact = {r["l_returnflag"]: r for r in REGISTRY["q26"].fn(spark, sf_oracle).collect()}
    med = {r["l_returnflag"]: r for r in REGISTRY["q33"].fn(spark, sf_oracle).collect()}
    for k in exact:
        assert abs(apx[k]["apx_nd_part"] - exact[k]["nd_part"]) <= 0.05 * exact[k]["nd_part"]
        assert abs(float(apx[k]["apx_p50"]) - float(med[k]["p50"])) <= 0.05 * max(float(med[k]["p50"]), 1.0)


def test_uuid_keys_unique_and_formatted(spark, sf_oracle):
    import re

    rows = REGISTRY["xp_uuid_keys"].fn(spark, sf_oracle).collect()
    ids = [r["request_id"] for r in rows]
    assert len(ids) == len(set(ids))
    pat = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")
    for u in ids:
        assert pat.match(u), u


def test_exact_dedup_idempotent(spark, sf_oracle):
    """SURVEY §5.2 item 4: dedup applied to its own output is a no-op."""
    from hadoop_copier_spark.queries.base import tbl
    from pyspark.sql import functions as F

    d = tbl(spark, sf_oracle, "documents")
    once = d.dropDuplicates(["text"]).select("text")
    twice = once.dropDuplicates(["text"])
    assert once.count() == twice.count()
    # and the keep-min-id formulation is stable too
    q56 = REGISTRY["q56"].fn(spark, sf_oracle)
    again = REGISTRY["q56"].fn(spark, sf_oracle)
    assert sorted(map(tuple, q56.collect())) == sorted(map(tuple, again.collect()))
