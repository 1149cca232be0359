"""Property-based equivalence tests: the engine's composed operators vs
tiny brute-force Python references on adversarial inputs.

The oracle suite (test_oracle_queries.py) checks the fixtures; these check
the operator ALGEBRA — hypothesis-generated and hand-picked pathological
shapes (chains that punish O(diameter) propagation, equal-time as-of
ties, hot-key skew) that the fixtures may not contain.

Spark jobs cost ~0.5 s each, so hypothesis runs few, large examples
(max_examples is deliberately small; deadline disabled)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from hadoop_copier_spark.operators.asof import asof_join
from hadoop_copier_spark.operators.components import connected_components
from hadoop_copier_spark.operators.skew import salted_join

# ---------------------------------------------------------------------------
# connected components vs union-find


def _union_find_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min-label per component, matching connected_components' contract
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in parent}


def _cc_spark(spark, edges, nodes):
    edf = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:  # self-loop placeholder keeps the schema; harmless
        edf = edf.filter(F.lit(False))
    ndf = spark.createDataFrame([(n,) for n in nodes], "src long") if nodes else None
    out = connected_components(edf, nodes=ndf)
    return {r["node"]: r["comp"] for r in out.collect()}


def test_cc_long_chain_converges_in_log_rounds(spark):
    """A 200-node path graph: plain label propagation needs ~200 rounds;
    pointer jumping must land it well inside the 50-round cap — and get
    the single min-label component exactly right."""
    edges = [(i, i + 1) for i in range(200)]
    got = _cc_spark(spark, edges, nodes=range(201))
    assert got == {n: 0 for n in range(201)}


def test_cc_two_cliques_and_singletons(spark):
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    nodes = list(range(20))
    got = _cc_spark(spark, edges, nodes)
    assert got == _union_find_components(edges, nodes)


def test_cc_duplicate_and_self_edges(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 3), (4, 5), (5, 4)]
    nodes = [1, 2, 3, 4, 5, 6]
    got = _cc_spark(spark, edges, nodes)
    assert got == _union_find_components(edges, nodes)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)), min_size=0, max_size=120
    )
)
def test_cc_random_graphs_match_union_find(spark, edges):
    nodes = sorted({n for e in edges for n in e} | set(range(0, 41, 7)))
    got = _cc_spark(spark, edges, nodes)
    assert got == _union_find_components(edges, nodes)


# ---------------------------------------------------------------------------
# as-of join vs brute force


def _asof_brute(left_rows, right_rows):
    """(key, lt) x (key, rt, val): latest rt <= lt; ties -> max val."""
    out = {}
    for lk, lt in left_rows:
        cands = [
            (rt, val)
            for rk, rt, val in right_rows
            if rk == lk and rt <= lt
        ]
        out[(lk, lt)] = max(cands) if cands else None
    return out


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1,
        max_size=30,
        unique=True,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 9)),
        min_size=0,
        max_size=60,
        unique=True,
    ),
)
def test_asof_join_matches_brute_force(spark, left, right):
    ldf = spark.createDataFrame(left, "k long, lt long")
    rdf = spark.createDataFrame(right or [(0, 0, 0)], "k long, rt long, val long")
    if not right:
        rdf = rdf.filter(F.lit(False))
    got = asof_join(ldf, rdf, on="k", left_time="lt", right_time="rt",
                    tiebreak="val", how="left")
    expect = _asof_brute(left, right)
    rows = {(r["k"], r["lt"]): (r["rt"], r["val"]) if r["rt"] is not None else None
            for r in got.collect()}
    assert set(rows) == set(expect)
    for key, want in expect.items():
        assert rows[key] == want, (key, rows[key], want)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1,
        max_size=30,
        unique=True,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 9)),
        min_size=0,
        max_size=60,
        unique=True,
    ),
    lookback=st.integers(1, 60),
    width=st.integers(1, 80),
)
def test_asof_bucketed_matches_plain_lookback(spark, left, right, lookback, width):
    """Property form of the round-10 bucket claim, generalized in round 11
    to ANY positive width: for any frames and any (lookback L, width W) —
    including W < L, where the left side explodes over ceil(L/W)+1
    buckets — the bucketed plan returns EXACTLY the plain-lookback
    result, brute-forced here with the lookback filter applied, so both
    Spark paths are checked against ground truth."""
    ldf = spark.createDataFrame(left, "k long, lt long")
    rdf = spark.createDataFrame(right or [(0, 0, 0)], "k long, rt long, val long")
    if not right:
        rdf = rdf.filter(F.lit(False))
    kwargs = dict(on="k", left_time="lt", right_time="rt", tiebreak="val",
                  how="left", lookback=F.lit(lookback))
    plain = asof_join(ldf, rdf, **kwargs)
    bucketed = asof_join(ldf, rdf, bucket_width=float(width),
                         lookback_seconds=float(lookback), **kwargs)
    expect = {}
    for lk, lt in left:
        cands = [(rt, val) for rk, rt, val in right
                 if rk == lk and lt - lookback <= rt <= lt]
        expect[(lk, lt)] = max(cands) if cands else None
    for df in (plain, bucketed):
        rows = {(r["k"], r["lt"]): (r["rt"], r["val"]) if r["rt"] is not None else None
                for r in df.collect()}
        assert rows == expect


# ---------------------------------------------------------------------------
# salted join ≡ plain join (same rows, any salt fan-out)


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    big=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=0, max_size=50
    ),
    small=st.lists(
        st.tuples(st.integers(0, 4), st.text("ab", min_size=1, max_size=2)),
        min_size=0,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    n_salts=st.sampled_from([1, 3, 8]),
)
def test_salted_join_equivalent_to_plain_join(spark, big, small, n_salts):
    bdf = spark.createDataFrame(big or [(0, 0)], "key long, payload long")
    sdf = spark.createDataFrame(small or [(0, "a")], "key long, name string")
    if not big:
        bdf = bdf.filter(F.lit(False))
    if not small:
        sdf = sdf.filter(F.lit(False))
    got = sorted(
        tuple(r) for r in salted_join(bdf, sdf, "key", n_salts=n_salts).collect()
    )
    want = sorted(tuple(r) for r in bdf.join(sdf, "key").collect())
    assert got == want


# ---------------------------------------------------------------------------
# session_window vs gaps-and-islands reference (the round-1 boundary bug:
# an event at exactly prev_ts + gap MERGES — islands must break on >, not >=)


def _sessions_brute(ts_by_user, gap):
    out = {}
    for u, tss in ts_by_user.items():
        tss = sorted(tss)
        sessions = []
        start = prev = tss[0]
        count = 1
        for t in tss[1:]:
            if t - prev > gap:  # NOT >=: exact-gap events merge
                sessions.append((start, count))
                start, count = t, 0
            count += 1
            prev = t
        sessions.append((start, count))
        out[u] = sessions
    return out


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 7200)),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
def test_session_window_matches_islands_reference(spark, events):
    """Random event streams (including exact-gap collisions by
    construction: timestamps quantized to whole seconds over 2 h with a
    600 s gap) must sessionize identically to the brute-force islands
    scan."""
    gap = 600
    df = spark.createDataFrame(
        [(u, t) for u, t in events], "user_id long, sec long"
    ).select("user_id", F.timestamp_seconds("sec").alias("ts"), "sec")
    got = (
        df.groupBy(F.session_window("ts", f"{gap} seconds").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id", F.unix_timestamp("w.start").alias("start"), "n"
        )
        .collect()
    )
    by_user = {}
    for u, t in events:
        by_user.setdefault(u, []).append(t)
    want = {
        (u, start, n)
        for u, sess in _sessions_brute(by_user, gap).items()
        for start, n in sess
    }
    assert {(r["user_id"], r["start"], r["n"]) for r in got} == want


# ---------------------------------------------------------------------------
# merge_upsert vs dict semantics


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    base=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 9)),
        min_size=0,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    changes=st.lists(
        st.tuples(st.integers(0, 25), st.integers(10, 19)),
        min_size=0,
        max_size=15,
        unique_by=lambda t: t[0],
    ),
)
def test_merge_upsert_matches_dict_semantics(spark, base, changes):
    from hadoop_copier_spark.operators.merge import merge_upsert

    bdf = spark.createDataFrame(base or [(0, 0)], "k long, v long")
    cdf = spark.createDataFrame(changes or [(0, 0)], "k long, v long")
    if not base:
        bdf = bdf.filter(F.lit(False))
    if not changes:
        cdf = cdf.filter(F.lit(False))
    got = sorted(tuple(r) for r in merge_upsert(bdf, cdf, "k").collect())
    want = dict(base)
    want.update(dict(changes))
    assert got == sorted(want.items())


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40)),
        min_size=1,
        max_size=20,
        unique=True,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(0, 9)),
        min_size=0,
        max_size=40,
        unique=True,
    ),
    lookback=st.sampled_from([0, 3, 10]),
)
def test_asof_lookback_bounds_matches(spark, left, right, lookback):
    """The fan-out cap changes semantics EXACTLY at the window edge: a
    match at lt - lookback is kept (inclusive), anything older is dropped
    — equivalent to brute force over the filtered candidate set."""
    ldf = spark.createDataFrame(left, "k long, lt long")
    rdf = spark.createDataFrame(right or [(0, 0, 0)], "k long, rt long, val long")
    if not right:
        rdf = rdf.filter(F.lit(False))
    got = asof_join(ldf, rdf, on="k", left_time="lt", right_time="rt",
                    tiebreak="val", how="left", lookback=F.lit(lookback))
    rows = {(r["k"], r["lt"]): (r["rt"], r["val"]) if r["rt"] is not None else None
            for r in got.collect()}
    for lk, lt in left:
        cands = [(rt, v) for rk, rt, v in right
                 if rk == lk and lt - lookback <= rt <= lt]
        want = max(cands) if cands else None
        assert rows[(lk, lt)] == want, ((lk, lt), rows[(lk, lt)], want)


def test_theta_count_equals_q20_match_counts(spark, sf_smoke):
    """xh_theta_count is q20's per-row match cardinality: for every
    supplier, n_smaller must equal the number of q20 pairs where it is
    the greater side (and 0 for suppliers with no matches)."""
    from hadoop_copier_spark.queries import REGISTRY

    pairs = REGISTRY["q20"].fn(spark, sf_smoke).groupBy("k1").count().collect()
    by_k = {r["k1"]: r["count"] for r in pairs}
    got = REGISTRY["xh_theta_count"].fn(spark, sf_smoke).collect()
    assert got  # non-empty fixture
    for r in got:
        assert r["n_smaller"] == by_k.get(r["s_suppkey"], 0), r["s_suppkey"]


# ---------------------------------------------------------------------------
# scalable global prefix sum ≡ single-partition window cumsum (round 11)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 9),       # order key WITH ties (id breaks them)
            st.integers(-50, 50),    # value (negatives exercise offsets)
        ),
        min_size=0,
        max_size=60,
    ),
    descending=st.booleans(),
)
def test_global_prefix_sum_matches_brute_force(spark, rows, descending):
    """operators/prefix.global_prefix_sum must equal the plain running
    sum over the total order (order key + unique id tiebreak) for ANY
    data — including empty input, negative values, and both sort
    directions — while never planning a single-partition window."""
    from hadoop_copier_spark.operators.prefix import global_prefix_sum

    data = [(i, o, v) for i, (o, v) in enumerate(rows)]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(data or [(0, 0, 0)], 4),
        "id long, o long, v long",
    )
    if not data:
        df = df.filter(F.lit(False))
    order = [F.col("o").desc(), F.col("id")] if descending else [F.col("o"), F.col("id")]
    got = {
        r["id"]: r["cum"]
        for r in global_prefix_sum(df, "v", order, out_col="cum").collect()
    }
    key = (lambda t: (-t[1], t[0])) if descending else (lambda t: (t[1], t[0]))
    acc, expect = 0, {}
    for i, o, v in sorted(data, key=lambda t: key((t[0], t[1]))):
        acc += v
        expect[i] = acc
    assert got == expect


def test_prefix_operators_deterministic_across_repeated_actions(spark):
    """ADVICE r18 (low): the lazy localCheckpoint inside the prefix
    operators is only correct because the internal metadata collect is
    the FIRST job over the stamped frame and touches every partition,
    pinning the monotonically_increasing_id values. This pins the
    OBSERVABLE consequence: the returned frame (and its rank twin) must
    yield byte-identical results on every subsequent action — including
    partial-scan actions (limit) interleaved between full collects,
    which would corrupt the offsets if the checkpoint were ever left
    unmaterialized at return time."""
    from hadoop_copier_spark.operators.prefix import global_prefix_sum, grouped_rank

    df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(i, i % 7, (i * 37) % 23 - 11) for i in range(200)], 8
        ),
        "id long, g long, v long",
    )
    ps = global_prefix_sum(df, "v", [F.col("v"), F.col("id")], out_col="cum")
    first = sorted(tuple(r) for r in ps.collect())
    ps.limit(3).collect()  # partial-scan action between full collects
    assert sorted(tuple(r) for r in ps.collect()) == first
    assert sorted(tuple(r) for r in ps.collect()) == first

    rk = grouped_rank(df, ["g"], [F.col("v"), F.col("id")])
    first_rk = sorted(tuple(r) for r in rk.collect())
    rk.limit(3).collect()
    assert sorted(tuple(r) for r in rk.collect()) == first_rk


# ---------------------------------------------------------------------------
# bounded two-level grouped top-K ≡ per-group window row_number (round 11)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 1000)),
        min_size=0,
        max_size=80,
        unique=True,            # (group, value) unique => value unique per group
    ),
    k=st.sampled_from([1, 3, 10]),
    n_parts=st.sampled_from([1, 4, 16]),
)
def test_grouped_topk_matches_window_row_number(spark, rows, k, n_parts):
    """operators/topk.grouped_topk must produce exactly the rows and
    ranks of ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) <= K, for any
    data, K, and input partitioning — the bounded-state accumulator is a
    pure plan transformation of the window form."""
    from hadoop_copier_spark.operators.topk import grouped_topk

    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows or [(0, 0)], n_parts),
        "g long, v long",
    )
    if not rows:
        df = df.filter(F.lit(False))
    got = {
        (r["g"], r["v"]): r["rank"]
        for r in grouped_topk(df, "g", "v", k).collect()
    }
    expect = {}
    by_group = {}
    for g, v in rows:
        by_group.setdefault(g, []).append(v)
    for g, vs in by_group.items():
        for pos, v in enumerate(sorted(vs)[:k], start=1):
            expect[(g, v)] = pos
    assert got == expect


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 5)),  # values TIE heavily
        min_size=0,
        max_size=80,
    ),
    k=st.sampled_from([1, 3, 10]),
    n_parts=st.sampled_from([1, 4, 16]),
)
def test_grouped_topk_composite_key_matches_window_with_ties(
    spark, rows, k, n_parts
):
    """Tie-safe composite-key form (round 12, VERDICT r11 #6): with a
    unique tiebreak column, grouped_topk(g, v, k, tiebreak_col=t) must
    equal ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, t) <= K for any
    data — including heavy value ties — K, and input partitioning."""
    from hadoop_copier_spark.operators.topk import grouped_topk

    tagged = [(g, v, i) for i, (g, v) in enumerate(rows)]  # i = unique id
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(tagged or [(0, 0, 0)], n_parts),
        "g long, v long, t long",
    )
    if not tagged:
        df = df.filter(F.lit(False))
    got = {
        (r["g"], r["v"], r["t"]): r["rank"]
        for r in grouped_topk(df, "g", "v", k, tiebreak_col="t").collect()
    }
    expect = {}
    by_group = {}
    for g, v, t in tagged:
        by_group.setdefault(g, []).append((v, t))
    for g, vts in by_group.items():
        for pos, (v, t) in enumerate(sorted(vts)[:k], start=1):
            expect[(g, v, t)] = pos
    assert got == expect


# ---------------------------------------------------------------------------
# keyed range-partitioned rank fix-up ≡ per-group window row_number (round 12)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        # group key may be NULL: ROW_NUMBER() OVER (PARTITION BY g) treats
        # the NULL group as a real partition, so grouped_rank must too
        # (None-safe driver sort + eqNullSafe offset join).
        st.tuples(
            st.one_of(st.none(), st.integers(0, 3)), st.integers(0, 1000)
        ),
        min_size=0,
        max_size=80,
        unique=True,            # (group, value) unique => total order per group
    ),
    n_parts=st.sampled_from([1, 4, 16]),
)
def test_grouped_rank_matches_window_row_number(spark, rows, n_parts):
    """operators/prefix.grouped_rank must equal ROW_NUMBER() OVER
    (PARTITION BY g ORDER BY v) for any data and any input partitioning —
    the range-repartition + per-(pid, group) offset fix-up is a pure plan
    transformation of the skew-prone per-group window sort. Includes
    NULL group keys (a valid window partition)."""
    from hadoop_copier_spark.operators.prefix import grouped_rank

    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows or [(0, 0)], n_parts),
        "g long, v long",
    )
    if not rows:
        df = df.filter(F.lit(False))
    got = {
        (r["g"], r["v"]): r["rk"]
        for r in grouped_rank(df, ["g"], ["v"]).collect()
    }
    expect = {}
    by_group = {}
    for g, v in rows:
        by_group.setdefault(g, []).append(v)
    for g, vs in by_group.items():
        for pos, v in enumerate(sorted(vs), start=1):
            expect[(g, v)] = pos
    assert got == expect


def test_grouped_rank_skewed_group_spans_partitions(spark):
    """One group holds 90% of the rows across many input partitions —
    the regime where a per-group window sort funnels into one task. The
    fix-up must still rank it exactly, and its rows must genuinely span
    multiple range partitions (the scale claim, asserted on __pid before
    the projection drops it)."""
    from hadoop_copier_spark.operators.prefix import grouped_rank

    rows = [("big", i) for i in range(900)] + [
        (f"s{i % 5}", 10_000 + i) for i in range(100)
    ]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 16), "g string, v long"
    )
    out = grouped_rank(df, ["g"], ["v"]).collect()
    big = sorted((r["v"], r["rk"]) for r in out if r["g"] == "big")
    assert [rk for _, rk in big] == list(range(1, 901))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    assert n_parts > 1  # the claim below is vacuous on a 1-partition config
    # Rebuild the operator's range layout and count the physical
    # partitions the skewed group lands in: > 1 means the big group is
    # genuinely split, i.e. no single-task sort exists in the plan.
    span = (
        df.repartitionByRange(n_parts, "g", "v")
        .withColumn("__spid", F.spark_partition_id())
        .filter(F.col("g") == "big")
        .select(F.count_distinct("__spid").alias("c"))
        .collect()[0]["c"]
    )
    assert span > 1, "skewed group collapsed into a single range partition"


def test_grouped_rank_null_group_keys(spark):
    """A NULL group key is a real window partition: NULL-group rows must
    be ranked among themselves (1..n), never dropped (the NULL-rejecting
    equi-join failure mode) nor crash the driver-side offset sort (the
    None-vs-str TypeError failure mode). Mixed None/str keys exercise
    both."""
    from hadoop_copier_spark.operators.prefix import grouped_rank

    rows = [(None, i) for i in range(7)] + [("a", 10), ("a", 11), ("b", 12)]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), "g string, v long"
    )
    out = grouped_rank(df, ["g"], ["v"]).collect()
    assert len(out) == len(rows), "NULL-group rows were dropped"
    got = {(r["g"], r["v"]): r["rk"] for r in out}
    for i in range(7):
        assert got[(None, i)] == i + 1
    assert got[("a", 10)] == 1 and got[("a", 11)] == 2 and got[("b", 12)] == 1


# ---------------------------------------------------------------------------
# winnowing fingerprints ≡ brute-force reference on arbitrary corpora (r12)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=12),
        min_size=1,
        max_size=8,
    ),
    n_parts=st.sampled_from([1, 4]),
)
def test_winnow_fingerprint_matches_reference_on_random_corpora(
    spark, tmp_path_factory, docs, n_parts
):
    """For ANY corpus and input partitioning, the registry operator's
    (n_fps, n_shared_fps) must equal a pure-Python winnowing
    re-derivation — tiny alphabet + short docs maximize dup-gram and
    window-tie density, the regimes where an off-by-one in the window
    frame or the sub-window rule would show."""
    import hashlib
    import shutil

    from hadoop_copier_spark.queries import REGISTRY

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def ref_fps(toks, k=3, w=4):
        if len(toks) < k:
            grams = [" ".join(toks)]
        else:
            grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = [h60(g) for g in grams]
        eff = min(w, len(hs))
        return {
            min(hs[max(0, i - w + 1) : i + 1]) for i in range(eff - 1, len(hs))
        }

    rows = [(i, " ".join(t), "en", "s", 0) for i, t in enumerate(docs)]
    root = tmp_path_factory.mktemp("winnow_prop")
    tmp = str(root)
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_parts),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    try:
        got = {
            r["doc_id"]: (r["n_fps"], r["n_shared_fps"])
            for r in REGISTRY["xh_winnow_fingerprint"].fn(spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    fps = {i: ref_fps(t) for i, t in enumerate(docs)}
    owners = {}
    for i, s_ in fps.items():
        for fp in s_:
            owners.setdefault(fp, set()).add(i)
    expect = {
        i: (len(s_), sum(1 for fp in s_ if len(owners[fp]) >= 2))
        for i, s_ in fps.items()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# round-13 text ops ≡ brute-force Python references on arbitrary corpora


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["ab", "abc", "x", "qzr", "abab"]),
            min_size=0,
            max_size=8,
        ),
        min_size=0,
        max_size=6,
    )
)
def test_bpe_merge_step_matches_bruteforce(spark, docs, tmp_path_factory):
    """xh_bpe_merge_step's top pairs must equal a character-level Python
    recount for ANY corpus — including empty docs, 1-char tokens (no
    pairs) and repeated substrings (overlapping pairs count per
    position, the BPE convention)."""
    import collections
    import os

    from hadoop_copier_spark.queries import REGISTRY

    rows = [
        (i, " ".join(toks), "en", "s", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    d = str(tmp_path_factory.mktemp("bpe"))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows or [(0, "", "en", "s", 0)], 2),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = [
        (r["pair"], r["n"])
        for r in REGISTRY["xh_bpe_merge_step"].fn(spark, d).collect()
    ]
    expect = collections.Counter()
    for _i, toks in enumerate(docs):
        for t in toks:
            t = t.lower()
            for j in range(len(t) - 1):
                expect[t[j:j + 2]] += 1
    want = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == want, (got, want)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=7),
        min_size=0,
        max_size=5,
    )
)
def test_cooccurrence_window_matches_bruteforce(spark, docs, tmp_path_factory):
    """xh_cooccurrence_window's (center, context) counts must equal the
    Python forward-window-2 recount for ANY corpus — short docs (no
    pairs), repeated tokens (each position pairs independently) and
    window truncation at document ends."""
    import collections
    import os

    from hadoop_copier_spark.queries import REGISTRY

    rows = [
        (i, " ".join(toks), "en", "s", 1) for i, toks in enumerate(docs)
    ]
    d = str(tmp_path_factory.mktemp("cooc"))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows or [(0, "", "en", "s", 0)], 2),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = [
        (r["w1"], r["w2"], r["n"])
        for r in REGISTRY["xh_cooccurrence_window"].fn(spark, d).collect()
    ]
    expect = collections.Counter()
    for toks in docs:
        for i, w in enumerate(toks):
            for off in (1, 2):
                if i + off < len(toks):
                    expect[(w, toks[i + off])] += 1
    want = sorted(
        ((w1, w2, n) for (w1, w2), n in expect.items()),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:30]
    assert got == want, (got, want)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "rare1", "rare2"]),
                 min_size=1, max_size=10),
        min_size=1,
        max_size=6,
    )
)
def test_unigram_surprisal_matches_bruteforce_bits(spark, docs, tmp_path_factory):
    """xh_unigram_surprisal's integer surprisal must equal the Python
    recount — bits(token) = bitlength(N // count) — for ANY corpus, and
    must be MONOTONE in rarity: a token's bits never decrease when its
    corpus count decreases (the property that makes it a quality
    signal)."""
    import collections
    import os

    from hadoop_copier_spark.queries import REGISTRY

    rows = [(i, " ".join(toks), "en", "s", 1) for i, toks in enumerate(docs)]
    d = str(tmp_path_factory.mktemp("surp"))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_tokens"], r["sum_bits"], r["mean_bits_ppm"])
        for r in REGISTRY["xh_unigram_surprisal"].fn(spark, d).collect()
    }
    cnt = collections.Counter(t for toks in docs for t in toks)
    total = sum(cnt.values())

    def bits(tok):
        return (total // cnt[tok]).bit_length()

    for i, toks in enumerate(docs):
        n, sb = len(toks), sum(bits(t) for t in toks)
        assert got[i] == (n, sb, sb * 1_000_000 // n), (i, got[i])
    # rarity monotonicity across this corpus's tokens
    by_count = sorted(cnt.items(), key=lambda kv: kv[1])
    for (t1, c1), (t2, c2) in zip(by_count, by_count[1:]):
        if c1 < c2:
            assert bits(t1) >= bits(t2)
