"""Pins for hadoop_copier_spark.memo — the memoized-cache registry the
bench's warm pass and gate retries depend on (ADVICE r16 medium: a gate
retry must be able to clear exactly the caches the offender fronts, or
a regression in a cached stage is silently cleared by a warm re-run)."""

from hadoop_copier_spark.memo import clear_memoized_caches, consumed_caches
from hadoop_copier_spark.operators import similarity
from hadoop_copier_spark.queries import REGISTRY, graph_ops, tpch_analogs


def test_registry_names_every_known_cache():
    counts = clear_memoized_caches()
    assert set(counts) == {"graph_edges", "tpch_probes", "hardneg_probe"}


def test_clear_only_touches_named_cache():
    graph_ops._EDGE_CACHE["k"] = "v"
    tpch_analogs._PROBE_CACHE["k"] = 1
    similarity._HARDNEG_PROBE_CACHE["k"] = (1, 1)
    try:
        out = clear_memoized_caches(only=("graph_edges",))
        assert out == {"graph_edges": 1}
        assert not graph_ops._EDGE_CACHE
        assert tpch_analogs._PROBE_CACHE and similarity._HARDNEG_PROBE_CACHE
    finally:
        clear_memoized_caches()


def test_consumed_caches_covers_every_cache_using_query():
    """Every registry query whose module owns a cache must be mapped to
    it, and the sole hardneg consumer must resolve by name — if a new
    cache-consuming family appears without a consumed_caches rule, the
    bench would retry it against a baseline that measured more work."""
    by_cache = {}
    for name, q in REGISTRY.items():
        if "alias" in q.tags:
            continue
        for c in consumed_caches(q.fn):
            by_cache.setdefault(c, []).append(name)
    assert "xh_bfs_hops" in by_cache["graph_edges"]
    assert "xh_hard_negatives" in by_cache["hardneg_probe"]
    assert len(by_cache["hardneg_probe"]) == 1
    assert by_cache["tpch_probes"]  # the tpch analog family
    # module-rule sanity: nothing outside the owning modules claims a cache
    for name in by_cache["graph_edges"]:
        assert REGISTRY[name].fn.__module__.endswith("queries.graph_ops")


def test_every_module_level_cache_is_registered():
    """Staleness guard: any module-level ``*_CACHE`` dict added anywhere
    in the package MUST be wired into memo._caches(), or the bench's
    warm pass / gate retries silently measure less work than baselines
    for whatever new family memoizes state (the exact ADVICE r16 hole,
    kept closed structurally)."""
    import importlib
    import pkgutil

    import hadoop_copier_spark as pkg
    from hadoop_copier_spark.memo import _caches

    registered = {id(c) for c in _caches().values()}
    unregistered = []
    for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        mod = importlib.import_module(m.name)
        for attr in dir(mod):
            if attr.endswith("_CACHE") and isinstance(getattr(mod, attr), dict):
                if id(getattr(mod, attr)) not in registered:
                    unregistered.append(f"{m.name}.{attr}")
    assert not unregistered, (
        f"module-level caches missing from memo._caches(): {unregistered}"
    )


def test_clear_then_rebuild_is_lazy(spark, sf_smoke):
    """Clearing the edge cache mid-session must be safe: next consumer
    rebuilds lazily and returns the same rows."""
    before = graph_ops._weighted_edges(spark, sf_smoke).count()
    cleared = clear_memoized_caches(only=("graph_edges",))
    assert cleared["graph_edges"] >= 1
    after = graph_ops._weighted_edges(spark, sf_smoke).count()
    assert before == after


def test_per_key_eviction_only_removes_own_keys():
    """ADVICE r17: tpch_probes holds one entry per (session, sf_dir,
    site), each built by the FIRST query using that site — whole-cache
    clears keyed on one fronter per cache NAME let a later site-builder's
    warm re-run measure less work than its first run. The per-key
    protocol: snapshot diffs attribute keys to their builder, and
    eviction removes exactly those — other queries' keys survive."""
    from hadoop_copier_spark.memo import (
        clear_memoized_caches,
        evict_cache_keys,
        snapshot_cache_keys,
    )

    clear_memoized_caches()
    try:
        pre = snapshot_cache_keys()
        tpch_analogs._PROBE_CACHE[("app", "sf", "site_a")] = 1
        tpch_analogs._PROBE_CACHE[("app", "sf", "site_b")] = 2
        mid = snapshot_cache_keys()
        built_q1 = {c: mid[c] - pre[c] for c in mid if mid[c] - pre[c]}
        assert built_q1 == {
            "tpch_probes": {("app", "sf", "site_a"), ("app", "sf", "site_b")}
        }
        # a second query builds a third site + an unrelated cache entry
        tpch_analogs._PROBE_CACHE[("app", "sf", "site_c")] = 3
        graph_ops._EDGE_CACHE[("app", "sf")] = "edges"
        post = snapshot_cache_keys()
        built_q2 = {c: post[c] - mid[c] for c in post if post[c] - mid[c]}

        # q2's warm re-run evicts ONLY its own keys
        out = evict_cache_keys(built_q2)
        assert out == {"tpch_probes": 1, "graph_edges": 1}
        assert ("app", "sf", "site_c") not in tpch_analogs._PROBE_CACHE
        assert ("app", "sf", "site_a") in tpch_analogs._PROBE_CACHE
        assert ("app", "sf", "site_b") in tpch_analogs._PROBE_CACHE

        # q1's retry evicts its two sites; double-evicting is a no-op
        assert evict_cache_keys(built_q1) == {"tpch_probes": 2}
        assert evict_cache_keys(built_q1) == {}
        assert not tpch_analogs._PROBE_CACHE
    finally:
        clear_memoized_caches()
