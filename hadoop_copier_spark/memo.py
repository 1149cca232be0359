"""Registry of the package's cross-invocation memoized caches.

Three modules memoize per-session state keyed by applicationId so
repeated invocations within one session skip redundant jobs:

* ``queries.graph_ops._EDGE_CACHE`` — the shared localCheckpoint'ed
  co-purchase edge frame every graph operator filters (one basket
  pipeline per (session, sf_dir); ~2.6 s at sf0.1, fronted by the
  first graph-family query to run).
* ``queries.tpch_analogs._PROBE_CACHE`` — byte-aware broadcast-probe
  row counts per (session, sf_dir, site); each site's bounded count()
  is fronted by the first query using that site.
* ``operators.similarity._HARDNEG_PROBE_CACHE`` — the hard-negatives
  query-side (n, dim) probe per (session, query-plan semanticHash,
  input-files fingerprint). This cache's hit changes PATH SELECTION
  (broadcast vs IVF), not just a hint, so since round 18 (VERDICT r17
  #4) its key carries the sorted leaf input-file list as a data-version
  signal: a same-path rewrite produces new part-file names, the key
  changes, and the probe re-fires — no immutability assumption left.

Why a registry: the bench's warm pass and gate retries (bench.py) must
control whether a measurement includes this memoized work. ADVICE r16
(medium): the r16 gate's warm retry re-ran offenders in a session where
these caches were already hot, so a genuine regression in a cached
stage would trip the first pass and then be silently cleared by a
retry that measured strictly less work. Since round 18 (ADVICE r17)
the bench tracks cache keys PER QUERY: snapshot_cache_keys() diffs
around each first run record exactly which keys that query inserted,
and evict_cache_keys() removes precisely those before its warm re-run
and any gate retry — so every query's warm number re-pays exactly the
memoized work its own first run paid (same work, minus whole-stage-
codegen compile), including per-site ``tpch_probes`` entries the old
one-fronter-per-cache-NAME protocol missed.
"""

from __future__ import annotations

from typing import Callable


def _caches() -> dict[str, dict]:
    from .operators import similarity
    from .queries import graph_ops, tpch_analogs

    return {
        "graph_edges": graph_ops._EDGE_CACHE,
        "tpch_probes": tpch_analogs._PROBE_CACHE,
        "hardneg_probe": similarity._HARDNEG_PROBE_CACHE,
    }


def clear_memoized_caches(only: tuple[str, ...] | None = None) -> dict[str, int]:
    """Clear the registered memoized caches (all, or just ``only``).

    Returns {cache_name: evicted_entry_count} for the artifact trail.
    Safe to call with live sessions: every cache is re-populated lazily
    on next use (the edge cache's superseded localCheckpoint blocks are
    reclaimed by the context's cleaner once unreferenced).
    """
    out: dict[str, int] = {}
    for name, cache in _caches().items():
        if only is not None and name not in only:
            continue
        out[name] = len(cache)
        cache.clear()
    return out


def snapshot_cache_keys() -> dict[str, set]:
    """Current key sets of every registered cache (cheap driver-side
    copies). The bench diffs snapshots taken around a query's first run
    to learn exactly which keys THAT query's first run inserted."""
    return {name: set(cache) for name, cache in _caches().items()}


def evict_cache_keys(evictions: dict[str, set]) -> dict[str, int]:
    """Evict specific keys from specific caches; returns
    {cache_name: n_actually_evicted}. ADVICE r17: the warm pass and
    gate retries used to clear whole caches for the single query that
    FRONTED each cache NAME — but ``tpch_probes`` holds one entry per
    (session, sf_dir, probe site), each built by the FIRST query using
    that site, so a warm re-run of a later site-builder measured
    strictly less work than its first run. Per-KEY eviction makes every
    query's warm re-run (and gate retry) re-pay exactly the memoized
    work its own first run paid — no per-site hole, no over-clearing
    of keys built by other queries."""
    caches = _caches()
    out: dict[str, int] = {}
    for name, keys in evictions.items():
        cache = caches[name]
        n = 0
        for k in keys:
            if k in cache:
                del cache[k]
                n += 1
        if n:
            out[name] = n
    return out


def consumed_caches(fn: Callable) -> tuple[str, ...]:
    """Which registered caches a registry query's ``fn`` populates.

    Resolution is by module: every ``queries.graph_ops`` query filters
    the shared edge frame; every ``queries.tpch_analogs`` query may hit
    a broadcast-probe site; ``xh_hard_negatives`` (queries.llm_ops) is
    the sole hardneg-probe consumer. Used by bench.py to decide which
    caches a gate retry must clear and to annotate cache-fronting
    queries in the artifact.
    """
    mod = getattr(fn, "__module__", "") or ""
    if mod.endswith("queries.graph_ops"):
        return ("graph_edges",)
    if mod.endswith("queries.tpch_analogs"):
        return ("tpch_probes",)
    if getattr(fn, "__name__", "") == "xh_hard_negatives":
        return ("hardneg_probe",)
    return ()
