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
  query-side (n, dim) probe per (session, query-plan semanticHash).
  NOTE this cache's hit changes PATH SELECTION (broadcast vs IVF), not
  just a hint, so it assumes immutable inputs per session: re-writing
  data at the same path mid-session with an identical plan hash would
  keep the stale path choice (ADVICE r16 — documented contract, same
  as the fixture-immutability assumption the other probes make).

Why a registry: the bench's warm pass and gate retries (bench.py) must
control whether a measurement includes this memoized work. ADVICE r16
(medium): the r16 gate's warm retry re-ran offenders in a session where
these caches were already hot, so a genuine regression in a cached
stage would trip the first pass and then be silently cleared by a
retry that measured strictly less work. The bench now clears these
caches at warm-pass start (so the warm pass re-pays session-scoped
builds exactly where the first pass paid them — same work, minus
whole-stage-codegen compile) and clears the relevant cache before
retrying a cache-FRONTING query (so the retry measures the same work
its baseline recorded).
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
