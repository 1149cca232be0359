"""Entity-resolution / record-linkage operators (round 7, part 4).

The missing classic alongside dedup: finding records that refer to the
same real-world entity WITHOUT an exact key — the customer-address /
product-catalog matching problem. The scalable shape is always the
same: cheap BLOCKING passes propose candidate pairs as equi-joins
(never an all-pairs comparison), then an exact similarity verify runs
only inside blocks. MinHash-LSH (operators/dedup.py) is this pattern
for set similarity; this module adds the edit-distance flavor used for
short strings (names, titles, SKUs).
"""

from __future__ import annotations

from .base import F, tbl
from .registry import register

_MAX_LV = 2  # verify threshold: edit distance <= 2


@register(
    "xh_fuzzy_match",
    oracle=f"""WITH p AS (
  SELECT p_partkey AS k, p_name AS nm, p_brand AS br,
         string_split(p_name, ' ')[1] AS w1,
         string_split(p_name, ' ')[-1] AS w2
  FROM part
),
cand AS (
  SELECT a.k AS key_a, b.k AS key_b, a.nm AS nm_a, b.nm AS nm_b,
         a.br AS br
  FROM p a JOIN p b ON a.br = b.br AND a.w1 = b.w1 AND a.k < b.k
  UNION
  SELECT a.k, b.k, a.nm, b.nm, a.br
  FROM p a JOIN p b ON a.br = b.br AND a.w2 = b.w2 AND a.k < b.k
)
SELECT br AS brand, CAST(levenshtein(nm_a, nm_b) AS BIGINT) AS lv,
       COUNT(*) AS n_pairs
FROM cand WHERE levenshtein(nm_a, nm_b) <= {_MAX_LV}
GROUP BY 1, 2 ORDER BY brand, lv""",
    tags=("er", "fuzzy", "dedup"),
)
def xh_fuzzy_match(spark, sf_dir):
    """Fuzzy entity matching over product names: multi-pass blocking
    (same brand + same FIRST name token, unioned with same brand + same
    LAST token — the standard recall fix for single-key blocking, since
    a typo in the blocking word of one pass is caught by the other),
    exact levenshtein <= {_MAX_LV} verification inside blocks only, and
    a bounded (brand, distance, n_pairs) match profile as output.

    Scale shape: BOTH blocking passes are plain equi joins on
    (brand, token) — hash-joinable, never an all-pairs comparison; the
    quadratic term is confined to single blocks, and block size is
    controlled by blocking-key selectivity (add tokens to the key to
    tighten it), exactly how production record linkage bounds its
    candidate sets. The levenshtein verify runs MAP-SIDE on each pass's
    join output, BEFORE the cross-pass distinct — so the dedup shuffle
    carries only (key_a, key_b, brand, lv) integer/code rows for pairs
    that already passed, never the name strings of every candidate
    (filter-then-distinct == distinct-then-filter for a deterministic
    per-row predicate; lv is a function of the pair). The output
    aggregate is brands x (lv+1) rows at any corpus size. Both engines
    implement standard Levenshtein, so the profile hash-checks
    exactly."""
    p = tbl(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.col("p_name").alias("nm"),
        F.col("p_brand").alias("br"),
        F.element_at(F.split("p_name", " "), 1).alias("w1"),
        F.element_at(F.split("p_name", " "), -1).alias("w2"),
    )

    def pass_on(word_col):
        a = p.select(
            F.col("k").alias("key_a"),
            F.col("nm").alias("nm_a"),
            "br",
            F.col(word_col).alias("blk"),
        )
        b = p.select(
            F.col("k").alias("key_b"),
            F.col("nm").alias("nm_b"),
            F.col("br").alias("br_b"),
            F.col(word_col).alias("blk_b"),
        )
        return (
            a.join(
                b,
                (F.col("br") == F.col("br_b"))
                & (F.col("blk") == F.col("blk_b"))
                & (F.col("key_a") < F.col("key_b")),
            )
            # bounded form: O(threshold*len) banded DP instead of the full
            # O(len^2) matrix, early-exit when |len_a - len_b| > threshold,
            # returns -1 above it — ~1M candidate pairs per pass make the
            # verify compute-bound, so the band is the win (verified
            # equivalent to full-levenshtein <= threshold by the oracle).
            # Equal names take an O(len) equality fast path (lv = 0 by
            # definition; round 17 — on replicated corpora exact-name
            # pairs dominate the blocks, measured on the x16 probe in
            # bench/er_scaling_results.json; oracle keeps plain
            # levenshtein and hash-matches)
            .withColumn(
                "lv",
                F.when(F.col("nm_a") == F.col("nm_b"), F.lit(0))
                .otherwise(F.levenshtein("nm_a", "nm_b", _MAX_LV))
                .cast("bigint"),
            )
            .filter(F.col("lv") >= 0)
            .select("key_a", "key_b", "br", "lv")
        )

    cand = pass_on("w1").unionByName(pass_on("w2")).distinct()
    return (
        cand.groupBy(F.col("br").alias("brand"), "lv")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("brand", "lv")
    )
