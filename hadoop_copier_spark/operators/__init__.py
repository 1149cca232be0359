"""Custom operators Spark lacks natively, composed from DataFrame ops
(SURVEY §4.2 'needs custom work')."""

from .asof import asof_join  # noqa: F401
from .bloom import bloom_build, bloom_position_sql, bloom_probe  # noqa: F401
from .components import connected_components, dedup_clusters  # noqa: F401
from .dedup import (  # noqa: F401
    near_dup_pairs,
    simhash64,
    window_jaccard_pairs,
)
from .layout import compact_parquet, zorder_rewrite  # noqa: F401
from .merge import merge_upsert  # noqa: F401
from .prefix import global_prefix_sum, grouped_rank  # noqa: F401
from .similarity import (  # noqa: F401
    cosine_topk,
    ivf_ann_topk,
    lsh_ann_topk,
    semantic_dedup,
)
from .skew import salted_join  # noqa: F401
from .topk import grouped_topk  # noqa: F401
