from bzzz_spark.serve.local import (
    LocalIndex,
    local_facet_counts,
    local_matched,
    local_search,
    local_sorted_search,
    local_total_hits,
)
from bzzz_spark.serve.scatter import (
    ShardedIndex,
    build_sharded,
    open_serving,
)

__all__ = [
    "LocalIndex",
    "ShardedIndex",
    "build_sharded",
    "local_facet_counts",
    "local_matched",
    "local_search",
    "local_sorted_search",
    "local_total_hits",
    "open_serving",
]
