"""Alias namespace: `parallel` -> the multi-chip layer.

Canonical modules: `fastpyvectordb_tpu.dist` (mesh helpers, shard_map
sharded search with distributed top-k, distributed k-means, multi-host
wiring) and `fastpyvectordb_tpu.core.outofcore` (host-streamed corpora).
"""
from .core.outofcore import (  # noqa: F401
    OutOfCoreSearcher,
    QuantizedOutOfCoreSearcher,
)
from .dist.mesh import DATA_AXIS, QUERY_AXIS, make_mesh, replicate, shard_corpus  # noqa: F401
from .dist.multihost import global_mesh, initialize, shard_local_corpus  # noqa: F401
from .dist.sharded import (  # noqa: F401
    ShardedSearcher,
    build_sharded_kmeans_step,
    build_sharded_search,
)
