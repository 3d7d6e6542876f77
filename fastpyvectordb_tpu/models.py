"""Alias namespace: `models` -> index structures and encoders.

Canonical modules: `fastpyvectordb_tpu.ann` (IVF-Flat, graph beam-search
ANN), `fastpyvectordb_tpu.quant` (scalar/binary/product quantizers), and
the pure-JAX text encoder in `fastpyvectordb_tpu.embeddings`.
"""
from .ann.graph_ann import GraphANN  # noqa: F401
from .ann.ivf import IVFIndex  # noqa: F401
from .embeddings import JaxTransformerEmbedder  # noqa: F401
from .quant.binary import BinaryQuantizer  # noqa: F401
from .quant.kmeans import assign_chunked, kmeans_fit  # noqa: F401
from .quant.product import ProductQuantizer  # noqa: F401
from .quant.scalar import ScalarQuantizer  # noqa: F401
from .quant.scan import QuantizedScan  # noqa: F401
