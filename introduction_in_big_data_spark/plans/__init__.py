"""Query plans. Importing this package registers every query module
into `registry.REGISTRY`."""

from . import core  # noqa: F401
from . import cf_queries  # noqa: F401
from . import text_queries  # noqa: F401
from . import dedup_queries  # noqa: F401
from . import similarity_queries  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import sketch_queries  # noqa: F401
from . import multimodal_queries  # noqa: F401
from . import extras  # noqa: F401
from . import tpch_shapes  # noqa: F401
from . import tpch_more  # noqa: F401
from . import tpch_last  # noqa: F401
from . import timeseries_queries  # noqa: F401
from . import curation_queries  # noqa: F401
from . import skew_queries  # noqa: F401
from . import chunk_queries  # noqa: F401
from . import layout_queries  # noqa: F401
from . import graph_queries  # noqa: F401
from .registry import REGISTRY, QuerySpec, oracle_sql, queries, register

__all__ = ["REGISTRY", "QuerySpec", "oracle_sql", "queries", "register"]
