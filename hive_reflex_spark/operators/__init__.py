"""Operator modules. Importing this package registers every query/oracle
pair into :mod:`hive_reflex_spark.registry`."""

from hive_reflex_spark.operators import (  # noqa: F401
    analytics,
    codec,
    compiler,
    dedup,
    graph,
    nn,
    power,
    relational,
    similarity,
    tensor,
    text,
    timeseries,
)
from hive_reflex_spark.sources import multimodal  # noqa: F401
from hive_reflex_spark.streaming import ops as streaming_ops  # noqa: F401

__all__ = [
    "analytics",
    "codec",
    "compiler",
    "dedup",
    "graph",
    "nn",
    "power",
    "relational",
    "similarity",
    "streaming_ops",
    "tensor",
    "text",
    "timeseries",
    "multimodal",
]
