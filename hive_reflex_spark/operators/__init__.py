"""Operator modules. Importing this package registers every query/oracle
pair into :mod:`hive_reflex_spark.registry`."""

from hive_reflex_spark.operators import (  # noqa: F401
    dedup,
    relational,
    similarity,
    tensor,
    text,
)

__all__ = ["dedup", "relational", "similarity", "tensor", "text"]
