"""Operator modules. Importing this package registers every query/oracle
pair into :mod:`hive_reflex_spark.registry`."""

from hive_reflex_spark.operators import relational, tensor  # noqa: F401

__all__ = ["relational", "tensor"]
