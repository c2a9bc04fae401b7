"""Round-12 additions (placeholder header; queries appended below).

These register AFTER rotation_r12 — registry tail, behind the driver
window, per the new-query deferral policy; in-repo oracle parity via
tests/test_round12.py is their correctness gate until the round-13
front.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ._base import register
