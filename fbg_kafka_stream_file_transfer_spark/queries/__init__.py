"""Oracle-checked query registry.

Every operator from SURVEY.md §2 (plus the §2.h extension surface) gets a
named query here: a PySpark callable ``(spark, sf_dir) -> DataFrame`` and,
where SQL-expressible, a DuckDB oracle SQL string computing the same
result on the same tables. The driver hash-compares the two at sf0.01.

Column names, types, and rounding are deliberately mirrored between the
Spark and oracle sides (see queries.base conventions).

Standing rotation policy (registry ORDER is part of the driver contract:
the per-round correctness gate certifies the FIRST 50 entries, and the
registry now holds more than 50 queries):

    Queries are ordered by driver-certification staleness — queries that
    have NEVER had a green driver row come first, then queries whose most
    recent green row is oldest, ties broken by the stable module/definition
    order below. Staleness is computed at import time from the committed
    ``CORRECTNESS_r*.json`` files at the repo root, so each round's gate
    automatically certifies the queries that need it most and the rotation
    needs no manual editing. With ~190 queries and a 50-row window a full
    cycle takes ~4 rounds; ``oracle_check.py`` runs the identical gate over
    ALL queries locally every round (at sf0.01 AND sf0.1) to cover the
    off-window set, so the driver row is re-confirmation, not discovery.

If the correctness files are unreadable (fresh clone, driver running from
an unexpected cwd) the order falls back to the static module order, which
is itself a valid rotation state.
"""

from __future__ import annotations

import glob
import json
import os
import re

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

_MODULES = (
    envelope_q,
    relational_q,
    monitoring_q,
    dedup_q,
    text_q,
    similarity_q,
    pipeline_q,
    curation_q,
)

_NEVER = 0  # staleness sentinel: no green driver row in any round yet


def _last_certified_rounds() -> dict[str, int]:
    """Map query name -> latest round with a green driver row.

    Reads the committed ``CORRECTNESS_r{N}.json`` files at the repo root
    (two levels up from this package). A row counts as green when the
    value hash matched, or — for rows-only checks without an oracle —
    when both row count and schema matched. Unreadable/absent files are
    skipped; an empty result triggers the static-order fallback.
    """
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            # hash_match False is a RED row even when rows+schema match
            # (e.g. sample_split_assignment r6) — only hash_match None
            # (a rows-only check with no oracle) may fall back to the
            # weaker rows+schema criterion.
            green = row.get("hash_match") is True or (
                row.get("hash_match") is None
                and row.get("err") is None
                and bool(row.get("rows_match"))
                and bool(row.get("schema_match"))
            )
            if green:
                last[name] = max(last.get(name, _NEVER), rnd)
    return last


def _build_registry() -> dict[str, Q]:
    ordered: list[tuple[str, Q]] = []
    for mod in _MODULES:
        for name, q in mod.QUERIES.items():
            assert all(name != n for n, _ in ordered), f"duplicate query name {name}"
            ordered.append((name, q))
    last = _last_certified_rounds()
    # Stable sort: never-certified (0) first, then oldest round; Python's
    # sort is stable so ties keep the module/definition order above.
    ordered.sort(key=lambda item: last.get(item[0], _NEVER))
    return dict(ordered)


REGISTRY: dict[str, Q] = _build_registry()
