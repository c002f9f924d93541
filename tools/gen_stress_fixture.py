#!/usr/bin/env python3
"""Generate a LOCAL stress fixture at a larger scale factor than the
driver ships (TESTDATA.md stops at sf0.1).

Synthesizes `documents`, `embeddings`, and `events` parquet tables with
the same schemas, types (tz-less microsecond timestamps — the NTZ shape
the driver fixtures load as), vocabulary style, and duplicate structure
as the driver's sf0.1 tables, scaled by ``--scale`` (default 10× ≈ sf1).
Used by the SCALE.md stress runs: the goal is plan/throughput behavior
at 10×, not bit-parity with a hypothetical driver sf1.

Deterministic: seed 42, pure numpy. Writes OUTSIDE the repo's tracked
tree by default (.localdata/ is gitignored).

Usage:
    python3 tools/gen_stress_fixture.py [--out .localdata/sf1] [--scale 10]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: sf0.1 row counts (TESTDATA.md / observed) — scaled by --scale
BASE_ROWS = {"documents": 5_000, "embeddings": 2_000, "events": 100_000}

#: the driver corpus vocabulary style (observed at sf0.1): short
#: engine-themed tokens, ~40 distinct
VOCAB = (
    "the a big small fast slow spark data table row column key value hash sort "
    "merge join scan filter group agg window batch stream query order part line "
    "customer dup vector index cache shuffle stage plan codegen skew salt"
).split()

LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
EVENT_TYPES = ["click", "purchase", "signup", "view", "error"]


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    lens = rng.integers(8, 101, size=n)  # tokens per doc (~290 chars avg)
    toks = rng.integers(0, len(VOCAB), size=int(lens.sum()))
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(VOCAB[t] for t in toks[pos : pos + ln]))
        pos += ln
    # duplicate structure: ~1% exact dups, ~2% near dups (few-token edits)
    n_exact, n_near = n // 100, n // 50
    dup_targets = rng.integers(0, n - n_exact - n_near, size=n_exact + n_near)
    for j, src in enumerate(dup_targets[:n_exact]):
        texts[n - 1 - j] = texts[src]
    for j, src in enumerate(dup_targets[n_exact:]):
        words = texts[src].split()
        for k in rng.integers(0, len(words), size=max(1, len(words) // 20)):
            words[k] = VOCAB[rng.integers(0, len(VOCAB))]
        texts[n - n_exact - 1 - j] = " ".join(words)
    lang = rng.choice(LANGS, size=n, p=LANG_W)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "source": pa.array([f"src{i}" for i in rng.integers(0, 20, size=n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int, dim: int = 64) -> pa.Table:
    centroids = rng.normal(0, 1, size=(10, dim))
    label = rng.integers(0, 10, size=n)
    # noise σ=1.5 puts typical same-label cosine ≈ dim/(dim+σ²·dim·…) ≈ 0.3,
    # matching the driver fixture's pair density (86 pairs ≥0.4 per 2000
    # vectors at sf0.1) instead of a pathological all-pairs-pass cluster
    vecs = centroids[label] + rng.normal(0, 1.5, size=(n, dim))
    # ~1% exact-duplicate vectors (semantic-dedup positives)
    n_dup = n // 100
    src = rng.integers(0, n - n_dup, size=n_dup)
    vecs[n - n_dup :] = vecs[src]
    label[n - n_dup :] = label[src]
    vecs32 = vecs.astype(np.float32)
    emb = pa.FixedSizeListArray.from_arrays(pa.array(vecs32.ravel(), pa.float32()), dim)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": emb.cast(pa.list_(pa.float32())),
            "label": pa.array(label, pa.int32()),
        }
    )


def gen_events(rng: np.random.Generator, n: int) -> pa.Table:
    start = np.datetime64("2024-01-01T00:00:00", "us")
    # monotone-ish arrival with jitter, ~30 days span like the fixtures
    gaps = rng.exponential(30 * 86_400 / n, size=n)
    ts = start + (np.cumsum(gaps) * 1_000_000).astype("timedelta64[us]")
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n // 8, size=n), pa.int64()),
            "event_type": pa.array(rng.choice(EVENT_TYPES, size=n)),
            "value": pa.array(np.round(rng.exponential(100, size=n), 2), pa.float64()),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=n)]
            ),
        }
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".localdata/sf1")
    ap.add_argument("--scale", type=float, default=10.0)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(42)
    for name, gen in (
        ("documents", gen_documents),
        ("embeddings", gen_embeddings),
        ("events", gen_events),
    ):
        n = int(BASE_ROWS[name] * args.scale)
        tbl = gen(rng, n)
        path = os.path.join(args.out, f"{name}.parquet")
        # several row groups so Spark scans parallelize like real input
        pq.write_table(tbl, path, row_group_size=max(n // 16, 1024))
        print(f"{path}: {n} rows, {os.path.getsize(path) / 1e6:.1f} MB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
