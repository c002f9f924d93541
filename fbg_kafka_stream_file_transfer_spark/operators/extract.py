"""Document extraction — the Docling-service analogue (reference S8/E4).

The reference POSTs each file to a Docling HTTP service per message
(camel/file-pipeline.yaml:124-167) behind a MicroProfile circuit breaker
(50 % failure ratio → open, 60 s half-open, 3 successes → close,
application.properties:79-82). Here extraction is an Arrow-batched
``mapInPandas`` operator running *inside* the executors — removing the
reference's two network hops (SURVEY §3.4) — with:

- a pluggable backend (``Extractor``): the deterministic stub for tests/
  oracles; a real Docling-HTTP or local-model backend plugs in with the
  same signature,
- a per-partition circuit breaker for backends that can fail,
- bounded per-partition concurrency (the reference's 5-consumers-per-pod
  throttle, application.properties:45).

Scale: extraction is embarrassingly parallel; batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``. For HTTP backends the
breaker + ``max_concurrency`` bound protects the downstream service the
way the reference's HPA + breaker did.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Per-page text item and per-table shape item of the nested Docling
#: result (the reference stores the full Docling JSON verbatim,
#: file-pipeline.yaml:207-218; SURVEY §1.5 maps it to nested
#: ``texts``/``tables`` arrays parsed via ``from_json``).
TEXT_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("page", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)
TABLE_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("table_index", T.IntegerType()),
        T.StructField("n_rows", T.IntegerType()),
        T.StructField("n_cols", T.IntegerType()),
    ]
)

#: Output schema of the extraction result: scalar summary fields, the
#: nested texts/tables arrays, and the backend's verbatim JSON
#: (``result_json``) retained for the processed leg.
EXTRACT_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("status", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("page_count", T.IntegerType()),
        T.StructField("n_tables", T.IntegerType()),
        T.StructField("texts", T.ArrayType(TEXT_ITEM_SCHEMA)),
        T.StructField("tables", T.ArrayType(TABLE_ITEM_SCHEMA)),
        T.StructField("result_json", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)

#: The document-payload subset of EXTRACT_RESULT_SCHEMA — what
#: ``result_json`` serializes and ``parse_extract_result`` parses back
#: (the engine's ``from_json`` face of the verbatim Docling JSON).
RESULT_JSON_SCHEMA = T.StructType(
    [f for f in EXTRACT_RESULT_SCHEMA.fields if f.name not in ("result_json", "error")]
)

Extractor = Callable[[bytes], dict]


def stub_extractor(content: bytes) -> dict:
    """Deterministic, pure extractor for tests and oracle parity
    (SURVEY §7 risk (c)): derives every field from the content alone.

    With ``s`` the decoded content and ``L = len(s)``:
    page_count = 1 + L mod 5; text = s[:64]; page i (0-based) covers
    ``s[i*(L//p) :][:min(L//p, 48)]``; table j has
    ``2 + (L+j) mod 5`` rows × ``1 + (L+j) mod 4`` cols. Every rule is
    plain substring/modulo arithmetic so the DuckDB oracle can replicate
    the nested result exactly.
    """
    s = content.decode("utf-8", errors="replace")
    n = len(s)
    p = 1 + n % 5
    step = n // p
    texts = [
        {"page": i + 1, "text": s[i * step : i * step + min(step, 48)]}
        for i in range(p)
    ]
    tables = [
        {"table_index": j, "n_rows": 2 + (n + j) % 5, "n_cols": 1 + (n + j) % 4}
        for j in range(n % 3)
    ]
    return {
        "status": "SUCCESS",
        "text": s[:64],
        "page_count": p,
        "n_tables": n % 3,
        "texts": texts,
        "tables": tables,
        "error": None,
    }


def docling_http_extractor(service_url: str, timeout_connect: float = 30.0,
                           timeout_read: float = 300.0) -> Extractor:
    """Real-backend factory mirroring the reference's HTTP call (S8,
    application.properties:73-74). The request is a single well-formed
    JSON document — base64 content + the reference's conversion options
    (file-pipeline.yaml:131-135) — so any JSON endpoint can parse it.

    urllib exposes one deadline per request, so the connect phase is
    bounded separately via ``socket.setdefaulttimeout`` during the call
    and the full exchange by ``timeout_read`` (the reference's 300 s
    socket ceiling). Constructed lazily so the stub path has no network
    dependency.
    """

    def call(content: bytes) -> dict:
        import base64
        import socket
        import urllib.request

        body = json.dumps(
            {
                "content_b64": base64.b64encode(content).decode(),
                "options": {"from_format": None, "to_format": "json",
                            "ocr": True, "table_structure": True},
            }
        ).encode()
        req = urllib.request.Request(
            f"{service_url}/v1/convert/source",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        prev = socket.getdefaulttimeout()
        socket.setdefaulttimeout(timeout_connect)  # bounds the connect phase
        try:
            with urllib.request.urlopen(req, timeout=timeout_read) as resp:
                raw = resp.read()
        finally:
            socket.setdefaulttimeout(prev)
        parsed = json.loads(raw)
        texts = [
            {"page": t.get("page"), "text": t.get("text")}
            for t in parsed.get("texts", [])
        ]
        tables = [
            {"table_index": j, "n_rows": t.get("n_rows"), "n_cols": t.get("n_cols")}
            for j, t in enumerate(parsed.get("tables", []))
        ]
        return {
            "status": "SUCCESS",
            "text": parsed.get("text"),
            "page_count": parsed.get("page_count"),
            "n_tables": len(parsed.get("tables", [])),
            "texts": texts,
            "tables": tables,
            # the service's response verbatim — what the reference stores
            # to processed/ (file-pipeline.yaml:207-218)
            "result_json": raw.decode("utf-8", errors="replace"),
            "error": None,
        }

    return call


@dataclass
class CircuitBreaker:
    """Executor-local breaker with the reference's semantics
    (application.properties:79-82): sliding failure window, OPEN at
    ``failure_ratio``, half-open probe after ``delay_calls`` further
    calls (call-count proxy for the 60 s wall-clock delay — deterministic
    under test), close after ``success_threshold`` successes."""

    window: int = 10
    failure_ratio: float = 0.5
    delay_calls: int = 10
    success_threshold: int = 3

    def __post_init__(self) -> None:
        self._results: list[bool] = []
        self._state = "CLOSED"
        self._cooldown = 0
        self._half_open_successes = 0

    @property
    def state(self) -> str:
        return self._state

    def allow(self) -> bool:
        if self._state == "OPEN":
            self._cooldown += 1
            if self._cooldown >= self.delay_calls:
                self._state = "HALF_OPEN"
                self._half_open_successes = 0
            return self._state == "HALF_OPEN"
        return True

    def record(self, ok: bool) -> None:
        if self._state == "HALF_OPEN":
            if ok:
                self._half_open_successes += 1
                if self._half_open_successes >= self.success_threshold:
                    self._state = "CLOSED"
                    self._results = []
            else:
                self._state = "OPEN"
                self._cooldown = 0
            return
        self._results.append(ok)
        if len(self._results) > self.window:
            self._results.pop(0)
        if (
            len(self._results) >= self.window
            and sum(not r for r in self._results) / len(self._results) >= self.failure_ratio
        ):
            self._state = "OPEN"
            self._cooldown = 0


def parse_extract_result(col, schema: T.StructType | None = None) -> "Column":
    """``from_json`` over the verbatim ``result_json`` column — recovers
    the typed nested struct (texts/tables arrays) from the processed
    leg, the way SURVEY §1.5 maps the reference's stored Docling JSON.

    The default schema matches result_json the ENGINE synthesized
    (``_complete_row`` — the stub and any backend that returns only
    typed fields). ``result_json`` is stored VERBATIM by design, so a
    backend that supplies its own raw response body (e.g.
    ``docling_http_extractor``) is parsed with the service's schema —
    pass it here; unknown fields are simply NULL under ``from_json``,
    never an error."""
    from pyspark.sql import functions as F

    return F.from_json(col, schema if schema is not None else RESULT_JSON_SCHEMA)


_FIELD_ORDER = [f.name for f in EXTRACT_RESULT_SCHEMA.fields]
_FAILED_ROW = {f.name: None for f in EXTRACT_RESULT_SCHEMA.fields}


def _complete_row(row: dict) -> dict:
    """Normalize a backend dict to the full schema: missing fields become
    NULL; ``result_json`` defaults to the compact serialization of the
    document payload (backends that return a raw response body — the
    HTTP one — supply it verbatim instead)."""
    out = {k: row.get(k) for k in _FIELD_ORDER}
    if out["result_json"] is None and out["status"] == "SUCCESS":
        out["result_json"] = json.dumps(
            {f.name: out[f.name] for f in RESULT_JSON_SCHEMA.fields},
            separators=(",", ":"),
        )
    return out


def extract_documents(
    df: DataFrame,
    content_col: str = "content",
    extractor: Extractor = stub_extractor,
    breaker: CircuitBreaker | None = None,
    max_concurrency: int = 1,
    repartition: bool = True,
) -> DataFrame:
    """Run the extractor over every row via ``mapInPandas`` (Arrow batches).

    Appends the EXTRACT_RESULT_SCHEMA fields; failures produce
    status=FAILED rows (→ retry/DLQ legs) instead of aborting the batch,
    and an OPEN breaker fails fast with the reference's
    'circuit breaker open' message (routable by F1).

    ``max_concurrency`` bounds the number of in-flight extractor calls
    *per partition* (a thread pool inside the Arrow batch loop) — the
    engine-side analogue of the reference's 5-concurrent-consumers
    throttle (application.properties:45). Leave at 1 for CPU-bound
    in-process extractors (partitions already saturate the cores); raise
    it for I/O-bound HTTP backends, where total in-flight calls against
    the service are then ``partitions × max_concurrency`` — the knob the
    reference's breaker + HPA envelope bounded. Breaker state is shared
    across the partition's threads under a lock. Bounded overshoot:
    ``allow()`` is checked at task *start*, so after the failure
    threshold is crossed up to ``max_concurrency − 1`` already-admitted
    calls may still reach the backend before their ``record(False)``
    lands — the same slack a multi-consumer reference deployment has
    (each consumer notices the open breaker on its *next* poll). Callers
    needing a hard ceiling set ``max_concurrency=1``.

    ``repartition=False`` skips the spread-to-all-cores step — use it
    when partitioning was already sized for the backend (for HTTP
    targets, fewer partitions × higher max_concurrency bounds the
    service-wide fan-out explicitly).

    The spread is an EXPLICIT ``repartition(n, key)``, not the
    ``ensure_parallelism`` guard: extraction is the textbook
    compute-heavy/small-bytes stage, and AQE's byte-based partition
    coalescing will happily fuse the upstream shuffle (the route's
    dropDuplicates) down to a couple of partitions — the sf1 stress run
    measured 80 s instead of 9 s for the extraction leg because the
    guard's pre-AQE partition estimate (32) said "already parallel"
    while AQE executed 2 tasks. An explicit numPartitions repartition
    is exempt from AQE coalescing, pinning one task per core; its
    shuffle moves only the envelope batch (bounded in streaming by
    maxFilesPerTrigger), which is orders cheaper than losing the
    parallelism of the CPU/IO-bound stage. HASH partitioning on the
    envelope key when present (round-robin only as fallback):
    round-robin repartition local-sorts every row — binary content
    included — before shuffling (``spark.sql.execution.
    sortBeforeRepartition``, on by default for retry determinism),
    which costs more than the extraction it was meant to parallelize.
    """
    if repartition:  # extraction is CPU-bound, per-row independent
        n = df.sparkSession.sparkContext.defaultParallelism
        if "correlation_id" in df.columns:
            df = df.repartition(n, F.col("correlation_id"))
        else:
            df = df.repartition(n)
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [T.StructField(f"extract_{f.name}", f.dataType) for f in EXTRACT_RESULT_SCHEMA.fields]
    )
    passthrough = [f.name for f in df.schema.fields if f.name != content_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import threading

        cb = breaker  # executor-local copy per partition
        cb_lock = threading.Lock()

        def one(content) -> dict:
            with cb_lock:
                admitted = cb is None or cb.allow()
            if not admitted:
                return dict(
                    _FAILED_ROW,
                    status="FAILED",
                    error="circuit breaker open: extraction skipped",
                )
            try:
                raw = bytes(content) if content is not None else b""
                row = _complete_row(extractor(raw))
                ok = True
            except Exception as exc:  # backend failure → FAILED row
                row = dict(
                    _FAILED_ROW, status="FAILED", error=f"extraction failed: {exc}"
                )
                ok = False
            if cb is not None:
                with cb_lock:
                    cb.record(ok)
            return row

        pool = None
        if max_concurrency > 1:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=max_concurrency)
        try:
            for pdf in batches:
                rows = (
                    list(pool.map(one, pdf[content_col]))
                    if pool is not None
                    else [one(c) for c in pdf[content_col]]
                )
                out = pdf[passthrough].copy()
                for k in _FIELD_ORDER:
                    out[f"extract_{k}"] = [r[k] for r in rows]
                yield out
        finally:
            if pool is not None:
                pool.shutdown(wait=False)

    return df.mapInPandas(run, out_schema)


def sentence_udtf():
    """§2.g — the table-function face of the UDF surface: a Python UDTF
    that explodes a document into (sentence_index, sentence) rows.
    The reference exposes no user-extensible functions at all
    (SURVEY §2.g); this engine provides all four Spark shapes: scalar
    pandas_udf (shingles_arrow), mapInPandas (extract_documents),
    applyInPandasWithState (debounced_alerts), and this UDTF.

    Usage::

        SplitSentences = sentence_udtf()
        df.lateralJoin(SplitSentences(F.col("text")).alias("s"))
        # or SQL: spark.udtf.register("split_sentences", SplitSentences)
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_index int, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            if not text:
                return
            import re

            parts = [p.strip() for p in re.split(r"(?<=[.!?])\s+", text) if p.strip()]
            for i, p in enumerate(parts):
                yield (i, p)

    return SplitSentences
