"""Live-HTTP exercise of the Docling extractor backend (S8).

The container has no Docling service, but the backend client is real
urllib — so these tests stand up a local ``ThreadingHTTPServer`` that
speaks the Docling-ish JSON contract and drive the FULL path: Arrow
``mapInPandas`` batches → per-row HTTP POST from the executor workers →
nested result schema. This closes the gap between "wire format tested"
and "exercised against a live endpoint": only the model quality of the
real service is stubbed, not the transport, serialization, concurrency
bound, or failure routing.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators.extract import (
    docling_http_extractor,
    extract_documents,
)


class _DoclingHandler(BaseHTTPRequestHandler):
    """Minimal Docling-shaped endpoint: echoes the decoded content back
    in the conversion result, one text item per 'page'."""

    def do_POST(self):  # noqa: N802 (http.server API)
        assert self.path == "/v1/convert/source"
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        content = base64.b64decode(body["content_b64"]).decode("utf-8", "replace")
        if content.startswith("BOOM"):
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b"backend exploded")
            return
        resp = json.dumps(
            {
                "text": content[:64],
                "page_count": 2,
                "texts": [
                    {"page": 1, "text": content[:10]},
                    {"page": 2, "text": content[10:20]},
                ],
                "tables": [{"n_rows": 3, "n_cols": 2}],
            }
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def log_message(self, *a):  # silence request logging
        pass


@pytest.fixture(scope="module")
def docling_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _DoclingHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _envelopes(spark, texts):
    return spark.createDataFrame(
        [(i, t.encode()) for i, t in enumerate(texts)],
        "correlation_id long, content binary",
    )


class TestDoclingHttpLive:
    def test_success_roundtrip_via_mapinpandas(self, spark, docling_server):
        df = _envelopes(spark, [f"document number {i} body text" for i in range(8)])
        out = extract_documents(
            df,
            extractor=docling_http_extractor(docling_server),
            max_concurrency=4,
        ).collect()
        assert len(out) == 8
        for r in out:
            assert r["extract_status"] == "SUCCESS"
            assert r["extract_page_count"] == 2
            assert r["extract_n_tables"] == 1
            assert r["extract_text"].startswith("document number")
            assert [t["page"] for t in r["extract_texts"]] == [1, 2]
            # verbatim service response stored, exactly what the
            # reference writes to processed/ (file-pipeline.yaml:207-218)
            stored = json.loads(r["extract_result_json"])
            assert stored["page_count"] == 2

    def test_http_error_routes_to_failed_row(self, spark, docling_server):
        df = _envelopes(spark, ["BOOM please", "fine document"])
        out = {
            r["correlation_id"]: r
            for r in extract_documents(
                df, extractor=docling_http_extractor(docling_server)
            ).collect()
        }
        assert out[1]["extract_status"] == "SUCCESS"
        assert out[0]["extract_status"] == "FAILED"
        assert "extraction failed" in out[0]["extract_error"]
