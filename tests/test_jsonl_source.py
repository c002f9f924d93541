"""JSONL corpus source: schema enforcement + corrupt-line quarantine."""

from __future__ import annotations

import json

from fbg_kafka_stream_file_transfer_spark.sources.jsonl import (
    DOCUMENTS_JSONL_SCHEMA,
    read_jsonl,
)


def _write_corpus(tmp_path):
    lines = [
        json.dumps(
            {"doc_id": i, "text": f"doc {i}", "lang": "en",
             "source": "s", "n_chars": 6}
        )
        for i in range(10)
    ]
    lines.insert(3, "{not valid json at all")
    lines.insert(7, '["an", "array", "not", "an", "object"]')
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


class TestJsonlSource:
    def test_split_and_accounting(self, spark, tmp_path):
        r = read_jsonl(spark, _write_corpus(tmp_path))
        assert r.n_clean == 10 and r.n_corrupt == 2
        assert r.clean.count() == 10
        assert r.clean.schema == DOCUMENTS_JSONL_SCHEMA
        bad = [row["raw_line"] for row in r.quarantine.collect()]
        assert len(bad) == 2
        assert any(b.startswith("{not valid") for b in bad)

    def test_clean_rows_typed(self, spark, tmp_path):
        r = read_jsonl(spark, _write_corpus(tmp_path))
        rows = {row["doc_id"]: row for row in r.clean.collect()}
        assert rows[4]["text"] == "doc 4"
        assert isinstance(rows[4]["n_chars"], int)

    def test_lazy_mode_skips_action(self, spark, tmp_path):
        r = read_jsonl(spark, _write_corpus(tmp_path), count=False)
        assert r.n_clean == -1 and r.n_corrupt == -1
        assert r.clean.count() == 10  # frames still usable
