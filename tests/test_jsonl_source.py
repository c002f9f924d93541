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


# ---- round 8: sharded JSONL export ----

from pyspark.sql import functions as Fn  # noqa: E402


def test_write_jsonl_shards_roundtrip_and_determinism(spark, tmp_path):
    from fbg_kafka_stream_file_transfer_spark.sources.jsonl import (
        DOCUMENTS_JSONL_SCHEMA,
        read_jsonl,
        shard_column,
        write_jsonl_shards,
    )

    rows = [
        (1, 'uniçode "quoted"\nnewline', "en", "web", 23),
        (2, None, "de", "web", 0),  # NULL text must survive
        (3, "plain", "fr", "books", 5),
    ] + [(i, f"doc {i}", "en", "web", 6) for i in range(10, 40)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "corpus")
    write_jsonl_shards(df, out, "doc_id", n_shards=4)

    back = read_jsonl(spark, out, DOCUMENTS_JSONL_SCHEMA)
    assert back.n_corrupt == 0 and back.n_clean == len(rows)
    got = {r.doc_id: r for r in back.clean.collect()}
    assert got[1].text == 'uniçode "quoted"\nnewline'  # escaping survives
    assert got[2].text is None
    assert got[3].source == "books"

    # deterministic shard map: directory layout matches shard_column
    import pathlib

    dirs = sorted(
        p.name for p in pathlib.Path(out).iterdir() if p.name.startswith("shard=")
    )
    assert len(dirs) <= 4
    expected = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", shard_column(Fn.col("doc_id"), 4).alias("s")
        ).collect()
    }
    for d in pathlib.Path(out).glob("shard=*"):
        sh = int(d.name.split("=")[1])
        lines = []
        for f in d.glob("part-*"):
            lines += f.read_text().splitlines()
        import json as _json

        for line in lines:
            assert expected[_json.loads(line)["doc_id"]] == sh
        # small-files guard: one part file per shard directory
        assert len(list(d.glob("part-*.txt"))) == 1


def test_write_jsonl_shards_gzip(spark, tmp_path):
    from fbg_kafka_stream_file_transfer_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl_shards,
    )

    df = spark.createDataFrame(
        [(i, "text " * 10, "en", "web", 50) for i in range(20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "gz")
    write_jsonl_shards(df, out, "doc_id", n_shards=2, compression="gzip")
    import pathlib

    gz_files = list(pathlib.Path(out).glob("shard=*/part-*.gz"))
    assert gz_files  # compressed wire format on disk
    back = read_jsonl(spark, out)
    assert back.n_clean == 20 and back.n_corrupt == 0
