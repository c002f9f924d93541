"""CSV corpus source: RFC 4180 dialect, quarantine, cross-engine interop."""

from __future__ import annotations

from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.sources.csv import (
    DOCUMENTS_CSV_SCHEMA,
    read_csv_corpus,
    write_csv_shards,
)

_HEADER = "doc_id,text,lang,source,n_chars"


def _write_corpus(tmp_path):
    rows = [f'{i},"doc {i}",en,s,6' for i in range(10)]
    # field-count mismatch and type mismatch must quarantine, not null
    rows.insert(3, '3,"only three fields",en')
    rows.insert(7, 'not_a_number,"bad id",en,s,6')
    p = tmp_path / "corpus.csv"
    p.write_text(_HEADER + "\n" + "\n".join(rows) + "\n")
    return str(p)


class TestCsvSource:
    def test_split_and_accounting(self, spark, tmp_path):
        r = read_csv_corpus(spark, _write_corpus(tmp_path))
        assert r.n_clean == 10 and r.n_corrupt == 2
        assert r.clean.schema == DOCUMENTS_CSV_SCHEMA
        bad = [row["raw_record"] for row in r.quarantine.collect()]
        assert len(bad) == 2
        assert any(b.startswith("not_a_number") for b in bad)

    def test_rfc4180_embedded_specials_roundtrip(self, spark, tmp_path):
        hostile = 'a,"b"\nc'  # comma, doubled-on-write quote, newline
        src = spark.createDataFrame(
            [(i, f"doc {i} {hostile}", "en", "s", 6) for i in range(20)],
            DOCUMENTS_CSV_SCHEMA,
        )
        out = str(tmp_path / "shards")
        write_csv_shards(src, out, "doc_id", n_shards=4)
        r = read_csv_corpus(spark, out)
        assert r.n_corrupt == 0 and r.n_clean == 20
        back = r.clean.select(*[f.name for f in DOCUMENTS_CSV_SCHEMA.fields])
        assert src.exceptAll(back).count() == 0
        assert back.exceptAll(src).count() == 0

    def test_shard_map_matches_jsonl_convention(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.sources.jsonl import (
            shard_column,
        )

        src = spark.createDataFrame(
            [(i, f"doc {i}", "en", "s", 6) for i in range(50)],
            DOCUMENTS_CSV_SCHEMA,
        )
        out = str(tmp_path / "shards")
        write_csv_shards(src, out, "doc_id", n_shards=4)
        got = (
            read_csv_corpus(spark, out)
            .clean.select(
                "doc_id",
                F.col("shard").cast("int").alias("disk_shard"),
                shard_column(F.col("doc_id"), 4).alias("expected"),
            )
            .filter(F.col("disk_shard") != F.col("expected"))
            .count()
        )
        assert got == 0

    def test_duckdb_reads_spark_shards(self, spark, tmp_path):
        """The written dialect is real RFC 4180: a non-Spark reader
        (DuckDB) must parse the shards to identical aggregates."""
        import duckdb

        hostile = 'x,"y"\nz'
        src = spark.createDataFrame(
            [(i, f"doc {i} {hostile}", "en", "s", 6) for i in range(30)],
            DOCUMENTS_CSV_SCHEMA,
        )
        out = str(tmp_path / "shards")
        write_csv_shards(src, out, "doc_id", n_shards=2)
        con = duckdb.connect()
        n, chars = con.execute(
            f"""SELECT count(*), CAST(sum(length(text)) AS BIGINT)
            FROM read_csv('{out}/*/*.csv', header=true, columns={{
              'doc_id':'BIGINT','text':'VARCHAR','lang':'VARCHAR',
              'source':'VARCHAR','n_chars':'BIGINT'}})"""
        ).fetchone()
        sn, schars = src.agg(
            F.count("*"), F.sum(F.length("text")).cast("bigint")
        ).collect()[0]
        assert (n, chars) == (sn, schars)

    def test_empty_string_and_null_are_distinct(self, spark, tmp_path):
        """RFC 4180 has no NULL: the dialect pins the Hive \\N sentinel
        so text='' and text=NULL survive the round-trip distinctly
        (without it, nullValue='' folds '' to NULL — r8 review)."""
        src = spark.createDataFrame(
            [(1, "a", "en", "s", 1), (2, "", "en", "s", 0),
             (3, None, "en", "s", None)],
            DOCUMENTS_CSV_SCHEMA,
        )
        out = str(tmp_path / "shards")
        write_csv_shards(src, out, "doc_id", n_shards=2)
        got = {
            r["doc_id"]: r["text"]
            for r in read_csv_corpus(spark, out).clean.collect()
        }
        assert got[1] == "a" and got[2] == "" and got[3] is None

    def test_duckdb_reads_null_sentinel(self, spark, tmp_path):
        import duckdb

        src = spark.createDataFrame(
            [(1, "a", "en", "s", 1), (2, None, "en", "s", None)],
            DOCUMENTS_CSV_SCHEMA,
        )
        out = str(tmp_path / "shards")
        write_csv_shards(src, out, "doc_id", n_shards=1)
        rows = duckdb.connect().execute(
            f"""SELECT doc_id, text FROM read_csv('{out}/*/*.csv',
            header=true, nullstr='\\N', columns={{
              'doc_id':'BIGINT','text':'VARCHAR','lang':'VARCHAR',
              'source':'VARCHAR','n_chars':'BIGINT'}}) ORDER BY doc_id"""
        ).fetchall()
        assert rows == [(1, "a"), (2, None)]
