#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs every query in ``__spark_entry__.queries()`` on Spark and its
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, column names, and an order-insensitive value hash (columns
sorted by name, rows sorted, values stringified).

Usage: python3 oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import traceback

import duckdb

import __spark_entry__ as entrymod
from fbg_kafka_stream_file_transfer_spark import get_spark
from fbg_kafka_stream_file_transfer_spark.sources.tables import TABLE_NAMES


def normalize_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # stabilize float repr: round-trip via %.10g
        return "%.10g" % v
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    return str(v)


def _duck_kind(type_str: str) -> str:
    s = str(type_str).upper()
    if s in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if s in (
        "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    ):
        return "int"
    if s in ("FLOAT", "DOUBLE"):
        return "float"
    if s.startswith("DECIMAL"):
        return "decimal"
    return "other"


def _spark_kind(dt) -> str:
    n = dt.typeName()
    if n in ("byte", "short", "integer", "long"):
        return "int"
    if n in ("float", "double"):
        return "float"
    if n.startswith("decimal"):
        return "decimal"
    return "other"


def dtype_mismatches(spark_fields, duck_types: dict[str, str]) -> list[str]:
    """Columns whose ENGINE-NATIVE types diverge in a way the driver's
    pandas canonicalization turns into a value-hash mismatch even when
    the exact values agree.

    The local gate compares ``fetchall()`` values (exact Python ints),
    so a bare DuckDB ``sum(int)`` — which returns HUGEINT and reaches
    the driver as float64 ("1000.0") against Spark's int64 ("1000") —
    passed locally yet hash-failed on the driver (r6
    ``sample_split_assignment``). Flag that class structurally:

    - oracle HUGEINT vs Spark integral (fix: ``CAST(... AS BIGINT)``);
    - integer on one side vs float on the other (driver stringifies
      int64/float64 differently).

    decimal-vs-float pairs are left to the value hash: pandas folds
    both to float64, so they are driver-equivalent when values match.
    """
    out = []
    for f in spark_fields:
        dt = duck_types.get(f.name)
        if dt is None:
            continue
        sk, dk = _spark_kind(f.dataType), _duck_kind(dt)
        if dk == "hugeint" and sk != "float":
            out.append(
                f"{f.name}: oracle {dt} (pandas→float64) vs spark "
                f"{f.dataType.simpleString()} — CAST the oracle aggregate AS BIGINT"
            )
        elif {sk, dk} == {"int", "float"}:
            out.append(
                f"{f.name}: spark {f.dataType.simpleString()} vs oracle {dt} "
                f"— int/float stringify differently under the driver canonicalizer"
            )
        elif {sk, dk} == {"int", "decimal"}:
            # Same class as HUGEINT: pandas folds DuckDB DECIMAL to
            # float64 ("1000.0") while Spark's integral column stays
            # int64 ("1000") — local fetchall() values agree exactly,
            # the driver hash does not.
            out.append(
                f"{f.name}: spark {f.dataType.simpleString()} vs oracle {dt} "
                f"— decimal folds to float64 under pandas; CAST both sides to the "
                f"same family (BIGINT or DOUBLE)"
            )
    return out


def frame_digest(cols: list[str], rows: list[tuple]) -> str:
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(normalize_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 1

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark("oracle_check")
    # Replicate the driver gate's session conf: it runs Spark 4 defaults
    # (ANSI on), not this repo's session factory. SPARK_GRAFT_ANSI=true
    # sweeps every query under that conf (VERDICT r16 item 2).
    import os as _os

    _ansi = _os.environ.get("SPARK_GRAFT_ANSI")
    if _ansi:
        spark.conf.set("spark.sql.ansi.enabled", _ansi)

    passed, failed, skipped = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            try:
                n = fn(spark, sf_dir).count()
                print(f"~ {name}: rows-only, {n} rows")
                skipped.append(name)
            except Exception:
                print(f"✗ {name}: SPARK ERROR (rows-only)")
                traceback.print_exc()
                failed.append(name)
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"✗ {name}: SPARK ERROR")
            traceback.print_exc()
            failed.append(name)
            continue
        # The driver gate's pandas canonicalizer cannot sort list/dict
        # cells: an oracle-checked query with a top-level complex column
        # is PERMANENTLY uncertifiable (sim_center_vectors, r6 ERR).
        complex_cols = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if complex_cols:
            print(f"✗ {name}: driver-uncertifiable complex columns {complex_cols}")
            failed.append(name)
            continue
        try:
            rel = con.sql(sql)
            duck_types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
            cur = con.execute(sql)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception:
            print(f"✗ {name}: DUCKDB ERROR")
            traceback.print_exc()
            failed.append(name)
            continue
        problems = dtype_mismatches(sdf.schema.fields, duck_types)
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            sh, dh = frame_digest(scols, srows), frame_digest(dcols, drows)
            if sh != dh:
                problems.append("value-hash mismatch")
                # show a few differing lines for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                ls = sorted("|".join(normalize_cell(r[i]) for i in order_s) for r in srows)
                ld = sorted("|".join(normalize_cell(r[i]) for i in order_d) for r in drows)
                diff = [(a, b) for a, b in zip(ls, ld) if a != b][:3]
                for a, b in diff:
                    print(f"    spark:  {a[:200]}")
                    print(f"    duckdb: {b[:200]}")
        if problems:
            print(f"✗ {name}: {'; '.join(problems)}")
            failed.append(name)
        else:
            print(f"✓ {name} ({len(srows)} rows)")
            passed.append(name)

    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(skipped)} rows-only")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
