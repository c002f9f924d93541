#!/usr/bin/env python3
"""End-to-end example: the table-maintenance day a lakehouse actually
runs — build, merge, layout, verify — over the events fixture.

1. bootstrap            — events persisted as a partitioned keyed table
2. incremental MERGE    — a day's changelog (upserts + tombstones)
                          applied with the ordered ts-conditional
                          merge: only touched partitions rewritten,
                          stale/redelivered writes are no-ops
3. redelivery drill     — the SAME delta replayed verbatim; the table
                          must not change (effectively-once contract)
4. compaction           — small files binned to target size with the
                          distributed prefix-sum planner
5. Z-order layout       — Morton clustering on (user_id, value) so
                          range predicates prune whole files
6. verification         — expectation suite over the final table

    python examples/run_maintenance.py [sf_dir] [work_dir]

Default sf_dir=/root/testdata/sf0.001. Every step is delta-sized or
one-pass; nothing collects more than a report-sized frame.
"""

from __future__ import annotations

import pathlib
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from fbg_kafka_stream_file_transfer_spark import get_spark  # noqa: E402
from fbg_kafka_stream_file_transfer_spark.operators import expectations as X  # noqa: E402
from fbg_kafka_stream_file_transfer_spark.operators.layout import (  # noqa: E402
    cluster_by_morton,
)
from fbg_kafka_stream_file_transfer_spark.operators.scale import (  # noqa: E402
    compact_to_target,
    merge_into_partitioned,
)
from fbg_kafka_stream_file_transfer_spark.sources.tables import load_table  # noqa: E402


def main(sf_dir: str, work_dir: str) -> None:
    spark = get_spark("maintenance-example")
    shutil.rmtree(work_dir, ignore_errors=True)
    table = f"{work_dir}/events_by_bucket"

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .withColumn("pt", (F.col("user_id") % 8).cast("int"))
    )

    print("== 1. bootstrap the keyed table (8 hash partitions) ==")
    ev.write.partitionBy("pt").parquet(table, mode="overwrite")
    n0 = spark.read.parquet(table).count()
    print(f"table rows: {n0}")

    print("\n== 2. incremental MERGE of a day's changelog ==")
    # synthetic delta: every 'click' user gets a fresh upsert, every
    # 'error' user a tombstone — but only in partitions 0-2, so 5/8
    # partitions must survive untouched
    delta = (
        ev.filter(F.col("pt") < 3)
        .filter(F.col("event_type").isin("click", "error"))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAY"))
        .withColumn(
            "op",
            F.when(F.col("event_type") == "error", "D").otherwise("U"),
        )
    )
    touched = merge_into_partitioned(
        spark, table, delta, ["event_id"], ["pt"],
        op_col="op", ts_col="ts", tiebreak_cols=("event_id",),
    )
    n1 = spark.read.parquet(table).count()
    print(f"touched partitions: {touched}/8; rows {n0} -> {n1}")

    print("\n== 3. redelivery drill: replay the same delta ==")
    merge_into_partitioned(
        spark, table, delta, ["event_id"], ["pt"],
        op_col="op", ts_col="ts", tiebreak_cols=("event_id",),
    )
    n2 = spark.read.parquet(table).count()
    assert n2 == n1, f"replay changed the table: {n1} -> {n2}"
    print(f"rows unchanged: {n2} (effectively-once)")

    print("\n== 4. compact to ~256 KiB bins (under the table lease) ==")
    # compaction scans the live merge target, so it takes the SAME
    # single-writer lease the merges take: a merge racing this
    # compaction now fails loudly (ConcurrentWriterError) instead of
    # mutating the table mid-scan. Steps 2-3 could not hold this lock
    # themselves — merge_into_partitioned acquires it internally.
    from fbg_kafka_stream_file_transfer_spark.operators.table import (
        table_write_lock,
    )

    with table_write_lock(spark, table, holder="maintenance-compaction"):
        cur = spark.read.parquet(table).withColumn(
            "row_bytes", F.length(F.to_json(F.struct("*")))
        )
        compact_to_target(
            cur, ["pt", "event_id"], "row_bytes", 256 * 1024,
            f"{work_dir}/compacted",
        )
    import glob

    files = glob.glob(f"{work_dir}/compacted/compaction_bin=*/*.parquet")
    print(f"compacted into {len(files)} files")

    print("\n== 5. Z-order (Morton) layout on (user_id, value) ==")
    cluster_by_morton(
        spark.read.parquet(table), "user_id", "value", 16
    ).write.parquet(f"{work_dir}/zordered", mode="overwrite")
    print("clustered write done (range predicates prune whole files)")

    print("\n== 6. expectation suite over the final table ==")
    final = spark.read.parquet(table)
    suite = X.expectation_suite(
        X.check_rows(
            final,
            {
                "event_id_not_null": F.col("event_id").isNotNull(),
                "ts_not_null": F.col("ts").isNotNull(),
                "type_in_set": F.col("event_type").isin(
                    "click", "view", "signup", "purchase", "error"
                ),
                # the delta tombstoned every error row in pt 0-2; none
                # may survive there (pt>=3 was out of merge scope)
                "no_surviving_tombstone_type": (F.col("pt") >= 3)
                | (F.col("event_type") != "error"),
            },
        ),
        X.check_unique(final, ["event_id"]),
    )
    suite.show(truncate=False)
    failed = [r.rule for r in suite.collect() if not r.pass_flag]
    assert not failed, f"maintenance left the table in violation: {failed}"

    print("\n== 7. manifest lifecycle: atomic commits + streaming CDF tail ==")
    # the same table under the r9 commit protocol: versioned manifest
    # commits (readers see old-or-new, never torn), a compaction that
    # is invisible to the change feed, and a downstream consumer
    # tailing every commit's row-level diff as a stream
    from fbg_kafka_stream_file_transfer_spark.operators.table import (
        ManifestTable,
    )
    from fbg_kafka_stream_file_transfer_spark.streaming.table_tail import (
        read_changes_feed,
        start_table_changes_tail,
    )

    mpath = f"{work_dir}/events_manifest"
    mt = ManifestTable(spark, mpath)
    mt.create(final, ["pt"])
    q = start_table_changes_tail(
        spark, mpath, f"{work_dir}/feed", f"{work_dir}/feed_ckpt"
    )
    try:
        q.processAllAvailable()  # v1 = initial snapshot as inserts
        delta2 = (
            final.filter((F.col("pt") == 0) & (F.col("event_type") == "view"))
            .limit(50)
            .withColumn("op", F.lit("D"))
        )
        merge_into_partitioned(  # v2: atomic manifest commit
            spark, mpath, delta2, ["event_id"], ["pt"], op_col="op"
        )
        mt.compact(retain_versions=3)  # v3: maintenance, no data change
        q.processAllAvailable()
    finally:
        q.stop()
    feed = read_changes_feed(spark, mpath, f"{work_dir}/feed")
    feed.groupBy("_commit_version", "_change_type").count().orderBy(
        "_commit_version", "_change_type"
    ).show()
    n_compaction_rows = feed.filter(F.col("_commit_version") == 3).count()
    assert n_compaction_rows == 0, "compaction leaked into the change feed"
    print(
        f"table at v{mt.current_version()}; compaction emitted "
        f"{n_compaction_rows} feed rows (maintenance is invisible)"
    )
    # incremental consumption + feed retention (r10): a consumer that
    # tracks its cursor reads only NEW commits, and the feed directory
    # itself is pruned to a bounded window
    from fbg_kafka_stream_file_transfer_spark.streaming.table_tail import (
        prune_changes_feed,
    )

    new_only = read_changes_feed(
        spark, mpath, f"{work_dir}/feed", since_version=1
    )
    print(f"cursor read since v1: {new_only.count()} rows (v2+v3 only)")
    pruned = prune_changes_feed(spark, f"{work_dir}/feed", keep_versions=2)
    print(f"feed pruned through v{max(pruned, default=0)}; "
          "a consumer whose cursor fell behind now gets a loud error")
    # metadata-only rollback (r10): restore re-references v1's entries
    # — zero data I/O at any table size — and the commit log shows it
    n_before = mt.read().count()
    v = mt.restore(1)
    print(f"restored to v1 as v{v}: {mt.read().count()} rows "
          f"(was {n_before} after the delete)")
    for h in mt.history():
        print(f"  v{h['version']}  {h['n_partitions']} partitions  "
              f"uuid={str(h['commit_uuid'])[:8]}…  {h['committed_utc']}")
    mt.vacuum()  # sweeps debris, preserves all retained history
    # stats-pruned read (r11): every commit recorded per-partition
    # min/max/null bounds; a where-conjunction skips partitions whose
    # bounds exclude it BEFORE any file is listed, then the same
    # predicate runs as the exact row filter
    lo = mt.read().agg(F.min("event_id")).collect()[0][0]
    scanned, total = mt.prune_stats([("event_id", "<", lo)])
    print(f"stats skip: event_id < {lo} admits {scanned}/{total} "
          "partitions — excluded from the manifest alone, no file "
          "listed")
    where = [("event_id", "<=", lo + 100)]
    print(f"{mt.read(where=where).count()} rows for event_id <= "
          f"{lo + 100} (bounds prune first, the exact filter decides)")
    # optimistic commit (r11): stage a partition rewrite WITHOUT the
    # lease, publish under a metadata-sized hold; had another writer
    # committed a disjoint partition meanwhile, the publish rebases
    pt0 = mt.read().select("pt").distinct().limit(1).collect()[0][0]
    rewrite = mt.read(partitions=[(pt0,)]).withColumn(
        "event_type", F.upper(F.col("event_type"))
    )
    staged = mt.stage_commit(rewrite, [(pt0,)])
    v = mt.commit_staged(staged, retain_versions=10)
    print(f"optimistic rewrite of pt={pt0} published as v{v} "
          "(lease held only for the metadata publish)")
    # file-granular skipping (r12): a clustered compaction sorts each
    # partition by the predicate column so the per-FILE bounds the
    # commit records become selective — a range read then lists only
    # the surviving files, one level below the partition pruning above
    n_rows = mt.read().count()
    per_file = max(25, n_rows // 32)  # ≥2 files/partition at any sf
    mt.compact(
        cluster_by=["event_id"],
        target_records_per_file=per_file,
        retain_versions=3,
    )
    hi = mt.read().agg(F.max("event_id")).collect()[0][0]
    w = [("event_id", ">=", (lo + hi) * 3 // 4)]
    ps = mt.prune_file_stats(w)
    print(
        f"clustered file skip: {ps['files_scanned']}/{ps['files_total']}"
        f" files scanned for the top event_id quartile"
        f" ({ps['entries_scanned']}/{ps['entries_total']} partitions)"
    )
    # the natural partition-column predicate prunes too (r12): this
    # lists ONE directory, not every live partition
    s2, t2 = mt.prune_stats([("pt", "=", pt0)])
    print(f"partition-key where-clause: {s2}/{t2} partitions scanned")
    # selective compaction (r13): the small-file report names the hot
    # partitions a CDC sink fragmented; only THOSE are rewritten —
    # untouched entries are re-referenced verbatim, O(selected) I/O
    rep = mt.small_file_report()
    worst = max(rep, key=lambda r: r["files"])
    print(f"small-file report: worst partition {worst['values']} holds "
          f"{worst['files']} files")
    n = mt.compact(min_files=max(2, worst["files"]))  # keep-current retention
    print(f"selective compact rewrote {n} partition(s); bare compact "
          "no longer truncates history (retain defaults to keep-current)")
    # conditional MERGE (r13): partial-column WHEN MATCHED AND cond
    # UPDATE SET — the delta carries only the key, partition, and the
    # expression inputs; every other column keeps its stored value
    bump = (
        mt.read(partitions=[(pt0,)])
        .select("event_id", "pt")
        .limit(20)
        .withColumn("amount", F.lit(5.0))
    )
    merge_into_partitioned(
        spark, mpath, bump, ["event_id"], ["pt"],
        when_matched_update={"value": "t.value + s.amount"},
        when_matched_condition="s.amount > 0",
        when_not_matched_insert=False,
    )
    print("conditional merge: 20 rows partially updated "
          f"(table still {mt.read().count()} rows — update-only)")
    # DML (r13): DELETE/UPDATE as atomic statements — a whole-
    # partition delete drops the entry metadata-only
    dr = mt.delete_where([("pt", "=", 7)])
    print(f"DELETE pt=7: {dr['rows_deleted']} rows, "
          f"{dr['entries_dropped']} entry dropped metadata-only")
    ur = mt.update_where([("value", "<", 1.0)], set={"value": "value + 1"})
    print(f"UPDATE value<1: {ur['rows_updated']} rows case-projected")
    # metadata-only COUNT (r13): the manifest answers; no scan runs
    d = mt.count(where=[("pt", "in", [0, 1])], detail=True)
    print(f"metadata count(pt in (0,1)) = {d['rows']} rows from "
          f"{d['entries_metadata']} entries, {d['entries_scanned']} scanned")
    # Z-ordered compaction (r13): multi-dim locality INSIDE the
    # manifest table — predicates on either dim skip files
    zrows = mt.count()
    mt.compact(zorder_by=["event_id", "user_id"],
               target_records_per_file=max(1, zrows // 64))
    ucut = mt.read().agg(F.max("user_id")).collect()[0][0] * 3 // 4
    zi = mt.prune_file_stats([("user_id", ">=", ucut)])
    print(f"zorder: user_id>={ucut} scans {zi['files_scanned']}/"
          f"{zi['files_total']} files")
    # shallow clone + integrity audit (r13): a zero-copy writable
    # fork, and the check to run before trusting it
    cl = mt.clone_to(f"{work_dir}/events_clone")
    print(f"shallow clone: {cl.count()} rows, zero bytes copied, "
          f"audit ok={cl.verify_table()['ok']}")
    print("history tail:", [
        (h['version'], (h['op'] or {}).get('name'))
        for h in mt.history()[-3:]
    ])
# file-granular DML (r14): after the Z-ordered rewrite above the
    # per-file bounds are selective, so a point statement rewrites
    # only the files whose bounds admit it — the rest carry forward
    # byte-identically as carried references inside the same entry
    victim = mt.read().agg(F.max("event_id")).collect()[0][0] // 2
    dr2 = mt.delete_where([("event_id", "=", victim)])
    print(
        f"file-granular DELETE event_id={victim}: "
        f"{dr2['files_rewritten']} file(s) rewritten, "
        f"{dr2['files_carried']} carried untouched "
        f"({dr2['entries_file_scoped']} entries file-scoped)"
    )
    # file-granular MERGE (r14): a scattered point-key CDC batch —
    # the exact key-set selection rewrites only the files that hold
    # a contested key, even though the keys span the whole id range
    some = [r.event_id for r in mt.read()
            .select("event_id").orderBy("event_id").limit(1).collect()]
    some += [r.event_id for r in mt.read()
             .select("event_id").orderBy(F.desc("event_id"))
             .limit(1).collect()]
    batch = (
        mt.read()
        .filter(F.col("event_id").isin(some))
        .select("event_id", "pt")
        .withColumn("value", F.lit(-1.0))
    )
    merge_into_partitioned(
        spark, mpath, batch, ["event_id"], ["pt"],
        when_matched_update={"value": "s.value"},
        when_not_matched_insert=False,
    )
    mop = [h["op"] for h in mt.history()
           if (h.get("op") or {}).get("name") == "merge"][-1]
    print(f"scattered-key merge: {mop.get('file_scoped', 0)} of "
          f"{mop['n_partitions']} touched partitions file-scoped")
    # metadata bounds (r14): the manifest answers MIN/MAX too
    print(f"stats_extent(event_id) = {mt.stats_extent('event_id')} "
          "(zero data I/O — the TTL sink's watermark source)")
    # schema evolution (r13): drop is metadata-only and tombstoned;
    # the drop commit is invisible to the change feed
    vb = mt.current_version()
    droppable = next(
        c for c in ("props", "value") if c in mt.read().columns
    )
    vd = mt.drop_columns([droppable])
    print(f"dropped {droppable!r} as v{vd}: zero data I/O, "
          f"{mt.changes(vb, vd).count()} feed rows (metadata-only), "
          "name tombstoned against resurrection")
    # partition evolution (r13): one lease-held rewrite; the boundary
    # diffs to ZERO rows so a tailing consumer never blips
    vb = mt.current_version()
    mt.read().select("event_type").distinct().count()  # warm
    ve = mt.repartition_table(["event_type"])
    print(f"repartitioned pt->event_type as v{ve}: boundary diff = "
          f"{mt.changes(vb, ve).count()} rows; new-key pruning: "
          f"{mt.prune_stats([('event_type', '=', 'click')])}")
    spark.stop()


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/maintenance_demo"
    main(sf, work)
