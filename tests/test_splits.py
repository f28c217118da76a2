"""Multi-split testdata mirror (sources/splits.py, r8 verdict item 4):
single-file parquet testdata is served through a value-preserving
N-split mirror so scans arrive parallel like a real lake's — and the
``_spread`` repartition becomes a NO-OP on the bench path instead of
an Exchange a real cluster would never pay."""

import os
import shutil

import pytest

from defi_features_data_pipeline_spark.sources import splits as S

SF_DIR = "/root/testdata/sf0.1"   # large enough to cross MIRROR_MIN_BYTES
SF_SMALL = "/root/testdata/sf0.01"


def test_mirror_is_multisplit_and_value_preserving(spark):
    src = os.path.join(SF_DIR, "documents.parquet")
    path = S.multisplit_path(spark, src)
    assert path != src and os.path.isdir(path)
    parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(parts) >= 2, "mirror is not multi-split"
    a = spark.read.parquet(src)
    b = spark.read.parquet(path)
    assert a.count() == b.count()
    assert a.schema == b.schema
    # exact content equality, order-insensitive
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_spread_is_noop_on_mirrored_scan(spark):
    """THE bench-path assertion: a mirrored corpus scan arrives with
    >= defaultParallelism partitions, so _spread returns the SAME
    DataFrame — no repartition Exchange in the hot queries."""
    from defi_features_data_pipeline_spark.queries.extensions import _spread, _t

    d = _t(spark, SF_DIR, "documents")
    assert d.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    assert _spread(spark, d) is d


def test_events_and_small_tables_not_mirrored(spark):
    ev = os.path.join(SF_DIR, "events.parquet")
    assert S.multisplit_path(spark, ev) == ev  # _events sniffs the source
    nation = os.path.join(SF_SMALL, "nation.parquet")
    assert S.multisplit_path(spark, nation) == nation  # under threshold


def test_mirror_rebuilds_when_source_changes(spark, tmp_path, monkeypatch):
    """Freshness is pinned to (size, mtime_ns): the driver regenerates
    testdata per round, and a stale mirror must rebuild — never serve
    rows from the previous round's corpus."""
    src_dir = tmp_path / "sfX"
    src_dir.mkdir()
    src = str(src_dir / "documents.parquet")
    shutil.copyfile(os.path.join(SF_DIR, "documents.parquet"), src)
    monkeypatch.setattr(S, "SPLITS_ROOT", str(tmp_path / "splits"))
    monkeypatch.setattr(S, "_MIRROR_CACHE", {})
    m1 = S.multisplit_path(spark, src)
    assert os.path.isdir(m1)
    n1 = spark.read.parquet(m1).count()
    # halve the source: a fresh corpus with different (size, mtime)
    half = spark.read.parquet(src).limit(n1 // 2).toPandas()
    os.remove(src)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(half), src)
    S._MIRROR_CACHE.clear()  # new session simulation
    m2 = S.multisplit_path(spark, src)
    assert spark.read.parquet(m2).count() == n1 // 2, "stale mirror served"


def test_kill_switch_serves_original(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_NO_SPLIT_MIRROR", "1")
    src = os.path.join(SF_DIR, "documents.parquet")
    assert S.multisplit_path(spark, src) == src


def test_mirror_commit_is_pointer_swap_with_grace(spark, tmp_path, monkeypatch):
    """r9 ADVICE: the commit must be an atomic meta-pointer replace —
    a rebuild leaves the SUPERSEDED version on disk (an in-flight
    reader of the old pointer finishes its scan; reaping waits out a
    grace period), the new pointer resolves immediately, and tmp dirs
    are process-unique (no shared .__tmp__ for two processes to
    clobber)."""
    import json

    src_dir = tmp_path / "sfY"
    src_dir.mkdir()
    src = str(src_dir / "documents.parquet")
    shutil.copyfile(os.path.join(SF_DIR, "documents.parquet"), src)
    monkeypatch.setattr(S, "SPLITS_ROOT", str(tmp_path / "splits"))
    monkeypatch.setattr(S, "_MIRROR_CACHE", {})
    m1 = S.multisplit_path(spark, src)
    assert os.path.isdir(m1) and ".__v_" in os.path.basename(m1)
    mdir = S._mirror_dir(src)
    meta = json.load(open(mdir + ".src.json"))
    assert meta["dir"] == os.path.basename(m1)
    # regenerate the source → rebuild commits a NEW version
    n1 = spark.read.parquet(m1).count()
    half = spark.read.parquet(src).limit(n1 // 2).toPandas()
    os.remove(src)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(half), src)
    S._MIRROR_CACHE.clear()
    m2 = S.multisplit_path(spark, src)
    assert m2 != m1
    assert os.path.isdir(m1), "superseded version reaped inside grace"
    assert spark.read.parquet(m2).count() == n1 // 2
    # past the grace period, a later build reaps the superseded version
    old = os.path.getmtime(m1) - S._REAP_GRACE_SECONDS - 5
    os.utime(m1, (old, old))
    S._reap_superseded(mdir, keep=os.path.basename(m2))
    assert not os.path.isdir(m1)
    assert os.path.isdir(m2)


def test_mirror_legacy_layout_served_when_fresh(spark, tmp_path, monkeypatch):
    """Meta without a `dir` field is the pre-r10 layout (content at
    the mirror dir itself) — it must keep serving while fresh, so the
    protocol upgrade does not cold-rebuild every existing mirror."""
    import json

    src_dir = tmp_path / "sfZ"
    src_dir.mkdir()
    src = str(src_dir / "documents.parquet")
    shutil.copyfile(os.path.join(SF_DIR, "documents.parquet"), src)
    monkeypatch.setattr(S, "SPLITS_ROOT", str(tmp_path / "splits"))
    monkeypatch.setattr(S, "_MIRROR_CACHE", {})
    m1 = S.multisplit_path(spark, src)
    mdir = S._mirror_dir(src)
    # rewrite as the legacy layout: content at mdir, meta without dir
    meta_path = mdir + ".src.json"
    meta = json.load(open(meta_path))
    os.rename(m1, mdir)
    legacy = {k: meta[k] for k in ("size", "mtime_ns", "splits")}
    with open(meta_path, "w") as f:
        json.dump(legacy, f)
    S._MIRROR_CACHE.clear()
    assert S.multisplit_path(spark, src) == mdir
