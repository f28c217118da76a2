"""Multi-split mirror for single-file parquet testdata (r8 verdict
item 4).

The driver's testdata tables are SINGLE parquet files — a shape a real
lake never has (a 100 TB table arrives in thousands of splits). A
1-file scan yields few input partitions, which (a) serializes every
CPU-heavy stage that runs before the first exchange, and (b) forced
the ``_spread`` repartition into hot query paths — an Exchange a real
cluster would never pay, distorting the bench and hiding
partition-skew behavior.

``multisplit_path(spark, src)`` returns a path whose scan arrives
ALREADY parallel: single-file sources are rewritten ONCE (value-
preserving parquet→parquet, ``repartition(defaultParallelism)``) into
``testdata_scale/splits/`` (gitignored — a per-environment cache, like
the sf1/sf10 probe sets) and the mirror is served on every later read.
Freshness is pinned to the source file's (size, mtime_ns): the driver
regenerates testdata per round, and a changed source atomically
rebuilds the mirror.

Commit protocol (r9 ADVICE: the shared ``.__tmp__`` dir let two
processes rmtree/rename each other's in-flight build, and the
rmtree(mdir)→rename gap left readers a transient missing mirror):
the same manifest-pointer pattern as the serving sink — each build
writes to a PROCESS-UNIQUE tmp, renames it to a process-unique
VERSIONED dir, then atomically ``os.replace``s the meta pointer at it.
Readers resolve through the pointer, so they never observe a missing
or partial mirror; concurrent builders produce distinct versions and
the last pointer wins; superseded versions are reaped only after a
grace period, so an in-flight reader of the previous version finishes
its scan.

What is NOT mirrored:
- directory datasets (already multi-split — the real-lake shape);
- tables under ``MIRROR_MIN_BYTES`` (real dimension tables arrive
  small; their 1-split scans are correct, not a testdata artifact);
- ``events.parquet`` (callers go through ``queries.core._events``,
  which sniffs the SOURCE file's physical timestamp type — nanos vs
  tz-naive micros — and a rewrite would change what it sniffs).

Kill switch: ``SPARK_GRAFT_NO_SPLIT_MIRROR=1`` serves originals
(for A/B measurements of the mirror itself).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
SPLITS_ROOT = os.environ.get(
    "SPARK_GRAFT_SPLITS_DIR",
    os.path.join(_REPO_ROOT, "testdata_scale", "splits"),
)
MIRROR_MIN_BYTES = 256 * 1024
NO_MIRROR_TABLES = ("events.parquet",)
# Tables whose per-row work is CPU-heavy (shingling, hashing, vector
# math over text/embedding payloads): mirrored at CORE-COUNT splits so
# the pre-exchange compute stage arrives parallel. Everything else is
# byte-proportional relational data and mirrors at ~1 MB/split — the
# real-lake shape (a 3 MB dimension arrives in 1-2 files, not 32; a
# measured 32-way mirror of it costs +0.3-0.9 s/query in pure task
# scheduling on local[32], PLANS.md r9 addendum 2).
CPU_HEAVY_TABLES = ("documents.parquet", "embeddings.parquet")
TARGET_SPLIT_BYTES = 1 << 20

# source path -> served path, per process (freshness is re-checked
# only once per session; the driver regenerates testdata between
# sessions, never during one)
_MIRROR_CACHE: dict[str, str] = {}


def _mirror_dir(src: str) -> str:
    """Mirror location for a source file: keyed by the source DIR's
    absolute-path hash + basename so /root/testdata/sf0.1 and some
    other sf0.1 can never collide."""
    d = os.path.dirname(os.path.abspath(src))
    tag = hashlib.md5(d.encode()).hexdigest()[:8]
    return os.path.join(
        SPLITS_ROOT, f"{os.path.basename(d)}_{tag}", os.path.basename(src)
    )


def multisplit_path(spark, src: str) -> str:
    """Path to read ``src`` from: the multi-split mirror when ``src``
    is a large single-file table (building it on first use), ``src``
    itself otherwise."""
    if os.environ.get("SPARK_GRAFT_NO_SPLIT_MIRROR") == "1":
        return src
    cached = _MIRROR_CACHE.get(src)
    if cached is not None:
        return cached
    if not os.path.isfile(src) or os.path.basename(src) in NO_MIRROR_TABLES:
        _MIRROR_CACHE[src] = src
        return src
    try:
        st = os.stat(src)
    except OSError:
        _MIRROR_CACHE[src] = src
        return src
    if st.st_size < MIRROR_MIN_BYTES:
        _MIRROR_CACHE[src] = src
        return src

    cores = max(int(spark.sparkContext.defaultParallelism), 2)
    if os.path.basename(src) in CPU_HEAVY_TABLES:
        n = cores
    else:
        n = max(2, min(cores, int(st.st_size // TARGET_SPLIT_BYTES)))

    mdir = _mirror_dir(src)
    meta_path = mdir + ".src.json"
    # split count is part of the identity: a policy change (or a
    # different core count) must rebuild, never serve the old layout
    want = {"size": st.st_size, "mtime_ns": st.st_mtime_ns, "splits": n}
    served = _resolve_current(mdir, meta_path, want)
    if served is not None:
        _MIRROR_CACHE[src] = served
        return served

    # process-unique version tag: concurrent builders can never touch
    # each other's tmp, and the committed dir name is collision-free
    vtag = f"{os.getpid()}_{uuid.uuid4().hex[:8]}"
    vdir = f"{mdir}.__v_{vtag}"
    tmp = f"{mdir}.__tmp_{vtag}"
    try:
        os.makedirs(os.path.dirname(mdir), exist_ok=True)
        # round-robin repartition: balanced splits whatever the key
        # distribution; a parquet→parquet rewrite is value-preserving
        # for every type Spark read in the first place
        spark.read.parquet(src).repartition(n).write.mode(
            "overwrite"
        ).parquet(tmp)
        os.rename(tmp, vdir)
        mtmp = f"{meta_path}.{vtag}"
        with open(mtmp, "w") as f:
            json.dump({**want, "dir": os.path.basename(vdir)}, f)
        os.replace(mtmp, meta_path)  # the atomic commit point
    except Exception:  # noqa: BLE001 — mirror is an optimization only
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(vdir, ignore_errors=True)
        _MIRROR_CACHE[src] = src
        return src
    _reap_superseded(mdir, keep=os.path.basename(vdir))
    _MIRROR_CACHE[src] = vdir
    return vdir


# superseded versions / orphan tmps older than this are reaped; long
# enough that any reader mid-scan of the previous version finishes
_REAP_GRACE_SECONDS = 600


def _resolve_current(mdir: str, meta_path: str, want: dict):
    """Served path for the current (size, mtime_ns, splits) identity,
    or None when absent/stale/corrupt. Meta without a ``dir`` field is
    the pre-r10 layout (content at ``mdir`` itself) — still served
    when fresh, so existing mirrors stay warm across the upgrade."""
    if not os.path.isfile(meta_path):
        return None
    try:
        with open(meta_path) as f:
            have = json.load(f)
    except Exception:  # noqa: BLE001 — unreadable meta ⇒ rebuild
        return None
    if not isinstance(have, dict):
        return None
    if {k: have.get(k) for k in want} != want:
        return None
    sub = have.get("dir")
    sdir = os.path.join(os.path.dirname(mdir), sub) if sub else mdir
    return sdir if os.path.isdir(sdir) else None


def _reap_superseded(mdir: str, keep: str) -> None:
    """Remove versioned mirrors and orphaned tmps of ``mdir`` other
    than ``keep``, but only once they are older than the grace period
    — a concurrent reader that resolved the previous pointer may still
    be scanning it. Best-effort: reaping is hygiene, never load-bearing."""
    import time

    parent, base = os.path.dirname(mdir), os.path.basename(mdir)
    now = time.time()
    try:
        names = os.listdir(parent)
    except OSError:
        return
    for name in names:
        superseded = name == base or name.startswith(  # base = pre-r10 layout
            (f"{base}.__v_", f"{base}.__tmp_", f"{base}.__tmp__")
        )
        if name == keep or not superseded:
            continue
        p = os.path.join(parent, name)
        try:
            if now - os.path.getmtime(p) > _REAP_GRACE_SECONDS:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            continue
