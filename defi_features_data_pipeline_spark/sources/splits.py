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
rebuilds the mirror (tmp write + rename; a crash mid-build leaves the
old mirror or no mirror, never a partial one).

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
    if os.path.isdir(mdir) and os.path.isfile(meta_path):
        try:
            with open(meta_path) as f:
                have = json.load(f)
        except Exception:  # noqa: BLE001 — unreadable meta ⇒ rebuild
            have = None
        if have == want:
            _MIRROR_CACHE[src] = mdir
            return mdir

    tmp = mdir + ".__tmp__"
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        os.makedirs(os.path.dirname(mdir), exist_ok=True)
        # round-robin repartition: balanced splits whatever the key
        # distribution; a parquet→parquet rewrite is value-preserving
        # for every type Spark read in the first place
        spark.read.parquet(src).repartition(n).write.mode(
            "overwrite"
        ).parquet(tmp)
        shutil.rmtree(mdir, ignore_errors=True)
        os.rename(tmp, mdir)
        with open(meta_path, "w") as f:
            json.dump(want, f)
    except Exception:  # noqa: BLE001 — mirror is an optimization only
        shutil.rmtree(tmp, ignore_errors=True)
        _MIRROR_CACHE[src] = src
        return src
    _MIRROR_CACHE[src] = mdir
    return mdir
