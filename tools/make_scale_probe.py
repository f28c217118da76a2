"""Generate a LOCAL scale-probe dataset (default sf1 = 10x sf0.1)
under testdata_scale/ — one more decade of scale beyond the shipped
testdata, for the bench's super-linearity probe (round-6 verdict
item 6). Deterministic (seeded numpy where randomness is needed);
schema-identical to the driver testdata.

Construction: R structure-preserving replicas of sf0.1 with disjoint
key ranges, so referential integrity and every per-key distribution
hold exactly while entity counts scale by R (TPC-H's own scaling
model: more customers, same orders-per-customer). Three tables need
more than key offsets to keep their WORKLOAD shape honest at scale:

- documents: replica i > 0 applies a BIJECTIVE vocab rename
  (token -> token_r{i}). Jaccard/MinHash/containment structure within
  a replica is invariant under token bijection, and replicas share no
  tokens, so near-dup pair counts scale exactly xR (naive text copies
  would add R^2 cross-replica duplicate pairs that no real corpus
  growth produces). n_chars is recomputed.
- embeddings: replica i > 0 applies a per-replica ORTHOGONAL rotation
  (QR of seeded Gaussian): within-replica inner products/cosines are
  preserved exactly; cross-replica cosines collapse to ~N(0, 1/d)
  noise, so ANN/near-dup workloads scale by corpus size, not by
  phantom identical vectors.
- customer: replica-tag name suffixes with pairwise edit distance
  > ENTITY_MAX_EDIT between replicas, so the ER blocked join's
  within-block structure replicates without cross-replica zero-
  distance matches. (Block count is fixed by (nation, segment), so
  candidate pairs still grow ~R^2 — that is the documented workload
  growth of attribute blocking, not a plan defect.)

Usage: python tools/make_scale_probe.py [R] [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SEED = 42
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# key-offset spec per table: column -> stride (max key + 1 at sf0.1)
OFFSETS = {
    "customer": {"c_custkey": 15_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
COPY_ONLY = ("region", "nation")


def _offset_table(t: pa.Table, spec: dict[str, int], i: int) -> pa.Table:
    for col, stride in spec.items():
        idx = t.schema.get_field_index(col)
        shifted = pc.add(t.column(col), pa.scalar(i * stride, t.schema.field(col).type))
        t = t.set_column(idx, col, shifted)
    return t


def _rename_tokens(texts: list[str], i: int) -> list[str]:
    suf = f"_r{i}"
    return [" ".join(tok + suf for tok in s.split(" ")) for s in texts]


def _rotation(dim: int, i: int) -> np.ndarray:
    rng = np.random.default_rng(SEED + i)
    q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
    return q * np.sign(np.diag(r))  # sign-fix: deterministic proper basis


def generate(r: int, src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for name in COPY_ONLY:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"), f"{out}/{name}.parquet")
    for name, spec in OFFSETS.items():
        base = pq.read_table(f"{src}/{name}.parquet")
        parts = []
        for i in range(r):
            t = _offset_table(base, spec, i)
            if name == "customer" and i > 0:
                # suffix length grows with i: adjacent tags differ by
                # >= 2 edits, beyond ENTITY_MAX_EDIT=1
                tag = "-" + "x" * (i + 1)
                names = pc.binary_join_element_wise(
                    t.column("c_name").cast(pa.string()), pa.scalar(tag), ""
                )
                t = t.set_column(t.schema.get_field_index("c_name"), "c_name", names)
            if name == "documents" and i > 0:
                texts = _rename_tokens(t.column("text").to_pylist(), i)
                t = t.set_column(
                    t.schema.get_field_index("text"), "text", pa.array(texts)
                )
                t = t.set_column(
                    t.schema.get_field_index("n_chars"),
                    "n_chars",
                    pa.array([len(s) for s in texts], pa.int64()),
                )
            if name == "embeddings" and i > 0:
                vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
                rot = (vecs @ _rotation(vecs.shape[1], i)).astype(np.float32)
                emb = pa.array(list(rot), pa.list_(pa.float32()))
                t = t.set_column(
                    t.schema.get_field_index("embedding"), "embedding", emb
                )
            parts.append(t)
        pq.write_table(pa.concat_tables(parts), f"{out}/{name}.parquet")


if __name__ == "__main__":
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    sf = 0.1 * r
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, "testdata_scale", f"sf{sf:g}")
    )
    generate(r, src, out)
    print(out)
