#!/usr/bin/env python
"""Synthesize a deterministic sf1 (~10x sf0.1) corpus for the scale
rehearsal (VERDICT r4 next-round #3). NOT a parity fixture — no oracle
runs against it; it exists to catch spill/GC/skew cliffs that plan
reading cannot.

Design, so that 10x data means 10x work (not 100x):

- TPC-H-ish tables replicate with a key stride of 10_000_000 per
  replica on every key/FK column, so referential integrity holds
  within each replica and join fan-outs scale linearly.
- `documents.text` gets a per-replica token-suffix rewrite (every
  whitespace token w -> w + "<r>x" for replica r>0): word counts and
  lengths barely move, but the 60-char-prefix dup families and the
  token-set Jaccard families stay WITHIN a replica — family sizes
  constant, total near-dup pairs x10, the way real corpora grow.
  (Naive text replication would merge families across replicas and
  grow pair output x100 — an unrealistic quadratic blowup.)
- `embeddings.embedding` gets a per-replica random ORTHOGONAL rotation
  (seeded QR): within-replica geometry (norms, cosines, cluster
  structure) is preserved EXACTLY, cross-replica cosines land near 0
  for 64-dim, far below every tau in use — again linear growth.
- `nation` / `region` stay fixed dims (25 / 5 rows at any sf).

Everything is seeded; running twice produces byte-identical frames.

Usage: python tools/make_sf1.py [--src /root/testdata/sf0.1]
                                [--dst .scratch/sf1] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

STRIDE = 10_000_000

# key columns to offset by replica * STRIDE, per table
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = ["region", "nation"]


def _suffix_tokens(text: str, tag: str) -> str:
    return " ".join(w + tag if w else w for w in text.split(" "))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=".scratch/sf1")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    for t in FIXED_DIMS:
        src = os.path.join(args.src, f"{t}.parquet")
        pq.write_table(pq.read_table(src), os.path.join(args.dst, f"{t}.parquet"))
        print(f"{t}: copied")

    for t, keys in KEYED.items():
        base = pq.read_table(os.path.join(args.src, f"{t}.parquet"))
        schema = base.schema
        pdf = base.to_pandas()
        reps = []
        for r in range(args.replicas):
            cp = pdf.copy(deep=False)
            for k in keys:
                cp[k] = pdf[k] + r * STRIDE
            if t == "documents" and r > 0:
                tag = f"{r}x"
                cp["text"] = pdf["text"].map(lambda s, tag=tag: _suffix_tokens(s, tag))
                cp["n_chars"] = cp["text"].str.len().astype(pdf["n_chars"].dtype)
            if t == "embeddings" and r > 0:
                mat = np.vstack(pdf["embedding"].to_numpy())
                rng = np.random.default_rng(1234 + r)
                q, _ = np.linalg.qr(rng.standard_normal((mat.shape[1], mat.shape[1])))
                rot = (mat @ q.astype(mat.dtype)).astype(mat.dtype)
                cp["embedding"] = list(rot)
            reps.append(cp)
        out = pd.concat(reps, ignore_index=True)
        tbl = pa.Table.from_pandas(out, schema=schema, preserve_index=False)
        pq.write_table(tbl, os.path.join(args.dst, f"{t}.parquet"))
        print(f"{t}: {base.num_rows} -> {tbl.num_rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
