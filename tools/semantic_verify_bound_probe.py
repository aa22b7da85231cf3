"""Measure the pruning power of JVM-side cosine upper bounds on the
REAL d_semantic_only_pairs_lsh candidate set — the experiment behind
the r15 rejection of a pre-Arrow-verify prefilter (VERDICT r14 #5;
PERF_NOTES r15 records the committed numbers).

Two exact bound families (both provably >= the true cosine, asserted
on every candidate pair):

- block-norm Cauchy-Schwarz: split each vector into k blocks, carry
  per-block norms, bound = sum_k ||a_k||*||b_k|| / (||a||*||b||).
  Ships k floats per vector instead of the full vector.
- partial-dot: exact dot over the first k dims + Cauchy-Schwarz on
  the remainder.  Ships k components per vector.

Verdict on the fixtures (near-orthogonal 64-dim embeddings,
tau = 0.25): block norms prune 0.00% at every k — the bound
concentrates near 1 because every vector spreads mass evenly across
blocks, and certifying cos < 0.25 needs sign information norm-only
bounds cannot carry.  The partial dot only prunes when k approaches
dim, at which point it IS the verify, on the JVM expression path r10
measured ~6 s slower than the Arrow kernel.  Re-run this probe if the
operating tau rises (k=32 bites at tau >= ~0.7) or the embedding
distribution gains real cluster structure.

Usage:  python tools/semantic_verify_bound_probe.py [sf_dir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAU = 0.25


def main() -> int:
    from kafka_spark_streaming_spark.operators.dedup import (
        _emb_lsh_candidates,
    )
    from kafka_spark_streaming_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="kss-bound-probe", cpus=16,
                      shuffle_partitions=16)

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    }
    cands = _emb_lsh_candidates(spark, sf).collect()
    ids = sorted(emb)
    V = np.stack([emb[i] for i in ids])
    idx = {v: i for i, v in enumerate(ids)}
    norms = np.linalg.norm(V, axis=1)
    dim = V.shape[1]
    ia = np.array([idx[r["vec_a"]] for r in cands])
    ib = np.array([idx[r["vec_b"]] for r in cands])
    true_cos = np.einsum("ij,ij->i", V[ia], V[ib]) / (norms[ia] * norms[ib])
    print(f"candidates={len(cands)} dim={dim} tau={TAU} "
          f"true survivors={int((true_cos >= TAU).sum())}")
    if not cands:
        print("no candidate pairs at this SF/geometry — nothing to bound")
        return 0

    for nblocks in (2, 4, 8, 16, 32):
        if dim % nblocks:
            continue
        B = V.reshape(len(ids), nblocks, dim // nblocks)
        bn = np.linalg.norm(B, axis=2)
        ub = np.einsum("ij,ij->i", bn[ia], bn[ib]) / (norms[ia] * norms[ib])
        assert (ub + 1e-12 >= true_cos).all(), "bound must dominate cosine"
        pruned = int((ub < TAU).sum())
        print(f"block-norm k={nblocks:3d} ({nblocks * 8} B/vec): "
              f"ub median={np.median(ub):.3f} "
              f"pruned {pruned}/{len(cands)} "
              f"({100 * pruned / len(cands):.2f}%)")

    for k in (16, 32, dim):
        d1 = np.einsum("ij,ij->i", V[ia][:, :k], V[ib][:, :k])
        ra = np.linalg.norm(V[ia][:, k:], axis=1)
        rb = np.linalg.norm(V[ib][:, k:], axis=1)
        ub = (d1 + ra * rb) / (norms[ia] * norms[ib])
        assert (ub + 1e-12 >= true_cos).all(), "bound must dominate cosine"
        pruned = int((ub < TAU).sum())
        tag = " (== the full dot: this IS the verify)" if k == dim else ""
        print(f"partial-dot k={k:3d} ({k * 4} B/vec): "
              f"ub median={np.median(ub):.3f} "
              f"pruned {pruned}/{len(cands)} "
              f"({100 * pruned / len(cands):.2f}%){tag}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
