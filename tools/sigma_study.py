#!/usr/bin/env python3
"""Decide the clustered-corpus sigma for the r10 regenerated controls.

r9's finding (VERDICT r9 "what's wrong" #2 / SURVEY 7.8): at sqrt(n)
clusters and sigma=0.25 the per-component noise vector has norm
sigma*sqrt(d) = 2.0 against unit-norm centers -- the "clusters" are
noise-dominated, matched-recall scan mass sits at ~15% at every decade,
and the per-decade shrink the sf1/sf10 controls showed stalls. Real
embedding corpora (yfcc-10M) let faiss IVF16384 probe <1% at 0.9 recall.

This script measures, in numpy and without any Spark run, the IDEAL-ROUTER
scan-mass fraction at 0.9 recall for a grid of (n, sigma): generate the
corpus exactly as gen_bench_sf.py does, take the generator's own centers
as the coarse quantizer (the best case any trained k-means can approach),
route each query to centers by distance, and find the smallest prefix of
probed clusters whose union covers >= 0.9 of the true 10-NN. Reported
mass = mean over queries of (rows in probed prefix)/n. This bounds from
BELOW what the bench's trained IVF will pick, so a sigma that reads ~2-4%
here is an honest "<=5% measured" target for the real run.
"""
import sys

import numpy as np


def study(n: int, sigma: float, d: int = 64, nq: int = 200, k: int = 10,
          seed: int = 42) -> tuple[float, float]:
    rng = np.random.default_rng(seed)
    c = int(np.sqrt(n))
    vecs = rng.standard_normal((n, d), dtype=np.float32)
    centers = rng.standard_normal((c, d), dtype=np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    asg = rng.integers(0, c, n)
    vecs = centers[asg] + sigma * vecs
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    sizes = np.bincount(asg, minlength=c)

    q = vecs[:nq]
    # true kNN by L2 (unit norm -> same order as cosine/ip)
    sims = q @ vecs.T
    nn = np.argpartition(-sims, k, axis=1)[:, :k + 1]
    # drop self, keep k
    truth = []
    for i in range(nq):
        ids = nn[i][np.argsort(-sims[i, nn[i]])]
        truth.append([j for j in ids if j != i][:k])
    truth = np.array(truth)

    # ideal router: probe clusters in order of query-center distance
    qc = q @ centers.T  # ip ~ -l2/2 on unit vectors
    order = np.argsort(-qc, axis=1)
    fracs = []
    probes = []
    for i in range(nq):
        tcl = asg[truth[i]]
        got, need = 0, int(np.ceil(0.9 * k))
        mass = 0
        member = set(tcl.tolist())
        cnt = np.zeros(c, dtype=np.int64)
        for t in tcl:
            cnt[t] += 1
        for rank, cl in enumerate(order[i]):
            mass += sizes[cl]
            got += cnt[cl]
            if got >= need:
                probes.append(rank + 1)
                break
        fracs.append(mass / n)
    return float(np.mean(fracs)), float(np.mean(probes))


def study_big(n: int, sigma: float, d: int = 64, nq: int = 200, k: int = 10,
              seed: int = 42, chunk: int = 500_000) -> tuple[float, float]:
    """Chunked variant for n past what one sims matrix holds (2M, 10M)."""
    rng = np.random.default_rng(seed)
    c = int(np.sqrt(n))
    centers = rng.standard_normal((c, d), dtype=np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # generate in chunks, keep queries from the first chunk
    blocks, asgs = [], []
    q = None
    for lo in range(0, n, chunk):
        m = min(chunk, n - lo)
        g = rng.standard_normal((m, d), dtype=np.float32)
        a = rng.integers(0, c, m)
        v = centers[a] + sigma * g
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        if q is None:
            q = v[:nq].copy()
        blocks.append(v)
        asgs.append(a)
    asg = np.concatenate(asgs)
    sizes = np.bincount(asg, minlength=c)
    # true kNN via chunked top-k merge
    best_s = np.full((nq, k + 1), -np.inf, dtype=np.float32)
    best_i = np.zeros((nq, k + 1), dtype=np.int64)
    off = 0
    for v in blocks:
        s = q @ v.T
        top = np.argpartition(-s, k, axis=1)[:, :k + 1]
        cs = np.concatenate([best_s, np.take_along_axis(s, top, 1)], axis=1)
        ci = np.concatenate([best_i, top + off], axis=1)
        keep = np.argpartition(-cs, k, axis=1)[:, :k + 1]
        best_s = np.take_along_axis(cs, keep, 1)
        best_i = np.take_along_axis(ci, keep, 1)
        off += v.shape[0]
    truth = []
    for i in range(nq):
        order = best_i[i][np.argsort(-best_s[i])]
        truth.append([j for j in order if j != i][:k])
    truth = np.array(truth)
    qc = q @ centers.T
    order = np.argsort(-qc, axis=1)
    fracs, probes = [], []
    need = int(np.ceil(0.9 * k))
    for i in range(nq):
        cnt = np.bincount(asg[truth[i]], minlength=c)
        got, mass = 0, 0
        for rank, cl in enumerate(order[i]):
            mass += sizes[cl]
            got += cnt[cl]
            if got >= need:
                probes.append(rank + 1)
                break
        fracs.append(mass / n)
    return float(np.mean(fracs)), float(np.mean(probes))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "decades":
        # the committed r10 decade curve: sigma=0.20 vs the old 0.25
        for sigma in (0.20, 0.25):
            for n in (20_000, 200_000, 2_000_000, 10_000_000):
                fn = study if n <= 200_000 else study_big
                mass, nprobe = fn(n, sigma)
                print(f"sigma={sigma:.2f} n={n:>9} C=sqrt(n)={int(np.sqrt(n)):>5}: "
                      f"ideal-router mass@0.9 = {100*mass:6.2f}%  "
                      f"mean nprobe = {nprobe:7.1f}", flush=True)
        sys.exit(0)
    for n in (20_000, 200_000):
        for sigma in (0.25, 0.15, 0.10, 0.07, 0.05):
            mass, nprobe = study(n, sigma)
            print(f"n={n:>7} sqrt(n) clusters sigma={sigma:.2f}: "
                  f"ideal-router mass@0.9 = {100*mass:6.2f}%  "
                  f"mean nprobe = {nprobe:7.1f}", flush=True)
