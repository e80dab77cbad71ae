#!/usr/bin/env python3
"""Generate a scaled-up BENCHMARK-shape dataset (embeddings + documents
only) matching the driver testdata's schema and distributions, for the
scale-ratchet bench runs (SPARK_GRAFT_QPS_ONLY=1).

This is NOT a correctness-gate input — the driver's /root/testdata parquet
stays the only oracle source. It exists so serving-path scale claims can be
exercised at 10x rows before anyone claims 100x.

Usage: gen_bench_sf.py OUTDIR SCALE [clusters] [embonly] [sigma]
  SCALE multiplies sf0.1's row counts. The optional third arg draws the
  embeddings from that many gaussian clusters instead of one isotropic
  shell: real embedding corpora (deep1b, text2image, msturing) cluster,
  and cluster structure is what lets IVF routing's matched-recall mass
  fraction SHRINK as the corpus grows — the uniform shell is the
  worst case for routing (every query's neighbors spread over all
  clusters, so the needed fraction is scale-invariant).

  sigma (default 0.25, the r8/r9 control recipe) is the per-component
  within-cluster noise scale. tools/sigma_study.py measured the
  ideal-router scan-mass at 0.9 recall across sigma: at 0.25 the noise
  vector norm is sigma*sqrt(64) = 2.0 against unit centers — noise-
  dominated, mass ~15-22% at EVERY decade (the r9 10M artifacts' loose-
  corpus tax) — while at sigma <= 0.16 every query's 10-NN collapses
  into its own cluster (nprobe = 1, degenerate the other way). The r10
  tighter control uses sigma = 0.20 (noise norm 1.6 vs inter-center
  ~sqrt(2)): mass 6.6% @20k -> 4.4% @200k with mean nprobe 9 -> 20 —
  real multi-cluster routing whose fraction keeps falling per decade,
  the yfcc-like regime the 3,200-QPS baseline row lives in.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF = "/root/testdata/sf0.1"


def main(outdir: str, scale: int, clusters: int = 0,
         emb_only: bool = False, sigma: float = 0.25) -> None:
    rng = np.random.default_rng(42)

    ref_emb = pq.read_table(f"{REF}/embeddings.parquet")
    n_emb = ref_emb.num_rows * scale
    dim = len(ref_emb.column("embedding")[0])
    # unit-norm gaussian directions — the reference embeddings' shape
    # (norms are exactly 1, components ~ N(0, 1/sqrt(d)) after normalize)
    vecs = rng.standard_normal((n_emb, dim), dtype=np.float32)
    if clusters > 0:
        # mixture of gaussians on the sphere: cluster centers are unit
        # directions, points are center + within-cluster noise (sigma
        # sized so clusters are tight but overlapping), re-normalized
        centers = rng.standard_normal((clusters, dim), dtype=np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        asg = rng.integers(0, clusters, n_emb)
        vecs = centers[asg] + sigma * vecs
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    n_labels = int(ref_emb.column("label").to_pandas().max()) + 1
    # build the list column from the flat float buffer + row offsets —
    # pa.array(list(vecs)) materializes n_emb python row objects and takes
    # tens of minutes at 10M rows; this is zero-copy and runs in seconds
    # int32 ListArray offsets wrap negative once n_emb*dim exceeds 2^31-1
    # (SCALE ~ 16700 at d=64 — the decade past 10M rows); switch to
    # 64-bit-offset LargeListArray there (same parquet LIST annotation,
    # Spark reads both identically)
    if (n_emb + 1) * dim > 2**31 - 1:
        offsets = pa.array(
            np.arange(0, (n_emb + 1) * dim, dim, dtype=np.int64))
        emb_col = pa.LargeListArray.from_arrays(
            offsets, pa.array(vecs.reshape(-1)))
    else:
        offsets = pa.array(
            np.arange(0, (n_emb + 1) * dim, dim, dtype=np.int32))
        emb_col = pa.ListArray.from_arrays(offsets, pa.array(vecs.reshape(-1)))
    emb = pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": emb_col,
        "label": pa.array(rng.integers(0, n_labels, n_emb, dtype=np.int32)),
    })
    pq.write_table(emb, f"{outdir}/embeddings.parquet")

    if emb_only:
        # serving-only scale runs (SPARK_GRAFT_TRACKS without sparse/batch)
        # read nothing but embeddings; 5M-row python text synthesis is the
        # generator's wall-clock at SCALE >= 1000
        print(f"wrote {n_emb} embeddings (d={dim}), no documents -> {outdir}")
        return
    ref_doc = pq.read_table(f"{REF}/documents.parquet").to_pandas()
    vocab = sorted({w for t in ref_doc["text"] for w in t.split()})
    langs = sorted(ref_doc["lang"].unique())
    sources = sorted(ref_doc["source"].unique())
    tok_counts = ref_doc["text"].str.split().str.len()
    lo, hi = int(tok_counts.min()), int(tok_counts.max())
    n_doc = len(ref_doc) * scale
    # ZIPF word draw (r10): real text is Zipfian; the old uniform draw
    # over a small vocab produced tf ~ 1 almost everywhere, so sparse MIPS
    # scores were tie-heavy sums of 1s — no posting carried more impact
    # than another, which is exactly the corpus on which neither
    # weight-ranked truncation nor impact-ordered budgets can cut scan
    # volume at matched recall (the r9 sparse trajectory finding). s = 1.1
    # with a hash-shuffled rank→word map; head words reach tf in the tens,
    # the tail stays tf = 1 — SPLADE-like impact spread. Vectorized: the
    # per-doc python loop was the generator's wall at 1M+ docs.
    # vocabulary EXTENSION (r10, second pass): the reference sf0.1 vocab is
    # 31 words — at that size every doc contains every query dim, scores
    # concentrate (sum over ~31 shared dims), and NO budget scheme can cut
    # scan volume at matched recall: the 200k-doc Zipf run still picked the
    # full budget. Real retrieval corpora have 1e4-1e5 vocab and SELECTIVE
    # posting lists (a SPLADE query matches a tiny fraction of docs per
    # dim). Extend with synthetic tokens to a Heaps-law-ish size
    # (~total_tokens/200, capped at 50k) so tail dims are selective while
    # Zipf keeps a dense head — the regime linscan's budget semantics
    # actually live in.
    lens = rng.integers(lo, hi + 1, n_doc)
    total_tokens = int(lens.sum())
    v_target = min(50_000, max(len(vocab), total_tokens // 200))
    if v_target > len(vocab):
        vocab = list(vocab) + [f"tok{i:05d}" for i in range(v_target - len(vocab))]
    vocab_arr = np.array(vocab)
    nv = len(vocab_arr)
    zipf_p = 1.0 / np.arange(1, nv + 1) ** 1.1
    zipf_p /= zipf_p.sum()
    word_of_rank = rng.permutation(nv)
    flat = rng.choice(nv, size=int(lens.sum()), p=zipf_p)
    words = vocab_arr[word_of_rank[flat]]
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_doc)]
    doc = pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(langs, n_doc)),
        "source": pa.array(rng.choice(sources, n_doc)),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })
    pq.write_table(doc, f"{outdir}/documents.parquet")
    print(f"wrote {n_emb} embeddings (d={dim}), {n_doc} documents -> {outdir}")


if __name__ == "__main__":
    out, scale = sys.argv[1], int(sys.argv[2])
    nclusters = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    embonly = len(sys.argv) > 4 and sys.argv[4] == "embonly"
    sig = float(sys.argv[5]) if len(sys.argv) > 5 else 0.25
    import os
    os.makedirs(out, exist_ok=True)
    main(out, scale, nclusters, embonly, sig)
