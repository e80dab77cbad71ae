#!/usr/bin/env python3
"""Per-family QPS-vs-n across the benched scale decades, from the
committed BENCH_* artifacts. Prints each serving family's matched-recall
headline (median q/s, recall) at each scale plus the per-decade QPS
ratio — the measured scaling behavior the README/SURVEY ratchet
sections quote.

Usage: scale_table.py [label=artifact.json ...]   (defaults to the r8 set)
"""
import json
import sys

DEFAULT = [
    ("2k", "BENCH_METRICS.json"),
    ("20k", "BENCH_r08_sf1.json"),
    ("200k", "BENCH_r08_sf10_xgrid.json"),
    ("2M", "BENCH_r08_sf100.json"),
    ("10M", "BENCH_r08_sf500_metrics.json"),
]

FAMILIES = [
    "filtered_knn", "sparse_budget_served", "ann_hnsw_probe",
    "ann_hnsw_probe_ip", "ann_hnsw_probe_routed",
    "ann_hnsw_probe_routed_auto", "ann_adc_served", "ann_ivfadc_served",
    "ann_ivfadc_residual_served", "ann_ivfsq8_served",
    "ann_ivfsq8_graphroute_served", "hamming_rerank_served",
    "maxsim_served",
]


def load(path):
    d = json.load(open(path))
    d = d.get("parsed") or d
    return d.get("qps") or {}


def main(pairs):
    cols = []
    for label, path in pairs:
        try:
            cols.append((label, load(path)))
        except (OSError, json.JSONDecodeError, AttributeError):
            pass
    if not cols:
        sys.exit("no artifact loaded: " + ", ".join(p for _, p in pairs))
    for fam in FAMILIES:
        row, prev = [], None
        for label, q in cols:
            v = q.get(fam)
            if not v:  # 0.0 = track off in that run
                row.append(f"{label}: -")
                prev = None
                continue
            rec = (q.get("recall") or {}).get(fam)
            ratio = f" ({v / prev:.2f}x)" if prev else ""
            row.append(f"{label}: {v:,.0f}{ratio}"
                       + (f" @{rec:.3f}" if rec is not None else ""))
            prev = v
        print(f"{fam:30s} " + "  |  ".join(row))
    # headline picks for the last (largest) column
    label, q = cols[-1]
    print(f"\n[{label}] op picks: "
          + json.dumps(q.get("op") or {}, sort_keys=True))
    env = q.get("env") or {}
    print(f"[{label}] env: {json.dumps(env)}")


if __name__ == "__main__":
    args = sys.argv[1:]
    pairs = ([tuple(a.split("=", 1)) if "=" in a else (a.split("/")[-1], a)
              for a in args] if args else DEFAULT)
    main(pairs)
