#!/usr/bin/env python3
"""Build bench_anchor_r18.json — the per-query MIN composite over (a) the
r17 anchor (itself the 12-run r17 composite) and (b) the r18 parity runs
with per-query build validity (the bench_r15_min / bench_anchor_r16/r17
precedent: a labeled COMPOSITE, not a measured run).

Folding the r17 anchor in is sound because every r18 change was measured
FASTER (vecops codegen swaps, capped bm25 spread, parser row-reuse), so
an r17-session minimum remains achievable on the r18 build — it is a
window-artifact bound, not a build bound. This makes the composite
elementwise TIGHTER than either session alone (stall detection gets more
sensitive, and the driver's bench-vs-baseline ratio reads HARSHER, never
flatter).

Run validity per query (the r18 session ran three build states):
  - runs 1,2: the inherited (r17-final) tree — valid only for queries
    untouched in r18;
  - runs 3..: + the vecops codegen swaps (the 27-query vector family incl.
    q_rrf_fusion), the capped bm25 postings spread, and the fused-parser
    row reuse (q_pack_explode_roundtrip);
  - runs 4..: + q_embed_outliers' centered diff and the q_bm25_topk /
    q_kmeans warm-set additions (their timed numbers change legitimately
    from run 4 on — the r17 q_bpe_compression convention);
  - runs 6..: + q_pca_power's two-factor quantize.

Usage: python3 tools/build_anchor_r18.py [runN.json ...]
(defaults to the repo-root bench_r18_run*.json; writes
bench_anchor_r18.json in place and prints the composite total).
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the 27 queries whose plans changed in the vecops commit (4287161), plus
# the bm25 spread (8ad40e9) and the parser row-reuse (dbd8c2e)
VECOPS = {
    "q_knn_ivf_pq", "q_knn_sq", "q_embed_outliers", "q_embed_drift",
    "q_embed_rp", "q_knn_rp", "q_knn_rp_recall", "q_rrf_fusion",
    "q_knn_hubness", "q_knn_sq_recall", "q_knn_bruteforce",
    "q_hard_negatives", "q_decontamination_embed", "q_knn_mutual",
    "q_knn_ivf", "q_knn_ivf_staged", "q_embed_neardup_lsh", "q_knn_recall",
    "q_knn_pq", "q_knn_pq_recall", "q_semdedup", "q_kmeans",
    "q_cluster_mix", "q_cluster_sample", "q_pca_power", "q_bm25_topk",
    "q_text_embed",
}

CHANGED_R18 = {q: 3 for q in VECOPS}
CHANGED_R18["q_pack_explode_roundtrip"] = 3
# final measurement state from run 4 (warm-set / centered diff)
for q in ("q_embed_outliers", "q_bm25_topk", "q_kmeans"):
    CHANGED_R18[q] = 4
# two-factor quantize landed before run 6
CHANGED_R18["q_pca_power"] = 6


def load(path):
    d = json.load(open(path))
    return d.get("queries") or d["parsed"]["queries"]


def main():
    paths = sys.argv[1:] or sorted(
        glob.glob(os.path.join(REPO, "bench_r18_run*.json")),
        key=lambda p: int(re.search(r"run(\d+)", p).group(1)))
    runs = {int(re.search(r"run(\d+)", p).group(1)): load(p) for p in paths}
    # seed UNTOUCHED queries from the r17 anchor; touched queries start
    # empty (their r17 entries describe the pre-change build) — except
    # that folding r17 in is also valid for touched queries because every
    # r18 change measured faster; keep them seeded too, per the module doc
    comp = {k: v for k, v in load(
        os.path.join(REPO, "bench_anchor_r17.json")).items()
        if k not in ("rest", "omitted")}
    for n, q in sorted(runs.items()):
        for k, v in q.items():
            if k in ("rest", "omitted"):
                continue
            if n < CHANGED_R18.get(k, 0):
                continue
            comp[k] = min(comp.get(k, 1e18), v)
    total = sum(comp.values())
    out = {
        "metric": "total", "value": round(total, 4), "unit": "sec",
        "queries": {k: round(v, 4) for k, v in sorted(comp.items())},
        "sf": "/root/testdata/sf0.1",
        "note": ("per-query MIN composite over the r17 anchor (12-run r17 "
                 "composite) and the r18 parity runs " +
                 ",".join(str(n) for n in sorted(runs)) +
                 " (bench_r18_run*.json; per-query build validity per "
                 "tools/build_anchor_r18.py) - the stall/mover reference "
                 "from r18 on"),
    }
    dst = os.path.join(REPO, "bench_anchor_r18.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"{dst}: {len(comp)} queries, composite total {total:.2f} s")


if __name__ == "__main__":
    main()
