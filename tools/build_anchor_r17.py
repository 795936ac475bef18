#!/usr/bin/env python3
"""Build bench_anchor_r17.json — the per-query MIN composite over the r17
final-build parity runs (the bench_r15_min.json / bench_anchor_r16.json
precedent: a labeled COMPOSITE, not a measured run; every entry was
actually measured on the final r17 build in its least-contended window).

Run validity per query (the r17 session ran two build states):
  - runs 5..N: the final build for EVERY query;
  - runs 3,4: final for all queries EXCEPT q_bm25_topk / q_rrf_fusion
    (those two carried the later-REVERTED postings re-spread);
  - runs 1,2: pre-change build — valid ONLY for queries untouched this
    round (not the re-spread six, not q_stream_dq / q_bpe_compression,
    and included for bm25/rrf whose final form equals the pre-change one).

Usage: python3 tools/build_anchor_r17.py run1.json run2.json ... > out
(reads the repo-root bench_r17_run*.json by default; writes
bench_anchor_r17.json in place and prints the composite total).
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHANGED_R17 = {  # first valid run index for queries whose build changed
    # re-spread in runs >= 3
    "q_cdc_chunks": 3, "q_source_overlap": 3, "q_source_overlap_sketch": 3,
    "q_source_divergence": 3, "q_tfidf": 3, "q_join_size_sketch": 3,
    # concurrent drains / warm-set member in runs >= 3
    "q_stream_dq": 3, "q_bpe_compression": 3,
}
# re-spread tried in runs 3/4 and REVERTED — runs 1,2,5.. are the final form
SPREAD_REVERTED = {"q_bm25_topk": (3, 4), "q_rrf_fusion": (3, 4)}


def load(path):
    d = json.load(open(path))
    return d.get("queries") or d["parsed"]["queries"]


def main():
    paths = sys.argv[1:] or sorted(
        glob.glob(os.path.join(REPO, "bench_r17_run*.json")),
        key=lambda p: int(re.search(r"run(\d+)", p).group(1)))
    runs = {int(re.search(r"run(\d+)", p).group(1)): load(p) for p in paths}
    comp = {}
    for n, q in sorted(runs.items()):
        for k, v in q.items():
            if k in ("rest", "omitted"):
                continue
            if n < CHANGED_R17.get(k, 0):
                continue
            if n in SPREAD_REVERTED.get(k, ()):
                continue
            comp[k] = min(comp.get(k, 1e18), v)
    total = sum(comp.values())
    out = {
        "metric": "total", "value": round(total, 4), "unit": "sec",
        "queries": {k: round(v, 4) for k, v in sorted(comp.items())},
        "sf": "/root/testdata/sf0.1",
        "note": ("per-query MIN composite over the r17 final-build parity "
                 "runs " + ",".join(str(n) for n in sorted(runs)) +
                 " (bench_r17_run*.json; per-query run validity per "
                 "tools/build_anchor_r17.py) - the anchor and mover "
                 "reference from r17 on"),
    }
    dest = os.path.join(REPO, "bench_anchor_r17.json")
    with open(dest, "w") as f:
        json.dump(out, f, separators=(",", ":"))
        f.write("\n")
    print(f"wrote {dest}: {len(comp)} queries, composite total {total:.1f} s")


if __name__ == "__main__":
    main()
