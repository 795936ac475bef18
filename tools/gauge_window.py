#!/usr/bin/env python3
"""Window-temperature gauge for bench runs (BASELINE.md discipline).

Compares a bench run's per-query map against a reference map (default:
the committed anchor): the MEDIAN per-query ratio is the window
temperature (host noise moves every query by a common factor — loadavg
and %idle both lie on this host), and the honest regression signal is a
query whose ratio is an OUTLIER against that median, not a total.

Two medians are printed (r14 lesson): the RAW median over all shared
queries, and the CACHE-INSENSITIVE median over the subset whose timing
did not move in the round-14 codegen-cache A/B pair
(bench_r14_run4.json @4096 vs bench_r14_run5_cache100.json @100, same
window, ratio within ±15%). When the run and the reference were
measured at DIFFERENT codegen-cache sizes, the structural saving
contaminates the raw untouched-median (r14: raw 1.411 vs honest 1.199)
— the cache-insensitive subset is the estimator that still reads the
true window. When run and reference share a cache size the two medians
agree and the raw one (10x the sample) is the better-conditioned read.

Usage: python3 tools/gauge_window.py RUN.json [--ref MAP.json]
       (legacy positional: gauge_window.py RUN.json MAP.json)
Accepts either a raw bench_out.json line or the driver's BENCH JSON
wrapper (with a "parsed" field).
"""
import argparse
import json
import statistics
import sys

DEFAULT_REF = "bench_quiet_r12.json"
# The committed same-window codegen-cache A/B pair (round 14) and the
# band that defines "insensitive": |t_c100 / t_c4096 − 1| ≤ 0.15. On the
# 169 anchor-shared queries this yields the 31-query subset BASELINE.md's
# r14 entry reasons with (medians 1.14/1.165 on run10/run11 reproduce).
AB_CACHE4096 = "bench_r14_run4.json"
AB_CACHE100 = "bench_r14_run5_cache100.json"
AB_BAND = 0.15


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    qs = dict(d["queries"])
    qs.pop("rest", None)
    qs.pop("omitted", None)
    return d.get("value"), qs, d.get("failed", []), d.get("tainted")


def cache_insensitive_set():
    """Query names whose timing was flat across the r14 codegen-cache
    A/B pair — the window estimator immune to cache-size mismatch
    between run and reference. Empty set if the pair files are absent
    (gauge degrades to raw-median-only, loudly)."""
    try:
        _, q4, _, _ = load_queries(AB_CACHE4096)
        _, q100, _, _ = load_queries(AB_CACHE100)
    except (OSError, json.JSONDecodeError):
        return set()
    return {k for k in q4
            if k in q100 and q4[k] > 0.3
            and abs(q100[k] / q4[k] - 1) <= AB_BAND}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run")
    ap.add_argument("ref_pos", nargs="?", help="legacy positional ref map")
    ap.add_argument("--ref", default=None,
                    help=f"reference per-query map (default {DEFAULT_REF})")
    a = ap.parse_args()
    ref_path = a.ref or a.ref_pos or DEFAULT_REF
    run_total, run, run_failed, run_tainted = load_queries(a.run)
    ref_total, ref, _, _ = load_queries(ref_path)
    # a failed query timed near-zero (or a tainted post-OOM run) would gauge
    # as a cool window or a silent speedup — exclude failures from the ratio
    # set and refuse the run loudly (r12 advice)
    if run_failed or run_tainted:
        print(f"ERROR: run carries failures — failed={run_failed} "
              f"tainted={run_tainted}; timings unreliable, not gauging",
              file=sys.stderr)
        sys.exit(2)
    shared = {k: (run[k], ref[k]) for k in run
              if k in ref and ref[k] > 0.3}
    if not shared:
        sys.exit("no shared queries above 0.3 s — nothing to gauge")
    ratios = {k: r / v for k, (r, v) in shared.items()}
    med = statistics.median(ratios.values())
    ins = cache_insensitive_set() & ratios.keys()
    print(f"run total {run_total} vs ref {ref_total} [{ref_path}] "
          f"({len(shared)} shared queries)")
    print(f"window temperature, raw median per-query ratio: {med:.3f}")
    if ins:
        ins_med = statistics.median(ratios[k] for k in ins)
        print(f"window temperature, cache-insensitive median "
              f"({len(ins)} queries): {ins_med:.3f}")
        if abs(ins_med - med) / med > 0.08:
            print("  NOTE: medians diverge >8% — run and reference likely "
                  "differ in codegen-cache size; trust the cache-"
                  "insensitive read")
    else:
        print("WARN: r14 A/B pair files absent — cache-insensitive median "
              "unavailable, raw median may under/over-read across "
              "cache-size changes", file=sys.stderr)
    # a real mover is an outlier AGAINST the window: ratio beyond
    # 1.5x the median with absolute movement worth reading
    outliers = [(k, r, *shared[k]) for k, r in ratios.items()
                if r > 1.5 * med and shared[k][0] - shared[k][1] > 0.8]
    if outliers:
        print("movers beyond the window factor (ratio > 1.5x median, "
              ">0.8 s absolute):")
        for k, r, rv, av in sorted(outliers, key=lambda x: -x[1]):
            print(f"  {k:32s} {av:6.2f} -> {rv:6.2f}  ({r:.2f}x, "
                  f"window-adjusted {r / med:.2f}x)")
    else:
        print("no movers beyond the window factor — any total shift is "
              "window temperature, not build growth")


if __name__ == "__main__":
    main()
