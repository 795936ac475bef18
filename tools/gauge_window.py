#!/usr/bin/env python3
"""Window-temperature gauge for bench runs (BASELINE.md discipline).

Compares a bench run's per-query map against the committed anchor map
(bench_quiet_r12.json): the MEDIAN per-query ratio is the window
temperature (host noise moves every query by a common factor — loadavg
and %idle both lie on this host), and the honest regression signal is a
query whose ratio is an OUTLIER against that median, not a total.

Usage: python3 tools/gauge_window.py BENCH_rN.json [anchor.json]
Accepts either a raw bench_out.json line or the driver's BENCH JSON
wrapper (with a "parsed" field).
"""
import json
import statistics
import sys


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    qs = dict(d["queries"])
    qs.pop("rest", None)
    qs.pop("omitted", None)
    return d.get("value"), qs, d.get("failed", []), d.get("tainted")


def main():
    run_path = sys.argv[1]
    anchor_path = sys.argv[2] if len(sys.argv) > 2 else "bench_quiet_r12.json"
    run_total, run, run_failed, run_tainted = load_queries(run_path)
    anchor_total, anchor, _, _ = load_queries(anchor_path)
    # a failed query timed near-zero (or a tainted post-OOM run) would gauge
    # as a cool window or a silent speedup — exclude failures from the ratio
    # set and refuse the run loudly (r12 advice)
    if run_failed or run_tainted:
        print(f"ERROR: run carries failures — failed={run_failed} "
              f"tainted={run_tainted}; timings unreliable, not gauging",
              file=sys.stderr)
        sys.exit(2)
    shared = {k: (run[k], anchor[k]) for k in run
              if k in anchor and anchor[k] > 0.3}
    if not shared:
        sys.exit("no shared queries above 0.3 s — nothing to gauge")
    ratios = {k: r / a for k, (r, a) in shared.items()}
    med = statistics.median(ratios.values())
    print(f"run total {run_total} vs anchor {anchor_total} "
          f"({len(shared)} shared queries)")
    print(f"window temperature (median per-query ratio): {med:.3f}")
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
