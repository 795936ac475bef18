#!/usr/bin/env python3
"""Window-temperature gauge for bench runs (BASELINE.md discipline).

Compares a bench run's per-query map against a reference map (default:
the committed anchor): the MEDIAN per-query ratio is the window
temperature (host noise moves every query by a common factor — loadavg
and %idle both lie on this host), and the honest regression signal is a
query whose ratio is an OUTLIER against that median, not a total.

Three medians are printed:
  raw          — all shared queries (best-conditioned when run and
                 reference share a codegen-cache size);
  insensitive  — the subset whose timing did not move in the round-14
                 codegen-cache A/B pair (bench_r14_run4.json @4096 vs
                 bench_r14_run5_cache100.json @100, same window, ratio
                 within ±15%). When run and reference were measured at
                 DIFFERENT cache sizes the structural saving contaminates
                 the raw median (r14: raw 1.411 vs honest 1.199) — this
                 subset still reads the true window;
  trimmed      — the insensitive subset further EXCLUDING queries whose
                 reference entry is < 2 s (r15 verdict item 3): the
                 builder's 20-run minima probe proved a sub-2 s
                 scheduling-floor class (q_df_incremental, q_dedup_simhash,
                 q_ab_lift, q_knn_rp_recall) never reads < 1.2x in ANY
                 run, permanently biasing the insensitive median
                 +0.10–0.15 — so the re-anchor bar and the headline window
                 read are computed on the trimmed subset.

Mover (outlier) detection uses the TRIMMED median when available (r15
advice: the raw median is the contaminated estimate exactly when the
medians diverge, which can mask real movers or flag spurious ones),
falling back to insensitive then raw.

Usage: python3 tools/gauge_window.py RUN.json [--ref MAP.json]
       (legacy positional: gauge_window.py RUN.json MAP.json)
Accepts either a raw bench_out.json line or the driver's BENCH JSON
wrapper (with a "parsed" field). Default reference and A/B pair paths
resolve relative to the REPO ROOT (this script's parent directory), so
the gauge works from any CWD; explicit arguments stay CWD-relative.
"""
import argparse
import json
import pathlib
import statistics
import sys

_REPO = pathlib.Path(__file__).resolve().parent.parent
# r18 stall/mover reference: per-query MIN composite over the r17 anchor
# (itself the twelve-run r17 composite) and the r18 parity runs with
# per-query build validity (tools/build_anchor_r18.py) — elementwise
# TIGHTER than either session alone; sound because every r18 change
# measured faster. Consistency evidence: bench_r18_run7/run8, a 0.57%
# consecutive final-build pair (BASELINE.md r18 entry). History: the r17
# anchor (bench_anchor_r17.json), the r16 composite, and the r12 map
# (bench_quiet_r12.json) stay on disk.
DEFAULT_REF = str(_REPO / "bench_anchor_r18.json")
# The committed same-window codegen-cache A/B pair (round 14) and the
# band that defines "insensitive": |t_c100 / t_c4096 − 1| ≤ 0.15. On the
# 169 anchor-shared queries this yields the 31-query subset BASELINE.md's
# r14 entry reasons with (medians 1.14/1.165 on run10/run11 reproduce).
AB_CACHE4096 = str(_REPO / "bench_r14_run4.json")
AB_CACHE100 = str(_REPO / "bench_r14_run5_cache100.json")
AB_BAND = 0.15
# Reference entries below this are the scheduling-floor class — excluded
# from the trimmed median (r15 verdict item 3).
TRIM_FLOOR_S = 2.0


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    qs = dict(d["queries"])
    qs.pop("rest", None)
    qs.pop("omitted", None)
    return d.get("value"), qs, d.get("failed", []), d.get("tainted")


def load_run_diagnostics(path):
    """The run's self-reported contention evidence (both optional): the
    total hypervisor steal CPU-s over the timed window (Bench's
    "steal_total", r16 verdict item 7) and the per-query stall records
    ("stalls": {q: {timed, retry, load, steal}})."""
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    stalls = d.get("stalls")
    return d.get("steal_total"), stalls if isinstance(stalls, dict) else {}


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
    steal_total, stalls = load_run_diagnostics(a.run)
    if steal_total is not None:
        # the one-number contended-window read (r16 verdict item 7): high
        # steal names a co-tenant burst window before any mover is argued
        print(f"run steal total: {steal_total:.1f} cpu-s over the timed "
              "window (hypervisor steal — /proc/stat field 8 delta)")
    else:
        print("run steal total: not reported (pre-r17 run or /proc/stat "
              "unavailable)")
    print(f"window temperature, raw median per-query ratio: {med:.3f}")
    window = med  # mover bar: best available estimator wins below
    if ins:
        ins_med = statistics.median(ratios[k] for k in ins)
        print(f"window temperature, cache-insensitive median "
              f"({len(ins)} queries): {ins_med:.3f}")
        window = ins_med
        trimmed = {k for k in ins if shared[k][1] >= TRIM_FLOOR_S}
        if trimmed:
            tr_med = statistics.median(ratios[k] for k in trimmed)
            print(f"window temperature, TRIMMED insensitive median "
                  f"(ref >= {TRIM_FLOOR_S:.0f} s, {len(trimmed)} queries): "
                  f"{tr_med:.3f}   <- re-anchor / headline gauge")
            window = tr_med
            if len(trimmed) < 15:
                # the headline rests on a small subset (r16 advice): 10 of
                # 31 insensitive queries clear the floor vs the current
                # anchor — say so rather than letting a thin median read
                # as well-conditioned
                print(f"  WARN: trimmed sample is only {len(trimmed)} "
                      "queries (< 15) — the headline median is "
                      "thin-sampled; read it with the raw/insensitive "
                      "medians, not alone", file=sys.stderr)
        else:
            print(f"WARN: no insensitive query has ref >= {TRIM_FLOOR_S} s "
                  "— trimmed median unavailable", file=sys.stderr)
        if abs(ins_med - med) / med > 0.08:
            print("  NOTE: raw and insensitive medians diverge >8% — run "
                  "and reference likely differ in codegen-cache size; "
                  "trust the insensitive/trimmed reads")
    else:
        print("WARN: r14 A/B pair files absent — cache-insensitive median "
              "unavailable, raw median may under/over-read across "
              "cache-size changes", file=sys.stderr)
        # the floor trim still applies without the A/B pair (r16 advice):
        # the sub-2 s scheduling-floor bias is a property of the QUERIES,
        # not of the insensitive subset — a raw-trimmed median beats the
        # plain raw median as the fallback estimator
        raw_trimmed = {k for k in ratios if shared[k][1] >= TRIM_FLOOR_S}
        if raw_trimmed:
            rt_med = statistics.median(ratios[k] for k in raw_trimmed)
            print(f"window temperature, raw TRIMMED median "
                  f"(ref >= {TRIM_FLOOR_S:.0f} s, {len(raw_trimmed)} "
                  f"queries): {rt_med:.3f}   <- fallback gauge")
            window = rt_med
    # a real mover is an outlier AGAINST the window: ratio beyond 1.5x the
    # best window estimate (trimmed > insensitive > raw — r15 advice: the
    # raw median is the contaminated one exactly when the estimates
    # diverge) with absolute movement worth reading
    outliers = [(k, r, *shared[k]) for k, r in ratios.items()
                if r > 1.5 * window and shared[k][0] - shared[k][1] > 0.8]
    if outliers:
        print(f"movers beyond the window factor (ratio > 1.5x window "
              f"{window:.3f}, >0.8 s absolute):")
        for k, r, rv, av in sorted(outliers, key=lambda x: -x[1]):
            print(f"  {k:32s} {av:6.2f} -> {rv:6.2f}  ({r:.2f}x, "
                  f"window-adjusted {r / window:.2f}x)")
    else:
        print("no movers beyond the window factor — any total shift is "
              "window temperature, not build growth")
    if stalls:
        # the run's own in-slot evidence for its elevated entries: a retry
        # near the reference (window-adjusted) plus in-slot steal names a
        # transient co-tenant burst; a retry matching the timed number
        # names a real regression
        print(f"stall records carried by the run ({len(stalls)}):")
        for k, s in sorted(stalls.items()):
            retry, timed = s.get("retry", -1.0), s.get("timed", -1.0)
            refv = ref.get(k)
            adj = (f", retry {retry / refv / window:.2f}x window-adjusted"
                   if refv and retry > 0 else "")
            print(f"  {k:32s} timed {timed:6.2f}  retry {retry:6.2f}  "
                  f"load {s.get('load', -1.0):5.2f}  "
                  f"steal {s.get('steal', -1.0):6.2f} cpu-s{adj}")


if __name__ == "__main__":
    main()
