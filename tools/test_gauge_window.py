#!/usr/bin/env python3
"""Self-contained checks for gauge_window.py (r16 verdict item 7 + r16
advice): the steal_total/stalls parser, the raw-trimmed fallback when the
A/B pair is absent, and the thin-trimmed-sample warning. No pytest
dependency — run `python3 tools/test_gauge_window.py`; exits nonzero on
the first failure.
"""
import contextlib
import io
import json
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
import gauge_window as gw  # noqa: E402


def run_main(run_path, ref_path, ab4096=None, ab100=None):
    """Invoke gauge_window.main with patched argv and A/B pair paths,
    returning (stdout, stderr)."""
    old_argv = sys.argv
    old_ab = (gw.AB_CACHE4096, gw.AB_CACHE100)
    sys.argv = ["gauge_window.py", str(run_path), "--ref", str(ref_path)]
    if ab4096 is not None:
        gw.AB_CACHE4096 = ab4096
    if ab100 is not None:
        gw.AB_CACHE100 = ab100
    out, err = io.StringIO(), io.StringIO()
    try:
        with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
            gw.main()
    finally:
        sys.argv = old_argv
        gw.AB_CACHE4096, gw.AB_CACHE100 = old_ab
    return out.getvalue(), err.getvalue()


def main():
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="gaugetest"))
    run = tmp / "run.json"
    ref = tmp / "ref.json"
    # 4 queries: q_a/q_b above the 2 s trim floor, q_c/q_d floor-class.
    # q_a stalls (timed 3x its ref with a clean retry + in-slot steal).
    run.write_text(json.dumps({
        "metric": "total", "value": 20.0,
        "queries": {"q_a": 9.0, "q_b": 5.2, "q_c": 1.0, "q_d": 0.9,
                    "rest": 3.9, "omitted": 2},
        "stalls": {"q_a": {"timed": 9.0, "retry": 3.1, "load": 4.5,
                           "steal": 12.3}},
        "steal_total": 42.5, "sf": "/x"}))
    ref.write_text(json.dumps({
        "metric": "total", "value": 12.0,
        "queries": {"q_a": 3.0, "q_b": 5.0, "q_c": 0.9, "q_d": 0.8},
        "sf": "/x"}))

    # --- parser: steal_total + stalls --------------------------------------
    steal, stalls = gw.load_run_diagnostics(run)
    assert steal == 42.5, steal
    assert stalls == {"q_a": {"timed": 9.0, "retry": 3.1, "load": 4.5,
                              "steal": 12.3}}, stalls
    # absent fields: (None, {}) — pre-r17 runs must not crash the gauge
    steal2, stalls2 = gw.load_run_diagnostics(ref)
    assert steal2 is None and stalls2 == {}, (steal2, stalls2)
    # driver wrapper ("parsed") unwraps identically
    wrapped = tmp / "wrapped.json"
    wrapped.write_text(json.dumps({"parsed": json.loads(run.read_text())}))
    assert gw.load_run_diagnostics(wrapped) == (steal, stalls)
    # rest/omitted stripped as before
    _, qs, _, _ = gw.load_queries(run)
    assert set(qs) == {"q_a", "q_b", "q_c", "q_d"}, qs

    # --- no-A/B-pair path: raw TRIMMED fallback gauge ----------------------
    out, err = run_main(run, ref, ab4096="/nonexistent_ab.json",
                        ab100="/nonexistent_ab.json")
    assert "run steal total: 42.5 cpu-s" in out, out
    # raw median over ratios {3.0, 1.04, 1.11, 1.13} = 1.12; trimmed to
    # ref >= 2 s leaves {q_a: 3.0, q_b: 1.04} -> median 2.02
    assert "raw TRIMMED median (ref >= 2 s, 2 queries): 2.020" in out, out
    assert "A/B pair files absent" in err, err
    # the fallback gauge (2.02) is the mover bar: q_a at 3.0x is NOT
    # beyond 1.5x window, so no mover — but its stall record still prints
    assert "no movers beyond the window factor" in out, out
    assert "stall records carried by the run (1):" in out, out
    assert "timed   9.00  retry   3.10" in out, out
    # retry 3.1 vs ref 3.0 at window 2.02 -> 0.51x window-adjusted
    assert "retry 0.51x window-adjusted" in out, out

    # --- with an A/B pair: thin-trimmed-sample warning ---------------------
    ab = tmp / "ab.json"
    ab.write_text(json.dumps({
        "value": 12.0,
        "queries": {"q_a": 3.0, "q_b": 5.0, "q_c": 0.9, "q_d": 0.8},
        "sf": "/x"}))  # identical at both cache sizes -> all insensitive
    out2, err2 = run_main(run, ref, ab4096=str(ab), ab100=str(ab))
    assert "TRIMMED insensitive median" in out2, out2
    assert "trimmed sample is only 2 queries (< 15)" in err2, err2

    print("test_gauge_window: OK (parser, raw-trimmed fallback, "
          "thin-sample warn, stall records)")


if __name__ == "__main__":
    main()
