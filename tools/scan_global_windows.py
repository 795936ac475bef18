#!/usr/bin/env python3
"""Scan PLANS.md for GLOBAL ordered Window operators (no PARTITION BY).

A global ordered window moves its whole input to one reducer — the
scale-killer class the round-8 verdict flagged on q_rfm (fixed in round 9
by the labeled-histogram + PrefixSum derivation). This scan keeps the
class visible: every remaining global window must be either

  (a) above a partial WindowGroupLimit — Spark's two-phase top-k: each
      task keeps only k rows before the single-partition rank, so the
      global window sees tasks*k rows, never the corpus; or
  (b) over a relation bounded by construction (source / cell / price /
      quota cardinality), listed in BOUNDED below with its bound.

Exit 1 if a global ordered window appears in a query that is neither
WindowGroupLimit-protected nor allowlisted — i.e. a new scale-killer.

Usage: python3 tools/scan_global_windows.py [PLANS.md]
"""
import re
import sys

# Queries whose global ordered windows are over provably bounded
# relations (no WindowGroupLimit involved). Keep reasons precise — this
# list is evidence, not an escape hatch.
BOUNDED = {
    "q_cluster_sample": "quota remainder ranking over the cell relation (fixed cell count)",
    "q_mix_schedule": "stride schedule over per-source quotas (source cardinality)",
    "q_quality_drift": "drift ranking over per-source rollups (source cardinality)",
    "q_rrf_fusion": "rank windows run AFTER TakeOrdered cut both candidate lists to k rows (PlanAuditSpec-locked)",
    "q_sample_stratified": "per-stratum quota remainders (source cardinality)",
    "q_skyline": "strict-prefix running max over the per-price max collapse (price cardinality)",
    "q_tokenize_ids": "vocabulary id assignment over the frequency-ranked vocab (vocab cardinality; production tokenizers cap the vocab)",
    "q_zipf_fit": "OLS fit over the top token ranks (rank-limited input)",
    "q_rolling_distinct": "running delta sum over the calendar-day spine (bounded by elapsed days, not data volume)",
    "q_decile_gains": "cumulative share over the decile rollup (bucket-count bounded: <= 10 rows; the per-customer ranks themselves come from the window-free PrefixSum scaffold)",
}


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "PLANS.md"
    lines = open(path).read().split("\n")

    def bracket_groups(args: str) -> list[str]:
        depth, groups, cur = 0, [], ""
        for ch in args:
            if ch == "[":
                depth += 1
                if depth == 1:
                    cur = ""
                else:
                    cur += ch
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(cur)
                else:
                    cur += ch
            elif depth >= 1:
                cur += ch
        return groups

    sec = None
    # per query: order-expr texts of WindowGroupLimit ops (their second
    # bracket group), and order texts of GLOBAL ordered Window ops
    wgl_orders: dict[str, set] = {}
    glob_wins: dict[str, list[str]] = {}
    for i, line in enumerate(lines):
        if line.startswith("## "):
            sec = line[3:].strip()
        is_wgl = bool(re.match(r"^\(\d+\) WindowGroupLimit", line))
        # exactly the Window operator — WindowGroupLimit has the argument
        # format [partition],[order],fn,k,mode and is handled separately
        is_win = bool(re.match(r"^\(\d+\) Window\s*$", line))
        if not (is_wgl or is_win):
            continue
        for j in range(i + 1, min(i + 6, len(lines))):
            if lines[j].startswith("Arguments:"):
                groups = bracket_groups(lines[j][len("Arguments:"):].strip())
                if is_wgl and len(groups) >= 2:
                    wgl_orders.setdefault(sec, set()).add(groups[1])
                # [exprs],[order] with ASC/DESC = global ordered window;
                # [exprs],[partition] (no sort markers) is partitioned.
                if is_win and len(groups) == 2 and \
                        ("ASC" in groups[1] or "DESC" in groups[1]):
                    glob_wins.setdefault(sec, []).append(groups[1])
                break
    bad = []
    for q, wins in sorted(glob_wins.items()):
        # a global window is WindowGroupLimit-protected only if a group
        # limit over the SAME order spec exists in the plan — per-window
        # matching, not per-query credit (a protected top-k next to an
        # unprotected global rank must still fail)
        unprotected = [w for w in wins if w not in wgl_orders.get(q, set())]
        if not unprotected:
            status = "ok (every global window has a matching WindowGroupLimit — two-phase top-k)"
        elif q in BOUNDED:
            status = f"ok (bounded: {BOUNDED[q]})"
        else:
            status = "UNBOUNDED?"
            bad.append(q)
        print(f"{q}: {len(wins)} global ordered window(s) — {status}")
    if bad:
        print(f"\nFAIL: unaccounted global ordered windows in: {', '.join(bad)}")
        return 1
    print(f"\nOK: every global ordered window is WindowGroupLimit-protected or allowlisted-bounded "
          f"({len(glob_wins)} queries scanned)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
