#!/usr/bin/env python3
"""Plan-signature regression gate (r12 verdict item 5).

PlanAuditSpec locks plan shapes at TEST time; this gate locks them at the
BUILD-ARTIFACT level: it diffs every query's optimized-plan SIGNATURE in a
freshly regenerated PLANS.md against the committed one, so a Spark upgrade
or refactor that silently de-optimizes a query — a lost pushdown, a new
Exchange, a vanished WholeStageCodegen span, a broadcast that became a
shuffle — fails loudly even for queries no spec asserts individually.

A query's signature is the noise-normalized skeleton of its plan block:

  - every operator-tree line (`+- Exchange (4)`, `* HashAggregate (11)`),
    with numeric operator ids stripped but indentation, branch structure,
    codegen `*` markers, and join-type qualifiers kept verbatim;
  - every `PushedFilters:` / `PartitionFilters:` / `SelectedBucketsCount:`
    detail line, with expression ids (`#123`), plan ids, and subquery ids
    normalized away (these renumber freely between generations).

Cosmetic regenerations (id renumbering) therefore diff empty; any real
shape change is reported per query and the exit is nonzero. An INTENDED
change is acknowledged by committing the regenerated PLANS.md.

Usage: python3 tools/plan_signature_check.py NEW.md [OLD.md]
  OLD defaults to the committed PLANS.md (`git show HEAD:PLANS.md`).
Typical gate:  sbt "runMain graft.Plans" && \
               python3 tools/plan_signature_check.py PLANS.md
(graft.Plans overwrites PLANS.md in place, so the diff is working-tree
vs HEAD — exactly the change a commit would introduce.)
"""
import re
import subprocess
import sys

TREE_RE = re.compile(r"^([\s:+\-]*)(\* )?([A-Za-z][^()]*?)\s*\(\d+\)\s*$")
DETAIL_KEYS = ("PushedFilters:", "PartitionFilters:", "SelectedBucketsCount:")


def normalize(line):
    line = re.sub(r"#\d+", "#", line)
    # RDD ids renumber freely between generations (an ExistingRDD scan's
    # `MapPartitionsRDD[1957] at localCheckpoint` detail is the same plan
    # whatever the id); the checkpoint call site stays, the id goes
    line = re.sub(r"RDD\[\d+\]", "RDD[]", line)
    line = re.sub(r"plan_id=\d+", "plan_id=", line)
    line = re.sub(r"subquery#?\s*\d*", "subquery#", line)
    line = re.sub(r"dynamicpruning#?\d*", "dynamicpruning#", line)
    return line.rstrip()


def signatures(text):
    """{query -> [signature lines]} from a PLANS.md body."""
    sigs = {}
    name = None
    for line in text.splitlines():
        if line.startswith("## "):
            name = line[3:].strip()
            sigs[name] = []
            continue
        if name is None:
            continue
        m = TREE_RE.match(line)
        if m:
            sigs[name].append(normalize(m.group(1) + (m.group(2) or "") + m.group(3)))
        elif any(k in line for k in DETAIL_KEYS):
            sigs[name].append(normalize(line.strip()))
    return sigs


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    new_text = open(sys.argv[1]).read()
    if len(sys.argv) > 2:
        old_text = open(sys.argv[2]).read()
        old_label = sys.argv[2]
    else:
        old_text = subprocess.run(
            ["git", "show", "HEAD:PLANS.md"], capture_output=True, text=True,
            check=True).stdout
        old_label = "HEAD:PLANS.md"
    new, old = signatures(new_text), signatures(old_text)

    removed = sorted(set(old) - set(new))
    added = sorted(set(new) - set(old))
    changed = []
    for q in sorted(set(old) & set(new)):
        if old[q] != new[q]:
            changed.append(q)

    if added:
        print(f"new queries (no committed signature yet): {', '.join(added)}")
    ok = True
    if removed:
        ok = False
        print(f"REMOVED from the regenerated plans (headline query lost?): "
              f"{', '.join(removed)}")
    for q in changed:
        ok = False
        print(f"SIGNATURE CHANGED: {q}")
        o, n = old[q], new[q]
        # compact line diff: first divergence window, then count
        import difflib
        diff = list(difflib.unified_diff(o, n, lineterm="", n=1))
        for d in diff[2:22]:
            print(f"    {d}")
        if len(diff) > 22:
            print(f"    ... ({len(diff) - 22} more diff lines)")
    if ok:
        print(f"plan signatures: {len(set(old) & set(new))} queries match "
              f"{old_label} — no silent plan shape change")
    else:
        print("\nplan signature drift vs " + old_label + " — if intended, "
              "commit the regenerated PLANS.md; if not, a refactor or Spark "
              "change silently re-planned these queries")
        sys.exit(1)


if __name__ == "__main__":
    main()
