#!/usr/bin/env python3
"""Verify every code symbol cited in COVERAGE.md resolves to real code.

COVERAGE.md cites symbols as `pkg/File.symbol` or `File.symbol` (backticked).
For each cite whose File maps to a .scala file under src/main/scala/graft,
require the symbol to appear in that file as a def/val/var/object/class/trait
or case-class field. Cites whose File is not a repo file (e.g. Spark API
mentions like `Dataset.observe`) are skipped. Exits non-zero on any dangling
cite — this is the guard against doc drift like the round-7
`jdbcStagedMerge` -> `jdbcUpsert` rename.

Usage: python3 tools/check_coverage_cites.py  (run from the repo root)
"""
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
SRC = ROOT / "src" / "main" / "scala" / "graft"

CITE = re.compile(r"`((?:[a-z][a-zA-Z]*/)?[A-Z][A-Za-z]+)\.([a-zA-Z][A-Za-z0-9]*)`")


def main():
    scala_files = {p.relative_to(SRC).as_posix()[:-len(".scala")]: p
                   for p in SRC.rglob("*.scala")}
    by_base = {}
    for rel, p in scala_files.items():
        by_base.setdefault(rel.rsplit("/", 1)[-1], []).append(p)
    text = (ROOT / "COVERAGE.md").read_text()
    n_checked = n_skipped = 0
    bad = []
    for m in CITE.finditer(text):
        ref, sym = m.group(1), m.group(2)
        if ref in scala_files:
            paths = [scala_files[ref]]
        elif ref in by_base:
            paths = by_base[ref]
        else:
            n_skipped += 1  # not a repo file: Spark/external API mention
            continue
        n_checked += 1
        pat = re.compile(
            r"\b(?:def|val|var|lazy val|object|class|trait)\s+" + re.escape(sym) + r"\b"
            r"|\b" + re.escape(sym) + r"\s*:")
        if not any(pat.search(p.read_text()) for p in paths):
            bad.append(f"{ref}.{sym} (cited in COVERAGE.md, not found in "
                       + ", ".join(str(p.relative_to(ROOT)) for p in paths) + ")")
    for b in bad:
        print(f"DANGLING {b}")
    print(f"== {n_checked} cites checked, {n_skipped} non-repo skipped, "
          f"{len(bad)} dangling")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
