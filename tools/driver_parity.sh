#!/usr/bin/env bash
# Driver-parity bench runner (r13 verdict item 1): reproduce the driver
# harness's bench invocation exactly — a FRESH `sbt "runMain graft.Bench"`
# JVM with the same env contract (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS /
# SPARK_GRAFT_BENCH_OUT), the same bounded stdout-tail capture — plus an
# optional CONTENTION INJECTOR that emulates the driver-window host load the
# builder's quiet sessions never see.
#
# Why the injector is the load-bearing part: the r13 driver bench ran in
# THIS repo with the same warm warehouse and staged inputs the builder uses
# (verified by artifact mtimes), so the only degree of freedom left between
# "builder measures 4.4-6.3 s" and "driver measures 14.7 s" on q_stream_ks
# is concurrent host load during the driver's window (untouched-median
# gauge 1.415, the hottest recorded; the 2-3x movers were CONTIGUOUS in run
# order — ks, late, markov, quality — i.e. a load burst, not a code
# property). `--load N` spins N busy processes for the duration of the run
# so that shape can be reproduced and measured on demand instead of waiting
# for the driver to land in one.
#
# Usage: tools/driver_parity.sh [--load N] [--sf DIR] [--out FILE]
#                                [--cpus N] [--ref MAP.json]
#                                [--driver-session] [--evict]
#   --load N   run N CPU-burner processes concurrently with the bench
#   --sf DIR   fixture dir (default /root/testdata/sf0.1)
#   --out F    bench_out JSON path (default bench_parity.json)
#   --cpus N   SPARK_GRAFT_CPUS for the bench (default 32, the driver's
#              value — passed EXPLICITLY so a parity run can never
#              silently inherit a different shuffle width from the
#              caller's environment; r14 advice)
#   --ref M    extra gauge pass vs a chosen reference map (e.g. a
#              same-build run11-class map), in addition to the anchor
#   --driver-session  reproduce the driver's SESSION shape, not just its
#              invocation (r15 verdict item 1): run the full sf0.01
#              Verify correctness dump first — the exact job the driver
#              runs before its bench, with all its page-cache, metastore
#              and tmp churn — then the bench, serially in this shell
#   --evict    evict every warehouse + testdata + verify-output file from
#              the OS page cache (posix_fadvise DONTNEED — works without
#              root, unlike drop_caches) immediately before the bench:
#              the cold-disk variant of the driver-session hypothesis
# Output: the bench's self-truncating stdout line, the harness-style
# ~2000-char tail it would have parsed, and the gauge_window.py read of the
# full per-query map vs the committed anchor (raw + cache-insensitive +
# trimmed medians).
set -u
cd "$(dirname "$0")/.."

LOAD=0
SF=/root/testdata/sf0.1
OUT=bench_parity.json
CPUS=32
REF=
SESSION=0
EVICT=0
while [ $# -gt 0 ]; do
  case "$1" in
    --load) LOAD="$2"; shift 2 ;;
    --sf)   SF="$2";   shift 2 ;;
    --out)  OUT="$2";  shift 2 ;;
    --cpus) CPUS="$2"; shift 2 ;;
    --ref)  REF="$2";  shift 2 ;;
    --driver-session) SESSION=1; shift ;;
    --evict) EVICT=1; shift ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done

if [ "$SESSION" -eq 1 ]; then
  echo "== driver-session mode: full sf0.01 Verify dump before the bench =="
  VT0=$(date +%s)
  SPARK_GRAFT_CPUS="$CPUS" \
    sbt "runMain graft.Verify /root/testdata/sf0.01 target/verify_session" \
    >/dev/null 2>&1
  VRC=$?
  echo "== verify dump: $(( $(date +%s) - VT0 )) s, rc=$VRC =="
fi

if [ "$EVICT" -eq 1 ]; then
  echo "== evicting warehouse/testdata pages (posix_fadvise DONTNEED) =="
  python3 - <<'PYEOF'
import os
n = b = 0
for root in ("spark-warehouse", "/root/testdata", "target/verify_session"):
    for d, _, fs in os.walk(root):
        for f in fs:
            p = os.path.join(d, f)
            try:
                fd = os.open(p, os.O_RDONLY)
                try:
                    os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
                    n += 1; b += os.path.getsize(p)
                finally:
                    os.close(fd)
            except OSError:
                pass
print(f"evicted {n} files, {b/1e6:.1f} MB advised out of page cache")
PYEOF
fi

BURNERS=()
if [ "$LOAD" -gt 0 ]; then
  echo "== starting $LOAD burner processes (driver-window emulation) =="
  for _ in $(seq 1 "$LOAD"); do
    ( while :; do :; done ) &
    BURNERS+=($!)
  done
  trap 'kill "${BURNERS[@]}" 2>/dev/null' EXIT
fi

# a stale $OUT from a previous run must never be gauged as THIS run's
# result if the bench crashes before writing (r14 review)
rm -f "$OUT"
T0=$(date +%s)
STDOUT=$(SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_OUT="$OUT" \
  SPARK_GRAFT_CPUS="$CPUS" sbt "runMain graft.Bench" 2>/dev/null)
RC=$?
T1=$(date +%s)

if [ "$LOAD" -gt 0 ]; then
  kill "${BURNERS[@]}" 2>/dev/null
  trap - EXIT
fi

# the harness captures only a bounded tail of stdout — show what it would see
TAIL=$(printf '%s' "$STDOUT" | tail -c 2000)
echo "== harness-visible stdout tail (last 2000 chars) =="
echo "$TAIL"
echo
echo "== wall: $((T1 - T0)) s, rc=$RC, load=$LOAD, sf=$SF =="
if [ -f "$OUT" ]; then
  echo "== gauge vs anchor =="
  python3 tools/gauge_window.py "$OUT"
  if [ -n "$REF" ]; then
    echo "== gauge vs $REF =="
    python3 tools/gauge_window.py "$OUT" --ref "$REF"
  fi
else
  echo "ERROR: $OUT not written" >&2
  exit 1
fi
# surface a nonzero bench exit even when a (partial, tainted) JSON was
# flushed — the gauge above is then context, not a success report
exit "$RC"
