#!/usr/bin/env python3
"""Second-resolution hypervisor-steal sampler (r16 driver-mover record,
BASELINE.md): logs `epoch steal_cpu_s_per_s loadavg1` once per second so
a bench mover can be correlated with a co-tenant steal burst after the
fact. Near-zero cost (one /proc read per second) — safe to run
CONCURRENTLY with a bench, unlike any load-generating instrument.

Usage: python3 tools/steal_monitor.py OUT.tsv   (stop with SIGTERM/ctrl-C)
"""
import signal
import sys
import time

out = open(sys.argv[1], "w", buffering=1)
stop = False
signal.signal(signal.SIGTERM, lambda *_: sys.exit(0))


def sample():
    f = open("/proc/stat").readline().split()
    return int(f[8])


prev = sample()
while True:
    time.sleep(1)
    cur = sample()
    load1 = open("/proc/loadavg").read().split()[0]
    out.write(f"{time.time():.0f}\t{(cur - prev) / 100.0:.3f}\t{load1}\n")
    prev = cur
