#!/usr/bin/env python3
"""Evict data files from the OS page cache without root (r16, verdict
item 1/2): posix_fadvise(POSIX_FADV_DONTNEED) on every file under the
given roots (default: the warehouse + testdata). drop_caches needs root
and is denied in this container; fadvise evicts the named files' clean
pages, which is exactly the cold-disk state the driver-session
hypothesis posits for the staged parquet scans.

Usage: python3 tools/evict_pages.py [root ...]
"""
import os
import sys

roots = sys.argv[1:] or ["spark-warehouse", "/root/testdata"]
n = b = 0
for root in roots:
    for d, _, fs in os.walk(root):
        for f in fs:
            p = os.path.join(d, f)
            try:
                fd = os.open(p, os.O_RDONLY)
                try:
                    os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
                    n += 1
                    b += os.path.getsize(p)
                finally:
                    os.close(fd)
            except OSError:
                pass
print(f"evicted {n} files, {b / 1e6:.1f} MB advised out of page cache")
