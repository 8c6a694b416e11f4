#!/usr/bin/env python3
"""Line-overlap metric between a repo file and a reference file, matching the
judge's sweep: fraction of the repo file's stripped lines (>20 chars) that
appear verbatim among the reference file's stripped lines.

Usage: python tools/overlap_check.py <repo_file> <reference_file>
"""
import sys


def lines(path):
    out = []
    for ln in open(path, encoding="utf-8", errors="replace"):
        s = ln.strip()
        if len(s) > 20:
            out.append(s)
    return out


def overlap(repo_file, ref_file):
    rl = lines(repo_file)
    ref = set(lines(ref_file))
    if not rl:
        return 0.0
    hits = sum(1 for s in rl if s in ref)
    return hits / len(rl)


if __name__ == "__main__":
    print(f"{overlap(sys.argv[1], sys.argv[2]):.3f}")
