#!/usr/bin/env python3
"""Render the BASELINE.md soak matrix from two tools.Soak logs.

Usage: soak_table.py <10x log> <30x log>

Emits a markdown table: per-query wall-times at sf0.1 / 10x / 30x and the
implied scaling exponent alpha = ln(t30/t10) / ln(3) — the high-scale
slope, where the fixed per-query overhead visible at sf0.1 has amortized
(alpha 1.0 = linear in data, 0 = scale-free, >1 = super-linear).
"""
import math
import re
import sys

LINE = re.compile(
    r"\[soak\] (\S+)\s+sf0\.1\s+([0-9.]+)s \(\s*(\d+) rows\)\s+"
    r"(\d+)x\s+([0-9.]+)s \(\s*(\d+) rows\)\s+ratio")


def parse(path):
    out = {}
    for ln in open(path):
        m = LINE.search(ln)
        if m:
            q, t_small, _, copies, t_big, rows_big = m.groups()
            out[q] = (float(t_small), float(t_big), int(copies),
                      int(rows_big))
    return out


def main(p10, p30):
    a, b = parse(p10), parse(p30)
    print("| query | sf0.1 s | 10x s | 30x s | t30/t10 | alpha(10->30) |")
    print("|---|---|---|---|---|---|")
    worst = (None, -1.0)
    for q in a:
        if q not in b:
            continue
        t1 = (a[q][0] + b[q][0]) / 2  # two independent sf0.1 measurements
        t10, t30 = a[q][1], b[q][1]
        alpha = math.log(t30 / t10) / math.log(3)
        if alpha > worst[1]:
            worst = (q, alpha)
        print(f"| {q} | {t1:.2f} | {t10:.2f} | {t30:.2f} "
              f"| {t30 / t10:.2f} | {alpha:.2f} |")
    print(f"\nworst exponent: {worst[0]} alpha={worst[1]:.2f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
