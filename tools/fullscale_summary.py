#!/usr/bin/env python3
"""Summarize a FullScale sweep log into the BASELINE.md growth table.

Usage: python3 tools/fullscale_summary.py /tmp/fullscale_x100.log [k]

Parses FULLSCALE SUMMARY lines (rows + wall per query at x1 vs xK),
buckets queries into growth classes, and prints the distribution plus
the outliers a BASELINE.md entry needs: failures, wall ratios > k
(super-linear), and the per-query table sorted by wall ratio.
"""
import re
import sys


def main() -> None:
    path = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    pat = re.compile(
        r"FULLSCALE SUMMARY (\S+) rows (-?\d+) -> (-?\d+) \(ratio ([\d.]+|-)\) "
        r"wall ([\d.]+) / ([\d.]+) = ([\d.]+)")
    fail_pat = re.compile(r"FULLSCALE (x\S+) (\S+) FAILED (.*)")
    rows = []
    fails = []
    for line in open(path, errors="replace"):
        m = pat.search(line)
        if m:
            q, n1, nk, rr, tk, t1, wr = m.groups()
            rows.append((q, int(n1), int(nk), rr, float(t1), float(tk), float(wr)))
        f = fail_pat.search(line)
        if f:
            fails.append(f.groups())
    if fails:
        print(f"FAILURES ({len(fails)}):")
        for tag, q, msg in fails:
            print(f"  {tag} {q}: {msg[:160]}")
    if not rows:
        print("no SUMMARY lines found (sweep still running?)")
        return
    walls = sorted(r[6] for r in rows if r[6] > 0)
    t1_total = sum(r[4] for r in rows)
    tk_total = sum(r[5] for r in rows)
    med = walls[len(walls) // 2]
    p90 = walls[int(len(walls) * 0.9)]
    print(f"\nqueries={len(rows)} total wall x1={t1_total:.1f}s "
          f"x{k}={tk_total:.1f}s ratio={tk_total / t1_total:.2f}x")
    print(f"wall ratio median={med:.2f} p90={p90:.2f} max={walls[-1]:.2f}")
    sup = [r for r in rows if r[6] > k]
    print(f"super-linear (wall ratio > {k}): {len(sup)}")
    print("\ntop 20 by wall ratio:")
    for q, n1, nk, rr, t1, tk, wr in sorted(rows, key=lambda r: -r[6])[:20]:
        print(f"  {q:34s} rows {n1:>10} -> {nk:>12} (x{rr}) "
              f"wall {t1:6.2f} -> {tk:8.2f} ({wr:6.2f}x)")
    print("\ntop 15 by absolute xK wall:")
    for q, n1, nk, rr, t1, tk, wr in sorted(rows, key=lambda r: -r[5])[:15]:
        print(f"  {q:34s} {tk:8.2f}s (x1 {t1:5.2f}s, ratio {wr:.2f}x) rows {nk}")


if __name__ == "__main__":
    main()
