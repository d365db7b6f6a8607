"""Canary-normalized cross-round bench comparison (r12 judge ask #2).

Compares two BENCH_LOCAL.json files (full per-entry maps + canary block)
per the protocol in SCALE.md: per-entry ratios are divided by the canary
ratio before anything is attributed to the tree — the canary is a fixed,
never-modified, map-only micro-workload, so its round-over-round movement
measures the BOX, not the code.

Usage: python tools/bench_compare.py OLD.json NEW.json [top_n]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    co, cn = old["canary"]["median"], new["canary"]["median"]
    f = cn / co
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    to = sum(qo[q] for q in common)
    tn = sum(qn[q] for q in common)
    print(f"canary median: old {co:.3f}s new {cn:.3f}s -> box factor f = {f:.3f}")
    print(f"common entries: {len(common)}")
    print(f"total on common: old {to:.1f}s new {tn:.1f}s")
    print(f"raw ratio {tn / to:.3f}x | canary-normalized {(tn / to) / f:.3f}x")
    ratios = sorted(
        ((qn[q] / qo[q] if qo[q] > 0 else float('inf'), q) for q in common)
    )
    med = ratios[len(ratios) // 2][0]
    print(f"median per-entry raw ratio {med:.3f}x | normalized {med / f:.3f}x")
    movers = sorted(common, key=lambda q: abs(qn[q] - qo[q]), reverse=True)[:top_n]
    print(f"\n| entry | r_old s | r_new s | raw | normalized |")
    print("|---|---|---|---|---|")
    for q in movers:
        r = qn[q] / qo[q] if qo[q] > 0 else float("inf")
        print(f"| {q} | {qo[q]:.2f} | {qn[q]:.2f} | {r:.2f}x | {r / f:.2f}x |")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        cost = sum(qn[q] for q in only_new)
        print(f"\nnew entries ({len(only_new)}, {cost:.1f}s): "
              + ", ".join(f"{q} {qn[q]:.2f}s" for q in only_new))


if __name__ == "__main__":
    main()
