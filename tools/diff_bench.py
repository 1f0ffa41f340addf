"""Compare two bench JSON lines: per-query time deltas + plan drift.

Usage: python tools/diff_bench.py BENCH_r01.json BENCH_r02.json

Flags queries slower by >25% and any change in the physical-plan
fingerprint (join strategy counts, exchanges, pushed filters, python
nodes) -- a plan drift with a time regression is almost always a lost
broadcast or a new shuffle.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    oq, nq = old.get("queries", {}), new.get("queries", {})
    op, np_ = old.get("plans", {}), new.get("plans", {})

    print(f"total: {old.get('value')} -> {new.get('value')} s")
    for name in sorted(set(oq) | set(nq)):
        if name not in oq:
            print(f"  + {name}: {nq[name]} s (new)")
            continue
        if name not in nq:
            print(f"  - {name}: removed (was {oq[name]} s)")
            continue
        a, b = oq[name], nq[name]
        flag = ""
        if a > 0 and b > a * 1.25:
            flag = "  <-- SLOWER"
        drift = ""
        if name in op and name in np_ and op[name] != np_[name]:
            changed = {
                k: (op[name].get(k), np_[name].get(k))
                for k in set(op[name]) | set(np_[name])
                if op[name].get(k) != np_[name].get(k)
            }
            drift = f"  plan drift: {changed}"
        if flag or drift or abs(b - a) > max(0.5, 0.25 * a):
            print(f"  {name}: {a} -> {b} s{flag}{drift}")


if __name__ == "__main__":
    main()
