"""Per-query bench regression table: compare a fresh bench.py JSON
line against a previous round's BENCH_r{N}.json.

Usage: python tools/bench_regress.py OLD.json NEW.json [flag_ratio]

OLD may be a driver-recorded BENCH_r{N}.json (with "parsed") or a raw
one-line bench.py output; NEW likewise.  Prints a markdown table and
flags any query slower than flag_ratio (default 1.25x).  Exit code 0
always — the flag is informational (this box's timings jitter ~20%
run-to-run at sf0.1 fixed-cost sizes).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    if "parsed" in doc:  # driver BENCH_r{N}.json wrapper
        return doc["parsed"]
    return doc


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    flag_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"| phase | old s | new s | ratio |")
    print(f"|---|---|---|---|")
    flagged = []
    for k in nq:
        o, n = oq.get(k), nq[k]
        if o is None:
            print(f"| {k} | — | {n:.2f} | new |")
            continue
        r = n / o if o else float("inf")
        mark = " ⚠" if r > flag_ratio else ""
        if r > flag_ratio:
            flagged.append((k, r))
        print(f"| {k} | {o:.2f} | {n:.2f} | {r:.2f}{mark} |")
    for k in oq:
        if k not in nq:
            print(f"| {k} | {oq[k]:.2f} | — | REMOVED ⚠ |")
            flagged.append((k, float("inf")))
    ot, nt = old.get("value"), new.get("value")
    if ot and nt:
        print(f"| **total** | {ot:.2f} | {nt:.2f} | {nt / ot:.2f} |")
    if flagged:
        print(f"\nflagged (> {flag_ratio}x): "
              + ", ".join(f"{k} {r:.2f}x" for k, r in flagged))
    else:
        print(f"\nno query > {flag_ratio}x slower")


if __name__ == "__main__":
    main()
