"""Super-linear growth gate: BENCH_SF1.json vs BENCH_FULL.json.

Quadratic-ish candidate growth (inverted-index self-joins, LSH band
occupancy, all-pairs fallbacks) hides at sf0.1 where constant overhead
dominates; at 10x the data it shows up as a per-query time ratio well
above the data ratio. This gate compares the sf1 sweep against the
sf0.1 record and flags any query whose growth exceeds
``DATA_RATIO * SLACK`` — unless SCALE.md carries an explicit
``scale-exempt: <query>`` justification line.

Noise control: queries under ``MIN_BASE`` seconds at sf0.1 are
compared against the floor (tiny absolute times ratio wildly), and a
flagged query must also be MATERIAL at sf1 (> MIN_SF1 seconds) —
a 0.2 s -> 3 s jump is overhead variance, not an algorithmic blowup.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DATA_RATIO = 10.0
SLACK = 1.6
MIN_BASE = 0.4  # seconds at sf0.1: below this, use the floor as base
MIN_SF1 = 6.0  # seconds at sf1: below this, never flag


def exemptions() -> set[str]:
    text = (REPO / "SCALE.md").read_text() if (REPO / "SCALE.md").exists() else ""
    return set(re.findall(r"scale-exempt:\s*(q_[a-z0-9_]+)", text))


def check(sf1_path: Path | None = None, base_path: Path | None = None) -> list[str]:
    """Return violation strings (empty = gate passes)."""
    sf1 = json.loads((sf1_path or REPO / "BENCH_SF1.json").read_text())["queries"]
    base = json.loads((base_path or REPO / "BENCH_FULL.json").read_text())["queries"]
    exempt = exemptions()
    bad = []
    for name, t1 in sf1.items():
        t0 = base.get(name)
        if t0 is None or t0 < 0 or t1 < 0:
            if t1 < 0:
                bad.append(f"{name}: FAILED at sf1")
            continue
        ratio = t1 / max(t0, MIN_BASE)
        if ratio > DATA_RATIO * SLACK and t1 > MIN_SF1 and name not in exempt:
            bad.append(f"{name}: {t0:.2f}s -> {t1:.2f}s ({ratio:.1f}x > {DATA_RATIO * SLACK:.0f}x)")
    return bad


def main() -> int:
    bad = check()
    sf1 = json.loads((REPO / "BENCH_SF1.json").read_text())["queries"]
    base = json.loads((REPO / "BENCH_FULL.json").read_text())["queries"]
    rows = []
    for name, t1 in sf1.items():
        t0 = base.get(name)
        if t0 and t0 > 0 and t1 > 0:
            rows.append((t1 / max(t0, MIN_BASE), name, t0, t1))
    rows.sort(reverse=True)
    print("top growth ratios (sf0.1 -> sf1):")
    for r, name, t0, t1 in rows[:15]:
        print(f"  {name}: {t0:.2f}s -> {t1:.2f}s ({r:.1f}x)")
    if bad:
        print("\nGATE VIOLATIONS:")
        for b in bad:
            print(" ", b)
        return 1
    print("\ngate: no unexplained super-linear growth")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
