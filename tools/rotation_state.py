"""Window-rotation auditor: compute each registry row's driver-evidence
age from the committed CORRECTNESS_r*.json history and check the
rotation discipline the judge enforces:

- the driver checks only the FIRST 50 entries of ``queries()``;
- a row's AGE = current round − the last round the driver checked it
  (current round = latest committed CORRECTNESS file + 1);
- every age-3+ row must be INSIDE the window, or be one of ≤10
  documented overflow rows.

Usage: ``python tools/rotation_state.py [--max-overflow N]`` — prints
the per-age cohort summary and exits 1 if more than N (default 0)
age-3+ rows sit outside the window. Run by
``tests/test_rotation_discipline.py`` so a bad reorder fails the suite
BEFORE the driver sees it, and by hand when planning the next round's
order.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def correctness_history() -> dict[int, dict]:
    out = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            out[int(m.group(1))] = json.load(f)
    return out


def rotation_state() -> dict:
    """Return {round, rows: {name: {age, last_checked, last_green,
    position, in_window}}, violations, overflow}."""
    import __spark_entry__ as entry

    order = list(entry.queries())
    hist = correctness_history()
    if not hist:
        raise SystemExit("no CORRECTNESS_r*.json committed")
    current = max(hist) + 1
    rows = {}
    for pos, name in enumerate(order):
        last = last_green = None
        for rnd in sorted(hist):
            rec = hist[rnd].get(name)
            if rec is not None:
                last = rnd
                if rec.get("rows_match") and rec.get("schema_match") and (
                    rec.get("hash_match") is not False
                ):
                    last_green = rnd
        rows[name] = {
            "position": pos + 1,
            "in_window": pos < WINDOW,
            "last_checked": last,
            "last_green": last_green,
            "age": (current - last) if last is not None else None,
        }
    stale = [
        n for n, r in rows.items()
        if (r["age"] is None or r["age"] >= 3) and not r["in_window"]
    ]
    never = [n for n, r in rows.items() if r["last_checked"] is None]
    red_last = [
        n for n, r in rows.items()
        if r["last_checked"] is not None and r["last_green"] != r["last_checked"]
    ]
    return {
        "round": current,
        "registry": len(order),
        "rows": rows,
        "stale_outside_window": sorted(stale),
        "never_checked": sorted(never),
        "red_at_last_check": sorted(red_last),
    }


def main() -> int:
    max_overflow = 0
    if "--max-overflow" in sys.argv:
        idx = sys.argv.index("--max-overflow") + 1
        if idx >= len(sys.argv) or not sys.argv[idx].lstrip("-").isdigit():
            raise SystemExit("usage: rotation_state.py [--max-overflow N]")
        max_overflow = int(sys.argv[idx])
    st = rotation_state()
    ages: dict[object, int] = {}
    for r in st["rows"].values():
        ages[r["age"]] = ages.get(r["age"], 0) + 1
    print(f"round r{st['round']}  registry {st['registry']}  window {WINDOW}")
    for age in sorted(ages, key=lambda a: (a is None, a)):
        print(f"  age {age}: {ages[age]} rows")
    if st["red_at_last_check"]:
        print("red at last driver check (must re-green in-window):")
        for n in st["red_at_last_check"]:
            print(f"  {n} (pos {st['rows'][n]['position']})")
    if st["never_checked"]:
        print(f"never driver-checked: {st['never_checked']}")
    ok = len(st["stale_outside_window"]) <= max_overflow
    if st["stale_outside_window"]:
        print(
            f"age-3+ rows OUTSIDE the window ({len(st['stale_outside_window'])}, "
            f"allowed {max_overflow}): {st['stale_outside_window']}"
        )
    print("ROTATION-OK" if ok else "ROTATION-VIOLATION")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
