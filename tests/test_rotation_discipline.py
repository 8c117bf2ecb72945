"""Window-rotation discipline (r16): the driver checks only the first
50 entries of ``queries()``; every row whose driver evidence is 3+
rounds old must be inside that window, and any row that was RED at its
last driver check must re-green in-window. These are the conventions
VERDICT r13-r15 enforced by hand each round — this test makes a bad
reorder fail the suite before the driver sees it. No Spark session
needed: it only reads the committed CORRECTNESS history and the
registry order."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_no_stale_rows_outside_window():
    from rotation_state import rotation_state

    st = rotation_state()
    assert st["registry"] >= 100
    # the r16 plan has ZERO overflow; if a future round legitimately
    # documents overflow (<=10 rows, each with compensating evidence),
    # update this bound alongside the rotation note
    assert st["stale_outside_window"] == []
    # a brand-new row is legitimate ONLY inside the window — its first
    # driver check must happen the round it lands, never deferred
    for name in st["never_checked"]:
        assert st["rows"][name]["in_window"], (
            f"new row {name} must enter the registry inside the driver "
            f"window (position {st['rows'][name]['position']})"
        )


def test_red_rows_lead_the_window():
    from rotation_state import rotation_state

    st = rotation_state()
    for name in st["red_at_last_check"]:
        assert st["rows"][name]["in_window"], (
            f"{name} was red at its last driver check and must re-green "
            f"in-window (position {st['rows'][name]['position']})"
        )
