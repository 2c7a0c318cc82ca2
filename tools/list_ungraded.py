"""List driver-grading exposure: which declared queries have appeared
in a CORRECTNESS_r* window, which never have, and what the current
graded window (first 50 of queries()) will add this round.

Usage: python tools/list_ungraded.py
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    import __spark_entry__ as entry_mod

    graded: set[str] = set()
    for f in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        graded |= set(json.load(open(f)).keys())
    qs = list(entry_mod.queries().keys())
    oracles = set(entry_mod.oracle_sql().keys())
    win = qs[:50]
    never = [q for q in qs if q not in graded]
    print(f"declared: {len(qs)}  oracle-backed: "
          f"{len([q for q in qs if q in oracles])}")
    print(f"graded union so far: {len(graded)}")
    print(f"window: {len(win)} entries, "
          f"{len([q for q in win if q not in oracles])} without oracle, "
          f"{len([q for q in win if q not in graded])} new exposure")
    print(f"projected union after this round: "
          f"{len(graded | set(win))}")
    remaining = [q for q in never if q not in win]
    print(f"\nstill never graded after this round ({len(remaining)}):")
    for q in remaining:
        tag = "" if q in oracles else "   [no oracle — keep out of window]"
        print(f"  {q}{tag}")


if __name__ == "__main__":
    main()
