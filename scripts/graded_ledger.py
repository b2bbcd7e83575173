"""Summarize which registered queries have ever been driver-graded green.

Reads every CORRECTNESS_r*.json at the repo root and prints three lists:
ever-green keys, keys graded but never green, and never-graded keys in
registration order — the input for rotating ``registry._GRADE_FRONT`` each
round (see GRADED.md).
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from datums_warehouse_spark import registry  # noqa: E402


def main() -> None:
    allq = list(registry.all_queries())
    seen: set[str] = set()
    green: set[str] = set()
    rows_only: set[str] = set()
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        for k, v in json.load(open(f)).items():
            seen.add(k)
            if v.get("err") is None and (v.get("hash_match") or v.get("rows_match")):
                green.add(k)
            elif v.get("err") == "no_oracle" and k in registry.ROWS_ONLY_BY_DESIGN:
                # the driver records an oracle-less key as err:"no_oracle" —
                # for allowlisted keys that IS the expected outcome (rows-only
                # by design). Kept in a SEPARATE bucket from hash-verified
                # green (ADVICE r10: a no_oracle row carries no value-hash
                # signal; merging it into `green` overstates verification).
                rows_only.add(k)
    rows_only -= green  # a key hash-verified in ANY round counts as green
    never = [k for k in allq if k not in seen]
    print(
        f"registered: {len(allq)}  ever graded: {len(seen)}  "
        f"ever hash/rows green: {len(green)}  "
        f"rows-only by design: {len(rows_only)}"
    )
    print("\n# rows-only(by design) — a driver row of err:'no_oracle' is the")
    print("# EXPECTED green outcome for these keys, not a failure:")
    for k, why in sorted(registry.ROWS_ONLY_BY_DESIGN.items()):
        print(f"#   {k}: {why}")
    print("\n# ever green (hash- or rows-verified driver row)")
    print(", ".join(sorted(green)))
    print("\n# rows-only by design (allowlisted no_oracle rows, never hash-verified)")
    print(", ".join(sorted(rows_only)) or "(none)")
    print("\n# graded but never green")
    print(", ".join(sorted(seen - green - rows_only)) or "(none)")
    print(f"\n# never graded ({len(never)}) — rotation candidates, registration order")
    print(", ".join(never) or "(none)")
    print("\n# current first-50 window")
    print(", ".join(allq[:50]))


if __name__ == "__main__":
    main()
