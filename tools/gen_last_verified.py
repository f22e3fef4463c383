"""Regenerate last_verified.json from the driver's CORRECTNESS_r0N.json
files: for each query, the most recent round with a GREEN row (no error,
nothing mismatched, at least one positive check).  __spark_entry__.py
orders the registry stalest-first from this file, so every query
re-verifies at worst every ceil(n_queries / 50) rounds instead of
depending on a hand-curated list.

Run after each round lands a new CORRECTNESS file:
    python tools/gen_last_verified.py
"""

from __future__ import annotations

import glob
import json
import os
import re

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green(row: dict) -> bool:
    checks = [row.get("rows_match"), row.get("schema_match"),
              row.get("hash_match")]
    return (row.get("err") is None and False not in checks
            and True in checks)


def main() -> None:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if green(row):
                last[name] = max(last.get(name, 0), rnd)
    out = os.path.join(HERE, "last_verified.json")
    with open(out, "w") as f:
        json.dump(dict(sorted(last.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    by_round: dict[int, int] = {}
    for r in last.values():
        by_round[r] = by_round.get(r, 0) + 1
    print(f"wrote {out}: {len(last)} queries green at least once; "
          f"last-green histogram {dict(sorted(by_round.items()))}")


if __name__ == "__main__":
    main()
