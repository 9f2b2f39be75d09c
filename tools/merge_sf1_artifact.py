"""Merge the round-10 sf1 sweep parts into SF1_CONTRACT_r10.json.

The --all sweep ran in parts (a mid-sweep engine fix restarted it with
--skip of the already-green names; per-query retries with a raised
DuckDB temp cap run last), each part logging per-query JSON lines.
This tool folds every part's lines plus the INFEASIBLE_AT_SF1 map
into one artifact, later parts overriding earlier ones per query.

Usage: python tools/merge_sf1_artifact.py OUT LOG [LOG ...]
"""
from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sf1_contract import INFEASIBLE_AT_SF1  # noqa: E402

LINE = re.compile(r"^([a-z_0-9]+): (\{.*\})$")


def main() -> None:
    out, logs = sys.argv[1], sys.argv[2:]
    results: dict[str, dict] = {}
    for path in logs:
        txt = open(path, encoding="utf-8", errors="replace").read().replace("\r", "\n")
        for line in txt.split("\n"):
            m = LINE.match(line.strip())
            if m:
                try:
                    results[m.group(1)] = json.loads(m.group(2))
                except json.JSONDecodeError:
                    pass
    # names classified infeasible keep their attempt record (the walls
    # and error are evidence) but move under the infeasible section
    # instead of counting as bad
    attempts = {
        n: results.pop(n) for n in list(results) if n in INFEASIBLE_AT_SF1
    }
    green = [
        n for n, r in results.items()
        if r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
    ]
    bad = sorted(set(results) - set(green))
    payload = {
        "summary": {
            "round": 10,
            "n": len(results),
            "green": len(green),
            "bad": bad,
            "note": (
                "full oracle-feasible sf1 contract: every oracle-carrying "
                "registry query except infeasible_at_sf1 (reasons + alternate "
                "routes below); per-query walls for both engines inline"
            ),
        },
        "infeasible_at_sf1": INFEASIBLE_AT_SF1,
        "infeasible_attempts": attempts,
        "results": dict(sorted(results.items())),
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"{out}: n={len(results)} green={len(green)} bad={bad}")


if __name__ == "__main__":
    main()
