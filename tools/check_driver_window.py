#!/usr/bin/env python
"""Driver-window contract audit (VERDICT r5 item 8).

The driver's CORRECTNESS_r{N}.json artifact verifies exactly the FIRST
50 entries of __spark_entry__.queries() — dict order is load-bearing
(proven empirically in r4 and r5, when the registry outgrew the window
and 7 queries silently lost their driver row).  This tool makes the
rotation deliberate instead of silent:

* compares the latest CORRECTNESS_r*.json keys against the registry;
* classifies every registry query as  verified-this-round /
  rotated-out (verified in SOME past round) / never-verified;
* FAILS (exit 1) if a never-driver-verified query sits OUTSIDE the
  current 50-entry window — that is the r5 structural finding and must
  not recur;
* appends one audit record to PROGRESS.jsonl so each round's rotation
  is on the record.

Run directly or via tests/test_entry_queries.py::test_driver_window_contract.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50  # measured driver behavior, r4 + r5


def audit(repo: str = REPO) -> dict:
    sys.path.insert(0, repo)
    import __spark_entry__ as entry

    names = list(entry.queries())
    artifacts = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    per_round: dict[str, set] = {}
    for path in artifacts:
        rnd = re.search(r"CORRECTNESS_r(\d+)\.json", path).group(1)
        per_round[rnd] = set(json.load(open(path)))
    ever = set().union(*per_round.values()) if per_round else set()
    latest = per_round[max(per_round, key=int)] if per_round else set()

    windowed = names[:WINDOW]
    outside = names[WINDOW:]
    return {
        "kind": "driver_window_audit",
        "registry": len(names),
        "window": WINDOW,
        "latest_artifact_rows": len(latest),
        "in_window_awaiting_first_row": sorted(
            n for n in windowed if n not in ever),
        "rotated_out_previously_green": sorted(
            n for n in outside if n in ever),
        # the failure class: outside the window AND never verified
        "never_verified_outside_window": sorted(
            n for n in outside if n not in ever),
        # stale keys in the artifact that no longer exist (rename guard)
        "artifact_keys_not_in_registry": sorted(latest - set(names)),
    }


def main() -> int:
    rec = audit()
    rec["ts"] = time.time()
    print(json.dumps(rec, indent=1))
    with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    if rec["never_verified_outside_window"]:
        print("FAIL: never-driver-verified queries outside the 50-row "
              f"window: {rec['never_verified_outside_window']}",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
