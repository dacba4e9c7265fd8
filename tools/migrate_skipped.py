#!/usr/bin/env python3
"""Migrate ScaleStress artifacts to the round-12 error-channel format.

Round-11 artifacts recorded deliberately-disabled probes as
RuntimeException entries in the `errors` map ("probes off"), which made
"zero errors" claims carry exceptions as their way of saying "not
measured" (round-11 verdict, missing #4). The harness now writes a
separate `skipped` map; this script applies the same split to already-
committed artifacts IN PLACE. Format-only: measured rows, samples,
spills and probe payloads are byte-untouched — only entries whose
message marks a deliberate skip move from `errors` to `skipped`.
"""
import json
import sys

SKIP_MARKERS = ("probes off", "ProbeSkipped")


def migrate(path: str) -> bool:
    with open(path) as f:
        doc = json.load(f)
    errors = doc.get("errors")
    if not errors:
        return False
    skipped = doc.setdefault("skipped", {})
    moved = [k for k, v in errors.items()
             if any(m in str(v) for m in SKIP_MARKERS)]
    if not moved:
        return False
    for k in moved:
        # keep only the human reason, not the exception wrapper
        msg = str(errors.pop(k))
        skipped[k] = "probes off" if "probes off" in msg else msg
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"{path}: moved {len(moved)} skip entries "
          f"({', '.join(moved)}); errors now {len(errors)}")
    return True


if __name__ == "__main__":
    changed = 0
    for p in sys.argv[1:]:
        changed += migrate(p)
    print(f"migrated {changed} artifact(s)")
