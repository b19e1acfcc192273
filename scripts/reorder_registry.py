"""Staleness reorder of the __spark_entry__._QUERIES registry.

The driver's correctness harness records rows for only the FIRST ~50
registry entries per round (SURVEY.md §2.1). This script enforces the
documented rotation mechanically:

1. last-green(key) = highest round r where CORRECTNESS_r{r}.json has a
   hash_match (or, for rows-only entries, rows_match) = true row;
2. order = never-checked keys first (current relative order kept — new
   queries sit at the top already), then banked keys ascending by
   last-green (ties keep current relative order);
3. rewrite the _QUERIES dict literal in place, grouped with comments.

Run once per round after new queries land:
    python scripts/reorder_registry.py          # rewrite + report
    python scripts/reorder_registry.py --check  # report only
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")


def last_green_by_key() -> dict[str, int]:
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            data = json.load(f)
        for key, row in data.items():
            ok = row.get("hash_match") or (
                row.get("hash_match") is None and row.get("rows_match")
            )
            if ok:
                out[key] = max(out.get(key, 0), rnd)
    return out


def registry_keys(src: str) -> list[tuple[str, str]]:
    """(key, callable_name) pairs from the _QUERIES dict literal, in
    current order. Refuses to proceed if ANY non-comment body line
    fails to match the entry pattern — a line-wrapped or otherwise
    odd entry must be fixed, not silently dropped from the rewrite."""
    m = re.search(r"_QUERIES: dict\[.*?\] = \{\n(.*?)\n\}\n", src, re.S)
    body = m.group(1)
    entry_re = re.compile(r'^    "([^"]+)": (\w+),$')
    pairs = []
    for line in body.split("\n"):
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        em = entry_re.match(line)
        if not em:
            raise SystemExit(
                f"registry line does not match the one-entry-per-line "
                f"pattern (would be dropped by the rewrite): {line!r}"
            )
        pairs.append((em.group(1), em.group(2)))
    return pairs


def main() -> int:
    check_only = "--check" in sys.argv
    with open(ENTRY) as f:
        src = f.read()
    pairs = registry_keys(src)
    keys = [k for k, _ in pairs]
    assert len(keys) == len(set(keys)), "duplicate registry keys"
    green = last_green_by_key()
    pos = {k: i for i, k in enumerate(keys)}
    ordered = sorted(pairs, key=lambda kv: (green.get(kv[0], 0), pos[kv[0]]))

    groups: dict[int, int] = {}
    for k, _ in ordered:
        groups[green.get(k, 0)] = groups.get(green.get(k, 0), 0) + 1
    print("cadence (last-green round -> entries):")
    for rnd in sorted(groups):
        label = "never" if rnd == 0 else f"r{rnd:02d}"
        print(f"  {label}: {groups[rnd]}")
    window = ordered[:50]
    print(f"window head (first 50): {[k for k, _ in window][:10]} ...")

    if check_only:
        return 0

    lines = []
    prev_round = None
    for k, fn in ordered:
        rnd = green.get(k, 0)
        if rnd != prev_round:
            label = (
                "never driver-checked (new queries first)"
                if rnd == 0
                else f"last driver-green r{rnd:02d}"
            )
            lines.append(f"    # --- {label} ---")
            prev_round = rnd
        lines.append(f'    "{k}": {fn},')
    head = (
        "_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {\n"
        "    # Registry order is deliberate: the driver's correctness harness checks\n"
        "    # the first ~50 entries per round, so ordering = STALENESS (SURVEY.md\n"
        "    # §2.1): never-driver-checked entries first, then ascending last-green\n"
        "    # round. Maintained mechanically by scripts/reorder_registry.py —\n"
        "    # rerun it after adding queries (new entries go at the top).\n"
    )
    new_block = head + "\n".join(lines) + "\n}\n"
    src2 = re.sub(
        r"_QUERIES: dict\[.*?\] = \{\n.*?\n\}\n", new_block, src, count=1, flags=re.S
    )
    reparsed = registry_keys(src2)
    if len(reparsed) != len(pairs) or {k for k, _ in reparsed} != set(keys):
        raise SystemExit(
            f"rewrite would change the registry: {len(pairs)} entries in, "
            f"{len(reparsed)} out — aborting without writing"
        )
    with open(ENTRY, "w") as f:
        f.write(src2)
    print(f"rewrote {len(ordered)} entries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
