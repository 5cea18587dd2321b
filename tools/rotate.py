#!/usr/bin/env python
"""Execute the per-round registry rotation mechanically.

The by-hand edit slipped once (round 11: the displaced 50th promoted
name ended up neither in the prefix nor in DEFERRED until the suite's
invariant test caught it). This tool performs the whole rotation as one
deterministic edit of workload/__init__.py:

1. every name the newest CORRECTNESS_r*.json certifies green
   (hash_match true) moves from wherever it is into DEMOTED under a
   round-stamped comment;
2. DEFERRED names are promoted (removed from DEFERRED) oldest-first
   until the never-certified non-deferred set reaches exactly 50 (the
   driver prefix width) or DEFERRED runs dry;
3. both invariants re-run in-process: tools/check_rotation.py's
   prefix-overlap check and the test_parity prefix==fresh-set shape.

Usage:
    python tools/rotate.py            # dry run: print the plan
    python tools/rotate.py --execute  # apply the edit
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

INIT = os.path.join(
    ROOT, "epiteam_network_etl_functions_spark", "workload", "__init__.py"
)
PREFIX_WIDTH = 50


def newest_round() -> tuple[int, set[str]]:
    paths = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    if not paths:
        raise SystemExit("no CORRECTNESS_r*.json found")
    newest = paths[-1]
    rnd = int(re.search(r"r(\d+)", os.path.basename(newest)).group(1))
    with open(newest) as f:
        data = json.load(f)
    green = {
        n
        for n, row in data.items()
        if isinstance(row, dict) and row.get("hash_match")
    }
    return rnd, green


def plan():
    from epiteam_network_etl_functions_spark import workload

    workload.load_all()
    rnd, green = newest_round()
    demote = [
        n
        for n in workload.REGISTRY
        if n in green and n not in workload.DEMOTED
    ]
    # state after demotion
    demoted = set(workload.DEMOTED) | set(demote)
    deferred = [n for n in workload.DEFERRED if n not in green]
    fresh = [
        n
        for n in workload.REGISTRY
        if n not in demoted and n not in deferred
    ]
    promote = []
    for n in deferred:
        if len(fresh) + len(promote) >= PREFIX_WIDTH:
            break
        promote.append(n)
    return rnd, demote, promote, fresh


def main() -> int:
    execute = "--execute" in sys.argv
    rnd, demote, promote, fresh = plan()
    print(f"newest round: r{rnd:02d}")
    print(f"demote ({len(demote)}): {demote}")
    print(f"promote ({len(promote)}): {promote}")
    print(f"prefix after rotation: {len(fresh) + len(promote)}")
    if not execute:
        print("dry run — pass --execute to apply")
        return 0

    src = open(INIT).read()
    # 1. append the demoted names at the end of DEMOTED
    m = re.search(r"DEMOTED: tuple\[str, \.\.\.\] = \(\n(.*?)\n\)", src, re.S)
    block = m.group(1)
    add = f"    # -- driver-green round {rnd} (tools/rotate.py) --\n"
    add += "".join(f'    "{n}",\n' for n in demote)
    src = src[: m.end(1)] + "\n" + add.rstrip("\n") + src[m.end(1):]
    # 2. drop promoted (and newly demoted) names from DEFERRED
    m = re.search(r"DEFERRED: tuple\[str, \.\.\.\] = \(\n(.*?)\n\)", src, re.S)
    kept_lines = []
    drop = set(promote) | set(demote)
    for line in m.group(1).split("\n"):
        stripped = line.strip()
        if stripped.startswith('"') and stripped.rstrip(",").strip('"') in drop:
            continue
        kept_lines.append(line)
    src = src[: m.start(1)] + "\n".join(kept_lines) + src[m.end(1):]
    open(INIT, "w").write(src)
    print(f"edited {INIT}")

    # 3. re-verify both invariants from a clean re-import (the package's
    # module graph is dropped wholesale so the edited source reloads)
    for mod in [
        m
        for m in list(sys.modules)
        if m.startswith("epiteam_network_etl_functions_spark")
    ]:
        del sys.modules[mod]
    from epiteam_network_etl_functions_spark import workload

    workload.load_all()
    certified = set()
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for n, row in json.load(f).items():
                if isinstance(row, dict) and row.get("hash_match"):
                    certified.add(n)
    prefix = list(workload.REGISTRY)[:PREFIX_WIDTH]
    assert not set(prefix) & certified, "certified name left in prefix"
    fresh_now = [
        n
        for n in workload.REGISTRY
        if n not in workload.DEMOTED and n not in workload.DEFERRED
    ]
    assert len(fresh_now) <= PREFIX_WIDTH, "fresh set exceeds prefix width"
    assert list(workload.REGISTRY)[: len(fresh_now)] == fresh_now
    no_oracle = [n for n in prefix if n not in workload.ORACLES]
    assert not no_oracle, f"prefix names without oracle: {no_oracle}"
    print("rotation invariants: OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
