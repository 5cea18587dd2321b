"""Rotation invariant checker.

Verifies the registry's driver-facing 50-slot prefix contains only
never-certified names: zero overlap with the union of hash_match:true
names across every CORRECTNESS_r*.json in the repo root. Run after any
DEMOTED/DEFERRED edit.

Usage: python tools/check_rotation.py
"""
from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epiteam_network_etl_functions_spark import workload


def certified_names(repo_root: str) -> set[str]:
    names: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match"):
                names.add(name)
    return names


def main() -> int:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    workload.load_all()
    prefix = list(workload.REGISTRY)[:50]
    certified = certified_names(repo_root)
    overlap = sorted(set(prefix) & certified)

    uncertified_total = [n for n in workload.REGISTRY if n not in certified]
    no_oracle_prefix = [n for n in prefix if n not in workload.ORACLES]

    print(f"registry size: {len(workload.REGISTRY)}")
    print(f"certified (union r01..): {len(certified)}")
    print(f"uncertified remaining: {len(uncertified_total)}")
    print(f"prefix-50 overlap with certified: {len(overlap)}")
    if overlap:
        print("  OVERLAP:", overlap)
    if no_oracle_prefix:
        print(f"prefix names without oracle (burn a slot as err:no_oracle): {no_oracle_prefix}")
    print("prefix-50:")
    for i, n in enumerate(prefix):
        tag = "" if n in workload.ORACLES else "  [NO ORACLE]"
        print(f"  {i + 1:2d}. {n}{tag}")
    ok = not overlap and not no_oracle_prefix
    print("OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
