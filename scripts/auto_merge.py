#!/usr/bin/env python3
"""Auto-rebase + test + merge for ``aligned`` PRs
(reference scripts/auto_merge.py:1-22).

Dry-run by default: prints the plan.  With GITHUB_* env + --execute it
rebases the PR branch, runs the test suite, and merges on green.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys


def run(cmd, **kw):
    print("+", " ".join(cmd))
    return subprocess.run(cmd, check=True, **kw)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("branch", nargs="?", help="PR branch to merge")
    p.add_argument("--execute", action="store_true")
    args = p.parse_args()
    if not args.branch:
        print("usage: auto_merge.py <branch> [--execute]")
        return 2
    plan = [
        ["git", "fetch", "origin", args.branch],
        ["git", "rebase", "origin/main", args.branch],
        [sys.executable, "-m", "pytest", "tests/", "-x", "-q"],
        ["git", "checkout", "main"],
        ["git", "merge", "--ff-only", args.branch],
    ]
    if not args.execute:
        print("dry run; would execute:")
        for cmd in plan:
            print("  ", " ".join(cmd))
        return 0
    for cmd in plan:
        run(cmd)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
