#!/usr/bin/env python3
"""PR triage by touched path (reference scripts/pr_triage.py:1-25).

Labels PRs ``aligned`` when they touch active framework paths and
``deprecated`` when they only touch archived/legacy paths.  Runs against
the GitHub API when GITHUB_TOKEN/GITHUB_REPOSITORY are set; otherwise
classifies a file list from argv (used by tests/CI dry runs).
"""
from __future__ import annotations

import json
import os
import sys

ALIGNED_PREFIXES = (
    "project_morpheus_tpu/",
    "scenes/",
    "tests/",
    "scripts/",
    "bench.py",
    "__graft_entry__.py",
)
DEPRECATED_PREFIXES = ("archive/", "legacy/")


def classify(paths) -> str:
    if any(p.startswith(DEPRECATED_PREFIXES) for p in paths):
        if all(p.startswith(DEPRECATED_PREFIXES) for p in paths):
            return "deprecated"
    if any(p.startswith(ALIGNED_PREFIXES) for p in paths):
        return "aligned"
    return "needs-review"


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if argv:
        print(classify(argv))
        return 0
    token = os.environ.get("GITHUB_TOKEN")
    repo = os.environ.get("GITHUB_REPOSITORY")
    pr = os.environ.get("PR_NUMBER")
    if not (token and repo and pr):
        print("usage: pr_triage.py <changed files...> (or set GITHUB_* env)")
        return 2
    import httpx

    api = f"https://api.github.com/repos/{repo}"
    headers = {"Authorization": f"Bearer {token}"}
    files = httpx.get(f"{api}/pulls/{pr}/files", headers=headers).json()
    label = classify([f["filename"] for f in files])
    httpx.post(
        f"{api}/issues/{pr}/labels", headers=headers, json={"labels": [label]}
    )
    print(json.dumps({"pr": pr, "label": label}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
