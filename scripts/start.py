#!/usr/bin/env python3
"""Server entrypoint with fail-fast dependency checks.

Functional parity with reference scripts/start.py:24-49: verify critical
imports before binding the port, apply the config cascade, then serve.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def check_dependencies() -> list[str]:
    missing = []
    for mod in ("jax", "aiohttp", "numpy", "httpx"):
        try:
            __import__(mod)
        except ImportError:
            missing.append(mod)
    return missing


def main() -> int:
    missing = check_dependencies()
    if missing:
        print(
            f"missing required dependencies: {', '.join(missing)}", file=sys.stderr
        )
        return 1
    from project_morpheus_tpu import config as cfg
    from project_morpheus_tpu.server import start_server

    cfg.ensure_env_file_exists()
    merged = cfg.get_current_config()
    print(
        f"starting Morpheus TPU server on "
        f"{merged['ORPHEUS_HOST']}:{merged['ORPHEUS_PORT']} "
        f"(engine={merged['ORPHEUS_ENGINE_MODE']}, "
        f"model={merged['ORPHEUS_MODEL_SIZE']})"
    )
    start_server()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
