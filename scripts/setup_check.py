#!/usr/bin/env python3
"""Environment validator (the TPU analogue of the reference installers).

The reference ships one_click.py (venv + GPU wheel selection) and
validate_requirements.py (clean-venv import check,
scripts/validate_requirements.py:11-31).  On TPU images dependencies are
baked, so this validates instead: required imports, accelerator visibility,
native toolchain, and prints a capability report.  Exit 1 on hard failures.
"""
from __future__ import annotations

import importlib
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REQUIRED = ["jax", "numpy", "aiohttp", "httpx", "websockets", "pydantic", "optax", "orbax.checkpoint"]
OPTIONAL = ["torch", "transformers", "yaml", "einops", "flax"]


def main() -> int:
    report: dict = {"required": {}, "optional": {}, "hard_failures": []}
    for mod in REQUIRED:
        try:
            importlib.import_module(mod)
            report["required"][mod] = "ok"
        except ImportError as exc:
            report["required"][mod] = f"MISSING ({exc})"
            report["hard_failures"].append(mod)
    for mod in OPTIONAL:
        try:
            importlib.import_module(mod)
            report["optional"][mod] = "ok"
        except ImportError:
            report["optional"][mod] = "missing (feature-gated)"

    try:
        import jax

        devices = jax.devices()
        report["accelerator"] = {
            "backend": jax.default_backend(),
            "devices": [str(d) for d in devices],
            "device_count": len(devices),
        }
    except Exception as exc:  # noqa: BLE001
        report["accelerator"] = f"unavailable: {exc}"

    report["native_toolchain"] = {
        tool: bool(shutil.which(tool)) for tool in ("g++", "cmake", "ninja", "make")
    }
    try:
        from project_morpheus_tpu import native

        report["native_pcm_ops"] = native.available()
    except Exception as exc:  # noqa: BLE001
        report["native_pcm_ops"] = f"error: {exc}"

    print(json.dumps(report, indent=2))
    return 1 if report["hard_failures"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
