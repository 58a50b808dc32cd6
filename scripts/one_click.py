#!/usr/bin/env python3
"""One-command environment bootstrap (reference scripts/one_click.py parity).

The reference installer creates a venv, detects the accelerator
(nvidia-smi/rocm-smi) and installs matching CUDA/ROCm wheels
(one_click.py:66-133).  The TPU-native equivalent:

1. create ``.venv`` next to the repo (or reuse an existing one),
2. detect the accelerator: TPU (libtpu device files / TPU env vars) ->
   ``jax[tpu]``; none -> ``jax`` (CPU),
3. install ``requirements.txt`` plus the selected jax extra,
4. finish with ``scripts/setup_check.py`` inside the new venv.

``--dry-run`` prints the plan without touching anything (used by tests);
``--system`` skips venv creation and installs into the current
interpreter (containers/CI).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import venv
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def detect_accelerator(env=None, dev_root: str = "/dev") -> str:
    """Return "tpu" or "cpu" (the only targets this framework serves)."""
    env = env if env is not None else os.environ
    if env.get("TPU_NAME") or env.get("TPU_WORKER_HOSTNAMES"):
        return "tpu"
    dev = Path(dev_root)
    if any(dev.glob("accel*")) or any(dev.glob("vfio/*")):
        return "tpu"
    try:
        import jax  # already installed with a TPU backend?

        if any(d.platform == "tpu" for d in jax.devices()):
            return "tpu"
    except Exception:
        pass
    return "cpu"


def jax_requirement(accelerator: str) -> str:
    return "jax[tpu]>=0.5" if accelerator == "tpu" else "jax>=0.5"


def plan_commands(python: str, accelerator: str) -> list:
    """The pip invocations the bootstrap will run, in order."""
    req = REPO / "requirements.txt"
    return [
        [python, "-m", "pip", "install", "--upgrade", "pip"],
        [python, "-m", "pip", "install", "-r", str(req)],
        [python, "-m", "pip", "install", jax_requirement(accelerator)],
        [python, str(REPO / "scripts" / "setup_check.py")],
    ]


def ensure_venv(venv_dir: Path) -> str:
    """Create (or reuse) the venv; return its python executable."""
    py = venv_dir / "bin" / "python"
    if not py.exists():
        print(f"creating venv at {venv_dir}")
        venv.EnvBuilder(with_pip=True).create(str(venv_dir))
    return str(py)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--venv", default=str(REPO / ".venv"))
    ap.add_argument("--system", action="store_true",
                    help="install into the current interpreter (no venv)")
    ap.add_argument("--accelerator", choices=["auto", "tpu", "cpu"],
                    default="auto")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    acc = (
        detect_accelerator() if args.accelerator == "auto"
        else args.accelerator
    )
    print(f"accelerator: {acc} -> {jax_requirement(acc)}")

    if args.system:
        python = sys.executable
    elif args.dry_run:
        python = str(Path(args.venv) / "bin" / "python")
    else:
        python = ensure_venv(Path(args.venv))

    cmds = plan_commands(python, acc)
    for cmd in cmds:
        print("+", " ".join(cmd))
        if args.dry_run:
            continue
        rc = subprocess.call(cmd)
        if rc != 0:
            print(f"FAILED (rc={rc}): {' '.join(cmd)}", file=sys.stderr)
            return rc
    if not args.dry_run and not args.system:
        print(f"done — activate with: source {args.venv}/bin/activate")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
