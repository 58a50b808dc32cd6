#!/usr/bin/env python3
"""Convert an HF Orpheus/Llama release directory into an orbax params dir.

The reference's vLLM engine consumes the HF release directly
(Orpheus-TTS/orpheus_tts_pypi/orpheus_tts/engine_class.py:60-67).  This
repo's runtime can ALSO load the HF directory directly via
``ORPHEUS_CHECKPOINT_PATH`` (adapters/runtime.py:132-148); converting to
orbax once makes every later cold start a sharded, mmap-friendly restore:

    python scripts/convert_checkpoint.py ~/ckpts/orpheus-3b -o ~/ckpts/orpheus-3b-orbax
    ORPHEUS_CHECKPOINT_PATH=~/ckpts/orpheus-3b-orbax ORPHEUS_MODEL_SIZE=3b \
        python scripts/start.py

The model config is saved alongside (``llama_config.json``); the runtime
prefers it over ``ORPHEUS_MODEL_SIZE`` when restoring.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("hf_dir", help="HF checkpoint directory "
                                   "(config.json + safetensors/bin)")
    ap.add_argument("-o", "--out", required=True, help="orbax output dir")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from project_morpheus_tpu.model.hf_weights import load_hf_checkpoint
    from project_morpheus_tpu.training.checkpoint import save_params

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params, cfg = load_hf_checkpoint(args.hf_dir, dtype=dtype)
    out = Path(args.out).expanduser().absolute()
    out.mkdir(parents=True, exist_ok=True)
    path = save_params(out, params)
    (out / "llama_config.json").write_text(
        json.dumps(dataclasses.asdict(cfg), indent=2)
    )
    print(f"wrote {path} (+ llama_config.json); "
          f"use ORPHEUS_CHECKPOINT_PATH={out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
