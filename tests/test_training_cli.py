"""Training CLI: YAML config -> pretrain/lora smoke runs (tiny, CPU)."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _write_jsonl(path, n, seed, length=8):
    rng = np.random.default_rng(seed)
    with open(path, "w") as fh:
        for _ in range(n):
            ids = rng.integers(1, 1000, size=(length,)).tolist()
            fh.write(json.dumps({"input_ids": ids}) + "\n")


def _run_cli(args, cwd):
    return subprocess.run(
        [sys.executable, "-m", "project_morpheus_tpu.training", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        env={
            "PYTHONPATH": str(REPO),
            "JAX_PLATFORMS": "cpu",
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "HOME": str(cwd),
        },
        timeout=240,
    )


def test_pretrain_cli(tmp_path):
    _write_jsonl(tmp_path / "text.jsonl", 16, 0)
    _write_jsonl(tmp_path / "audio.jsonl", 8, 1)
    cfg = f"""
model_size: tiny_vocab
text_data: {tmp_path}/text.jsonl
audio_data: {tmp_path}/audio.jsonl
batch_size: 4
total_steps: 3
seq_length: 8
learning_rate: 1e-3
warmup_steps: 1
bf16: false
"""
    (tmp_path / "cfg.yaml").write_text(cfg)
    res = _run_cli(["pretrain", "--config", str(tmp_path / "cfg.yaml")], tmp_path)
    assert res.returncode == 0, res.stderr[-2000:]
    logs = [json.loads(l) for l in res.stdout.splitlines() if l.startswith("{")]
    assert any("text_loss" in l or "audio_loss" in l for l in logs)


def test_lora_cli_saves_merged(tmp_path):
    _write_jsonl(tmp_path / "data.jsonl", 8, 2)
    cfg = f"""
model_size: tiny_vocab
data: {tmp_path}/data.jsonl
batch_size: 2
total_steps: 2
seq_length: 8
lora_rank: 4
bf16: false
checkpoint_dir: {tmp_path}/ckpt
"""
    (tmp_path / "cfg.yaml").write_text(cfg)
    res = _run_cli(["lora", "--config", str(tmp_path / "cfg.yaml")], tmp_path)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "saved_merged" in res.stdout
    assert (tmp_path / "ckpt").exists()
