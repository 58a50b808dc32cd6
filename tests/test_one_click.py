"""Installer logic (reference tests/test_one_click.py analogue): wheel
selection and command planning are pure functions, tested hermetically;
--dry-run exercises main() without touching the environment."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import one_click  # noqa: E402


def test_detect_tpu_from_env(tmp_path):
    assert one_click.detect_accelerator(
        env={"TPU_NAME": "v5e-8"}, dev_root=str(tmp_path)
    ) == "tpu"
    assert one_click.detect_accelerator(
        env={"TPU_WORKER_HOSTNAMES": "h0,h1"}, dev_root=str(tmp_path)
    ) == "tpu"


def test_detect_tpu_from_device_files(tmp_path):
    (tmp_path / "accel0").touch()
    assert one_click.detect_accelerator(env={}, dev_root=str(tmp_path)) == "tpu"


def test_detect_cpu_fallback(tmp_path, monkeypatch):
    # no env hints, no device files, and the jax probe must not decide
    # "tpu" on this machine's real backend
    monkeypatch.setitem(sys.modules, "jax", None)
    assert one_click.detect_accelerator(env={}, dev_root=str(tmp_path)) == "cpu"


def test_jax_requirement_selection():
    assert "tpu" in one_click.jax_requirement("tpu")
    assert "tpu" not in one_click.jax_requirement("cpu")


def test_plan_commands_order():
    cmds = one_click.plan_commands("/x/python", "tpu")
    joined = [" ".join(c) for c in cmds]
    assert "pip install --upgrade pip" in joined[0]
    assert joined[1].endswith("requirements.txt")
    assert "jax[tpu]" in joined[2]
    assert joined[-1].endswith("setup_check.py")


def test_dry_run_main(capsys, tmp_path):
    rc = one_click.main(
        ["--dry-run", "--accelerator", "cpu", "--venv", str(tmp_path / "v")]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "accelerator: cpu" in out
    assert "setup_check.py" in out
    assert not (tmp_path / "v").exists()  # dry run touches nothing
