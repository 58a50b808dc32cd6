"""Layered config: bootstrap, precedence, coerced persistence."""
import os

from project_morpheus_tpu import config as cfg


def test_bootstrap_from_example(tmp_path):
    (tmp_path / ".env.example").write_text("FOO=bar\n")
    env = cfg.ensure_env_file_exists(tmp_path)
    assert env.read_text() == "FOO=bar\n"


def test_bootstrap_defaults_without_example(tmp_path):
    env = cfg.ensure_env_file_exists(tmp_path)
    assert "ORPHEUS_TEMPERATURE=0.6" in env.read_text()


def test_precedence_env_beats_files(tmp_path, monkeypatch):
    (tmp_path / ".env.example").write_text("K=example\n")
    (tmp_path / ".env").write_text("K=envfile\n")
    assert cfg.get_current_config(tmp_path)["K"] == "envfile"
    monkeypatch.setenv("K", "osenv")
    assert cfg.get_current_config(tmp_path)["K"] == "osenv"


def test_save_coerces_and_mirrors(tmp_path, monkeypatch):
    home = tmp_path / "home_config"
    monkeypatch.setattr(cfg, "HOME_CONFIG", home)
    cfg.save_config(
        {"ORPHEUS_MAX_TOKENS": 100.0, "ORPHEUS_TOP_P": 0.85, "FLAG": True},
        base_dir=tmp_path,
    )
    env_text = (tmp_path / ".env").read_text()
    assert "ORPHEUS_MAX_TOKENS=100" in env_text  # float -> int coercion
    assert "ORPHEUS_TOP_P=0.85" in env_text
    assert "FLAG=true" in env_text
    assert home.exists() and "ORPHEUS_MAX_TOKENS=100" in home.read_text()
    assert os.environ["ORPHEUS_MAX_TOKENS"] == "100"
