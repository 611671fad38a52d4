"""Entry-point CLI contracts: every script parses --help and exposes the
reference's tunables (README.md:78-92 of the reference)."""

import subprocess
import sys
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _help(script):
    res = subprocess.run(
        [sys.executable, os.path.join(ROOT, script), "--help"],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert res.returncode == 0, res.stderr[-500:]
    return res.stdout


@pytest.mark.parametrize(
    "script,expected_flags",
    [
        ("trainer.py", ["--patch-size", "--res-increase", "--batch-size",
                        "--initial-learning-rate", "--epochs", "--mask-threshold",
                        "--network-name", "--low-resblock", "--hi-resblock",
                        "--benchmark-file", "--restore"]),
        ("predictor.py", ["--patch-size", "--res-increase", "--batch-size",
                          "--model-path", "--no-round-small-values",
                          "--low-resblock", "--hi-resblock"]),
        ("test_iterator.py", ["--patch-size", "--batch-size", "--epochs"]),
        ("scripts/prepare_lowres_dataset.py", ["--input-filepath", "--downsample"]),
        ("scripts/prepare_patches.py", ["--patch-size", "--n-patch",
                                        "--mask-threshold", "--minimum-coverage",
                                        "--all-rotation"]),
        ("scripts/prepare_mri_data.py", ["--input-dir", "--phase-pattern",
                                         "--fh-mul", "--rl-mul", "--in-mul"]),
    ],
)
def test_script_help_exposes_reference_tunables(script, expected_flags):
    out = _help(script)
    for flag in expected_flags:
        assert flag in out, f"{script} missing {flag}"


def test_trainer_config_file_defaults(tmp_path):
    """--config FILE seeds argparse defaults; explicit flags still win;
    unknown keys are rejected."""
    import json

    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"patch_size": 10, "epochs": 3}))

    # Use --help to avoid running training; defaults must reflect the file.
    res = subprocess.run(
        [sys.executable, os.path.join(ROOT, "trainer.py"),
         "--config", str(cfg), "--help"],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert res.returncode == 0, res.stderr[-500:]

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"patch_sizee": 10}))
    res = subprocess.run(
        [sys.executable, os.path.join(ROOT, "trainer.py"),
         "--config", str(bad), "--help"],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert res.returncode != 0
    assert "patch_sizee" in res.stderr
