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


def test_predictor_missing_model_path_fails_hard(tmp_path):
    """A typo'd --model-path must be a hard argparse error, not a silent
    random-weights run (the reference crashes too, predictor.py:60-61).
    --allow-random-init is the explicit bench/test escape hatch."""
    res = subprocess.run(
        [sys.executable, os.path.join(ROOT, "predictor.py"),
         "--model-path", str(tmp_path / "nope.h5"),
         "--data-dir", "/root/reference/data",
         "--output-dir", str(tmp_path)],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert res.returncode == 2, (res.returncode, res.stderr[-500:])
    assert "not found" in res.stderr
    assert "--allow-random-init" in res.stderr
    # And the help advertises the escape hatch.
    assert "--allow-random-init" in _help("predictor.py")


def test_bench_emits_one_json_line_on_backend_failure():
    """bench.py's contract: exactly ONE JSON line on stdout even when the
    backend never comes up (BENCH_r03 was an unparseable stack trace —
    VERDICT r3 item 2). BENCH_FORCE_PLATFORM injects the failure; the
    retry budget is shrunk so the watchdog gives up immediately."""
    import json

    res = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "BENCH_FORCE_PLATFORM": "nonexistent_platform",
             "BENCH_INIT_RETRY_S": "2"},
    )
    assert res.returncode == 1
    lines = [l for l in res.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, res.stdout
    parsed = json.loads(lines[0])
    assert parsed["value"] is None
    assert "error" in parsed and parsed["error"], parsed


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
