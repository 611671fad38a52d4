"""export_ema.py: EMA/raw subtree extraction from train-state checkpoints."""

import subprocess
import sys

import h5py
import jax.numpy as jnp
import numpy as np

from flownet4d_tpu.training import checkpoint as ckpt
from flownet4d_tpu.training.trainer import TrainState


def _tiny_state(with_ema: bool):
    rng = np.random.default_rng(7)
    params = {"pc1": {"kernel": jnp.asarray(rng.standard_normal((3, 3, 3, 2, 4)),
                                            jnp.float32),
                      "bias": jnp.zeros((4,), jnp.float32)}}
    ema = ({"pc1": {"kernel": params["pc1"]["kernel"] + 1.0,
                    "bias": params["pc1"]["bias"] + 1.0}}
           if with_ema else None)
    return TrainState(params, {"count": jnp.zeros((), jnp.int32)},
                      jnp.asarray(5, jnp.int32), ema)


def _run_export(ckpt_dir, out, extra=()):
    return subprocess.run(
        [sys.executable, "scripts/export_ema.py", "--ckpt", str(ckpt_dir),
         "--out", str(out), *extra],
        capture_output=True, text=True, cwd=".",
    )


def test_export_ema_and_raw_subtrees(tmp_path):
    state = _tiny_state(with_ema=True)
    cdir = tmp_path / "s-latest.ckpt"
    ckpt.save_train_state(str(cdir), state)

    out = tmp_path / "ema.h5"
    r = _run_export(cdir, out)
    assert r.returncode == 0, r.stderr
    with h5py.File(out) as hf:
        np.testing.assert_allclose(
            hf["pc1/kernel"][...], np.asarray(state.ema["pc1"]["kernel"]))

    out_raw = tmp_path / "raw.h5"
    r = _run_export(cdir, out_raw, ("--raw",))
    assert r.returncode == 0, r.stderr
    with h5py.File(out_raw) as hf:
        np.testing.assert_allclose(
            hf["pc1/kernel"][...], np.asarray(state.params["pc1"]["kernel"]))


def test_export_ema_falls_back_to_params_without_ema(tmp_path):
    state = _tiny_state(with_ema=False)
    cdir = tmp_path / "s-latest.ckpt"
    ckpt.save_train_state(str(cdir), state)

    out = tmp_path / "w.h5"
    r = _run_export(cdir, out)
    assert r.returncode == 0, r.stderr
    assert "falling back to raw params" in r.stderr
    with h5py.File(out) as hf:
        np.testing.assert_allclose(
            hf["pc1/kernel"][...], np.asarray(state.params["pc1"]["kernel"]))
