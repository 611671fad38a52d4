"""Training step semantics + multi-device data parallelism (8 virtual CPUs)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import REFERENCE_DATA_DIR
from flownet4d_tpu.data import PatchLoader, load_indexes, TrainingBatch
from flownet4d_tpu.training import TrainerController
from flownet4d_tpu.parallel import make_mesh


def _tiny_controller(models_dir, batch_mesh=None, **kw):
    # channels=16 keeps CPU conv FLOPs tiny; the math is channel-agnostic.
    return TrainerController(
        8, 2, 1e-3, False, "tiny", low_resblock=1, hi_resblock=1,
        models_dir=str(models_dir), mesh=batch_mesh, channels=16, **kw,
    )


def _random_batch(b=8, p=8, r=2, seed=0, weights=None):
    rng = np.random.default_rng(seed)
    P = p * r
    return TrainingBatch(
        lr=rng.uniform(-1, 1, (b, p, p, p, 3)).astype(np.float32),
        mag=rng.uniform(0, 1, (b, p, p, p, 3)).astype(np.float32),
        hr=rng.uniform(-1, 1, (b, P, P, P, 3)).astype(np.float32),
        venc=np.full((b,), 1.5, np.float32),
        mask=(rng.uniform(size=(b, P, P, P)) > 0.5).astype(np.float32),
        rot_case=np.zeros((b,), np.int32),
        weight=np.ones((b,), np.float32) if weights is None else np.asarray(weights, np.float32),
    )


def test_devices_available():
    assert len(jax.devices()) == 8  # conftest forces 8 virtual CPU devices


def test_train_step_reduces_loss(tmp_path):
    tc = _tiny_controller(tmp_path, make_mesh(jax.devices()[:1]))
    batch = _random_batch()
    losses = []
    for _ in range(8):
        tc.loss_metrics.reset()
        tc.train_step(batch)
        losses.append(tc.loss_metrics["train_loss"].result())
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_padding_samples_do_not_affect_gradients(tmp_path):
    """A zero-weight padded sample must produce the same update as the
    unpadded batch (TF gradient-of-sum semantics with masking)."""
    mesh1 = make_mesh(jax.devices()[:1])
    tc_a = _tiny_controller(tmp_path / "a", mesh1, seed=7)
    tc_b = _tiny_controller(tmp_path / "b", mesh1, seed=7)

    full = _random_batch(b=4, seed=3)
    padded_arrays = jax.tree_util.tree_map(
        lambda x: np.concatenate([x, np.zeros_like(x[:2])]), full
    )
    padded = padded_arrays._replace(weight=np.asarray([1, 1, 1, 1, 0, 0], np.float32))

    tc_a.train_step(full)
    tc_b.train_step(padded)

    pa = jax.device_get(tc_a.state.params)
    pb = jax.device_get(tc_b.state.params)
    # atol covers accumulation-order noise: the padded batch sums 6 terms
    # (2 of them zero) where the unpadded batch sums 4.
    for la, lb in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(la, lb, atol=5e-6)


def test_multi_device_matches_single_device(tmp_path):
    """DP over 8 devices must produce the same update as 1 device."""
    tc1 = _tiny_controller(tmp_path / "one", make_mesh(jax.devices()[:1]), seed=11)
    tc8 = _tiny_controller(tmp_path / "eight", make_mesh(), seed=11)

    batch = _random_batch(b=8, seed=5)
    tc1.train_step(batch)
    tc8.train_step(batch)

    m1 = tc1.loss_metrics.results()
    m8 = tc8.loss_metrics.results()
    assert m1["train_loss"] == pytest.approx(m8["train_loss"], rel=1e-5)

    p1 = jax.device_get(tc1.state.params)
    p8 = jax.device_get(tc8.state.params)
    for l1, l8 in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(l1, l8, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    tc = _tiny_controller(tmp_path, make_mesh(jax.devices()[:1]))
    tc.train_step(_random_batch())
    tc.model_dir = str(tmp_path / "run")
    tc.model_path = str(tmp_path / "run" / "tiny")
    import os

    os.makedirs(tc.model_dir, exist_ok=True)
    tc.save_best_model()

    tc2 = _tiny_controller(tmp_path, make_mesh(jax.devices()[:1]), seed=99)
    tc2.restore_model(tc.model_dir, "tiny-best.ckpt")
    p1 = jax.device_get(tc.state.params)
    p2 = jax.device_get(tc2.state.params)
    for l1, l2 in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(l1, l2)

    # .h5 weight file round trip too
    from flownet4d_tpu.training.checkpoint import load_weights_h5

    params_h5 = load_weights_h5(f"{tc.model_path}-best.h5", p1)
    for l1, l2 in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(params_h5)):
        np.testing.assert_allclose(l1, np.asarray(l2))


def test_clip_norm_trains_and_bounds_update(tmp_path):
    """--clip-norm: the chained optimizer still trains (clip rescales m and
    v consistently, so Adam's normalized step survives; descent just warms
    up a step or two slower than unclipped on a noise target)."""
    tc = _tiny_controller(tmp_path, make_mesh(jax.devices()[:1]),
                          clip_norm=1.0)
    batch = _random_batch()
    losses = []
    for _ in range(10):
        tc.loss_metrics.reset()
        tc.train_step(batch)
        losses.append(tc.loss_metrics["train_loss"].result())
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ema_tracks_params_and_exports(tmp_path):
    """--ema-decay: state.ema is the exact EMA recursion of the params,
    val/test use the EMA view, and the .h5 export carries EMA weights."""
    import os

    decay = 0.5  # aggressive decay makes the recursion visible in 3 steps
    tc = _tiny_controller(tmp_path, make_mesh(jax.devices()[:1]),
                          ema_decay=decay)
    batch = _random_batch()

    expect = jax.device_get(tc.state.params)
    for _ in range(3):
        before = jax.device_get(tc.state.params)
        tc.train_step(batch)
        after = jax.device_get(tc.state.params)
        expect = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1 - decay) * p, expect, after)

    got = jax.device_get(tc.state.ema)
    for g, e in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(expect)):
        np.testing.assert_allclose(g, e, rtol=2e-6, atol=1e-7)

    # EMA differs from the live params (it lags), and the export uses it.
    live = jax.device_get(tc.state.params)
    assert any(
        not np.allclose(l, g)
        for l, g in zip(jax.tree_util.tree_leaves(live), jax.tree_util.tree_leaves(got))
    )
    tc.model_dir = str(tmp_path / "run")
    tc.model_path = str(tmp_path / "run" / "tiny")
    os.makedirs(tc.model_dir, exist_ok=True)
    tc.save_best_model()
    from flownet4d_tpu.training.checkpoint import load_weights_h5

    exported = load_weights_h5(f"{tc.model_path}-best.h5", live)
    for g, e in zip(jax.tree_util.tree_leaves(exported), jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(g), e, rtol=1e-6)


def test_restore_across_optimizer_layouts(tmp_path):
    """A checkpoint written by a schedule-driven Adam must restore into a
    constant-lr controller (params-only fallback, training/trainer.py
    restore_model) — the cross-layout case the round-3 eval hit."""
    import optax

    sched = optax.cosine_decay_schedule(1e-3, decay_steps=100, alpha=0.01)
    tc = _tiny_controller(tmp_path, make_mesh(jax.devices()[:1]),
                          lr_schedule=sched)
    tc.train_step(_random_batch())
    import os

    tc.model_dir = str(tmp_path / "run")
    tc.model_path = str(tmp_path / "run" / "tiny")
    os.makedirs(tc.model_dir, exist_ok=True)
    tc.save_best_model()

    tc2 = _tiny_controller(tmp_path / "b", make_mesh(jax.devices()[:1]), seed=99)
    tc2.restore_model(tc.model_dir, "tiny-best.ckpt")
    p1 = jax.device_get(tc.state.params)
    p2 = jax.device_get(tc2.state.params)
    for l1, l2 in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(l1, l2)
    # and the restored controller can step
    tc2.train_step(_random_batch(seed=1))


def test_resume_layout_drift_restores_step_from_meta(tmp_path):
    """resume_from's params-only fallback (checkpoint written with a
    different optimizer/EMA layout) must restore the step counter from the
    meta sidecar, not the fresh template's 0 — a cosine schedule would
    otherwise restart at lr-max mid-run (ADVICE r3)."""
    import os

    tc = _tiny_controller(tmp_path, make_mesh(jax.devices()[:1]))
    for s in range(3):
        tc.train_step(_random_batch(seed=s))
    tc.model_dir = str(tmp_path / "run")
    tc.model_path = str(tmp_path / "run" / "tiny")
    os.makedirs(tc.model_dir, exist_ok=True)
    tc.save_latest_model(1, force=True)

    import optax

    sched = optax.cosine_decay_schedule(1e-3, decay_steps=100, alpha=0.01)
    tc2 = _tiny_controller(tmp_path, make_mesh(jax.devices()[:1]), seed=99,
                           lr_schedule=sched, ema_decay=0.99)
    assert tc2.resume_from(tc.model_dir)
    assert int(np.asarray(jax.device_get(tc2.state.step))) == 3
    # and the resumed lr reflects the restored step, not step 0
    assert tc2.current_lr() == pytest.approx(float(sched(3)))
    tc2.train_step(_random_batch(seed=9))
    assert int(np.asarray(jax.device_get(tc2.state.step))) == 4


def test_end_to_end_epoch_on_reference_data(tmp_path):
    """One real epoch: loader -> train -> val -> quicksave artifacts."""
    rows = load_indexes(f"{REFERENCE_DATA_DIR}/train.csv")
    loader = PatchLoader(REFERENCE_DATA_DIR, 8, 2, 8)
    trainset = loader.initialize_dataset(rows[:16], shuffle=True, seed=0)
    valset = loader.initialize_dataset(rows[16:24], shuffle=False)

    tc = TrainerController(
        8, 2, 1e-3, True, "e2e", low_resblock=1, hi_resblock=1,
        models_dir=str(tmp_path), mesh=make_mesh(), channels=16,
    )
    tc.init_model_dir()
    tc.train_network(trainset, valset, n_epoch=1, testset=valset)

    import os

    assert os.path.isfile(os.path.join(tc.model_dir, "loss.csv"))
    assert os.path.isfile(os.path.join(tc.model_dir, "quicksave_e2e.h5"))
    assert os.path.isdir(f"{tc.model_path}-best.ckpt")
    assert tc.loss_metrics["val_loss"].result() > 0


def test_predictor_shards_patch_grid_over_mesh(tmp_path):
    """Inference DP: the patch batch shards across all 8 devices and the
    stitched output matches the single-device result."""
    import jax.numpy as jnp
    from flownet4d_tpu.inference import VolumePredictor
    from flownet4d_tpu.data.volume import VolumeDataset
    from conftest import REFERENCE_DATA_DIR

    ds = VolumeDataset()
    ds.load_vectorfield(f"{REFERENCE_DATA_DIR}/example_data.h5", 0)

    one = VolumePredictor(12, 2, 8, 1, 1, mesh=make_mesh(jax.devices()[:1]),
                          seed=3, channels=16)
    eight = VolumePredictor(12, 2, 8, 1, 1, mesh=make_mesh(), seed=3, channels=16)

    u1, v1, w1 = one.predict_volume(ds, round_small_values=False)
    u8, v8, w8 = eight.predict_volume(ds, round_small_values=False)
    np.testing.assert_allclose(u8, u1, atol=1e-5)
    np.testing.assert_allclose(v8, v1, atol=1e-5)
    np.testing.assert_allclose(w8, w1, atol=1e-5)


class _ListDataset:
    """len()-able in-memory dataset that can deliver SIGTERM to the
    process after a given *global* batch count (kill-and-resume test)."""

    def __init__(self, batches, kill_after_global=None, counter=None):
        self.batches = batches
        self.kill_after = kill_after_global
        self.counter = counter if counter is not None else [0]

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        import os
        import signal as _signal

        for b in self.batches:
            yield b
            self.counter[0] += 1
            if self.kill_after is not None and self.counter[0] == self.kill_after:
                os.kill(os.getpid(), _signal.SIGTERM)


def test_sigterm_checkpoint_and_elastic_resume(tmp_path):
    """SIGTERM mid-epoch-2 -> -latest.ckpt + meta written; a fresh
    controller resumes from epoch 1 with the exact same state and
    finishes the run (VERDICT round-1 item 10)."""
    import json
    import os

    mesh = make_mesh(jax.devices()[:1])
    batches = [_random_batch(seed=s) for s in range(3)]
    val = _ListDataset([_random_batch(seed=9)])

    tc = _tiny_controller(tmp_path, mesh)
    tc.init_model_dir()
    run_dir = tc.model_dir
    # Kill during epoch 2 (after global batch 5 = epoch-2 batch 2).
    tc.train_network(_ListDataset(batches, kill_after_global=5), val, n_epoch=3)

    assert os.path.isdir(f"{tc.model_path}-latest.ckpt")
    meta_path = f"{tc.model_path}-latest.meta.json"
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["epoch"] == 1  # one *completed* epoch
    assert meta["step"] == 5
    interrupted_step = int(np.asarray(jax.device_get(tc.state.step)))
    assert interrupted_step == 5

    # Fresh process stand-in: new controller, resume from the run dir.
    tc2 = _tiny_controller(tmp_path, mesh, seed=123)
    assert tc2.resume_from(run_dir)
    assert tc2.start_epoch == 1
    assert int(np.asarray(jax.device_get(tc2.state.step))) == 5
    p1 = jax.tree_util.tree_leaves(jax.device_get(tc.state.params))
    p2 = jax.tree_util.tree_leaves(jax.device_get(tc2.state.params))
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    tc2.train_network(_ListDataset(batches), val, n_epoch=3)
    # Epochs 2 and 3 re-run/complete: 5 + 2*3 = 11 steps total.
    assert int(np.asarray(jax.device_get(tc2.state.step))) == 11
    # loss.csv accumulated across both runs (header written once).
    with open(os.path.join(run_dir, "loss.csv")) as f:
        content = f.read()
    assert content.count("Network: tiny") == 1
    assert "Resumed from" in content


def test_predict_file_matches_predict_volume(tmp_path):
    """The pipelined multi-frame predict_file writes exactly what per-frame
    predict_volume computes (plus halved dx), for every time frame."""
    import h5py
    from flownet4d_tpu.inference import VolumePredictor
    from flownet4d_tpu.data.volume import VolumeDataset

    src = f"{REFERENCE_DATA_DIR}/example_data.h5"
    out = str(tmp_path / "sr.h5")
    pred = VolumePredictor(12, 2, 8, 1, 1, mesh=make_mesh(jax.devices()[:1]),
                          seed=5, channels=16)
    pred.predict_file(src, out, verbose=False)

    ds = VolumeDataset()
    n = ds.get_dataset_len(src)
    assert n >= 1
    with h5py.File(out) as f:
        assert f["u"].shape[0] == n
        for nrow in range(n):
            ds.load_vectorfield(src, nrow)
            u, v, w = pred.predict_volume(ds)
            np.testing.assert_allclose(np.asarray(f["u"][nrow]), u, atol=1e-6)
            np.testing.assert_allclose(np.asarray(f["v"][nrow]), v, atol=1e-6)
            np.testing.assert_allclose(np.asarray(f["w"][nrow]), w, atol=1e-6)
        np.testing.assert_allclose(np.asarray(f["dx"][0]), ds.dx / 2)


def test_selective_remat_is_numerically_inert(tmp_path):
    """remat_scope='hi' (checkpoint only the HBM-heavy hi-res stack) must
    produce the same update as no remat — remat changes memory, not math."""
    batch = _random_batch(seed=3)
    params = {}
    for scope_kw in [dict(remat=False), dict(remat=True, remat_scope="hi"),
                     dict(remat=True, remat_scope="low")]:
        # 2/2 resblocks: exercises the scanned-stack remat path.
        tc = TrainerController(
            8, 2, 1e-3, False, "tiny", low_resblock=2, hi_resblock=2,
            models_dir=str(tmp_path), channels=16,
            seed=0, packed_transfer=False, **scope_kw)
        tc.train_step(batch)
        params[str(scope_kw)] = jax.device_get(tc.state.params)
    keys = list(params)
    base = params[keys[0]]
    for k in keys[1:]:
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            base, params[k])


def test_rel_loss_term_adds_exactly_the_rel_term_and_is_optimizable(tmp_path):
    """rel_loss_weight=W must add exactly W * relative_error_loss to the
    objective (decomposition check: loss_with_rel - loss_without == the
    directly-computed rel term on the same predictions), and the combined
    objective must remain finite and descending under training."""
    from flownet4d_tpu.ops.losses import relative_error_loss

    mesh1 = make_mesh(jax.devices()[:1])
    batch = _random_batch(seed=5)  # rot_case=0: eval rotation is identity

    tc_ref = _tiny_controller(tmp_path / "ref", mesh1, seed=11)
    tc_rel = _tiny_controller(tmp_path / "rel", mesh1, seed=11,
                              rel_loss_weight=1.0)

    # Same seed -> identical params; eval both on the same batch.
    tc_ref.loss_metrics.reset()
    pred = np.asarray(jax.device_get(tc_ref.test_step(batch)))
    ref_loss = tc_ref.loss_metrics["val_loss"].result()
    tc_rel.loss_metrics.reset()
    tc_rel.test_step(batch)
    rel_loss = tc_rel.loss_metrics["val_loss"].result()

    expected_term = float(np.mean(np.asarray(relative_error_loss(
        jnp.asarray(pred), jnp.asarray(batch.hr), jnp.asarray(batch.mask),
        eps=tc_rel.rel_loss_eps))))
    assert expected_term > 0
    assert rel_loss - ref_loss == pytest.approx(expected_term, rel=1e-4)

    # The combined objective must be optimizable (finite, descending).
    # (The rel-err *metric* itself is not asserted to fall here: on random
    # uniform targets it sits near 100% and is dominated by noise at this
    # step count — see docs/training.md for the real-cohort evidence.)
    losses = []
    for _ in range(11):
        tc_rel.loss_metrics.reset()
        tc_rel.train_step(batch)
        losses.append(tc_rel.loss_metrics["train_loss"].result())
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_restart_on_spike_reloads_best_and_halves_lr(tmp_path):
    """spike_factor: an epoch whose mean train loss blows past
    factor x best must (a) reload the best checkpoint's params and (b)
    halve the effective lr via the in-state multiplier — the round-4
    release run was lost to exactly one unhandled ejection
    (docs/training.md)."""
    mesh1 = make_mesh(jax.devices()[:1])
    tc = _tiny_controller(tmp_path, mesh1, spike_factor=5.0)
    tc.init_model_dir()

    batches = [_random_batch(b=4, seed=i) for i in range(3)]
    val = _ListDataset([_random_batch(b=4, seed=9)])
    tc.train_network(_ListDataset(batches), val, n_epoch=2)
    assert tc._restarts == 0
    assert tc.current_lr() == pytest.approx(1e-3)
    best = jax.device_get(tc.state.params)

    # Inject the spike: absurd targets make the epoch-mean loss explode.
    spiked = [b._replace(hr=(1e4 * b.hr).astype(np.float32)) for b in batches]
    tc.train_network(_ListDataset(spiked), val, n_epoch=1)

    assert tc._restarts == 1
    assert tc.current_lr() == pytest.approx(5e-4)  # halved, no retrace
    restored = jax.device_get(tc.state.params)
    for lb, lr_ in zip(jax.tree_util.tree_leaves(best),
                       jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(lb, lr_)
    # The spiked epoch must not have been saved as a new best.
    with open(os.path.join(tc.model_dir, "loss.csv")) as f:
        assert "spike(" in f.read()

    # Restarts are capped: past max_restarts spikes are logged, not acted on.
    tc.max_restarts = 1
    tc.train_network(_ListDataset(spiked), val, n_epoch=1)
    assert tc.current_lr() == pytest.approx(5e-4)  # unchanged


def test_metric_fetch_cadence_is_epoch_exact(tmp_path):
    """metric_fetch_every>1 accumulates metric sums on device; epoch
    totals must match the per-batch cadence (up to f32 summation order)."""
    batches = [_random_batch(b=4, seed=i) for i in range(5)]
    results = {}
    for k in (1, 4):
        tc = _tiny_controller(tmp_path / f"k{k}", make_mesh(jax.devices()[:1]),
                              seed=0, metric_fetch_every=k)
        tc.run_train_epoch(batches)
        results[k] = tc.loss_metrics.results()
    for name in results[1]:
        assert results[1][name] == pytest.approx(results[4][name], rel=1e-5, abs=1e-9), name


def test_residual_skip_init_is_trilinear_and_h5_roundtrip(tmp_path):
    """residual_skip: the untrained network must equal the align-corners
    trilinear upsample of its velocity input exactly (zero-init final
    heads + input skip), the flag must ride the exported .h5's attrs, and
    a VolumePredictor constructed WITHOUT the flag must pick it up from
    the file and reproduce the trainer's forward."""
    from flownet4d_tpu.models import SR4DFlowNet, SR4DFlowNetConfig
    from flownet4d_tpu.ops.upsample import upsample3d
    from flownet4d_tpu.training import checkpoint as ckpt
    from flownet4d_tpu.inference import VolumePredictor

    cfg = SR4DFlowNetConfig(res_increase=2, low_resblock=1, hi_resblock=1,
                            channels=16, residual_skip=True)
    model = SR4DFlowNet(cfg)
    rng = np.random.default_rng(0)
    vel = jnp.asarray(rng.uniform(-1, 1, (2, 6, 6, 6, 3)).astype(np.float32))
    mag = jnp.asarray(rng.uniform(0, 1, (2, 6, 6, 6, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(3), vel, mag)["params"]
    out = model.apply({"params": params}, vel, mag)
    base = upsample3d(vel, 2, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-7)

    # Train one step so the correction is nonzero, export, reload blind.
    mesh1 = make_mesh(jax.devices()[:1])
    tc = _tiny_controller(tmp_path, mesh1, residual_skip=True)
    tc.model_dir = str(tmp_path / "run")
    tc.model_path = str(tmp_path / "run" / "tiny")
    os.makedirs(tc.model_dir, exist_ok=True)
    batch = _random_batch(b=4, seed=2)
    tc.train_step(batch)
    tc.save_best_model()

    attrs = ckpt.read_h5_model_attrs(f"{tc.model_path}-best.h5")
    assert attrs["residual_skip"] == 1
    assert attrs["low_resblock"] == 1 and attrs["hi_resblock"] == 1

    pred = VolumePredictor(8, 2, 4, 8, 4, mesh=mesh1, channels=16)
    assert not pred.config.residual_skip
    pred.load_weights(f"{tc.model_path}-best.h5")
    assert pred.config.residual_skip  # rebuilt from the file's attrs
    assert pred.config.low_resblock == 1
    want = np.asarray(tc.model.apply(
        {"params": jax.device_get(tc.state.params)},
        jnp.asarray(batch.lr[:1]), jnp.asarray(batch.mag[:1])))
    got = np.asarray(pred.model.apply(
        {"params": jax.device_get(pred.params)},
        jnp.asarray(batch.lr[:1]), jnp.asarray(batch.mag[:1])))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_warmup_schedule_composes_with_constant_and_cosine():
    """build_lr_schedule: warmup must ramp 0 -> peak for BOTH schedule
    kinds (ADVICE r4: it used to be silently ignored for constant)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from trainer import build_lr_schedule

    peak = 1e-3
    const = build_lr_schedule("constant", peak, 1e-6, 10, 100)
    assert const is not None
    assert float(const(0)) == pytest.approx(0.0)
    assert float(const(5)) == pytest.approx(peak / 2)
    assert float(const(10)) == pytest.approx(peak)
    assert float(const(99)) == pytest.approx(peak)  # constant after ramp

    cos = build_lr_schedule("cosine", peak, 1e-6, 10, 100)
    assert float(cos(0)) == pytest.approx(0.0)
    assert float(cos(10)) == pytest.approx(peak)
    assert float(cos(100)) == pytest.approx(1e-6, rel=1e-2)

    assert build_lr_schedule("constant", peak, 1e-6, 0, 100) is None
