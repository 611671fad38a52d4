"""io/h5 writer semantics + metric accumulators + packed wire format."""

import numpy as np
import h5py

from flownet4d_tpu.io.h5 import append_to_h5, read_dataset, dataset_len, save_predictions
from flownet4d_tpu.training.metrics import MeanMetric, MetricSet
from flownet4d_tpu.data.packed import pack_batch, unpack_batch
from flownet4d_tpu.data.patch_loader import TrainingBatch


def test_append_creates_then_appends(tmp_path):
    path = str(tmp_path / "t.h5")
    a = np.random.default_rng(0).standard_normal((2, 4, 4)).astype(np.float64)
    append_to_h5(path, "x", a)  # float64 -> float32 downcast
    append_to_h5(path, "x", a)
    with h5py.File(path) as h:
        assert h["x"].shape == (4, 4, 4)
        assert h["x"].dtype == np.float32
        assert h["x"].maxshape == (None, 4, 4)
    assert dataset_len(path, "x") == 4
    np.testing.assert_allclose(read_dataset(path, "x", 0), a[0].astype(np.float32))


def test_append_expand_dims_matches_prepare_writer(tmp_path):
    path = str(tmp_path / "t.h5")
    append_to_h5(path, "venc", 1.5, expand_dims=True)  # scalar -> (1,)
    append_to_h5(path, "venc", 2.0, expand_dims=True)
    np.testing.assert_allclose(read_dataset(path, "venc"), [1.5, 2.0])


def test_save_predictions_creates_dir(tmp_path):
    out = str(tmp_path / "nested" / "dir")
    save_predictions(out, "p.h5", "u", np.ones((1, 2, 2)))
    assert dataset_len(f"{out}/p.h5", "u") == 1


def test_mean_metric_weighted():
    m = MeanMetric("x")
    m.update(10.0, 4.0)  # sum 10 over 4 samples
    m.update(2.0, 1.0)
    assert m.result() == (10.0 + 2.0) / 5.0
    m.reset()
    assert m.result() == 0.0


def test_metric_set_order_matches_reference_csv():
    ms = MetricSet()
    assert list(ms.keys()) == [
        "train_loss", "val_loss", "train_accuracy", "val_accuracy",
        "train_mse", "val_mse", "train_div", "val_div", "l2_reg_loss",
    ]


def test_packed_roundtrip_exact_for_representable_values():
    rng = np.random.default_rng(1)
    b, p, r = 3, 4, 2
    P = p * r
    # f16-representable values survive the wire exactly
    lr = (rng.integers(-8, 8, (b, p, p, p, 3)) / 8.0).astype(np.float32)
    batch = TrainingBatch(
        lr=lr,
        mag=(rng.integers(0, 8, (b, p, p, p, 3)) / 8.0).astype(np.float32),
        hr=(rng.integers(-8, 8, (b, P, P, P, 3)) / 8.0).astype(np.float32),
        venc=np.full((b,), 1.5, np.float32),
        mask=(rng.uniform(size=(b, P, P, P)) > 0.5).astype(np.float32),
        rot_case=np.array([0, 5, 9], np.int32),
        weight=np.array([1, 1, 0], np.float32),
    )
    pb = pack_batch(batch)
    assert pb.fp.dtype == np.float16 and pb.u8.dtype == np.uint8
    out = unpack_batch(pb, p, r)
    for name in TrainingBatch._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), getattr(batch, name), atol=0,
            err_msg=name,
        )


def test_packed_mask_bitpack_odd_size():
    """Bit-packed mask round-trips when P^3 is not a byte multiple
    (np.packbits zero-pads the last byte; unpack slices it off)."""
    rng = np.random.default_rng(3)
    b, p, r = 2, 3, 1  # P = 3 -> P^3 = 27 bits = 4 bytes with 5 pad bits
    batch = TrainingBatch(
        lr=rng.uniform(-1, 1, (b, p, p, p, 3)).astype(np.float32),
        mag=rng.uniform(0, 1, (b, p, p, p, 3)).astype(np.float32),
        hr=rng.uniform(-1, 1, (b, p, p, p, 3)).astype(np.float32),
        venc=np.full((b,), 1.0, np.float32),
        mask=(rng.uniform(size=(b, p, p, p)) > 0.5).astype(np.float32),
        rot_case=np.array([7, 2], np.int32),
        weight=np.array([1, 0], np.float32),
    )
    pb = pack_batch(batch)
    assert pb.u8.shape == (b, 4 + 2)  # ceil(27/8) + rot + weight
    out = unpack_batch(pb, p, r)
    np.testing.assert_array_equal(np.asarray(out.mask), batch.mask)
    np.testing.assert_array_equal(np.asarray(out.rot_case), batch.rot_case)
    np.testing.assert_array_equal(np.asarray(out.weight), batch.weight)


def test_packed_quantization_bounded():
    rng = np.random.default_rng(2)
    b, p, r = 2, 6, 2
    batch = TrainingBatch(
        lr=rng.uniform(-1, 1, (b, p, p, p, 3)).astype(np.float32),
        mag=rng.uniform(0, 1, (b, p, p, p, 3)).astype(np.float32),
        hr=rng.uniform(-1, 1, (b, p * r, p * r, p * r, 3)).astype(np.float32),
        venc=np.full((b,), 2.0, np.float32),
        mask=np.ones((b, p * r, p * r, p * r), np.float32),
        rot_case=np.zeros((b,), np.int32),
        weight=np.ones((b,), np.float32),
    )
    out = unpack_batch(pack_batch(batch), p, r)
    # f16 quantisation of values in [-1, 1] stays below 5e-4 absolute
    assert np.abs(np.asarray(out.lr) - batch.lr).max() < 5e-4
    assert np.abs(np.asarray(out.hr) - batch.hr).max() < 5e-4
