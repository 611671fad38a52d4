"""Pytest root conftest.

Tests run on CPU with 8 virtual devices so sharding/mesh logic is
exercised without TPU hardware (and without stealing the chip from a
concurrently running benchmark). Must run before jax initialises.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Keep TF (used only as a golden reference in parity tests) off any accelerator.
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
# The reference is TF2/Keras-2 era; the installed Keras 3 cannot build it.
# tf_keras (legacy Keras 2) is available and this switch routes tf.keras to it.
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

REFERENCE_DATA_DIR = "/root/reference/data"
