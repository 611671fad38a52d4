"""Pytest root conftest.

Tests run on CPU with 8 virtual devices so sharding/mesh logic is
exercised without TPU hardware (and without stealing the chip from a
concurrently running benchmark). Must run before jax initialises.
"""

import os

# Force CPU even when the environment preconfigures a TPU backend.
# The site customization (sitecustomize.py) registers the TPU plugin before
# conftest runs and re-pins JAX_PLATFORMS, so env vars are too late here —
# jax.config flags take precedence instead.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Keep TF (used only as a golden reference in parity tests) off any accelerator.
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
# The reference is TF2/Keras-2 era; the installed Keras 3 cannot build it.
# tf_keras (legacy Keras 2) is available and this switch routes tf.keras to it.
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

REFERENCE_DATA_DIR = "/root/reference/data"
