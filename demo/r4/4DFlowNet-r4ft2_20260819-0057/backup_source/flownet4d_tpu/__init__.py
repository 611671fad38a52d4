"""flownet4d_tpu — a TPU-native 4D Flow MRI super-resolution framework.

A from-scratch JAX/Flax/Optax/Pallas rebuild of the capabilities of
EdwardFerdian/4DFlowNet (TF2/Keras). The compute path is designed for
TPU hardware: channels-last NDHWC convolutions that map onto the MXU,
a matmul-based trilinear upsampler, on-device physics-aware rotation
augmentation, and data-parallel training over a ``jax.sharding.Mesh``.

Package layout
--------------
- ``ops``        low-level jittable ops (conv, upsample, losses, rotation)
- ``models``     the SR4DFlowNet Flax model family
- ``data``       training input pipeline (patch index CSV -> device batches)
- ``training``   trainer controller, metrics, checkpointing
- ``inference``  volume patchify / stitch + predictor
- ``parallel``   mesh construction and sharding policies
- ``prepare_data`` offline dataset preparation (k-space downsampling, patches, DICOM)
- ``io``         canonical HDF5 readers/writers
- ``utils``      config and logging helpers

The name honours the reference's "4DFlowNet" (a leading digit is not a
valid Python identifier, hence ``flownet4d_tpu``).
"""

__version__ = "0.1.0"
