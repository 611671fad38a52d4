from .conv import conv3d_symmetric_pad, leaky_relu
from .upsample import upsample3d, linear_interp_matrix
from .losses import (
    voxelwise_mse,
    masked_fluid_mse,
    relative_speed_error,
    divergence,
    divergence_loss2,
)
from .rotate import (
    rotate_vector_field,
    rotate_scalar_field,
    batched_rotate_sample,
)

__all__ = [
    "conv3d_symmetric_pad",
    "leaky_relu",
    "upsample3d",
    "linear_interp_matrix",
    "voxelwise_mse",
    "masked_fluid_mse",
    "relative_speed_error",
    "divergence",
    "divergence_loss2",
    "rotate_vector_field",
    "rotate_scalar_field",
    "batched_rotate_sample",
]
