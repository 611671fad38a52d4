from .fft_downsampling import (
    downsample_phase_img,
    downsample_complex_img,
    rectangular_crop3d,
    add_complex_signal_noise,
    rescale_magnitude_on_ratio,
)
from .patch_data import PatchData, generate_random_patches

__all__ = [
    "downsample_phase_img",
    "downsample_complex_img",
    "rectangular_crop3d",
    "add_complex_signal_noise",
    "rescale_magnitude_on_ratio",
    "PatchData",
    "generate_random_patches",
]
