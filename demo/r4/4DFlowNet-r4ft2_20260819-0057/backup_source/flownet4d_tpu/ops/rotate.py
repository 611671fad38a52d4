"""On-device physics-aware rotation augmentation.

The reference rotates velocity patches on the host with numpy during data
loading (/root/reference/src/Network/PatchHandler3D.py:70-75, 166-274):
90/180/270-degree rotations in one of 3 planes, where *phase* (velocity)
images get component swaps and sign flips (a vector field transforms under
rotation), magnitude images get the swaps without sign flips, and the mask
rotates purely geometrically.

TPU-native design: the host loader ships raw patches plus a small integer
rotation code per sample; the rotation itself runs **inside the jitted
train step** as a vmapped ``lax.switch`` over the 10 static variants
(identity + 3 planes x 3 angles). Each variant is a channel permutation,
sign flip and transpose/flip — pure VPU work that XLA fuses with the rest
of the step, so augmentation costs no host time and no extra transfers.

Rotation code convention (matching the CSV schema columns ``rotate``,
``rotation_plane``, ``rotation_degree_idx``):

    case = 0                      if rotate == 0
    case = (plane - 1) * 3 + k    for plane in {1,2,3}, k in {1,2,3}

Patches must be spatially cubic (they are in the reference pipeline), so
every branch is shape-preserving as jit requires.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Per-case velocity-component permutation and sign, such that
# new[i] = sign[i] * old[perm[i]].  Derived from rotate90/rotate180_3d
# (PatchHandler3D.py:166-274).  Case order: 0=identity, then
# (plane-1)*3 + k for plane 1..3, k 1..3.
_PERMS = (
    (0, 1, 2),  # 0: identity
    (0, 2, 1),  # 1: plane1 k1: (u, w, -v)
    (0, 1, 2),  # 2: plane1 k2: (u, -v, -w)
    (0, 2, 1),  # 3: plane1 k3: (u, -w, v)
    (2, 1, 0),  # 4: plane2 k1: (-w, v, u)
    (0, 1, 2),  # 5: plane2 k2: (-u, v, -w)
    (2, 1, 0),  # 6: plane2 k3: (w, v, -u)
    (1, 0, 2),  # 7: plane3 k1: (-v, u, w)
    (0, 1, 2),  # 8: plane3 k2: (-u, -v, w)
    (1, 0, 2),  # 9: plane3 k3: (v, -u, w)
)
_SIGNS = (
    (1, 1, 1),
    (1, 1, -1),
    (1, -1, -1),
    (1, -1, 1),
    (-1, 1, 1),
    (-1, 1, -1),
    (1, 1, -1),
    (-1, 1, 1),
    (-1, -1, 1),
    (1, -1, 1),
)
# Geometric rotation (plane axes on a (D, H, W, ...) array) and angle count.
_AXES = (None, (0, 1), (0, 1), (0, 1), (0, 2), (0, 2), (0, 2), (1, 2), (1, 2), (1, 2))
_KS = (0, 1, 2, 3, 1, 2, 3, 1, 2, 3)


def _make_branch(case: int, is_phase: bool):
    perm = _PERMS[case]
    signs = _SIGNS[case]

    def branch(field: jax.Array) -> jax.Array:
        # field: (D, H, W, 3) with components stacked channels-last.
        if case != 0:
            comps = [field[..., p] for p in perm]
            if is_phase:
                comps = [c if s == 1 else -c for c, s in zip(comps, signs)]
            out = jnp.stack(comps, axis=-1)
            out = jnp.rot90(out, k=_KS[case], axes=_AXES[case])
            return out
        return field

    return branch


def rotate_vector_field(field: jax.Array, case: jax.Array, is_phase: bool = True) -> jax.Array:
    """Rotate a (D, H, W, 3) vector (or magnitude triple) field on device.

    ``case`` is an int32 scalar in [0, 9]. ``is_phase=True`` applies the
    sign-flip table (velocity); ``is_phase=False`` only swaps components
    (magnitude images, PatchHandler3D.py:74).
    """
    branches = [_make_branch(c, is_phase) for c in range(10)]
    return lax.switch(case, branches, field)


def rotate_scalar_field(vol: jax.Array, case: jax.Array) -> jax.Array:
    """Geometric-only rotation of a (D, H, W) scalar field (the mask).

    Matches rotate_object (PatchHandler3D.py:83-95): no component algebra.
    """

    def make(case_idx):
        def branch(x):
            if case_idx == 0:
                return x
            return jnp.rot90(x, k=_KS[case_idx], axes=_AXES[case_idx])

        return branch

    return lax.switch(case, [make(c) for c in range(10)], vol)


def batched_rotate_sample(lr, hr, mag, mask, case):
    """Apply per-sample rotation to a full training batch on device.

    lr, hr: (B, d, d, d, 3) / (B, D, D, D, 3) velocity patches (phase),
    mag: (B, d, d, d, 3) magnitudes, mask: (B, D, D, D). case: (B,) int32.
    """
    rot_phase = jax.vmap(lambda f, c: rotate_vector_field(f, c, True))
    rot_mag = jax.vmap(lambda f, c: rotate_vector_field(f, c, False))
    rot_mask = jax.vmap(rotate_scalar_field)
    return (
        rot_phase(lr, case),
        rot_phase(hr, case),
        rot_mag(mag, case),
        rot_mask(mask, case),
    )


def rotation_case(rotate: int, plane: int, k: int) -> int:
    """Host helper: CSV (rotate, plane, degree_idx) -> case index in [0, 9]."""
    if not rotate or plane < 1 or plane > 3 or k < 1 or k > 3:
        return 0
    return (plane - 1) * 3 + k
