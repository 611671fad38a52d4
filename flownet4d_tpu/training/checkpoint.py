"""Checkpointing: Orbax for full train state, HDF5 for portable weights.

Reference behaviour being reproduced
(/root/reference/src/Network/TrainerController.py:347-394): best model ->
full weight file + pickled Adam slots; restore materialises optimizer
slots then loads weights. Here the whole train state (params + Optax
state + step) is one Orbax checkpoint, so restore is a single atomic
read — no zero-gradient warmup step is needed.

HDF5 weight export keeps interop with the reference's ``.h5`` weight
format: ``import_keras_weights`` maps a Keras ``model.save()`` file onto
our param tree by Conv3D creation order (kernel layouts are both DHWIO,
so no transposition is required).
"""

from __future__ import annotations

import os

import h5py
import numpy as np
import jax
import jax.numpy as jnp


def _flatten(params, prefix=""):
    out = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten_into(template, flat):
    def build(node, prefix=""):
        if isinstance(node, dict):
            return {k: build(v, f"{prefix}/{k}" if prefix else k) for k, v in node.items()}
        arr = np.asarray(flat[prefix])
        assert arr.shape == node.shape, f"{prefix}: {arr.shape} != {node.shape}"
        return jnp.asarray(arr, dtype=node.dtype)

    return build(template)


def save_weights_h5(path: str, params, attrs: dict | None = None) -> None:
    """Write the param tree to HDF5 under slash-separated flax paths.

    ``attrs`` (model architecture metadata, e.g. resblock counts and the
    residual_skip flag) land in the file's root attributes so loaders can
    reconstruct the right network without CLI flags."""
    flat = _flatten(jax.device_get(params))
    with h5py.File(path, "w") as hf:
        for k, v in flat.items():
            hf.create_dataset(k, data=np.asarray(v))
        for k, v in (attrs or {}).items():
            hf.attrs[k] = v


def read_h5_model_attrs(path: str) -> dict:
    """Architecture metadata stored by save_weights_h5 (empty for files
    written before round 5 and for reference Keras .h5 files)."""
    if not (os.path.isfile(path) and path.endswith(".h5")):
        return {}
    try:
        with h5py.File(path, "r") as hf:
            return {k: (v.item() if hasattr(v, "item") else v)
                    for k, v in hf.attrs.items()}
    except OSError:
        return {}


def load_weights_h5(path: str, params_template):
    with h5py.File(path, "r") as hf:
        flat = {}

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                flat[name] = np.asarray(obj)

        hf.visititems(visit)
    return _unflatten_into(params_template, flat)


# --------------------------------------------------------------------- #
# Keras interop

# Conv3D creation order in the reference build_network
# (/root/reference/src/Network/SR4DFlowNet.py:17-46) mapped to our module
# names. ResBlock convs are created in (conv1, conv2) pairs.
def conv_name_order(low_resblock: int, hi_resblock: int) -> list[tuple[str, bool]]:
    """[(flax_module_name, has_bias)] in Keras creation order."""
    order = [
        ("pc1", True),
        ("pc2", True),
        ("phase1", True),
        ("phase2", True),
        ("fuse1", True),
        ("fuse2", True),
    ]
    for i in range(low_resblock):
        order += [(f"low_res_block_{i}/conv1", False), (f"low_res_block_{i}/conv2", False)]
    for i in range(hi_resblock):
        order += [(f"hi_res_block_{i}/conv1", False), (f"hi_res_block_{i}/conv2", False)]
    for comp in ("u", "v", "w"):
        order += [(f"{comp}_head1", True), (f"{comp}_head2", True)]
    return order


def import_keras_weights(path: str, params_template, low_resblock: int, hi_resblock: int):
    """Load a Keras ``.h5`` (full save or weights-only) into our param tree.

    Keras names Conv3D layers 'conv3d', 'conv3d_1', ... in creation order;
    kernels live at model_weights/<name>/<name>/kernel:0.
    """
    order = conv_name_order(low_resblock, hi_resblock)
    flat = {}
    with h5py.File(path, "r") as hf:
        root = hf["model_weights"] if "model_weights" in hf else hf
        # Keras names Conv3D layers conv3d[_N] with a *process-global*
        # counter, so the first layer is not necessarily 'conv3d' — sort
        # whatever conv3d names the file actually contains.
        keras_names = sorted(
            (k for k in root if k == "conv3d" or k.startswith("conv3d_")),
            key=lambda n: 0 if n == "conv3d" else int(n.rsplit("_", 1)[1]),
        )
        assert len(keras_names) == len(order), (
            f"{len(keras_names)} Conv3D layers in {path}, expected {len(order)} "
            f"for {low_resblock} low / {hi_resblock} hi resblocks"
        )
        for keras_name, (our_name, has_bias) in zip(keras_names, order):
            grp = root[keras_name]
            # weight datasets may be nested one level (keras h5 layout)
            while not any(k.startswith("kernel") for k in grp.keys()):
                grp = grp[list(grp.keys())[0]]
            flat[f"{our_name}/kernel"] = np.asarray(grp["kernel:0"])
            if has_bias:
                flat[f"{our_name}/bias"] = np.asarray(grp["bias:0"])
    return _unflatten_into(params_template, flat)


# --------------------------------------------------------------------- #
# Orbax full-state checkpointing


def save_train_state(ckpt_dir: str, state) -> None:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(ckpt_dir, jax.device_get(state), force=True)


def restore_train_state(ckpt_dir: str, state_template):
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(ckpt_dir, item=jax.device_get(state_template))
    return jax.tree_util.tree_map(jnp.asarray, restored)


def restore_params(ckpt_dir: str, params_template):
    """Params-only restore from a full-train-state checkpoint.

    Optimizer-layout agnostic: a checkpoint written by a schedule-driven
    Adam restores fine into a constant-lr controller (and vice versa) —
    only the ``params`` subtree is read and validated against the
    template's structure/dtypes.
    """
    import orbax.checkpoint as ocp

    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt_dir))
    raw_params = raw["params"] if isinstance(raw, dict) and "params" in raw else raw[0]
    return jax.tree_util.tree_map(
        lambda t, a: jnp.asarray(a, jnp.asarray(t).dtype), params_template, raw_params
    )
