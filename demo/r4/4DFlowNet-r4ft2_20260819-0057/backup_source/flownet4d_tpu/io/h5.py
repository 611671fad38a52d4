"""Canonical HDF5 helpers.

One writer replaces the reference's three near-duplicate implementations
(/root/reference/src/prepare_data/h5functions.py:4-19,
 /root/reference/src/Network/h5util.py:5-23,
 /root/reference/src/utils/prediction_utils.py:5-28).

Semantics: create-or-append along axis 0 of a resizable dataset,
downcast float64 -> float32, optional gzip compression.
"""

from __future__ import annotations

import numpy as np
import h5py


def append_to_h5(
    path: str,
    col_name: str,
    data,
    *,
    compression: str | None = None,
    expand_dims: bool = False,
) -> None:
    """Append ``data`` along axis 0 of the resizable dataset ``col_name``.

    ``expand_dims=True`` matches the prepare_data writer that prepends a
    leading axis before appending (h5functions.py:5); the prediction writer
    appends as-is (prediction_utils.py:15-28).
    """
    data = np.asarray(data)
    if expand_dims:
        data = np.expand_dims(data, axis=0)
    if data.dtype == np.float64:
        data = data.astype(np.float32)

    with h5py.File(path, "a") as hf:
        if col_name not in hf:
            maxshape = (None,)
            if data.ndim > 1:
                maxshape = (None,) + data.shape[1:]
            hf.create_dataset(col_name, data=data, maxshape=maxshape, compression=compression)
        else:
            ds = hf[col_name]
            ds.resize(ds.shape[0] + data.shape[0], axis=0)
            ds[-data.shape[0]:] = data


def save_predictions(
    output_dir: str,
    output_filename: str,
    col_name: str,
    data,
    *,
    compression: str | None = None,
) -> None:
    """Directory-creating append (reference h5util.save_predictions)."""
    import os

    os.makedirs(output_dir, exist_ok=True)
    append_to_h5(os.path.join(output_dir, output_filename), col_name, data, compression=compression)


def read_dataset(path: str, col_name: str, index=None) -> np.ndarray:
    """Read a column (optionally a single axis-0 row) as a numpy array."""
    with h5py.File(path, "r") as hf:
        ds = hf[col_name]
        return np.asarray(ds if index is None else ds[index])


def dataset_len(path: str, col_name: str = "u") -> int:
    """Number of axis-0 rows (time frames) in a column."""
    with h5py.File(path, "r") as hf:
        return hf[col_name].shape[0]
