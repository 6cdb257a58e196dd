"""Device mesh construction.

The reference is single-process/single-device (main.py:39-45; SURVEY.md
section 2.4: no DP/TP/PP anywhere).  The TPU rebuild's scaling axes:

- ``data``: batch sharding (the DP analog),
- ``model``: row-sharding of the user/item embedding tables (the recsys
  analog of TP/EP) and item-axis sharding of full-catalog eval.

One mesh serves both; collectives ride ICI within a slice.  For >= 2 hosts
call ``jax.distributed.initialize`` before building the mesh — the same
code then spans DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def make_mesh(n_data: int | None = None, n_model: int | None = None,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults: all devices on the data axis (pure DP), model axis 1 — the
    right default until tables outgrow one chip's HBM.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None and n_model is None:
        n_data, n_model = n, 1
    elif n_data is None:
        n_data = n // n_model
    elif n_model is None:
        n_model = n // n_data
    if n_data * n_model != n:
        raise ValueError(f"mesh {n_data}x{n_model} != {n} devices")
    arr = mesh_utils.create_device_mesh((n_data, n_model), devices=devices)
    return Mesh(arr, ("data", "model"))


def single_device_mesh() -> Mesh:
    return Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
