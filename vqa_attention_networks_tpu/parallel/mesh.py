"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    ``data=None`` consumes all remaining devices on the data axis. On real
    hardware the device order respects ICI topology (jax.devices() is
    topology-ordered); on the emulated CPU backend order is irrelevant.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    need = data * model
    assert need <= n, f"mesh {data}x{model} needs {need} devices, have {n}"
    if need < n:
        print(f"WARNING: mesh {data}x{model} uses {need} of {n} available "
              f"devices ({n - need} idle) — raise data_parallel/"
              "model_parallel to use them all")
    arr = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, model=1, devices=jax.devices()[:1])
