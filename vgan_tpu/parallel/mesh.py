"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A ('data', 'model') mesh. ``data`` defaults to n_devices // model.

    On a v5e slice the mesh axes ride ICI; multi-host extends this via
    ``jax.distributed.initialize`` + the same Mesh over all processes.
    """
    devices = list(devices if devices is not None else jax.devices())
    if model < 1 or (data is not None and data < 1):
        raise ValueError(f"mesh axes must be >= 1, got data={data} model={model}")
    if data is None:
        data = len(devices) // model
    if data * model > len(devices) or data < 1:
        raise ValueError(
            f"mesh data={data} x model={model} needs {data * model} devices "
            f"but only {len(devices)} are available"
        )
    if data * model != len(devices):
        devices = devices[: data * model]
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, *axes: Optional[str]) -> NamedSharding:
    """NamedSharding with the given per-dimension mesh axes (None=replicated)."""
    return NamedSharding(mesh, PartitionSpec(*axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
