"""Device mesh construction.

One mesh, three named axes (reference had data-parallel only via DDP,
pipeline.py:462-466; TP/EP are capability upgrades — SURVEY.md §2.8):

  * ``data``   — batch sharding (DP); gradients all-reduce over this axis.
  * ``model``  — tensor parallelism: attention heads / FFN columns / SSM
    inner channels.
  * ``expert`` — MoE expert sharding (dispatch all-to-all rides this axis).

All collectives are inserted by XLA from sharding annotations (GSPMD); no
hand-written communication.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh

AXES = ("data", "model", "expert")


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    shape: Optional[Tuple[int, int, int]] = None,
) -> Mesh:
    """Build a (data, model, expert) mesh over the given devices.

    Default shape puts all devices on the data axis. ``shape`` must multiply
    to the device count.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1, 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return create_mesh(jax.devices()[:1], (1, 1, 1))
