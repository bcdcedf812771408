"""Trace-time parallel context: routes model internals to SP/CP collectives.

The model's forward functions are pure and config-driven; sequence/context
parallelism additionally needs the live ``Mesh`` and axis names, which do not
belong in the serialisable ``ApertisConfig``. This context is entered INSIDE
the jitted train/eval step (so it is active while JAX traces the model) and
consulted by ``models.apertis._ssm_full`` / ``_mha_full``:

  * SSM: the selective scan runs as a sequence-sharded shard_map
    (``parallel.sequence.ssm_scan_sequence_parallel``) — cross-chunk traffic
    is one all-gather of (B, H, N) chunk summaries per layer.
  * MHA: attention runs as ring attention over the same axis
    (``parallel.ring_attention``).

Activations are L-sharded across the whole layer stack via a sharding
constraint placed in ``forward`` so pointwise/matmul work also splits over
the ``seq`` axis (GSPMD handles those; only scan/attention need the explicit
shard_map bodies).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import NamedTuple, Optional

from jax.sharding import Mesh


class ParallelContext(NamedTuple):
    mesh: Optional[Mesh] = None
    sp_axis: Optional[str] = None     # sequence axis name (None = SP off)
    batch_axis: Optional[str] = None  # batch axis to preserve inside shard_map

    @property
    def active(self) -> bool:
        return (self.mesh is not None and self.sp_axis is not None
                and self.mesh.shape.get(self.sp_axis, 1) > 1)


_LOCAL = threading.local()


def current() -> ParallelContext:
    return getattr(_LOCAL, "ctx", None) or ParallelContext()


@contextmanager
def parallel_context(mesh: Mesh, sp_axis: str = "seq",
                     batch_axis: Optional[str] = "data"):
    """Enable sequence/context parallelism for model calls traced inside."""
    prev = getattr(_LOCAL, "ctx", None)
    _LOCAL.ctx = ParallelContext(mesh, sp_axis, batch_axis)
    try:
        yield _LOCAL.ctx
    finally:
        _LOCAL.ctx = prev
