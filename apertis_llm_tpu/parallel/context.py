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
    ep_axis: Optional[str] = None     # expert axis for all-to-all dispatch

    @property
    def active(self) -> bool:
        """Sequence parallelism enabled."""
        return (self.mesh is not None and self.sp_axis is not None
                and self.mesh.shape.get(self.sp_axis, 1) > 1)

    @property
    def ep_active(self) -> bool:
        """Explicit expert-parallel (all-to-all) dispatch enabled."""
        return (self.mesh is not None and self.ep_axis is not None
                and self.mesh.shape.get(self.ep_axis, 1) > 1)


_LOCAL = threading.local()


def current() -> ParallelContext:
    return getattr(_LOCAL, "ctx", None) or ParallelContext()


@contextmanager
def parallel_context(mesh: Mesh, sp_axis: Optional[str] = "seq",
                     batch_axis: Optional[str] = "data",
                     ep_axis: Optional[str] = None):
    """Enable sequence/expert parallelism for model calls traced inside."""
    prev = getattr(_LOCAL, "ctx", None)
    _LOCAL.ctx = ParallelContext(mesh, sp_axis, batch_axis, ep_axis)
    try:
        yield _LOCAL.ctx
    finally:
        _LOCAL.ctx = prev
