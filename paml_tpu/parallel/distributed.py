"""Multi-host execution (SURVEY.md section 5.8).

The reference has no distributed runtime (files are its only IPC); the
TPU-native equivalent is one SPMD program per host joined through
`jax.distributed.initialize`, with XLA collectives over ICI within a
slice and DCN across slices.  This module is the single entry point: call
`initialize()` on every host before building meshes; `global_data_mesh()`
then lays the site-pattern axis over every chip in the job.

The only collectives the likelihood needs are psum (lnL, gradients) and
occasional all_gathers (site posteriors for output), both inserted by XLA
from the shardings — there is no custom transport layer.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-host job (idempotent).

    With no arguments, JAX auto-detects the cluster (TPU pod metadata or
    the standard JAX_COORDINATOR_* environment variables).  Single-host
    runs may skip this entirely.
    """
    # NOTE: do not probe jax.process_count() here — it initializes the
    # XLA backend, after which jax.distributed.initialize refuses to run
    try:
        if jax.distributed.is_initialized():
            return                 # already joined
    except AttributeError:         # older JAX: fall back to private state
        try:
            from jax._src.distributed import global_state
            if getattr(global_state, "client", None) is not None:
                return
        except ImportError:  # pragma: no cover - private API moved
            pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (ValueError, RuntimeError) as e:
        if "already" in str(e).lower():
            return
        if num_processes not in (None, 1):
            raise
        # single-process run without cluster metadata: nothing to join


def global_data_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every chip in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def is_primary() -> bool:
    """True on the process that should write output files."""
    return jax.process_index() == 0
