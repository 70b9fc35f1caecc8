"""Multi-host orchestration.

The reference has no distributed backend at all (SURVEY.md §2:
coordination is the filesystem + process polling). raintpu's model:

- **intra-host / intra-slice**: the (dp, sp) mesh in
  :mod:`raintpu.parallel.mesh` — XLA collectives over ICI.
- **multi-host**: ``jax.distributed`` initialization here; the global
  mesh spans all hosts' devices, each host feeds its local shard of the
  frame batch (frames are embarrassingly parallel, so cross-host
  traffic is zero in pure-dp layouts; drop-parallel psum stays inside a
  host's ICI domain when sp <= local device count).
- **fault tolerance**: file-keyed idempotent work units (conflict
  strategy 'skip') — a restarted host resumes exactly where outputs
  stop, the same load-bearing recovery the reference uses.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op for single-process runs).

    With no arguments, auto-detection is attempted (TPU pod metadata);
    pass explicit values for manual clusters.
    """
    import jax

    if num_processes is None and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except Exception as e:
            # Auto-detection legitimately fails on single-process runs,
            # but the error may also be real multi-host misconfiguration
            # — surface it instead of swallowing.
            from raintpu.utils.logging import print_warning
            print_warning(
                "jax.distributed auto-init failed "
                f"({type(e).__name__}: {e}); continuing single-process.")
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)


def local_batch_bounds(n_items: int) -> tuple:
    """[start, end) of this process's share of a global work list."""
    import jax

    p = jax.process_index()
    n = jax.process_count()
    per = -(-n_items // n)
    return min(p * per, n_items), min((p + 1) * per, n_items)


def make_global_array(local: np.ndarray, mesh, spec):
    """Assemble a global sharded array from per-host local data."""
    import jax

    return jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(mesh, spec), local)
