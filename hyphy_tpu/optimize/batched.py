"""Batched (vmapped) bounded optimization for per-site fits.

The reference runs per-site Nelder-Mead fits serially or fans them out over
an MPI job queue (``FEL.bf:1188-1228``, ``libv3/tasks/mpi.bf``).  Here every
site's small bounded optimization runs simultaneously as one vmapped
program — sites with heterogeneous convergence are handled by the masked
``while_loop`` (it iterates until the slowest site converges).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from hyphy_tpu.models.parameters import Params, Specs
from hyphy_tpu.optimize.core import maximize_jax


def grid_best_starts(
    objective: Callable[[jnp.ndarray, Params], jnp.ndarray],
    grid: Dict[str, jnp.ndarray],
    idx,
):
    """Evaluate G candidate starting points for every item and return the
    best per item (the reference's OPTIMIZATION_START_GRID semantics).

    ``grid``: dict of [G]-shaped (or [G, ...]) arrays; ``idx``: [N] item
    indices or an int.  Returns a dict of [N, ...] chosen starts.
    """
    if isinstance(idx, int):
        idx = jnp.arange(idx)

    # ONE jitted program: evaluated eagerly this is hundreds of
    # per-primitive device dispatches (each a full round trip on a
    # tunneled accelerator — minutes of pure latency per analysis)
    @jax.jit
    def _grid_values(grid, idx):
        def eval_point(g_params):
            return jax.vmap(lambda i: objective(i, g_params))(idx)  # [N]

        values = jax.vmap(eval_point)(grid)  # [G, N]
        best = jnp.argmax(values, axis=0)    # [N]
        return {k: v[best] for k, v in grid.items()}, values

    return _grid_values(grid, idx)


def vmapped_maximize(
    objective: Callable[[jnp.ndarray, Params], jnp.ndarray],
    specs: Specs,
    init_batch: Params,
    n_items: int,
    precision: float = 1e-4,
    max_iterations: Optional[int] = None,
):
    """Maximize ``objective(item_index, params)`` independently per item.

    ``init_batch``: dict of [N, ...] per-item starting values.
    Returns (params [N,...], values [N], iterations [N]).
    """
    idx = jnp.arange(n_items)

    def solve_one(i, init):
        return maximize_jax(
            lambda p: objective(i, p),
            specs,
            init,
            precision=precision,
            max_iterations=max_iterations,
        )

    return jax.vmap(solve_one)(idx, init_batch)
