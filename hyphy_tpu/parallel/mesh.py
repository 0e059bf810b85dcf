"""Device-mesh sharding utilities.

The framework's parallel model (replacing the reference's OpenMP site-range
split, ``likefunc.cpp:11016``, and MPI site-template mode,
``likefunc.h:109``): alignment sites / site-fit problems are sharded
data-parallel across a 1-D ``sites`` mesh axis; parameters are replicated;
reductions ride ``psum`` over ICI.  The same program runs on one chip, a
TPU slice, or N virtual CPU devices (tests / ``dryrun_multichip``).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices: Optional[Sequence] = None, axis: str = "sites") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


def pad_to_multiple(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def sharded_site_solve(
    solver: Callable,
    init_batch: Dict[str, jnp.ndarray],
    n_items: int,
    mesh: Optional[Mesh] = None,
):
    """Run ``solver(idx [N], init_batch {k: [N,...]})`` with the leading
    (site) axis sharded across the mesh.

    Pads N up to a multiple of the device count (padded items recompute
    item 0 — harmless), shards inputs, and unpads every output along axis
    0.  ``solver`` must be shardable along axis 0 (a vmapped per-site
    computation is).
    """
    mesh = mesh or data_mesh()
    n_dev = mesh.devices.size
    n_pad = pad_to_multiple(max(n_items, 1), n_dev)

    idx = np.zeros(n_pad, dtype=np.int64)
    idx[:n_items] = np.arange(n_items)
    padded = {}
    for k, v in init_batch.items():
        v = np.asarray(v)
        pad_width = [(0, n_pad - v.shape[0])] + [(0, 0)] * (v.ndim - 1)
        padded[k] = np.pad(v, pad_width, mode="edge")

    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    idx_dev = jax.device_put(jnp.asarray(idx), sharding)
    init_dev = {k: jax.device_put(jnp.asarray(v), sharding) for k, v in padded.items()}

    if jax.default_backend() == "cpu":
        out = jax.jit(solver)(idx_dev, init_dev)
    else:
        # accelerator: run the solver's stages as separate device calls so
        # long batched optimizations can chunk themselves (a single fused
        # multi-minute call trips remote-worker watchdogs); the stages are
        # jitted individually inside
        out = solver(idx_dev, init_dev)
    return jax.tree_util.tree_map(lambda a: np.asarray(a)[:n_items], out)
