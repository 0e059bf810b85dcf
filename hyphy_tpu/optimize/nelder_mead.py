"""Vmappable fixed-structure Nelder-Mead for small bounded problems.

The reference's per-site fits use Nelder-Mead at precision 1e-3
(``FEL.bf:726-734``, ``likefunc.cpp:9456`` SimplexMethod).  This
implementation is shaped for ``vmap``: a fixed number of iterations with a
static reflect/expand/contract/shrink decision tree, operating on
logit-transformed bounded parameters.  No gradients, tiny compile.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from hyphy_tpu.models.parameters import (
    Params,
    Specs,
    clip_to_bounds,
    to_bounded,
    to_unbounded,
)


def _pack(specs: Specs):
    keys = sorted(specs)
    sizes = [
        int(jnp.prod(jnp.asarray(specs[k].shape))) if specs[k].shape else 1
        for k in keys
    ]

    def to_vec(params: Params) -> jnp.ndarray:
        return jnp.concatenate(
            [jnp.ravel(jnp.asarray(params[k])) for k in keys]
        ) if keys else jnp.zeros(0)

    def to_dict(vec: jnp.ndarray) -> Params:
        out, ofs = {}, 0
        for k, sz in zip(keys, sizes):
            val = vec[ofs : ofs + sz]
            out[k] = val.reshape(specs[k].shape) if specs[k].shape else val[0]
            ofs += sz
        return out

    return to_vec, to_dict, sum(sizes)


def nelder_mead(
    objective: Callable[[Params], jnp.ndarray],
    specs: Specs,
    init: Params,
    max_iterations: int = 200,
    initial_step: float = 0.5,
) -> Tuple[Params, jnp.ndarray]:
    """Maximize ``objective`` over bounded params; returns (params, value).

    Fixed ``max_iterations`` reflect/expand/contract steps in unbounded
    (logit) space.  Designed to be wrapped in ``jax.vmap``.
    """
    to_vec, to_dict, n = _pack(specs)

    def f(u_vec: jnp.ndarray) -> jnp.ndarray:
        params = to_bounded(to_dict(u_vec), specs)
        v = objective(params)
        return jnp.where(jnp.isfinite(v), v, -jnp.inf)

    u0 = to_vec(to_unbounded(clip_to_bounds(init, specs), specs))
    # initial simplex: u0 plus a step along each axis
    simplex = jnp.concatenate(
        [u0[None, :], u0[None, :] + initial_step * jnp.eye(n)], axis=0
    )  # [n+1, n]
    values = jax.vmap(f)(simplex)

    def step(carry, _):
        simplex, values = carry
        order = jnp.argsort(-values)  # descending: best first
        simplex = simplex[order]
        values = values[order]
        best, worst = simplex[0], simplex[-1]
        centroid = jnp.mean(simplex[:-1], axis=0)

        reflected = centroid + (centroid - worst)
        f_r = f(reflected)
        expanded = centroid + 2.0 * (centroid - worst)
        f_e = f(expanded)
        contracted = centroid - 0.5 * (centroid - worst)
        f_c = f(contracted)

        # choose replacement for the worst vertex
        use_expand = jnp.logical_and(f_r > values[0], f_e > f_r)
        use_reflect = jnp.logical_and(f_r > values[-2], jnp.logical_not(use_expand))
        use_contract = jnp.logical_and(
            jnp.logical_not(use_expand),
            jnp.logical_and(jnp.logical_not(use_reflect), f_c > values[-1]),
        )
        new_point = jnp.where(
            use_expand[..., None], expanded,
            jnp.where(use_reflect[..., None], reflected,
                      jnp.where(use_contract[..., None], contracted, worst)),
        )
        new_value = jnp.where(
            use_expand, f_e,
            jnp.where(use_reflect, f_r, jnp.where(use_contract, f_c, values[-1])),
        )
        shrink = jnp.logical_not(
            jnp.logical_or(use_expand, jnp.logical_or(use_reflect, use_contract))
        )
        # shrink everything toward the best vertex when no move helped
        shrunk = best[None, :] + 0.5 * (simplex - best[None, :])
        shrunk_values = jax.vmap(f)(shrunk)
        simplex = jnp.where(
            shrink,
            shrunk.at[0].set(best),
            simplex.at[-1].set(new_point),
        )
        values = jnp.where(
            shrink,
            shrunk_values.at[0].set(values[0]),
            values.at[-1].set(new_value),
        )
        return (simplex, values), None

    (simplex, values), _ = jax.lax.scan(
        step, (simplex, values), None, length=max_iterations
    )
    best_idx = jnp.argmax(values)
    best_params = to_bounded(to_dict(simplex[best_idx]), specs)
    return best_params, values[best_idx]


def vmapped_nelder_mead(
    objective: Callable[[jnp.ndarray, Params], jnp.ndarray],
    specs: Specs,
    init_batch: Params,
    idx,
    max_iterations: int = 200,
):
    """Per-item Nelder-Mead: ``objective(item_index, params)``.

    ``idx``: [N] item indices (an int for ``jnp.arange``-style use).
    Returns (params [N,...], values [N]).  Shardable along the item axis —
    wrap with ``parallel.mesh.sharded_site_solve`` to distribute sites.
    """
    if isinstance(idx, int):
        idx = jnp.arange(idx)

    def solve_one(i, init):
        return nelder_mead(
            lambda p: objective(i, p), specs, init, max_iterations=max_iterations
        )

    return jax.vmap(solve_one)(idx, init_batch)
