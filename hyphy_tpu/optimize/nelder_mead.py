"""Batched bounded Nelder-Mead with convergence masking / early exit.

The reference's per-site fits use Nelder-Mead at precision 1e-3
(``FEL.bf:726-734``, ``likefunc.cpp:9456`` SimplexMethod) and its serial
Brent machinery stops per site as soon as the bump is located
(``likefunc.cpp:9136``).  This implementation keeps the batched (all sites
at once) structure that TPUs want, but restores the adaptive stopping the
reference gets for free serially:

  * the whole batch of simplexes advances inside one ``lax.while_loop``
    whose condition is "any site still has simplex value-spread > tol" —
    so the loop runs max-over-sites iterations, not a fixed worst case;
  * each iteration costs a fixed THREE batched objective evaluations
    (reflect; a per-item adaptive second probe that is the expansion when
    the reflection leads and the outside-contraction otherwise; and a
    rank-1 worst-toward-best fallback replacing the classic full shrink),
    instead of the n+4 a naive lockstep decision tree pays;
  * converged sites are frozen (masked updates), so their values are
    bit-stable once done.

Parameters are optimized in logit-transformed (unbounded) space.
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


def _batched_nelder_mead(
    f_batch: Callable[[jnp.ndarray], jnp.ndarray],  # [N, n] -> [N]
    u0: jnp.ndarray,                                # [N, n]
    max_iterations: int,
    tol: float,
    initial_step: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Maximize ``f_batch`` per row; returns (u_best [N, n], value [N])."""
    n_items, n = u0.shape
    dtype = u0.dtype

    # initial simplex: u0 plus a step along each axis -> [N, n+1, n].
    # The n+1 objective sweeps run as ONE jitted program — eager, each is
    # hundreds of per-primitive dispatches through a tunneled accelerator
    @jax.jit
    def _init_values(simplex):
        return jnp.stack(
            [f_batch(simplex[:, k, :]) for k in range(n + 1)], axis=1
        )  # [N, n+1]

    offsets = jnp.concatenate(
        [jnp.zeros((1, n), dtype), initial_step * jnp.eye(n, dtype=dtype)], axis=0
    )
    simplex = u0[:, None, :] + offsets[None, :, :]
    values = _init_values(simplex)

    tol = jnp.asarray(tol, dtype)

    def spread(values):
        return jnp.max(values, axis=1) - jnp.min(values, axis=1)

    def cond(carry):
        _, values, it = carry
        return jnp.logical_and(
            it < max_iterations, jnp.any(spread(values) > tol)
        )

    def make_body(fused: bool):
        def body(carry):
            simplex, values, it = carry
            done = spread(values) <= tol                   # [N]

            order = jnp.argsort(-values, axis=1)           # best first
            simplex = jnp.take_along_axis(simplex, order[..., None], axis=1)
            values = jnp.take_along_axis(values, order, axis=1)
            best = simplex[:, 0]                           # [N, n]
            worst = simplex[:, -1]
            centroid = jnp.mean(simplex[:, :-1], axis=1)

            reflected = centroid + (centroid - worst)
            expanded = centroid + 2.0 * (centroid - worst)
            contracted = centroid - 0.5 * (centroid - worst)
            fallback = best + 0.5 * (worst - best)         # rank-1 shrink
            if fused:
                # latency-bound backends: all four probes in ONE stacked
                # batched call (4 evals / 1 dispatch)
                nl = reflected.shape[0]
                f_all = f_batch(jnp.concatenate(
                    [reflected, expanded, contracted, fallback]
                ))
                f_r = f_all[:nl]
                f_e_raw = f_all[nl : 2 * nl]
                f_c_raw = f_all[2 * nl : 3 * nl]
                f_s = f_all[3 * nl :]
                want_expand = f_r > values[:, 0]
                f_2 = jnp.where(want_expand, f_e_raw, f_c_raw)
            else:
                # compute-bound backends: reflect, then ONE adaptive second
                # probe (expansion when the reflection leads, else outside
                # contraction), then the fallback — 3 evals / 3 dispatches
                f_r = f_batch(reflected)
                want_expand = f_r > values[:, 0]
                f_2 = f_batch(jnp.where(
                    want_expand[:, None], expanded, contracted
                ))
                f_s = f_batch(fallback)
            second = jnp.where(want_expand[:, None], expanded, contracted)

            f_e = jnp.where(want_expand, f_2, -jnp.inf)
            f_c = jnp.where(want_expand, -jnp.inf, f_2)
            use_expand = jnp.logical_and(want_expand, f_e > f_r)
            use_reflect = jnp.logical_and(f_r > values[:, -2], ~use_expand)
            use_contract = jnp.logical_and(
                ~use_expand, jnp.logical_and(~use_reflect, f_c > values[:, -1])
            )
            new_point = jnp.where(
                use_expand[:, None], second,
                jnp.where(use_reflect[:, None], reflected,
                          jnp.where(use_contract[:, None], second, fallback)),
            )
            new_value = jnp.where(
                use_expand, f_2,
                jnp.where(use_reflect, f_r, jnp.where(use_contract, f_2, f_s)),
            )
            new_simplex = simplex.at[:, -1].set(new_point)
            new_values = values.at[:, -1].set(new_value)

            # freeze converged rows so finished sites stay bit-stable
            simplex = jnp.where(done[:, None, None], simplex, new_simplex)
            values = jnp.where(done[:, None], values, new_values)
            return simplex, values, it + 1

        return body

    # fusing the probes into one 4N-item call saves dispatches but
    # QUADRUPLES the peak activation footprint (per-site codon objectives
    # materialize [items, branches, 61, 61] propagators — 4x on a 16G-HBM
    # chip OOMs at ~300 sites x 200 branches); sequential probes are the
    # safe default, HYPHY_TPU_NM_FUSED=1 opts in for small problems
    import os as _os

    body = make_body(
        fused=jax.default_backend() != "cpu"
        and _os.environ.get("HYPHY_TPU_NM_FUSED") == "1"
    )

    traced = any(
        isinstance(x, jax.core.Tracer) for x in (u0, simplex, values)
    )
    if traced:
        simplex, values, _ = jax.lax.while_loop(
            cond, body, (simplex, values, jnp.zeros((), jnp.int32))
        )
    else:
        # concrete inputs: advance in bounded chunks of iterations, one jit
        # call each, with the batch state living on the device between
        # calls.  Remote-accelerator workers kill device calls that run for
        # minutes (observed on big site batches); a chunk stays ~seconds.
        import os as _os

        chunk = int(_os.environ.get("HYPHY_TPU_NM_CHUNK", "32"))

        @jax.jit
        def run_chunk(carry, it_limit):
            def chunk_cond(c):
                return jnp.logical_and(c[2] < it_limit, cond(c))

            out = jax.lax.while_loop(chunk_cond, body, carry)
            return out, cond(out)

        from hyphy_tpu.config import settings

        carry = (simplex, values, jnp.zeros((), jnp.int32))
        it_done = 0
        while it_done < max_iterations:
            it_limit = min(it_done + chunk, max_iterations)
            carry, more = run_chunk(carry, jnp.asarray(it_limit, jnp.int32))
            it_done = it_limit
            if not bool(more) or settings.warmup:
                # warmup: one chunk compiles every program on this path
                break
        simplex, values, _ = carry
    best_idx = jnp.argmax(values, axis=1)                  # [N]
    u_best = jnp.take_along_axis(
        simplex, best_idx[:, None, None], axis=1
    )[:, 0, :]
    return u_best, jnp.max(values, axis=1)


def nelder_mead(
    objective: Callable[[Params], jnp.ndarray],
    specs: Specs,
    init: Params,
    max_iterations: int = 200,
    initial_step: float = 0.5,
    tol: float = 1e-6,
) -> Tuple[Params, jnp.ndarray]:
    """Maximize ``objective`` over bounded params; returns (params, value)."""
    to_vec, to_dict, n = _pack(specs)

    def f_batch(u_mat: jnp.ndarray) -> jnp.ndarray:
        def f_one(u_vec):
            v = objective(to_bounded(to_dict(u_vec), specs))
            return jnp.where(jnp.isfinite(v), v, -jnp.inf)

        return jax.vmap(f_one)(u_mat)

    u0 = to_vec(to_unbounded(clip_to_bounds(init, specs), specs))[None, :]
    u_best, value = _batched_nelder_mead(
        f_batch, u0, max_iterations, tol, initial_step
    )
    return to_bounded(to_dict(u_best[0]), specs), value[0]


def vmapped_nelder_mead(
    objective: Callable[[jnp.ndarray, Params], jnp.ndarray],
    specs: Specs,
    init_batch: Params,
    idx,
    max_iterations: int = 200,
    tol: float = 1e-6,
    initial_step: float = 0.5,
):
    """Per-item Nelder-Mead: ``objective(item_index, params)``.

    ``idx``: [N] item indices (an int for ``jnp.arange``-style use).
    Returns (params [N,...], values [N]).  Shardable along the item axis —
    wrap with ``parallel.mesh.sharded_site_solve`` to distribute sites.

    All items iterate in lockstep inside one ``while_loop``; the loop exits
    as soon as EVERY item's simplex value-spread is <= ``tol`` (converged
    items are frozen while stragglers finish).
    """
    if isinstance(idx, int):
        idx = jnp.arange(idx)
    to_vec, to_dict, n = _pack(specs)

    def f_batch(u_mat: jnp.ndarray) -> jnp.ndarray:
        # accepts [m*N, n] — candidate points stacked over the item batch
        # (the NM body fuses its three probes into one batched call)
        m = u_mat.shape[0] // idx.shape[0]
        idx_m = jnp.tile(idx, m) if m > 1 else idx

        def f_one(i, u_vec):
            v = objective(i, to_bounded(to_dict(u_vec), specs))
            return jnp.where(jnp.isfinite(v), v, -jnp.inf)

        return jax.vmap(f_one)(idx_m, u_mat)

    def init_vec(i):
        one = {
            k: jnp.asarray(init_batch[k])[i] for k in specs
        }
        return to_vec(to_unbounded(clip_to_bounds(one, specs), specs))

    u0 = jax.vmap(init_vec)(jnp.arange(idx.shape[0]))
    u_best, values = _batched_nelder_mead(
        f_batch, u0, max_iterations, tol, initial_step
    )
    params = jax.vmap(lambda u: to_bounded(to_dict(u), specs))(u_best)
    return params, values
