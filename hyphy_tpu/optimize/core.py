"""Outer maximum-likelihood driver: bounded L-BFGS on JAX AD gradients.

Replaces the reference's derivative-free hybrid optimizer
(``_LikelihoodFunction::Optimize``, ``src/core/likefunc.cpp:4629``:
conjugate-gradient passes with numerical gradients + per-coordinate Brent).
With exact gradients from autodiff the bounded quasi-Newton converges in
far fewer likelihood evaluations; parameters are mapped to unbounded space
with a scaled logit (the reference does the same kind of remap,
``docs/optimization.md:72``).

Convergence mirrors ``OPTIMIZATION_PRECISION`` semantics: stop when the
lnL improvement over an iteration falls below the precision.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from hyphy_tpu.models.parameters import (
    Params,
    Specs,
    clip_to_bounds,
    count_parameters,
    to_bounded,
    to_unbounded,
)


def maximize(
    objective: Callable[[Params], jnp.ndarray],
    specs: Specs,
    init: Params,
    precision: float = 0.001,
    max_iterations: Optional[int] = None,
    memory_size: int = 15,
) -> Tuple[Params, jnp.ndarray, jnp.ndarray]:
    """Maximize ``objective`` over bounded params. Returns (params, value,
    iterations)."""
    n_free = count_parameters(specs)
    if n_free == 0:
        return dict(init), objective(init), jnp.zeros((), jnp.int32)
    if max_iterations is None:
        max_iterations = max(200, 30 * n_free)

    def loss(u: Params) -> jnp.ndarray:
        value = objective(to_bounded(u, specs))
        # guard NaN/-inf so the line search backtracks instead of dying
        # (reference: TOLERATE_NUMERICAL_ERRORS retry logic)
        return jnp.where(jnp.isfinite(value), -value, jnp.inf)

    u0 = to_unbounded(clip_to_bounds(init, specs), specs)
    solver = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(loss)

    # stop after `patience` consecutive iterations that each improve the
    # objective by less than `precision` (mirrors the reference's
    # "last pass improved < OPTIMIZATION_PRECISION" rule while tolerating
    # single flat line-search iterations)
    patience = 3

    def step(carry):
        u, state, prev_value, it, flat_count = carry
        value, grad = value_and_grad(u, state=state)
        updates, state = solver.update(
            grad, state, u, value=value, grad=grad, value_fn=loss
        )
        u_new = optax.apply_updates(u, updates)
        improvement = prev_value - value
        flat_count = jnp.where(improvement < precision, flat_count + 1, 0)
        return u_new, state, value, it + 1, flat_count

    def cond(carry):
        _, _, _, it, flat_count = carry
        return jnp.logical_and(it < max_iterations, flat_count < patience)

    state0 = solver.init(u0)
    u, state, value, it, _ = jax.lax.while_loop(
        cond,
        step,
        (u0, state0, jnp.asarray(jnp.inf, jnp.float64), jnp.zeros((), jnp.int32),
         jnp.zeros((), jnp.int32)),
    )
    final_value = loss(u)
    # the last accepted point may be (slightly) worse than the best seen
    # inside the line search; report the evaluated endpoint
    final = to_bounded(u, specs)
    return final, -final_value, it
