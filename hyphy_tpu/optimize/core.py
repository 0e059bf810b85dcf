"""Outer maximum-likelihood driver.

Replaces the reference's derivative-free hybrid optimizer
(``_LikelihoodFunction::Optimize``, ``src/core/likefunc.cpp:4629``:
conjugate-gradient passes with numerical gradients + per-coordinate Brent).

Two entry points:

  * :func:`maximize` — the host-level driver used for whole-gene fits: a
    bounded L-BFGS-B loop (scipy) over a jit-compiled value-and-gradient.
    This is exactly the reference's MPI "broadcast theta, reduce lnL"
    shape (``likefunc.cpp:1654``): the parameter vector is tiny and lives
    on the host, each evaluation is one fused device program.  Native box
    bounds (no logit remap) matter: phylogenetic fits have hundreds of
    branch-length parameters pinned near 0 where a squashing transform
    destroys the quasi-Newton curvature model.
  * :func:`maximize_jax` — a fully jittable/vmappable optax L-BFGS loop
    used by the batched per-site machinery (``optimize/batched.py``) where
    thousands of small independent fits run as one vmapped program.

Convergence mirrors ``OPTIMIZATION_PRECISION`` semantics: stop when the
lnL improvement falls below the precision (and, for the host driver, the
projected gradient is small or restarts stop helping).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hyphy_tpu.models.parameters import (
    Params,
    Specs,
    clip_to_bounds,
    count_parameters,
    flatten,
    to_bounded,
    to_unbounded,
)


def maximize(
    objective: Callable[[Params], jnp.ndarray],
    specs: Specs,
    init: Params,
    precision: float = 0.001,
    max_iterations: Optional[int] = None,
    memory_size: int = 25,
) -> Tuple[Params, jnp.ndarray, jnp.ndarray]:
    """Maximize ``objective`` over bounded params (host L-BFGS-B driver).
    Returns (params, value, iterations).

    On an accelerator backend the host loop's per-evaluation round trip
    (~100ms through a tunneled TPU) dominates wall-clock, so the fit runs
    as ONE device-side program instead (``maximize_jax``'s jitted L-BFGS
    while_loop — the reference's broadcast-theta/reduce-lnL MPI shape
    collapsed into the XLA program).  Set HYPHY_TPU_HOST_OPTIMIZER=1 to
    force the host driver anywhere."""
    import os as _os

    n_free = count_parameters(specs)
    if n_free == 0:
        return dict(init), objective(init), jnp.zeros((), jnp.int32)
    if (
        jax.default_backend() != "cpu"
        and _os.environ.get("HYPHY_TPU_HOST_OPTIMIZER") != "1"
    ):
        return maximize_jax(
            objective, specs, init, precision=precision,
            max_iterations=max_iterations,
            # fp32 device likelihoods carry ~|lnL|*1e-6 evaluation noise;
            # a convergence test below that floor never fires and the fit
            # burns its full iteration budget
            relative_floor=5e-7,
        )
    from scipy.optimize import minimize

    from hyphy_tpu.config import settings

    if max_iterations is None:
        max_iterations = max(500, 30 * n_free)
    if settings.warmup:
        # compile-prime only: the jitted value_and_grad is the only XLA
        # program on this path
        max_iterations = min(max_iterations, 3)

    init = clip_to_bounds(
        {k: jnp.asarray(init[k], jnp.float64) for k in specs}, specs
    )
    x0, unflatten = flatten(init)
    keys = sorted(specs)
    bounds = []
    for k in keys:
        s = specs[k]
        n = int(np.prod(s.shape)) if s.shape else 1
        # nudge zero lower bounds: at a rate of exactly 0, mismatching site
        # likelihoods are exactly 0, the clamp kills every gradient, and
        # L-BFGS-B declares convergence on its first projected step
        lo = float(s.lower)
        if lo == 0.0 and float(s.upper) > 0.0:
            lo = 1e-8
        bounds.extend([(lo, float(s.upper))] * n)

    def neg(x):
        value = objective(unflatten(jnp.asarray(x)))
        return jnp.where(jnp.isfinite(value), -value, jnp.inf)

    val_and_grad = jax.jit(jax.value_and_grad(neg))
    trace = _OptimizerTrace.open(keys, specs)

    def fg(x):
        v, g = val_and_grad(x)
        v = float(v)
        g = np.array(g, dtype=np.float64)
        if np.isnan(v):
            v = np.inf  # L-BFGS-B's line search backtracks on inf
        g[~np.isfinite(g)] = 0.0
        if trace is not None:
            trace.record(x, v, g)
        return v, g

    x = np.asarray(x0, dtype=np.float64)
    best_val = np.inf
    total_it = 0
    # scipy's ftol is relative; scale the requested ABSOLUTE lnL precision
    # (OPTIMIZATION_PRECISION semantics) by the objective's magnitude so a
    # coarse precision actually terminates coarsely
    f0, _ = fg(x)
    f_scale = max(abs(f0), 1.0) if np.isfinite(f0) else 1.0
    ftol = max(precision / f_scale * 0.1, 2.5e-15)
    # L-BFGS-B restarts: re-initializing the curvature memory at the stall
    # point recovers progress on fits with many near-bound branch lengths
    # (the role the reference's gradient/coordinate-pass alternation plays,
    # likefunc.cpp:4677-4683)
    for _ in range(6):
        res = minimize(
            fg, x, jac=True, method="L-BFGS-B", bounds=bounds,
            options={
                "maxiter": max_iterations - total_it,
                "maxcor": memory_size,
                "ftol": ftol,
                "gtol": 1e-8,
                "maxls": 60,
            },
        )
        x = np.asarray(res.x, dtype=np.float64)
        total_it += int(res.nit)
        improved = best_val - float(res.fun)
        best_val = min(best_val, float(res.fun))
        if total_it >= max_iterations or improved < precision:
            break

    final = {k: jnp.asarray(v) for k, v in unflatten(jnp.asarray(x)).items()}
    value = objective(final)
    if trace is not None:
        trace.close(float(value), total_it)
    return final, value, jnp.asarray(total_it, jnp.int32)


class _OptimizerTrace:
    """Optimizer observability (reference: PRODUCE_OPTIMIZATION_LOG,
    ``likefunc.cpp:4711-4760`` and VERBOSITY_LEVEL, ``hbl_env.cpp``).

    ``HYPHY_TPU_OPT_LOG=<path>``: append one JSON line per fit with the
    lnL trajectory (every evaluation: lnL + max |gradient|), the final
    parameter names/values, and iteration counts — enough to replay a
    mis-converged fit offline.  ``HYPHY_TPU_VERBOSITY>=1`` additionally
    echoes evaluations to stderr every ``2^ceil(log2(n))``-ish calls.
    """

    def __init__(self, path, verbosity, keys, specs):
        self.path = path
        self.verbosity = verbosity
        self.keys = keys
        self.specs = specs
        self.trajectory = []
        self.n_calls = 0
        self.x_last = None
        import time as _time

        self.t0 = _time.time()

    @classmethod
    def open(cls, keys, specs):
        import os as _os

        path = _os.environ.get("HYPHY_TPU_OPT_LOG")
        verbosity = int(_os.environ.get("HYPHY_TPU_VERBOSITY", "0") or 0)
        if not path and verbosity < 1:
            return None
        return cls(path, verbosity, keys, specs)

    def record(self, x, v, g):
        import sys as _sys

        self.n_calls += 1
        self.x_last = np.asarray(x)
        gmax = float(np.max(np.abs(g))) if g.size else 0.0
        self.trajectory.append((round(-v, 6), round(gmax, 6)))
        if self.verbosity >= 2 or (
            self.verbosity == 1 and (self.n_calls & (self.n_calls - 1)) == 0
        ):
            print(
                f"[opt] eval {self.n_calls}: lnL {-v:.6f} max|g| {gmax:.3g}",
                file=_sys.stderr, flush=True,
            )

    def close(self, value, iterations):
        import json as _json
        import sys as _sys
        import time as _time

        if self.verbosity >= 1:
            print(
                f"[opt] done: lnL {value:.6f} after {self.n_calls} evals / "
                f"{iterations} iterations ({_time.time() - self.t0:.1f}s)",
                file=_sys.stderr, flush=True,
            )
        if not self.path:
            return
        entry = {
            "lnL": value,
            "iterations": int(iterations),
            "evaluations": self.n_calls,
            "seconds": round(_time.time() - self.t0, 3),
            "trajectory": self.trajectory,
            "parameters": {k: self._param(k) for k in self.keys},
        }
        with open(self.path, "a") as fh:
            fh.write(_json.dumps(entry) + "\n")

    def _param(self, key):
        ofs = 0
        for k in self.keys:
            s = self.specs[k]
            n = int(np.prod(s.shape)) if s.shape else 1
            if k == key:
                vals = self.x_last[ofs : ofs + n]
                return vals.tolist() if n > 1 else float(vals[0])
            ofs += n
        return None


def maximize_jax(
    objective: Callable[[Params], jnp.ndarray],
    specs: Specs,
    init: Params,
    precision: float = 0.001,
    max_iterations: Optional[int] = None,
    memory_size: int = 15,
    relative_floor: float = 0.0,
) -> Tuple[Params, jnp.ndarray, jnp.ndarray]:
    """Jittable/vmappable variant: optax L-BFGS on logit-remapped bounded
    parameters (the reference also remaps to unbounded space,
    ``docs/optimization.md:72``).  Used for batched per-site fits."""
    n_free = count_parameters(specs)
    if n_free == 0:
        return dict(init), objective(init), jnp.zeros((), jnp.int32)
    if max_iterations is None:
        # 30/parameter like the host path, but capped: L-BFGS on a
        # 2000-branch-length fit converges (or stalls at the fp32 noise
        # floor) in a few thousand iterations — a 60k cap only gives
        # pathological non-convergence 60k iterations to burn
        max_iterations = max(200, min(30 * n_free, 3000))

    def loss(u: Params) -> jnp.ndarray:
        value = objective(to_bounded(u, specs))
        return jnp.where(jnp.isfinite(value), -value, jnp.inf)

    # default zoom line search (15 steps): capping it at 8 was measured to
    # cost 1.4 lnL on the 1000-taxon GTR (-158115.69 vs -158114.30) and
    # 1.5 lnL on the downstream MG94 while needing MORE iterations (738 vs
    # 585) — the deep zoom matters on ill-conditioned branch-length ridges
    solver = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(loss)

    # stop after `patience` consecutive sub-precision improvements, but only
    # once the gradient is small too; `hard_patience` flat iterations means
    # the line search is at its noise floor regardless
    patience = 3
    hard_patience = 20
    grad_tol = jnp.asarray(max(precision, 1e-8), jnp.float64)

    # window length for the noise-averaged stall test (see below)
    window = 48

    def step(carry):
        u, state, prev_value, it, flat_count, gmax_prev, anchor = carry
        value, grad = value_and_grad(u, state=state)
        updates, state = solver.update(
            grad, state, u, value=value, grad=grad, value_fn=loss
        )
        u_new = optax.apply_updates(u, updates)
        improvement = prev_value - value
        # per-iteration improvement threshold: 0.1x the requested lnL
        # precision — matching the host path's scipy ftol scaling
        # (ftol = precision/|f|*0.1).  The looser `precision` itself let
        # L-BFGS stop while creeping along ill-conditioned valleys at
        # ~precision/iter, losing ~0.09 lnL vs scipy on a 44-param MG94
        # fit (measured).  ``relative_floor`` still lifts the threshold
        # to the objective's evaluation-noise scale on fp32 devices.
        prec_eff = jnp.maximum(0.1 * precision, relative_floor * jnp.abs(value))
        # nan-robust: a non-finite improvement (inf/nan line-search probe)
        # must count as STALLED — `improvement < prec_eff` is False for
        # nan, which would RESET the counter and let a fit churn to the
        # iteration cap (observed on fp32 1000-taxon gene fits)
        made_progress = improvement >= prec_eff      # False for nan
        flat_count = jnp.where(made_progress, 0, flat_count + 1)
        gmax = jnp.max(
            jnp.asarray([jnp.max(jnp.abs(g)) for g in jax.tree_util.tree_leaves(grad)])
        )
        # windowed stall test, entirely on-device: fp32 evaluation noise
        # (~relative_floor * |lnL| per eval) can keep RESETTING flat_count
        # forever (observed: a 1000-taxon fp32 GTR fit noise-walking to
        # the 60k-iteration cap), but averaged over `window` iterations
        # the noise cancels — if a whole window improved the objective by
        # less than max(precision, 2x the noise scale), the fit is done.
        anchor_value, anchor_it, stall = anchor
        at_window = (it + 1 - anchor_it) >= window
        win_thr = jnp.maximum(precision, 2.0 * relative_floor * jnp.abs(value))
        # nan-robust (see flat_count): nan window-improvement = stalled
        win_progress = (anchor_value - value) >= win_thr
        stall = jnp.where(
            at_window, jnp.where(win_progress, 0, stall + 1), stall
        )
        anchor_value = jnp.where(at_window, value, anchor_value)
        anchor_it = jnp.where(at_window, it + 1, anchor_it)
        return (u_new, state, value, it + 1, flat_count, gmax,
                (anchor_value, anchor_it, stall))

    def converged_of(carry):
        _, _, _, it, flat_count, gmax, anchor = carry
        converged = jnp.logical_and(flat_count >= patience, gmax <= grad_tol)
        converged = jnp.logical_or(converged, flat_count >= hard_patience)
        return jnp.logical_or(converged, anchor[2] >= 2)

    # The optimization runs device-side in CHUNKS of iterations: all state
    # (parameters + L-BFGS memory) stays on the device between jit calls
    # and only one convergence scalar is fetched per chunk.  A single
    # unbounded while_loop would be marginally cheaper, but a multi-minute
    # device call trips remote-accelerator worker watchdogs (observed: the
    # TPU worker is killed mid-call on large gene fits), while a chunk is
    # bounded to ~a minute.
    # 256 iterations/chunk: ~1.5 s device time on a 2000-parameter
    # 1000-taxon fit — well inside remote-worker watchdog limits — while
    # paying 4x fewer per-chunk convergence fetches (each a full round
    # trip through a tunneled accelerator)
    chunk = int(__import__("os").environ.get("HYPHY_TPU_DEVICE_CHUNK", "256"))

    @jax.jit
    def run_chunk(carry, it_limit):
        def cond(c):
            return jnp.logical_and(
                c[3] < it_limit, jnp.logical_not(converged_of(c))
            )

        out = jax.lax.while_loop(cond, step, carry)
        return out, converged_of(out)

    @jax.jit
    def finish(carry):
        u = carry[0]
        # the last accepted point may be (slightly) worse than the best
        # seen inside the line search; report the evaluated endpoint
        return to_bounded(u, specs), loss(u), carry[3]

    u0 = to_unbounded(clip_to_bounds(init, specs), specs)

    def fresh_anchor():
        return (
            jnp.asarray(jnp.inf, jnp.float64),   # anchor value
            jnp.zeros((), jnp.int32),            # anchor iteration
            jnp.zeros((), jnp.int32),            # stalled-window count
        )

    carry = (
        u0, solver.init(u0), jnp.asarray(jnp.inf, jnp.float64),
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        jnp.asarray(jnp.inf, jnp.float64), fresh_anchor(),
    )
    if any(
        isinstance(x, jax.core.Tracer)
        for x in jax.tree_util.tree_leaves(init)
    ):
        # inside vmap/jit the host chunk loop cannot branch on `conv`:
        # run the single data-dependent while_loop (the caller's trace
        # context already owns device-call granularity)
        def cond(c):
            return jnp.logical_and(
                c[3] < max_iterations, jnp.logical_not(converged_of(c))
            )

        carry = jax.lax.while_loop(cond, step, carry)
        u = carry[0]
        return to_bounded(u, specs), -loss(u), carry[3]

    from hyphy_tpu.config import settings

    import os as _os2
    import sys as _sys2
    import time as _time2

    _verbose = int(_os2.environ.get("HYPHY_TPU_VERBOSITY", "0") or 0) >= 1
    _t_start = _time2.time()
    it_done = 0
    restarts = 0
    last_converged_value = None
    while it_done < max_iterations:
        it_limit = min(it_done + chunk, max_iterations)
        carry, conv = run_chunk(carry, jnp.asarray(it_limit, jnp.int32))
        it_done = it_limit
        if _verbose:
            print(
                f"[maximize_jax +{_time2.time() - _t_start:.1f}s] "
                f"it<=({int(carry[3])}/{it_limit}) lnL={-float(carry[2]):.4f} "
                f"gmax={float(carry[5]):.3g} conv={bool(conv)} "
                f"restarts={restarts}",
                file=_sys2.stderr, flush=True,
            )
        if settings.warmup:
            # warmup: every program is compiled after one chunk; stop
            break
        if bool(conv):
            # L-BFGS restart at the stall point with fresh curvature
            # memory — the same polish the host path's scipy restarts
            # provide: near-flat ridges scatter patience-based stops by
            # ~0.1 lnL on many-parameter fits (measured, 44-param MG94),
            # and a re-initialized memory recovers the remaining ascent.
            # Stop once a restart fails to improve by > precision.
            value_now = float(carry[2])
            # a restart must beat the EVALUATION-NOISE scale, not just the
            # requested precision: on fp32 devices relative_floor*|lnL| is
            # the smallest trustworthy improvement (a 1000-taxon gene fit
            # was observed paying two restarts for 0.2 lnL each — under
            # its own ~0.08 noise floor per window, minutes of wall-clock
            # for nothing)
            restart_thr = max(
                precision, 2.0 * relative_floor * abs(value_now)
            )
            if restarts >= 2 or (
                last_converged_value is not None
                and last_converged_value - value_now < restart_thr
            ):
                break
            last_converged_value = value_now
            restarts += 1
            carry = (
                carry[0], solver.init(carry[0]), carry[2], carry[3],
                jnp.zeros((), jnp.int32),
                jnp.asarray(jnp.inf, jnp.float64),
                (carry[2], carry[3], jnp.zeros((), jnp.int32)),
            )
    final, final_value, it = finish(carry)
    return final, -final_value, it
