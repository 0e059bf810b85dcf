"""Pallas TPU kernel for the pruning level step.

One level of Felsenstein pruning computes, for every internal node of the
level and every site pattern, the product of the children's transition-
weighted messages:

    prod[w, p, :] = PROD_k ( P[w,k] @ clv[w,k,p,:] )     (k = children)

The kernel keeps the per-child messages in VMEM and writes only the
sibling product (renormalization + log-scale stay in XLA: this Mosaic
build fails to legalize multi-output pallas_call).

MEASURED RESULT (v5e, 1000 taxa x 2048 patterns, bench.py): the kernel is
numerically exact (same |delta lnL| as the einsum path) but ~1.7x SLOWER
than XLA's pipeline — 82k vs 139k site-evals/s.  XLA batches every
node's [patterns,61]x[61,61] contraction into large GEMMs, while this
grid serializes per (node, pattern-tile); the HBM saving on the message
intermediate does not make up for the lost MXU batching.  It therefore
stays OPT-IN (``HYPHY_TPU_PALLAS=1``) as working Pallas infrastructure +
an honest negative perf result, not a default.

Two Mosaic lowering gotchas encoded here: (a) multi-output pallas_call
and (b) tracing under ``jax_enable_x64`` both die with "failed to
legalize operation 'func.return'" — the kernel traces under
``jax.enable_x64(False)`` and returns a single output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_TILE_P = 512


def _level_kernel(cc_ref, cp_ref, out_ref, *, arity):
    # cc_ref: [1, K, Tp, S]; cp_ref: [1, K, S, S]
    acc = None
    for k in range(arity):
        m = jax.lax.dot_general(
            cc_ref[0, k], cp_ref[0, k],
            (((1,), (1,)), ((), ())),          # m[p,i] = sum_j cc[p,j] P[i,j]
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        acc = m if acc is None else acc * m
    out_ref[0] = acc


def _einsum_impl(cc: jnp.ndarray, cp: jnp.ndarray):
    """Reference einsum formulation of the level step (used as the VJP
    backward: ``pallas_call`` has no autodiff rule, and gradient-based
    fits differentiate the default ``loglik`` dispatch this kernel can
    sit inside when ``HYPHY_TPU_PALLAS=1``)."""
    contrib = jnp.einsum(
        "wkij,wkpj->wkpi", cp, cc,
        preferred_element_type=cc.dtype, precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.prod(contrib, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def level_products(cc: jnp.ndarray, cp: jnp.ndarray, arity: int):
    """[W, patterns, S] sibling-product messages for one level.

    ``cc``: [W, K, patterns, S] gathered child CLVs; ``cp``: [W, K, S, S]
    child transition matrices, both fp32.  Differentiable: the forward
    runs the Pallas kernel, the backward falls back to the einsum
    formulation (numerically identical).
    """
    return _forward(cc, cp, arity=arity)


def _level_products_fwd(cc, cp, arity):
    return _forward(cc, cp, arity=arity), (cc, cp)


def _level_products_bwd(arity, res, g):
    _, vjp = jax.vjp(_einsum_impl, *res)
    return vjp(g)


level_products.defvjp(_level_products_fwd, _level_products_bwd)


@functools.partial(jax.jit, static_argnames=("arity",))
def _forward(cc: jnp.ndarray, cp: jnp.ndarray, arity: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w, k, patterns, s = cc.shape
    tile = min(_TILE_P, patterns)
    n_tiles = (patterns + tile - 1) // tile
    pad = n_tiles * tile - patterns
    if pad:
        cc = jnp.pad(cc, ((0, 0), (0, 0), (0, pad), (0, 0)),
                     constant_values=1.0)
    # the framework runs with jax_enable_x64 globally (fp64 parity path);
    # Mosaic cannot legalize the 64-bit index types that leak into the
    # kernel under x64, so trace the pallas_call with x64 scoped off
    with jax.enable_x64(False):
        return _call(cc, cp, w, k, tile, n_tiles, s, pad, patterns)


def _call(cc, cp, w, k, tile, n_tiles, s, pad, patterns):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        functools.partial(_level_kernel, arity=k),
        grid=(w, n_tiles),
        in_specs=[
            pl.BlockSpec((1, k, tile, s), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, s, s), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, s), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((w, n_tiles * tile, s), jnp.float32),
    )(cc, cp)
    if pad:
        out = out[:, :patterns]
    return out


@functools.lru_cache(maxsize=1)
def available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401

        return jax.default_backend() == "tpu"
    except Exception:
        return False
