"""Parameter specifications, bounds, and smooth bounded<->unbounded
transforms.

The reference optimizes bounded variables by mapping them to an unbounded
space (``docs/optimization.md:72``); default bounds are [0, 10000]
(``src/core/likefunc.h:61-62``).  Here every free parameter is a leaf of a
flat dict pytree; constraints of the forms libv3 actually uses (``x := c``,
``x := y``, proportional scalings) are expressed as derived values inside
model ``build`` functions rather than as a constraint solver.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_UPPER = 10000.0


@dataclasses.dataclass(frozen=True)
class ParamSpec:
    init: float = 0.1
    lower: float = 0.0
    upper: float = DEFAULT_UPPER
    shape: Tuple[int, ...] = ()
    # Cross-partition sharing in a multi-partition LikelihoodFunction:
    # None = default rule (scalars shared, vectors per-partition);
    # True/False overrides it (reference: same-named global variables are
    # shared across partitions, e.g. the joint omega of doPartitionedMG,
    # while the per-partition branch-length scalers are not,
    # shared-load-file.bf:716).
    shared: "bool | None" = None

    def initial(self) -> jnp.ndarray:
        return jnp.full(self.shape, self.init, dtype=jnp.float64)

    def is_shared(self) -> bool:
        return self.shared if self.shared is not None else self.shape == ()


Specs = Dict[str, ParamSpec]
Params = Dict[str, jnp.ndarray]


def initial_params(specs: Specs) -> Params:
    return {k: s.initial() for k, s in specs.items()}


# -- transforms -------------------------------------------------------------
# x in (l, u)  <->  y unbounded via scaled logit; picked so that for small
# (x - l) the map behaves like log(x - l): same conditioning as HyPhy's
# log-space steps.

_EPS = 1e-12


def to_unbounded(params: Params, specs: Specs) -> Params:
    out = {}
    for k, v in params.items():
        s = specs[k]
        z = (jnp.clip(v, s.lower + _EPS, s.upper - _EPS) - s.lower) / (s.upper - s.lower)
        out[k] = jnp.log(z) - jnp.log1p(-z)
    return out


def to_bounded(uparams: Params, specs: Specs) -> Params:
    out = {}
    for k, v in uparams.items():
        s = specs[k]
        out[k] = s.lower + (s.upper - s.lower) * jax.nn.sigmoid(v)
    return out


def clip_to_bounds(params: Params, specs: Specs) -> Params:
    return {
        k: jnp.clip(v, specs[k].lower + _EPS, specs[k].upper - _EPS)
        for k, v in params.items()
    }


def flatten(params: Params):
    """dict -> (vector, unflatten) with deterministic key order."""
    keys = sorted(params)
    sizes = [int(np.prod(params[k].shape)) if params[k].shape else 1 for k in keys]
    vec = jnp.concatenate([jnp.ravel(params[k]) for k in keys]) if keys else jnp.zeros(0)
    shapes = {k: params[k].shape for k in keys}

    def unflatten(v):
        out, ofs = {}, 0
        for k, sz in zip(keys, sizes):
            out[k] = v[ofs : ofs + sz].reshape(shapes[k])
            ofs += sz
        return out

    return vec, unflatten


def count_parameters(specs: Specs) -> int:
    return sum(int(np.prod(s.shape)) if s.shape else 1 for s in specs.values())


def stick_breaking_weights(raw: jnp.ndarray) -> jnp.ndarray:
    """Mixture weights from K-1 stick-breaking fractions in (0,1)
    (reference: ``parameters.helper.stick_breaking``, BS_REL.bf:313-351)."""
    raw = jnp.atleast_1d(raw)
    remaining = jnp.concatenate([jnp.ones((1,), raw.dtype), jnp.cumprod(1.0 - raw)])
    w = jnp.concatenate([raw, jnp.ones((1,), raw.dtype)]) * remaining
    return w
