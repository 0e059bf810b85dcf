"""Global configuration knobs.

The reference keeps ~80 typed environment variables in a central registry
(``src/core/hbl_env.cpp:120-360``); we keep the load-bearing subset as a
settings object, overridable per-call and via ``HYPHY_TPU_*`` environment
variables.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp


def _env(name: str, default, cast):
    raw = os.environ.get(f"HYPHY_TPU_{name}")
    if raw is None:
        return default
    if cast is bool:
        return raw.lower() in ("1", "true", "yes", "on")
    return cast(raw)


@dataclasses.dataclass
class Settings:
    """Runtime knobs (mirrors the reference's env registry, hbl_env.cpp)."""

    # lnL convergence tolerance for the outer optimizer
    # (reference: OPTIMIZATION_PRECISION, default per analysis; fixtures 0.001)
    optimization_precision: float = _env("OPTIMIZATION_PRECISION", 0.001, float)
    # max optimizer iterations scaled by #parameters
    # (reference: MAXIMUM_ITERATIONS_PER_VARIABLE)
    max_iterations_per_variable: int = _env("MAX_ITER_PER_VAR", 2000, int)
    # assume time-reversible models -> eigendecomposition expm fast path
    # (reference: ASSUME_REVERSIBLE_MODELS)
    assume_reversible: bool = _env("ASSUME_REVERSIBLE", True, bool)
    # RNG seed (reference: RANDOM_SEED)
    random_seed: int = _env("RANDOM_SEED", 0, int)
    # default parameter upper bound (reference: likefunc.h:61-62)
    default_upper_bound: float = 10000.0
    # count gaps when harvesting frequencies
    # (reference: COUNT_GAPS_IN_FREQUENCIES; libv3 sets 0)
    count_gaps_in_frequencies: bool = _env("COUNT_GAPS_IN_FREQUENCIES", False, bool)
    # verbosity (reference: VERBOSITY_LEVEL)
    verbosity: int = _env("VERBOSITY", 0, int)
    # warmup mode: run every optimizer for ~one device chunk only, so a
    # full analysis pipeline traces + compiles every XLA program it would
    # use (priming the persistent compilation cache) without paying the
    # compute.  Driven by `hyphy-tpu warmup <method> ...`; the compiled
    # programs are IDENTICAL to the real run's (iteration caps are runtime
    # scalars, not HLO constants), so the real run is then fully warm.
    warmup: bool = _env("WARMUP", False, bool)

    def default_mesh(self, for_dtype=None):
        """The session's default 1-D ``sites`` mesh, or ``None``.

        The reference engages its MPI optimizer modes automatically inside
        ``Optimize`` (``InitMPIOptimizer``, ``likefunc.cpp:3747``) — the
        user never asks for distribution.  This is the SPMD analogue:
        every ``LikelihoodFunction`` / ``BSRELEngine`` built by an
        analysis shards its pattern axis over this mesh when more than one
        device is visible.  ``HYPHY_TPU_MESH=off`` disables; the fp64
        host-parity stages on an accelerator session (``for_dtype`` fp64
        while the backend is not cpu) stay unsharded — they deliberately
        run on the host CPU device.
        """
        mode = os.environ.get("HYPHY_TPU_MESH", "auto").lower()
        if mode in ("0", "off", "none", "no"):
            return None
        devices = jax.devices()
        if len(devices) < 2:
            return None
        if (
            for_dtype is not None
            and jnp.dtype(for_dtype) == jnp.float64
            and jax.default_backend() != "cpu"
        ):
            return None
        import numpy as _np
        from jax.sharding import Mesh

        return Mesh(_np.array(devices), ("sites",))

    def likelihood_dtype(self) -> jnp.dtype:
        """Compute dtype for the likelihood path.

        fp64 everywhere for parity; the TPU has no native fp64 so the
        benchmark path selects fp32 explicitly (the reference has an fp32
        path too: MATRIX_EXPONENTIAL_SINGLE_PRECISION, matrix.cpp:9974).
        """
        forced = os.environ.get("HYPHY_TPU_PRECISION")
        if forced:
            return jnp.dtype(forced)
        if jax.default_backend() == "cpu":
            return jnp.dtype(jnp.float64)
        return jnp.dtype(jnp.float32)


settings = Settings()
