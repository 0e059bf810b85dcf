"""The opt-in Pallas level kernel must match the einsum path exactly.

Runs only on a real TPU backend (the default test tier forces CPU, where
the kernel is unavailable and XLA's path is authoritative anyway).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_level_products_matches_einsum():
    from hyphy_tpu.ops import pallas_pruning as pp

    if not pp.available():
        pytest.skip("Pallas level kernel needs a TPU backend")
    rng = np.random.default_rng(0)
    w, k, p, s = 5, 2, 700, 61
    cc = jnp.asarray(rng.uniform(0.1, 1.0, size=(w, k, p, s)), jnp.float32)
    cp = jnp.asarray(rng.uniform(0.0, 0.2, size=(w, k, s, s)), jnp.float32)
    out = pp.level_products(cc, cp, k)
    ref = jnp.prod(
        jnp.einsum("wkij,wkpj->wkpi", cp, cc,
                   precision=jax.lax.Precision.HIGHEST),
        axis=1,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
