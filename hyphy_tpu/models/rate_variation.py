"""Site-to-site rate variation: discretized Gamma, Gamma+Inv, GDD.

Reference: ``libv3/models/rate_variation.bf`` — unit-mean distributions
discretized into K equiprobable bins with the MEAN representation
(``_CategoryVariable``, ``src/core/category.cpp:1118-1206``):

  * Gamma(alpha, alpha): bin boundaries are quantiles at i/K; the bin mean
    is ``K * (F_{alpha+1}(b_{i+1}) - F_{alpha+1}(b_i))`` using the dCDF
    identity (``rate_variation.bf:104``).
  * GDD: free rates + stick-breaking weights normalized to unit mean.

Everything is differentiable: the gamma quantile uses Newton iterations on
``gammainc`` (fixed trip count, implicit-function gradient comes out of the
iteration itself).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammainc, gammaln

from hyphy_tpu.models.parameters import ParamSpec, Params, Specs, stick_breaking_weights


def gamma_quantile(p: jnp.ndarray, shape: jnp.ndarray, rate: jnp.ndarray) -> jnp.ndarray:
    """Inverse CDF of Gamma(shape, rate) via bracketed Newton on gammainc.

    Fixed 40-iteration bisection warmup + 15 Newton steps — static
    structure, jits and differentiates cleanly.
    """
    a = shape
    # Wilson-Hilferty initial guess
    g = gammaln(a)

    def cdf(x):
        return gammainc(a, x * rate)

    def pdf(x):
        xr = jnp.maximum(x * rate, 1e-300)
        return jnp.exp((a - 1.0) * jnp.log(xr) - xr - g) * rate

    # bracket [0, hi]
    hi0 = (a + 10.0 * jnp.sqrt(a) + 10.0) / rate

    def expand(carry, _):
        hi = carry
        hi = jnp.where(cdf(hi) < p, hi * 2.0, hi)
        return hi, None

    hi, _ = jax.lax.scan(expand, hi0, None, length=8)
    lo = jnp.zeros_like(hi)

    def bisect(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        below = cdf(mid) < p
        return (jnp.where(below, mid, lo), jnp.where(below, hi, mid)), None

    (lo, hi), _ = jax.lax.scan(bisect, (lo, hi), None, length=40)
    x = 0.5 * (lo + hi)

    def newton(carry, _):
        x = carry
        step = (cdf(x) - p) / jnp.maximum(pdf(x), 1e-300)
        x = jnp.clip(x - step, lo * 0.0, hi * 2.0)
        return x, None

    x, _ = jax.lax.scan(newton, x, None, length=15)
    return x


def discretized_gamma(alpha: jnp.ndarray, k: int = 4):
    """(rates [k], weights [k]) for unit-mean Gamma(alpha, alpha)
    discretized into k equiprobable bins, MEAN representation."""
    probs = jnp.arange(1, k, dtype=jnp.float64) / k
    bounds = gamma_quantile(probs, alpha, alpha)          # [k-1]
    # dCDF: F_{alpha+1, alpha}(x) = gammainc(alpha+1, alpha*x)
    dcdf = gammainc(alpha + 1.0, alpha * bounds)
    dcdf = jnp.concatenate([jnp.zeros(1), dcdf, jnp.ones(1)])
    rates = (dcdf[1:] - dcdf[:-1]) * k
    weights = jnp.full((k,), 1.0 / k)
    return rates, weights


def discretized_gamma_inv(alpha: jnp.ndarray, p_inv: jnp.ndarray, k: int = 4):
    """Gamma + invariant class (rate_variation.bf:194): class 0 has rate 0
    with weight p_inv; the gamma classes have weight (1-p_inv)/k and rates
    scaled by 1/(1-p_inv) to keep the overall mean at 1."""
    rates, _ = discretized_gamma(alpha, k)
    rates = rates / jnp.maximum(1.0 - p_inv, 1e-10)
    all_rates = jnp.concatenate([jnp.zeros(1), rates])
    weights = jnp.concatenate(
        [p_inv[None], jnp.full((k,), 1.0) * (1.0 - p_inv) / k]
    )
    return all_rates, weights


def gdd_rates(raw_rates: jnp.ndarray, weight_fracs: jnp.ndarray, normalize: bool = True):
    """General discrete distribution: K free rates, K-1 stick-breaking
    weight fractions; normalized to unit mean when ``normalize``."""
    weights = stick_breaking_weights(weight_fracs)
    if normalize:
        mean = jnp.sum(raw_rates * weights)
        rates = raw_rates / jnp.maximum(mean, 1e-30)
    else:
        rates = raw_rates
    return rates, weights


def gamma_specs(prefix: str = "rv_gamma") -> Specs:
    """alpha in [0.01, 100], init 0.5 (rate_variation.bf:84)."""
    return {f"{prefix}_alpha": ParamSpec(init=0.5, lower=0.01, upper=100.0)}
