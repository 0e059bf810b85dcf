"""Hidden-Markov rate variation across sites.

TPU-native equivalent of the reference's HMM category machinery:
``SumUpHiddenMarkov`` (``src/core/likefunc2.cpp:1166``) computes the
forward-algorithm log-likelihood of the per-site, per-rate-class likelihood
lattice under a Markov chain over rate classes along the *original* site
order (patterns are expanded through ``duplicateMap``); ``RunViterbi``
(``src/core/likefunc2.cpp:1284``) decodes the most probable class path.
HBL defines the chain through a category variable's HMM formula matrix
(``libv3/models/rate_variation.bf:38``, BUSTED ``--syn-rates`` HMM mode).

Implementation notes (TPU-first):
  * the recursion is an inherently sequential ``lax.scan`` over sites, but
    each step is O(C^2) for C rate classes (C <= 10), so the scan is
    latency- not compute-bound; the per-class site likelihoods feeding it
    are produced by the batched pruning engine in one shot.
  * everything is done in log space with per-step normalization folded into
    the carry (no 2^64 scalers).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def uniform_switching_matrix(n_classes: int, lam) -> jnp.ndarray:
    """The stay/switch chain libv3 uses for HMM rate variation
    (``rate_variation.bf:52-56``): stay with probability ``1 - lam``,
    switch to any other class with probability ``lam / (C - 1)``."""
    lam = jnp.asarray(lam)
    c = n_classes
    off = lam / (c - 1)
    t = jnp.full((c, c), off, dtype=lam.dtype)
    return t.at[jnp.arange(c), jnp.arange(c)].set(1.0 - lam)


def forward_log_likelihood(
    class_site_logliks: jnp.ndarray,  # [C, patterns] log L(site | class)
    duplicate_map: np.ndarray,        # [sites] int32 site -> pattern
    transition: jnp.ndarray,          # [C, C] row-stochastic P(next | cur)
    initial: jnp.ndarray,             # [C] start distribution
) -> jnp.ndarray:
    """Forward-algorithm lnL (reference ``SumUpHiddenMarkov``,
    ``likefunc2.cpp:1166``): sites in original order, hidden state = rate
    class."""
    dm = jnp.asarray(np.asarray(duplicate_map, dtype=np.int32))
    site_ll = class_site_logliks[:, dm]                    # [C, sites]
    log_t = jnp.log(jnp.maximum(transition, 1e-300))
    log_init = jnp.log(jnp.maximum(initial, 1e-300))

    def step(log_alpha, ll_col):
        # log_alpha [C]; propagate then emit
        prop = jax.scipy.special.logsumexp(
            log_alpha[:, None] + log_t, axis=0
        )
        new = prop + ll_col
        shift = jnp.max(new)
        return new - shift, shift

    first = log_init + site_ll[:, 0]
    shift0 = jnp.max(first)
    log_alpha, shifts = jax.lax.scan(step, first - shift0, site_ll[:, 1:].T)
    return (
        jax.scipy.special.logsumexp(log_alpha) + shift0 + jnp.sum(shifts)
    )


def viterbi_path(
    class_site_logliks: jnp.ndarray,
    duplicate_map: np.ndarray,
    transition: jnp.ndarray,
    initial: jnp.ndarray,
) -> Tuple[np.ndarray, float]:
    """Most probable class path (reference ``RunViterbi``,
    ``likefunc2.cpp:1284``).  Returns (path [sites] int32, joint log score).
    """
    dm = jnp.asarray(np.asarray(duplicate_map, dtype=np.int32))
    site_ll = class_site_logliks[:, dm]                    # [C, sites]
    log_t = jnp.log(jnp.maximum(transition, 1e-300))
    log_init = jnp.log(jnp.maximum(initial, 1e-300))

    def step(delta, ll_col):
        # delta [C] best score ending in class j
        cand = delta[:, None] + log_t                      # [from, to]
        best = jnp.max(cand, axis=0) + ll_col
        arg = jnp.argmax(cand, axis=0).astype(jnp.int32)
        return best, arg

    delta0 = log_init + site_ll[:, 0]
    delta, backptr = jax.lax.scan(step, delta0, site_ll[:, 1:].T)
    last = jnp.argmax(delta).astype(jnp.int32)
    score = delta[last]

    def back(state, bp_col):
        prev = bp_col[state]
        return prev, state

    _, rev_path = jax.lax.scan(back, last, backptr, reverse=True)
    path = jnp.concatenate([rev_path, last[None]])
    return np.asarray(path), float(score)


def posterior_class_probabilities(
    class_site_logliks: jnp.ndarray,
    duplicate_map: np.ndarray,
    transition: jnp.ndarray,
    initial: jnp.ndarray,
) -> jnp.ndarray:
    """Forward-backward per-site class posteriors (reference:
    ``ConstructCategoryMatrix`` marginal modes over HMM categories,
    ``likefunc2.cpp:309``+).  Returns [sites, C]."""
    dm = jnp.asarray(np.asarray(duplicate_map, dtype=np.int32))
    site_ll = class_site_logliks[:, dm]
    log_t = jnp.log(jnp.maximum(transition, 1e-300))
    log_init = jnp.log(jnp.maximum(initial, 1e-300))

    def fstep(log_alpha, ll_col):
        prop = jax.scipy.special.logsumexp(log_alpha[:, None] + log_t, axis=0)
        new = prop + ll_col
        shift = jnp.max(new)
        return new - shift, new - shift

    first = log_init + site_ll[:, 0]
    first = first - jnp.max(first)
    _, alphas = jax.lax.scan(fstep, first, site_ll[:, 1:].T)
    alphas = jnp.concatenate([first[None], alphas], axis=0)  # [sites, C]

    def bstep(log_beta, ll_col):
        new = jax.scipy.special.logsumexp(
            log_t + (ll_col + log_beta)[None, :], axis=1
        )
        new = new - jnp.max(new)
        return new, new

    zero = jnp.zeros_like(first)
    _, betas = jax.lax.scan(bstep, zero, site_ll[:, 1:].T, reverse=True)
    betas = jnp.concatenate([betas, zero[None]], axis=0)

    post = alphas + betas
    post = post - jax.scipy.special.logsumexp(post, axis=1, keepdims=True)
    return jnp.exp(post)
