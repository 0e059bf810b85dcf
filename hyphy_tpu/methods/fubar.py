"""FUBAR — Fast Unconstrained Bayesian AppRoximation.

Reference: ``SelectionAnalyses/FUBAR.bf`` + ``modules/grid_compute.ibf``.
Pipeline: GTR fit -> 20x20 (alpha, beta) rate grid (70% of points linear
in [0,1], remainder cubic to 50) -> per-grid-point site log-likelihood
vectors (theta fixed at GTR MLEs, CF3x4 frequencies, branch rates
proportional to GTR branch lengths) -> Dirichlet-prior posterior over grid
weights via 0th-order variational Bayes (default), collapsed Gibbs, or
MCMC -> per-site P(beta > alpha) and empirical Bayes factors.

TPU structure: the grid's 400 likelihood-vector evaluations are one
mesh-sharded batched pruning call (the reference runs them serially or
over an MPI queue, ``grid_compute.ibf:3-52``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hyphy_tpu.io.json_out import analysis_json, model_fit_entry
from hyphy_tpu.methods import common
from hyphy_tpu.models import frequencies as freq_mod
from hyphy_tpu.models.base import fill_diagonal_from_rows
from hyphy_tpu.models.codon import MG94Base
from hyphy_tpu.ops import expm as expm_ops
from hyphy_tpu.ops import pruning
from hyphy_tpu.parallel.mesh import sharded_site_solve


def alpha_beta_grid(points: int = 20, non_zero: bool = False) -> np.ndarray:
    """(alpha, beta) grid (fubar.DefineAlphaBetaGrid, FUBAR.bf:799)."""
    points = max(points, 5)
    neg = int(points * 0.7 + 0.5)
    pos = int((points - 1) * 0.3)
    if neg + pos != points:
        pos = points - neg
    one_d = np.zeros(points)
    one_d[:neg] = np.arange(neg) / neg
    one_d[neg - 1] = 1.0
    step = 49.0 ** (1.0 / 3.0) / pos
    for k in range(1, pos + 1):
        one_d[neg + k - 1] = 1.0 + (step * k) ** 3
    grid = np.array([(a, b) for a in one_d for b in one_d])
    if non_zero:
        mn = max(1e-3, one_d[0])
        grid[:, 0] = np.maximum(grid[:, 0], mn)
    return grid


def grid_site_loglik_matrix(
    data: common.LoadedData,
    grid: np.ndarray,
    precision: float = 1e-5,
    cache: Optional[str] = None,
    fingerprint_extra: str = "",
):
    """[G, patterns] site log-likelihood vectors over an (alpha, beta)
    grid — phases 1-2 shared by the FUBAR family (FUBAR, FADE's ancestor,
    B-STILL): GTR fit -> branch scaling -> one batched pruning call per
    grid point, grid-sharded over the mesh (reference: ``ComputeOnGrid``,
    ``modules/grid_compute.ibf:3-52``).

    Returns ``(sll [G, patterns], gtr, rate_syn, rate_non)`` where the
    unit rates satisfy blexpr(alpha, beta) = alpha*rate_syn +
    beta*rate_non (the model's branch-length expression at the GTR
    thetas, ``matrix.cpp:2644``).
    """
    gc = data.genetic_code
    filt = data.codon_filter

    if cache is not None and not cache.endswith(".npz"):
        cache = cache + ".npz"
    fingerprint = "|".join([
        str(filt.n_patterns), str(data.tree.n_leaves),
        data.genetic_code.name, fingerprint_extra,
    ])
    grid_key = np.asarray(grid, np.float64)
    cached = None
    if cache is not None and os.path.exists(cache):
        loaded = np.load(cache)
        if (
            "fingerprint" in loaded.files
            and str(loaded["fingerprint"]) == fingerprint
            and "grid" in loaded.files
            and loaded["grid"].shape == grid_key.shape
            and np.allclose(loaded["grid"], grid_key)
        ):
            cached = loaded

    gtr = common.fit_gtr(data, precision=precision)
    corners, codon_freqs = freq_mod.cf3x4(filt, gc)
    model = MG94Base(gc, corners, codon_freqs)
    theta = {k: jnp.asarray(v) for k, v in gtr.params.items() if k.startswith("theta")}
    q_syn, q_non = model.basis_matrices(theta)
    rate_syn, rate_non = model.syn_nonsyn_unit_rates(theta)
    if cached is not None:
        return np.asarray(cached["sll"]), gtr, float(rate_syn), float(rate_non)

    freqs = model.frequencies
    pdata = pruning.build_pruning_data(data.tree)
    lp = jnp.asarray(filt.leaf_partials())
    weights = jnp.asarray(filt.pattern_weights)

    # branch scale solving BL(alpha=beta=c) = 3 * gtr_bl against the raw
    # (un-divided) branch length expression (fubar.scalers.SetBranchLength:
    # FindRoot) => c = 3 * bl / (rate_syn + rate_non); verified against the
    # reference binary's "best scaling (1,1)" on CD2
    c_b = jnp.asarray(3.0 * gtr.branch_lengths / float(rate_syn + rate_non))
    n_grid = len(grid)
    grid_j = jnp.asarray(grid)

    def make_solver(c_b):
        def grid_site_logliks(i, _init):
            def one(g):
                a, b = grid_j[g, 0], grid_j[g, 1]
                m = fill_diagonal_from_rows(a * q_syn + b * q_non)
                left, lam, right = expm_ops.reversible_spectral(m, freqs)
                p = expm_ops.spectral_propagators(left, lam, right, c_b)
                return pruning.site_log_likelihoods(p, lp, freqs, pdata)

            return (jax.vmap(one)(i),)

        return grid_site_logliks

    # pass 1: best overall scaling on the grid (FUBAR.bf:280-292)
    (sll,) = sharded_site_solve(make_solver(c_b), {}, n_grid)
    total = sll @ np.asarray(weights)
    best = int(np.argmax(total))
    a_hat, b_hat = grid[best]
    # rebase branch scales at the best grid point: the per-branch synRate
    # values at (a_hat, b_hat) become the new proportionality constants
    c_rebased = float((a_hat * rate_syn + b_hat * rate_non) / (rate_syn + rate_non))
    c_b = c_b * c_rebased

    # pass 2: conditional site likelihood vectors on the rebased tree
    (sll,) = sharded_site_solve(make_solver(c_b), {}, n_grid)
    if cache is not None:
        np.savez(
            cache, sll=np.asarray(sll), grid=grid_key, fingerprint=fingerprint,
        )
    return np.asarray(sll), gtr, float(rate_syn), float(rate_non)


@dataclasses.dataclass
class FUBARResult:
    json: Dict
    site_table: np.ndarray       # [sites, 6] (VB0)
    grid: np.ndarray             # [G, 2]
    posterior_weights: np.ndarray  # [G]
    data: common.LoadedData
    gtr: common.GTRFit


def run(
    alignment: str,
    genetic_code: str = "Universal",
    tree: Optional[str] = None,
    branches: str = "All",
    grid_points: int = 20,
    method: str = "Variational-Bayes",
    concentration: float = 0.5,
    chain_length: int = 2_000_000,
    burn_in: int = 1_000_000,
    samples: int = 100,
    posterior: float = 0.9,
    precision: float = 1e-5,
    seed: int = 0,
    cache: Optional[str] = None,
) -> FUBARResult:
    """``cache``: path to a resumable checkpoint (reference fubar.cache,
    FUBAR.bf:160-236) holding the grid and conditional likelihood vectors;
    phases 1-2 are skipped when it exists and matches the settings."""
    data = common.load_codon_data(alignment, genetic_code, tree, branches)
    filt = data.codon_filter

    grid = alpha_beta_grid(grid_points)
    sll, gtr, _, _ = grid_site_loglik_matrix(
        data, grid, precision=precision, cache=cache,
        fingerprint_extra="|".join(
            [os.path.basename(alignment), branches, "fubar"]
        ),
    )

    # expand patterns -> sites; normalize per site (ConvertToConditionals)
    sll_sites = sll[:, filt.duplicate_map]               # [G, sites]
    mx = sll_sites.max(axis=0, keepdims=True)
    cond = np.exp(sll_sites - mx)
    cond /= cond.sum(axis=0, keepdims=True)
    n_sites = cond.shape[1]

    # posterior over grid weights (shared machinery, grid_compute.ibf)
    from hyphy_tpu.methods.grid_bayes import posterior_over_grid

    posterior_mean, _ = posterior_over_grid(
        method, cond, concentration, chain_length, burn_in, samples,
        rng=np.random.default_rng(seed),
    )

    # per-site statistics (FUBAR.bf phase 4)
    p_ks = posterior_mean @ cond                         # [sites]
    alpha_col = (posterior_mean * grid[:, 0]) @ cond / p_ks
    beta_col = (posterior_mean * grid[:, 1]) @ cond / p_ks
    pos_stencil = (grid[:, 0] < grid[:, 1]).astype(float)
    neg_stencil = (grid[:, 0] > grid[:, 1]).astype(float)
    p_pos = (posterior_mean * pos_stencil) @ cond / p_ks
    p_neg = (posterior_mean * neg_stencil) @ cond / p_ks
    weight_non_positive = posterior_mean[grid[:, 0] >= grid[:, 1]].sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        if 0 < weight_non_positive < 1:
            bf = p_pos / (1 - p_pos) / (1 - weight_non_positive) * weight_non_positive
        else:
            bf = np.ones(n_sites)

    site_table = np.stack(
        [alpha_col, beta_col, beta_col - alpha_col, p_neg, p_pos, bf], axis=1
    )

    headers = [
        ["alpha", "Mean posterior synonymous substitution rate at a site"],
        ["beta", "Mean posterior non-synonymous substitution rate at a site"],
        ["beta-alpha", "Mean posterior beta-alpha"],
        ["Prob[alpha>beta]", "Posterior probability of negative selection at a site"],
        ["Prob[alpha<beta]", "Posterior probability of positive selection at a site"],
        ["BayesFactor[alpha<beta]", "Empiricial Bayes Factor for positive selection at a site"],
    ]

    json = analysis_json(
        info="FUBAR (Fast Unconstrained Bayesian AppRoximation) estimates site "
             "rates using a flexible random effects prior on a rate grid",
        version="2.2",
        data=data,
        fits={
            "Nucleotide GTR": model_fit_entry(
                gtr.loglik, gtr.n_parameters, data.sample_size,
                frequencies=gtr.frequencies, display_order=0,
            ),
        },
        extra={
            "MLE": {"headers": headers, "content": {"0": site_table.tolist()}},
            "grid": np.column_stack([grid, posterior_mean]).tolist(),
            "settings": {
                "grid size": grid_points, "method": method,
                "concentration": concentration, "posterior": posterior,
            },
        },
    )
    return FUBARResult(
        json=json, site_table=site_table, grid=grid,
        posterior_weights=posterior_mean, data=data, gtr=gtr,
    )
