"""FADE — FUBAR Approach to Directional Evolution (protein alignments).

Reference: ``res/TemplateBatchFiles/SelectionAnalyses/FADE.bf``.  Tests
whether sites evolve *toward* a particular residue along test branches at
accelerated rates.  Requires a **rooted** tree (FADE.bf:191) — the biased
process is non-stationary, so the root placement matters.

Model (fade.rate.modifier, FADE.bf:359-377): on test branches,

    q_xy = rate * q_xy^base * bias/(1 - e^-bias)   if y == target
    q_xy = rate * q_xy^base * bias/(e^bias - 1)    if x == target
    q_xy = rate * q_xy^base                        otherwise

Background branches keep the baseline model.  The biased generator is
reversible w.r.t. the tilted frequencies pi'_x ∝ pi_x * e^{bias·[x=target]}
(detailed balance holds because the two bias factors differ by e^bias), so
the batched spectral expm applies; root frequencies stay at the baseline
pi (non-stationarity).

Per target residue: site likelihood vectors on a 20x20 (rate, bias) grid
(fade.DefineGrid, FADE.bf:891-938; bias=0 column = no-bias cells), then a
Dirichlet-prior posterior over grid weights (VB0 / collapsed Gibbs / MH —
shared ``grid_bayes`` machinery), per-site Prob[bias>0] and Bayes factors
(FADE.bf:426-447).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hyphy_tpu.data.alignment import read_alignment
from hyphy_tpu.data.filter import DataFilter
from hyphy_tpu.data.genetic_code import AMINO_ACIDS
from hyphy_tpu.likelihood import LikelihoodFunction, Partition
from hyphy_tpu.methods.grid_bayes import posterior_over_grid
from hyphy_tpu.models import frequencies as freq_mod
from hyphy_tpu.models.base import fill_diagonal_from_rows
from hyphy_tpu.models.protein import EmpiricalProtein
from hyphy_tpu.ops import expm as expm_ops
from hyphy_tpu.ops import pruning
from hyphy_tpu.parallel.mesh import sharded_site_solve
from hyphy_tpu.tree.topology import Tree
from hyphy_tpu.io.json_out import model_fit_entry


def define_grid(points: int = 20) -> np.ndarray:
    """(rate, bias) grid (fade.DefineGrid, FADE.bf:891-938)."""
    points = max(points, 5)
    below1 = int(points * 0.7 + 0.5)
    above1 = points - below1
    rate_1d = np.zeros(points)
    bias_1d = np.zeros(points)
    for k in range(below1):
        bias_1d[k] = k / below1
        rate_1d[k] = (k + 1) / (below1 + 1)
    rate_1d[below1 - 1] = 1.0
    bias_1d[below1 - 1] = 1.0
    step = 49.0 ** (1.0 / 3.0) / above1
    for k in range(1, above1 + 1):
        bias_1d[below1 + k - 1] = 1.0 + (step * k) ** 3
        rate_1d[below1 + k - 1] = 1.0 + (step * k) ** 3
    grid = np.array([(r, b) for r in rate_1d for b in bias_1d])
    grid[0] = (0.0, 0.0)
    grid[1, 1] = 0.0
    return grid


@dataclasses.dataclass
class FADEResult:
    json: Dict
    site_tables: Dict[str, np.ndarray]   # per residue [sites, 4]
    headers: List
    grid: np.ndarray
    baseline_loglik: float


def _bias_factors(bias: jnp.ndarray):
    """(toward, away) multipliers; both -> 1 as bias -> 0."""
    b = jnp.maximum(bias, 1e-10)
    toward = b / -jnp.expm1(-b)       # bias/(1 - e^-bias)
    away = b / jnp.expm1(b)           # bias/(e^bias - 1)
    return toward, away


def run(
    alignment: str,
    model: str = "WAG",
    tree: Optional[str] = None,
    branches: str = "All",
    grid_points: int = 20,
    method: str = "Variational-Bayes",
    concentration: float = 0.5,
    chain_length: int = 2_000_000,
    burn_in: int = 1_000_000,
    samples: int = 100,
    posterior_threshold: float = 0.9,
    precision: float = 1e-5,
    seed: int = 0,
    residues: Optional[str] = None,
) -> FADEResult:
    aln = read_alignment(alignment)
    filt = DataFilter.from_alignment(aln, "protein")
    if tree is None:
        if not aln.trees:
            raise ValueError("no tree in alignment file; pass tree")
        tree = next(iter(aln.trees.values()))
    tr = Tree.from_newick(tree, leaf_order=filt.names)
    tested = tr.select_branches(branches)

    # baseline fit (+F frequencies), free branch lengths (FADE.bf:246)
    mdl = EmpiricalProtein(model, frequencies=freq_mod.empirical_character(filt))
    lf = LikelihoodFunction([Partition(filt, tr, mdl)])
    init = {}
    if np.isfinite(tr.input_lengths[:-1]).all():
        init["t"] = jnp.asarray(np.maximum(tr.input_lengths[:-1], 1e-6))
    res = lf.fit(init=init, precision=precision)
    t_hat = jnp.asarray(res.params["t"])

    pi = mdl.frequencies
    s_pi = jnp.asarray(mdl.exchangeabilities) * pi[None, :]   # baseline off-diag
    q_base = fill_diagonal_from_rows(s_pi)
    base_left, base_lam, base_right = expm_ops.reversible_spectral(
        q_base[None], pi
    )
    pdata = pruning.build_pruning_data(tr)
    lp = jnp.asarray(filt.leaf_partials())
    pattern_weights = np.asarray(filt.pattern_weights)
    tested_idx = jnp.asarray(tested.astype(np.int32))         # 1 = biased model

    grid = define_grid(grid_points)
    grid_j = jnp.asarray(grid)
    n_grid = len(grid)
    dup = filt.duplicate_map
    n_sites = len(dup)

    headers = [
        ["rate", "Mean posterior relative rate at a site"],
        ["bias", "Mean posterior bias parameter at a site"],
        ["Prob[bias>0]", "Posterior probability of substitution bias"],
        ["BayesFactor[bias>0]", "Empiricial Bayes Factor for substitution bias"],
    ]

    bias_positive = grid[:, 1] > 0
    prior_pos = bias_positive.mean()

    site_tables: Dict[str, np.ndarray] = {}
    site_annotations = {}
    rng = np.random.default_rng(seed)

    targets = (
        [AMINO_ACIDS.index(r) for r in residues] if residues else range(20)
    )
    for target in targets:
        residue = AMINO_ACIDS[target]

        def grid_site_logliks(gi, _init, target=target):
            def one(g):
                rate, bias = grid_j[g, 0], grid_j[g, 1]
                toward, away = _bias_factors(bias)
                onehot = jnp.zeros(20).at[target].set(1.0)
                mult = (
                    1.0
                    + (toward - 1.0) * onehot[None, :]
                    + (away - 1.0) * onehot[:, None]
                )
                biased = fill_diagonal_from_rows(rate * s_pi * mult)
                pi_tilt = pi * jnp.exp(
                    jnp.maximum(bias, 1e-10) * onehot
                )
                pi_tilt = pi_tilt / pi_tilt.sum()
                b_left, b_lam, b_right = expm_ops.reversible_spectral(
                    biased[None], pi_tilt
                )
                left = jnp.stack([base_left[0], b_left[0]])[tested_idx]
                lam = jnp.stack([base_lam[0], b_lam[0]])[tested_idx]
                right = jnp.stack([base_right[0], b_right[0]])[tested_idx]
                p = expm_ops.spectral_propagators(left, lam, right, t_hat)
                return pruning.site_log_likelihoods(p, lp, pi, pdata)

            return (jax.vmap(one)(gi),)

        (sll,) = sharded_site_solve(grid_site_logliks, {}, n_grid)
        sll_sites = sll[:, dup]
        mx = sll_sites.max(axis=0, keepdims=True)
        cond = np.exp(sll_sites - mx)
        cond /= cond.sum(axis=0, keepdims=True)

        post_mean, _ = posterior_over_grid(
            method, cond, concentration, chain_length, burn_in, samples,
            site_weights=np.ones(n_sites), rng=rng,
        )

        p_ks = post_mean @ cond
        rate_col = (post_mean * grid[:, 0]) @ cond / p_ks
        bias_col = (post_mean * grid[:, 1]) @ cond / p_ks
        p_pos = (post_mean * bias_positive) @ cond / p_ks
        prior_mass = post_mean[bias_positive].sum()
        with np.errstate(divide="ignore", invalid="ignore"):
            if 0 < prior_mass < 1:
                bf = (p_pos / np.maximum(1 - p_pos, 1e-12)) * (1 - prior_mass) / prior_mass
            else:
                bf = np.ones(n_sites)
        site_tables[residue] = np.stack([rate_col, bias_col, p_pos, bf], axis=1)
        site_annotations[residue] = int((p_pos >= posterior_threshold).sum())

    json = {
        "analysis": {
            "info": "FADE (FUBAR Approach to Directional Evolution) tests "
                    "whether sites evolve towards a particular residue along "
                    "a subset of branches",
            "version": "0.2",
        },
        "input": {
            "file name": alignment,
            "number of sequences": filt.n_sequences,
            "number of sites": n_sites,
            "partition count": 1,
        },
        "fits": {
            f"{model}+F": model_fit_entry(
                res.loglik, res.n_free_parameters,
                n_sites * filt.n_sequences,
                frequencies=np.asarray(pi), display_order=0,
            ),
        },
        "MLE": {
            "headers": headers,
            "content": {
                residue: {"0": tbl.tolist()} for residue, tbl in site_tables.items()
            },
        },
        "site annotations": site_annotations,
        "settings": {
            "grid size": grid_points, "method": method,
            "concentration": concentration,
            "posterior": posterior_threshold,
        },
    }
    return FADEResult(
        json=json, site_tables=site_tables, headers=headers,
        grid=grid, baseline_loglik=res.loglik,
    )
