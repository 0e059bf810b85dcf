"""MEME — Mixed Effects Model of Evolution.

Reference: ``SelectionAnalyses/MEME.bf``.  Per site: a 2-class branch-site
mixture on tested branches — class 1: (alpha, beta- = omega_1 * alpha)
with weight p1; class 2: (alpha, beta+ free); background branches get a
FEL-style (alpha, beta_bg).  The null constrains beta+ := alpha; LRT
p-value uses the 2/3 - 2/3(0.45 chi2_1 + 0.55 chi2_2) mixture
(``MEME.bf:1656``).  A FEL fit per site seeds the MEME fit and is
reported alongside (``meme.handle_a_site``).

Per-branch empirical Bayes factors for the positive class come from
swapping each tested branch into a pure class and comparing to the
mixture likelihood (``meme.compute_branch_EBF``); the "# branches under
selection" column counts tested branches with EBF >= 100.

TPU structure: per-site fits are vmapped fixed-iteration Nelder-Mead over
patterns, sharded over the device mesh; branch-site mixtures use the
spectral mixture message kernel (no P materialization).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hyphy_tpu.io.json_out import analysis_json, model_fit_entry
from hyphy_tpu.methods import common
from hyphy_tpu.models.base import fill_diagonal_from_rows
from hyphy_tpu.models.parameters import ParamSpec
from hyphy_tpu.ops import expm as expm_ops
from hyphy_tpu.ops import pruning
from hyphy_tpu.optimize.batched import grid_best_starts
from hyphy_tpu.optimize.nelder_mead import vmapped_nelder_mead
from hyphy_tpu.parallel.mesh import sharded_site_solve

# FEL-style start grid for the per-site FEL pre-fit
_FEL_GRID = np.array(
    [(0.01, 0.1), (1.0, 0.1), (1.0, 0.5), (1.0, 1.0), (1.0, 5.0), (10.0, 0.1)]
)


def _progress(msg):
    if os.environ.get("HYPHY_TPU_PROGRESS", "1") != "0":
        print(f"[meme {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


@dataclasses.dataclass
class MEMEResult:
    json: Dict
    site_table: np.ndarray
    data: common.LoadedData
    gtr: common.GTRFit
    mg94: common.MG94Fit


def run(
    alignment: str,
    genetic_code: str = "Universal",
    tree: Optional[str] = None,
    branches: str = "All",
    pvalue: float = 0.1,
    precision: float = 1e-5,
) -> MEMEResult:
    data = common.load_codon_data(alignment, genetic_code, tree, branches)
    _progress("fitting nucleotide GTR")
    gtr = common.fit_gtr(data, precision=precision)
    _progress(f"GTR lnL {gtr.loglik:.3f}; fitting global MG94xREV")
    mg = common.fit_partitioned_mg94(data, gtr, precision=precision)
    _progress(f"MG94 lnL {mg.loglik:.3f}")

    filt = data.codon_filter
    tested = data.tested_branches
    has_background = bool((~tested).any())
    n_patterns = filt.n_patterns
    n_branches = data.tree.n_branches

    model = mg.model
    q_syn, q_non = model.basis_matrices(mg.params)
    rate_syn, rate_non = model.syn_nonsyn_unit_rates(mg.params)
    alpha_hat = jnp.asarray(mg.alphas)
    freqs = model.frequencies
    leaf_partials = jnp.asarray(filt.leaf_partials())
    pdata = pruning.build_pruning_data(data.tree)
    tested_j = jnp.asarray(tested.astype(np.float64))
    tested_idx = np.nonzero(tested)[0]

    # component layout: family 0 = negative class (omega1*alpha), family 1 =
    # positive class (beta+), family 2 = background (beta_bg)
    comp_index = np.zeros((n_branches, 2), dtype=np.int32)
    comp_index[:, 1] = 1
    comp_index[~tested] = 2
    comp_index_j = jnp.asarray(comp_index)

    def family_matrices(a, omega1, beta_plus, beta_bg):
        m = jnp.stack([
            a * q_syn + (omega1 * a) * q_non,
            a * q_syn + beta_plus * q_non,
            a * q_syn + beta_bg * q_non,
        ])
        return fill_diagonal_from_rows(m)

    def meme_site_loglik(i, p, forced_weights=None):
        """MEME mixture site lnL; forced_weights [B,2] overrides the class
        weights (for EBF computations)."""
        a = p["alpha"]
        bb = p["beta_bg"] if has_background else p["alpha"] * 0.0
        m = family_matrices(a, p["omega1"], p["beta_plus"], bb)
        left, lam, right = expm_ops.reversible_spectral(m, freqs)
        w1 = p["weight1"]
        if forced_weights is None:
            cw = jnp.stack([jnp.full((n_branches,), w1),
                            jnp.full((n_branches,), 1.0 - w1)], axis=1)
        else:
            cw = forced_weights
        cw = jnp.where(jnp.asarray(tested)[:, None], cw,
                       jnp.asarray([1.0, 0.0])[None, :])
        return pruning.single_site_log_likelihood_spectral_mixture(
            left, lam, right, comp_index_j, cw, alpha_hat,
            leaf_partials[:, i, :], freqs, pdata,
        )

    def fel_site_loglik(i, p):
        """FEL model: tested (alpha, beta_fg), background (alpha, beta_bg)."""
        betas = [p["beta_fg"]]
        if has_background:
            betas.append(p["beta_bg"])
        b = jnp.stack(betas)
        m = fill_diagonal_from_rows(
            p["alpha"] * q_syn[None] + b[:, None, None] * q_non[None]
        )
        left, lam, right = expm_ops.reversible_spectral(m, freqs)
        group = jnp.asarray(np.where(tested, 0, 1 if has_background else 0).astype(np.int32))
        return pruning.single_site_log_likelihood_spectral(
            left[group], lam[group], right[group], alpha_hat,
            leaf_partials[:, i, :], freqs, pdata,
        )

    # -- parameter spaces ---------------------------------------------------
    fel_specs = {
        "alpha": ParamSpec(init=1.0, lower=0.0, upper=10000.0),
        "beta_fg": ParamSpec(init=1.0, lower=0.0, upper=10000.0),
    }
    meme_specs = {
        "alpha": ParamSpec(init=1.0, lower=0.0, upper=10000.0),
        "omega1": ParamSpec(init=0.25, lower=0.0, upper=1.0),
        "weight1": ParamSpec(init=0.75, lower=0.0, upper=1.0),
        "beta_plus": ParamSpec(init=1.0, lower=0.0, upper=10000.0),
    }
    if has_background:
        fel_specs["beta_bg"] = ParamSpec(init=1.0, lower=0.0, upper=10000.0)
        meme_specs["beta_bg"] = ParamSpec(init=1.0, lower=0.0, upper=10000.0)
    null_specs = {k: v for k, v in meme_specs.items() if k != "beta_plus"}

    # -- stage 1: FEL pre-fit (separate jit: keeps each compile small) ------
    def solve_fel(idx, _init):
        fel_grid = {"alpha": jnp.asarray(_FEL_GRID[:, 0]),
                    "beta_fg": jnp.asarray(_FEL_GRID[:, 1])}
        if has_background:
            fel_grid["beta_bg"] = jnp.asarray(_FEL_GRID[:, 1])
        fel_starts, _ = grid_best_starts(fel_site_loglik, fel_grid, idx)
        fel_params, fel_lnl = vmapped_nelder_mead(
            fel_site_loglik, fel_specs, fel_starts, idx
        )
        fbg = fel_params["beta_bg"] if has_background else fel_params["alpha"]
        return fel_params["alpha"], fel_params["beta_fg"], fbg, fel_lnl

    _progress("stage 1: per-site FEL fits")
    fa, fb, fbg, fel_lnl = (
        np.array(x) for x in sharded_site_solve(solve_fel, {}, n_patterns)
    )
    _progress("stage 2: per-site MEME alternative fits")

    # -- stage 2: MEME alternative fit, seeded per meme.handle_a_site -------
    pos_case = fa < fb
    omega_rate = np.where(fa > 1e-5, fb / np.maximum(fa, 1e-5), 1.0)
    init0 = {
        "alpha": np.minimum(fa, 100.0),
        "omega1": np.clip(np.where(pos_case, 0.0, omega_rate), 0.0, 1.0),
        "weight1": np.where(pos_case, 0.25, 0.75),
        "beta_plus": np.where(pos_case, fb, np.maximum(0.1, 1.5 * fa)),
        "_fb": fb,
    }
    if has_background:
        init0["beta_bg"] = fbg
    # candidate rows (MEME.bf initial_guess_grid) relative to FEL estimates
    _CAND = [(1.0, None, None), (2.0, 0.5, 0.5), (4.0, 0.25, 0.25),
             (1.0, 0.5, 0.5), (1.0, 0.75, 0.8), (8.0, 0.5, 0.8),
             (1.0, 0.0, 0.01), (1.0, 0.0, 0.7)]

    def solve_alt(idx, init):
        n = idx.shape[0]
        fb_local = init["_fb"]
        base = {k: v for k, v in init.items() if k != "_fb"}

        def eval_cand(mult, om, wt):
            c = dict(base)
            c["beta_plus"] = jnp.maximum(fb_local * mult, 1e-4)
            if om is not None:
                c["omega1"] = jnp.full((n,), om)
                c["weight1"] = jnp.full((n,), wt)
            vals = jax.vmap(lambda j: meme_site_loglik(idx[j], {k: v[j] for k, v in c.items()}))(jnp.arange(n))
            return c, vals

        cands = [eval_cand(*row) for row in _CAND]
        cand_vals = jnp.stack([v for _, v in cands])
        best = jnp.argmax(cand_vals, axis=0)
        starts = {
            k: jnp.stack([c[k] for c, _ in cands])[best, jnp.arange(n)]
            for k in base
        }
        alt_params, alt_lnl = vmapped_nelder_mead(
            meme_site_loglik, meme_specs, starts, idx
        )
        return tuple(alt_params[k] for k in sorted(meme_specs)) + (alt_lnl,)

    alt_out = sharded_site_solve(solve_alt, init0, n_patterns)
    alt_params = {k: np.array(v) for k, v in zip(sorted(meme_specs), alt_out[:-1])}
    alt_lnl = np.array(alt_out[-1])
    alpha, omega1 = alt_params["alpha"], alt_params["omega1"]
    weight1, beta_plus = alt_params["weight1"], alt_params["beta_plus"]

    # -- stage 3: null fit (beta_plus := alpha) -----------------------------
    def solve_null(idx, init):
        def null_loglik(i, p):
            merged = dict(p)
            merged["beta_plus"] = jnp.maximum(p["alpha"], 1e-4)
            return meme_site_loglik(i, merged)

        null_params, null_lnl = vmapped_nelder_mead(
            null_loglik, null_specs, init, idx
        )
        return (null_lnl,)

    _progress("stage 3: per-site null fits")
    null_init = {k: v for k, v in alt_params.items() if k != "beta_plus"}
    # alpha = 0 is a logit-space trap (vanishing steps at the bound); start
    # the null from the FEL-style blend of alt alpha and beta+ (the
    # reference resets alpha to 1e-4 and relies on native-space NM steps)
    null_init["alpha"] = (
        np.minimum(alpha, 100.0) + 3.0 * np.minimum(beta_plus, 100.0)
    ) / 4.0
    (null_lnl,) = (np.array(x) for x in sharded_site_solve(solve_null, null_init, n_patterns))

    # -- stage 4: branch EBFs (meme.compute_branch_EBF): force each tested
    # branch into the negative class; posterior_+ = 1 - w1 L_neg / L_mix ----
    ebf_init = dict(alt_params)
    ebf_init["_lnl"] = alt_lnl

    def solve_ebf(idx, init):
        n = idx.shape[0]

        def one_site(j):
            p_j = {k: init[k][j] for k in alt_params}
            w1 = p_j["weight1"]

            def one_branch(b):
                fw = jnp.stack([
                    jnp.full((n_branches,), w1),
                    jnp.full((n_branches,), 1.0 - w1),
                ], axis=1)
                fw = fw.at[b].set(jnp.asarray([1.0, 0.0]))
                return meme_site_loglik(idx[j], p_j, forced_weights=fw)

            return jax.vmap(one_branch)(jnp.asarray(tested_idx))

        forced_lnl = jax.vmap(one_site)(jnp.arange(n))       # [n, n_tested]
        w1 = init["weight1"]
        post_neg = w1[:, None] * jnp.exp(forced_lnl - init["_lnl"][:, None])
        post_pos = jnp.clip(1.0 - post_neg, 0.0, 1.0)
        prior_pos = 1.0 - w1
        # degenerate weights: EBF := 1 (meme.compute_branch_EBF: zero
        # prior odds => eBF = 1)
        degenerate = (prior_pos <= 1e-12) | (prior_pos >= 1.0 - 1e-12)
        ebf = (post_pos / jnp.maximum(1.0 - post_pos, 1e-300)) * (
            (1.0 - prior_pos) / jnp.maximum(prior_pos, 1e-300)
        )[:, None]
        ebf = jnp.where(degenerate[:, None], 1.0, ebf)
        return (ebf,)

    _progress("stage 4: branch EBFs")
    (ebf,) = (np.array(x) for x in sharded_site_solve(solve_ebf, ebf_init, n_patterns))
    _progress("assembling results")

    # total tested branch length at the alternative fit
    mean_beta = weight1 * omega1 * alpha + (1.0 - weight1) * beta_plus
    bl = (
        alpha[:, None] * float(rate_syn) + mean_beta[:, None] * float(rate_non)
    ) * np.asarray(alpha_hat)[None, :] / 3.0
    total_bl = bl @ np.asarray(tested_j)
    fel_alpha, fel_beta = fa, fb

    # LRT + p-values; sites failing the positive-evidence condition get
    # Null = alternative (MEME.bf else-branch)
    condition = (beta_plus > alpha) & ((1.0 - weight1) > 1e-6)
    lrt = np.where(condition, np.maximum(2.0 * (alt_lnl - null_lnl), 0.0), 0.0)
    pvals = np.array([
        2.0 / 3.0 - 2.0 / 3.0 * (
            0.45 * (1.0 - common.chi2_sf(x, 1)) + 0.55 * (1.0 - common.chi2_sf(x, 2))
        )
        for x in lrt
    ])
    n_branches_sel = (ebf >= 100.0).sum(axis=1).astype(float)
    n_branches_sel = np.where(condition, n_branches_sel, 0.0)

    constant = filt.constant_pattern_mask()
    beta_minus = omega1 * alpha
    meme_logl = alt_lnl
    fel_logl = fel_lnl
    lrt_meme_fel = np.maximum(2.0 * (alt_lnl - fel_lnl), 0.0)

    cols = [alpha, beta_minus, weight1, beta_plus, 1.0 - weight1, lrt, pvals,
            n_branches_sel, total_bl, meme_logl, fel_logl, lrt_meme_fel,
            fel_alpha, fel_beta]
    for arr, cval in zip(cols, (0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0)):
        arr[constant] = cval

    dup = filt.duplicate_map
    site_table = np.stack([c[dup] for c in cols], axis=1)

    headers = [
        ["&alpha;", "Synonymous substitution rate at a site"],
        ["&beta;<sup>1</sup>", "Non-synonymous substitution rate at a site for the negative/neutral evolution component 1"],
        ["p<sup>1</sup>", "Mixture distribution weight allocated to negative/neutral evolution component 1"],
        ["&beta;<sup>+</sup>", "Non-synonymous substitution rate at a site for the positive selection component"],
        ["p<sup>+</sup>", "Mixture distribution weight allocated to the positive selection component"],
        ["LRT", "Likelihood ratio test statistic for episodic diversification"],
        ["p-value", "Asymptotic p-value for episodic diversification"],
        ["# branches under selection", "Number of tested branches with EBF >= 100 for the positive class"],
        ["Total branch length", "The total length of branches contributing to inference at this site"],
        ["MEME LogL", "Site Log-likelihood under the MEME model"],
        ["FEL LogL", "Site Log-likelihood under the FEL model"],
        ["LRT MEME vs FEL", "Likelihood ratio test statistic for MEME vs FEL"],
        ["FEL &alpha;", "Synonymous substitution rate under the FEL model"],
        ["FEL &beta;", "Non-synonymous substitution rate under the FEL model"],
    ]

    json = analysis_json(
        info="MEME (Mixed Effects Model of Evolution) estimates a site-wise "
             "synonymous rate and a mixture of two omega classes on tested branches",
        version="3.0",
        data=data,
        fits={
            "Nucleotide GTR": model_fit_entry(
                gtr.loglik, gtr.n_parameters, data.sample_size,
                frequencies=gtr.frequencies, display_order=0,
            ),
            "Global MG94xREV": model_fit_entry(
                mg.loglik, mg.n_parameters, data.sample_size,
                frequencies=mg.codon_freqs, display_order=1,
                rate_distributions={
                    f"non-synonymous/synonymous rate ratio for *{name}*":
                        [[float(mg.omegas[g]), 1.0]]
                    for g, name in enumerate(data.group_names)
                },
            ),
        },
        extra={"MLE": {"headers": headers, "content": {"0": site_table.tolist()}}},
    )
    return MEMEResult(json=json, site_table=site_table, data=data, gtr=gtr, mg94=mg)
