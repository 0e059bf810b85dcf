"""MEME — Mixed Effects Model of Evolution.

Reference: ``SelectionAnalyses/MEME.bf``.  Per site: a K-class branch-site
mixture on tested branches (K = ``rate_classes``, MEME.bf:134) — classes
1..K-1: (alpha, beta_i = omega_i * alpha, omega_i in [0,1]) with
stick-breaking weights (MEME.bf:498-513); class K: beta+ free;
background branches get a FEL-style (alpha, beta_bg).  The null
constrains beta+ := alpha; the LRT p-value uses the
2/3 - 2/3(0.45 chi2_1 + 0.55 chi2_2) mixture (``MEME.bf:1656``) or a
parametric bootstrap when ``resample`` > 0 (``MEME.bf:1662``:
p = (1 + #{LRT_sim >= LRT}) / (1 + N), sims drawn from each site's null
fit).  A FEL fit per site seeds the MEME fit and is reported alongside
(``meme.handle_a_site``).

Per-branch empirical Bayes factors for the positive class come from
forcing each tested branch into each non-positive class and comparing to
the mixture likelihood (``meme.compute_branch_EBF``, MEME.bf:886); the
"# branches under selection" column counts tested branches with
EBF >= 100.

``multiple_hits``: "Double"/"Double+Triple" adds 2- (delta) and 3-hit
(psi) rates (MEME.bf:140-155); ``site_multihit`` = "Estimate" frees them
per site, "Global" plugs in the global-fit MLEs (MEME.bf:478-481).

TPU structure: per-site fits are vmapped fixed-iteration Nelder-Mead over
patterns, sharded over the device mesh; branch-site mixtures use the
spectral mixture message kernel (no P materialization).  Bootstrap
replicates are folded into the same vmapped batch as extra columns.
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


def _stick_weights(ws):
    """[K-1] stick-breaking aux -> [K] class weights (BS_REL.bf:313-351)."""
    ws = jnp.asarray(ws)
    k1 = ws.shape[0]
    remaining = jnp.concatenate([jnp.ones(1), jnp.cumprod(1.0 - ws)])
    return jnp.concatenate([ws * remaining[:k1], remaining[k1:]])


def run(
    alignment: str,
    genetic_code: str = "Universal",
    tree: Optional[str] = None,
    branches: str = "All",
    pvalue: float = 0.1,
    precision: float = 1e-5,
    rate_classes: int = 2,
    resample: int = 0,
    resample_seed: int = 0,
    multiple_hits: str = "None",
    site_multihit: str = "Estimate",
) -> MEMEResult:
    if not (2 <= rate_classes <= 4):
        raise ValueError("rate_classes must be in [2, 4] (MEME.bf:135)")
    K = rate_classes
    mh = multiple_hits not in (None, "None", "")
    mh_triple = multiple_hits == "Double+Triple"
    mh_est = mh and site_multihit == "Estimate"

    md = common.load_codon_data_multi(alignment, genetic_code, tree, branches)
    _progress(f"{md.n_partitions} partition(s); fitting nucleotide GTR")
    gtr = common.fit_gtr_multi(md, precision=precision)
    md, gtr = common.kill_zero_branches_multi(md, gtr, branches)
    _progress(f"GTR lnL {gtr.loglik:.3f}; fitting global MG94xREV")
    mg = common.fit_partitioned_mg94_multi(
        md, gtr, precision=precision, multiple_hits=multiple_hits
    )
    _progress(f"MG94 lnL {mg.loglik:.3f}")

    def _solve_partition(data, mgp):

        filt = data.codon_filter
        tested = data.tested_branches
        has_background = bool((~tested).any())
        n_patterns = filt.n_patterns
        n_branches = data.tree.n_branches

        model = mgp.model
        delta_hat = float(mgp.params.get("delta", 0.0)) if mh else 0.0
        psi_hat = float(mgp.params.get("psi", 0.0)) if mh_triple else 0.0
        if mh:
            q_syn, q_non = model.combined_basis_matrices(mgp.params)
            q1_syn, q1_non = model.basis_matrices(mgp.params)
            q2_syn, q2_non = model.multihit_basis_matrices(mgp.params, 2)
            q3 = model.multihit_basis_matrices(mgp.params, 3) if mh_triple else None
        else:
            q_syn, q_non = model.basis_matrices(mgp.params)
        rate_syn = float(q_syn.sum(-1) @ model.frequencies)
        rate_non = float(q_non.sum(-1) @ model.frequencies)
        from hyphy_tpu.config import settings as _settings

        dtype = _settings.likelihood_dtype()
        use_spectral = dtype == jnp.float64  # fp32 eigh: ~1e-2 error on 61-state Q
        alpha_hat = jnp.asarray(mgp.alphas, dtype)
        freqs = model.frequencies.astype(dtype)
        leaf_partials = jnp.asarray(filt.leaf_partials(), dtype)
        pdata = pruning.build_pruning_data(data.tree)
        tested_j = jnp.asarray(tested.astype(np.float64))
        tested_idx = np.nonzero(tested)[0]

        # component layout: families 0..K-1 = tested-branch omega classes
        # (0..K-2 negative/neutral, K-1 positive), family K = background
        comp_index = np.tile(np.arange(K, dtype=np.int32), (n_branches, 1))
        comp_index[~tested] = K
        comp_index_j = jnp.asarray(comp_index)
        bg_onehot = jnp.asarray([1.0] + [0.0] * (K - 1))

        def _bases(p):
            if not mh_est:
                return q_syn, q_non
            d = p["delta"]
            qs = q1_syn + d * q2_syn
            qn = q1_non + d * q2_non
            if mh_triple:
                qs = qs + p["psi"] * q3[0]
                qn = qn + p["psi"] * q3[1]
            return qs, qn

        def family_matrices(p):
            qs, qn = _bases(p)
            a = p["alpha"]
            bb = p["beta_bg"] if has_background else p["alpha"] * 0.0
            betas = [p[f"omega_{i}"] * a for i in range(1, K)] + [p["beta_plus"], bb]
            m = jnp.stack([a * qs + b * qn for b in betas])
            return fill_diagonal_from_rows(m)

        def meme_site_loglik(i, p, forced_weights=None, lp=None):
            """MEME mixture site lnL; forced_weights [B,K] overrides the class
            weights (for EBF computations); ``lp`` overrides the leaf-partials
            tensor (bootstrap replicates)."""
            lp = leaf_partials if lp is None else lp
            m = family_matrices(p).astype(dtype)
            if forced_weights is None:
                w = _stick_weights(jnp.stack([p[f"w_{i}"] for i in range(1, K)]))
                cw = jnp.broadcast_to(w[None, :], (n_branches, K))
            else:
                cw = forced_weights
            cw = jnp.where(jnp.asarray(tested)[:, None], cw, bg_onehot[None, :])
            if not use_spectral:
                # fp32/TPU: per-family Taylor expm as VECTOR actions mixed
                # per branch (matrix.cpp:9974 analogue; no [B,S,S] tensors)
                qn_f, m2p_f, r_f, j_f = jax.vmap(
                    lambda mf: expm_ops.taylor_action_factors(mf, alpha_hat)
                )(m)                                         # [Fam,...],[Fam,B]
                n_fam = m.shape[0]
                # dense per-branch family weights from (comp_index, cw)
                w_dense = jnp.zeros((n_branches, n_fam), dtype)
                w_dense = w_dense.at[
                    jnp.repeat(jnp.arange(n_branches), K),
                    comp_index_j.reshape(-1),
                ].add(cw.astype(dtype).reshape(-1))
                return pruning.single_site_log_likelihood_taylor(
                    qn_f, m2p_f, r_f.T, j_f.T,
                    jnp.zeros(n_branches, jnp.int32),
                    expm_ops.taylor_action_terms(dtype),
                    lp[:, i, :], freqs, pdata,
                    mix_weights=w_dense,
                )
            left, lam, right = expm_ops.reversible_spectral(m, freqs)
            return pruning.single_site_log_likelihood_spectral_mixture(
                left, lam, right, comp_index_j, cw, alpha_hat,
                lp[:, i, :], freqs, pdata,
            )

        def fel_site_loglik(i, p, lp=None):
            """FEL model: tested (alpha, beta_fg), background (alpha, beta_bg)."""
            lp = leaf_partials if lp is None else lp
            qs, qn = _bases(p)
            betas = [p["beta_fg"]]
            if has_background:
                betas.append(p["beta_bg"])
            b = jnp.stack(betas)
            m = fill_diagonal_from_rows(
                p["alpha"] * qs[None] + b[:, None, None] * qn[None]
            ).astype(dtype)
            group = jnp.asarray(np.where(tested, 0, 1 if has_background else 0).astype(np.int32))
            if not use_spectral:
                qn_g, m2p_g, r_g, j_g = jax.vmap(
                    lambda mg_: expm_ops.taylor_action_factors(mg_, alpha_hat)
                )(m)
                rows = jnp.arange(n_branches)
                return pruning.single_site_log_likelihood_taylor(
                    qn_g, m2p_g, r_g[group, rows], j_g[group, rows], group,
                    expm_ops.taylor_action_terms(dtype),
                    lp[:, i, :], freqs, pdata,
                )
            left, lam, right = expm_ops.reversible_spectral(m, freqs)
            return pruning.single_site_log_likelihood_spectral(
                left[group], lam[group], right[group], alpha_hat,
                lp[:, i, :], freqs, pdata,
            )

        # -- parameter spaces ---------------------------------------------------
        fel_specs = {
            "alpha": ParamSpec(init=1.0, lower=0.0, upper=10000.0),
            "beta_fg": ParamSpec(init=1.0, lower=0.0, upper=10000.0),
        }
        meme_specs = {
            "alpha": ParamSpec(init=1.0, lower=0.0, upper=10000.0),
            "beta_plus": ParamSpec(init=1.0, lower=0.0, upper=10000.0),
        }
        for i in range(1, K):
            meme_specs[f"omega_{i}"] = ParamSpec(
                init=min(0.25 * i, 1.0), lower=0.0, upper=1.0
            )
            # stick-breaking aux weights (MEME.bf:500 bounds 1e-8..1)
            meme_specs[f"w_{i}"] = ParamSpec(
                init=1.0 / (K - i + 1), lower=0.0, upper=1.0
            )
        if has_background:
            fel_specs["beta_bg"] = ParamSpec(init=1.0, lower=0.0, upper=10000.0)
            meme_specs["beta_bg"] = ParamSpec(init=1.0, lower=0.0, upper=10000.0)
        if mh_est:
            for key, val in (("delta", delta_hat),) + (
                (("psi", psi_hat),) if mh_triple else ()
            ):
                fel_specs[key] = ParamSpec(init=max(val, 1e-3), lower=0.0, upper=100.0)
                meme_specs[key] = ParamSpec(init=max(val, 1e-3), lower=0.0, upper=100.0)
        null_specs = {k: v for k, v in meme_specs.items() if k != "beta_plus"}

        # candidate rows (MEME.bf initial_guess_grid) relative to FEL estimates:
        # (beta+ multiplier, omega_1 override, w_1 override)
        _CAND = [(1.0, None, None), (2.0, 0.5, 0.5), (4.0, 0.25, 0.25),
                 (1.0, 0.5, 0.5), (1.0, 0.75, 0.8), (8.0, 0.5, 0.8),
                 (1.0, 0.0, 0.01), (1.0, 0.0, 0.7)]

        def make_stage_solvers(lp):
            """Per-site fit stages against an arbitrary leaf-partials tensor
            (the real data, or simulated bootstrap columns)."""

            def solve_fel(idx, _init):
                fel_grid = {"alpha": jnp.asarray(_FEL_GRID[:, 0]),
                            "beta_fg": jnp.asarray(_FEL_GRID[:, 1])}
                if has_background:
                    fel_grid["beta_bg"] = jnp.asarray(_FEL_GRID[:, 1])
                if mh_est:
                    n_grid = _FEL_GRID.shape[0]
                    fel_grid["delta"] = jnp.full((n_grid,), delta_hat)
                    if mh_triple:
                        fel_grid["psi"] = jnp.full((n_grid,), psi_hat)
                f = lambda i, p: fel_site_loglik(i, p, lp=lp)
                fel_starts, _ = grid_best_starts(f, fel_grid, idx)
                fel_params, fel_lnl = vmapped_nelder_mead(f, fel_specs, fel_starts, idx)
                fbg = fel_params["beta_bg"] if has_background else fel_params["alpha"]
                return fel_params["alpha"], fel_params["beta_fg"], fbg, fel_lnl

            def solve_alt(idx, init):
                n = idx.shape[0]
                fb_local = init["_fb"]
                base = {k: v for k, v in init.items() if k != "_fb"}
                f = lambda i, p: meme_site_loglik(i, p, lp=lp)

                def eval_cand(mult, om, wt):
                    c = dict(base)
                    c["beta_plus"] = jnp.maximum(fb_local * mult, 1e-4)
                    if om is not None:
                        c["omega_1"] = jnp.full((n,), om)
                        c["w_1"] = jnp.full((n,), wt)
                    vals = jax.vmap(
                        lambda j: f(idx[j], {k: v[j] for k, v in c.items()})
                    )(jnp.arange(n))
                    return c, vals

                cands = [eval_cand(*row) for row in _CAND]
                cand_vals = jnp.stack([v for _, v in cands])
                best = jnp.argmax(cand_vals, axis=0)
                starts = {
                    k: jnp.stack([c[k] for c, _ in cands])[best, jnp.arange(n)]
                    for k in base
                }
                alt_params, alt_lnl = vmapped_nelder_mead(f, meme_specs, starts, idx)
                # restart from the found optimum with a fresh simplex: the
                # rank-1 shrink fallback can collapse a simplex early on
                # hard 4-parameter sites, leaving ~1 lnL on the table (the
                # MEME-dominates-FEL invariant catches it); a second pass
                # converges in a handful of iterations when already optimal
                alt_params2, alt_lnl2 = vmapped_nelder_mead(
                    f, meme_specs, alt_params, idx
                )
                better = alt_lnl2 > alt_lnl
                alt_params = {
                    k: jnp.where(better, alt_params2[k], alt_params[k])
                    for k in alt_params
                }
                alt_lnl = jnp.maximum(alt_lnl, alt_lnl2)
                return tuple(alt_params[k] for k in sorted(meme_specs)) + (alt_lnl,)

            def solve_null(idx, init):
                def null_loglik(i, p):
                    merged = dict(p)
                    merged["beta_plus"] = jnp.maximum(p["alpha"], 1e-4)
                    return meme_site_loglik(i, merged, lp=lp)

                null_params, null_lnl = vmapped_nelder_mead(
                    null_loglik, null_specs, init, idx
                )
                return tuple(null_params[k] for k in sorted(null_specs)) + (null_lnl,)

            return solve_fel, solve_alt, solve_null

        def alt_init_from_fel(fa, fb, fbg):
            """Stage-2 seeds per meme.handle_a_site."""
            pos_case = fa < fb
            omega_rate = np.where(fa > 1e-5, fb / np.maximum(fa, 1e-5), 1.0)
            init0 = {
                "alpha": np.minimum(fa, 100.0),
                "omega_1": np.clip(np.where(pos_case, 0.0, omega_rate), 0.0, 1.0),
                "w_1": np.where(pos_case, 0.25, 0.75),
                "beta_plus": np.where(pos_case, fb, np.maximum(0.1, 1.5 * fa)),
                "_fb": fb,
            }
            n = fa.shape[0]
            for i in range(2, K):
                init0[f"omega_{i}"] = np.full(n, min(0.25 * i, 1.0))
                init0[f"w_{i}"] = np.full(n, 1.0 / (K - i + 1))
            if has_background:
                init0["beta_bg"] = fbg
            if mh_est:
                init0["delta"] = np.full(n, delta_hat)
                if mh_triple:
                    init0["psi"] = np.full(n, psi_hat)
            return init0

        def run_site_pipeline(lp, n_sites, label=""):
            solve_fel, solve_alt, solve_null = make_stage_solvers(lp)
            _progress(f"stage 1{label}: per-site FEL fits")
            fa, fb, fbg, fel_lnl = (
                np.array(x) for x in sharded_site_solve(solve_fel, {}, n_sites)
            )
            _progress(f"stage 2{label}: per-site MEME alternative fits")
            init0 = alt_init_from_fel(fa, fb, fbg)
            alt_out = sharded_site_solve(solve_alt, init0, n_sites)
            alt_params = {k: np.array(v) for k, v in zip(sorted(meme_specs), alt_out[:-1])}
            alt_lnl = np.array(alt_out[-1])

            _progress(f"stage 3{label}: per-site null fits")
            null_init = {k: v for k, v in alt_params.items() if k != "beta_plus"}
            # alpha = 0 is a logit-space trap (vanishing steps at the bound);
            # start the null from the FEL-style blend of alt alpha and beta+
            null_init["alpha"] = (
                np.minimum(alt_params["alpha"], 100.0)
                + 3.0 * np.minimum(alt_params["beta_plus"], 100.0)
            ) / 4.0
            null_out = sharded_site_solve(solve_null, null_init, n_sites)
            null_params = {k: np.array(v) for k, v in zip(sorted(null_specs), null_out[:-1])}
            null_lnl = np.array(null_out[-1])
            return fa, fb, fbg, fel_lnl, alt_params, alt_lnl, null_params, null_lnl

        (fa, fb, fbg, fel_lnl, alt_params, alt_lnl, null_params, null_lnl) = (
            run_site_pipeline(leaf_partials, n_patterns)
        )
        alpha = alt_params["alpha"]
        beta_plus = alt_params["beta_plus"]
        omegas = [alt_params[f"omega_{i}"] for i in range(1, K)]
        stick = np.stack([alt_params[f"w_{i}"] for i in range(1, K)])  # [K-1, n]
        weights = np.array(jax.vmap(_stick_weights, in_axes=1, out_axes=1)(
            jnp.asarray(stick)
        ))  # [K, n]

        # -- branch EBFs (meme.compute_branch_EBF): force each tested branch
        # into each non-positive class c; posterior_+ = 1 - sum_c w_c L_c/L_mix
        ebf_init = dict(alt_params)
        ebf_init["_lnl"] = alt_lnl

        def solve_ebf(idx, init):
            n = idx.shape[0]

            def one_site(j):
                p_j = {k: init[k][j] for k in alt_params}
                w = _stick_weights(jnp.stack([p_j[f"w_{i}"] for i in range(1, K)]))

                def one_branch_class(b, c):
                    fw = jnp.broadcast_to(w[None, :], (n_branches, K))
                    fw = fw.at[b].set(jax.nn.one_hot(c, K, dtype=fw.dtype))
                    return meme_site_loglik(idx[j], p_j, forced_weights=fw)

                return jax.vmap(
                    lambda b: jax.vmap(lambda c: one_branch_class(b, c))(
                        jnp.arange(K - 1)
                    )
                )(jnp.asarray(tested_idx))                       # [n_tested, K-1]

            forced_lnl = jax.vmap(one_site)(jnp.arange(n))       # [n, n_tested, K-1]
            w_all = jax.vmap(
                lambda j: _stick_weights(
                    jnp.stack([init[f"w_{i}"][j] for i in range(1, K)])
                )
            )(jnp.arange(n))                                      # [n, K]
            w_neg = w_all[:, : K - 1]                             # [n, K-1]
            post_neg = (
                w_neg[:, None, :] * jnp.exp(forced_lnl - init["_lnl"][:, None, None])
            ).sum(-1)                                             # [n, n_tested]
            post_pos = jnp.clip(1.0 - post_neg, 0.0, 1.0)
            prior_pos = w_all[:, K - 1]
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

        # LRT + p-values; sites failing the positive-evidence condition get
        # Null = alternative (MEME.bf else-branch)
        w_plus = weights[K - 1]
        condition = (beta_plus > alpha) & (w_plus > 1e-6)
        lrt = np.where(condition, np.maximum(2.0 * (alt_lnl - null_lnl), 0.0), 0.0)
        pvals = np.array([
            2.0 / 3.0 - 2.0 / 3.0 * (
                0.45 * (1.0 - common.chi2_sf(x, 1)) + 0.55 * (1.0 - common.chi2_sf(x, 2))
            )
            for x in lrt
        ])

        # -- parametric bootstrap (MEME.bf:1445-1470): simulate `resample`
        # columns per site under its null fit, re-run the full per-site
        # pipeline on the simulated batch, p = (1 + #{LRT_sim >= LRT}) / (1+N)
        if resample > 0:
            import scipy.linalg as sla
            from hyphy_tpu.utils import simulate as sim_mod

            _progress(f"simulating {resample} null replicates per site")
            rng = np.random.default_rng(resample_seed)
            S = int(freqs.shape[0])
            eye = np.eye(S)
            root_freqs_np = np.asarray(freqs)
            alpha_np = np.asarray(alpha_hat)
            constant = filt.constant_pattern_mask()
            sim_partials = np.ones((filt.n_sequences, n_patterns * resample, S))
            qs_np, qn_np = (np.asarray(x) for x in (q_syn, q_non))
            for s in range(n_patterns):
                if constant[s]:
                    continue
                a_s = float(null_params["alpha"][s])
                if mh_est:
                    qs_s = np.asarray(q1_syn) + float(null_params["delta"][s]) * np.asarray(q2_syn)
                    qn_s = np.asarray(q1_non) + float(null_params["delta"][s]) * np.asarray(q2_non)
                    if mh_triple:
                        qs_s = qs_s + float(null_params["psi"][s]) * np.asarray(q3[0])
                        qn_s = qn_s + float(null_params["psi"][s]) * np.asarray(q3[1])
                else:
                    qs_s, qn_s = qs_np, qn_np
                betas_s = [float(null_params[f"omega_{i}"][s]) * a_s for i in range(1, K)]
                betas_s.append(a_s)  # beta_plus := alpha under the null
                w_s = np.array(_stick_weights(
                    np.array([float(null_params[f"w_{i}"][s]) for i in range(1, K)])
                ))
                bg_s = float(null_params["beta_bg"][s]) if has_background else a_s
                # per-family P then branch mixture (explicit-form model)
                fams = []
                for b_val in betas_s + [bg_s]:
                    q = a_s * qs_s + b_val * qn_s
                    q -= np.diag(q.sum(axis=1))
                    fams.append(q)
                p_branch = np.zeros((n_branches, S, S))
                for b in range(n_branches):
                    if tested[b]:
                        p_branch[b] = sum(
                            w_s[c] * sla.expm(fams[c] * alpha_np[b]) for c in range(K)
                        )
                    else:
                        p_branch[b] = sla.expm(fams[K] * alpha_np[b])
                st = sim_mod.simulate_states(data.tree, p_branch, root_freqs_np, resample, rng)
                sim_partials[:, s * resample : (s + 1) * resample, :] = eye[
                    st[: filt.n_sequences]
                ]
            sim_lp = jnp.asarray(sim_partials)
            (_, _, _, _, _, sim_alt_lnl, _, sim_null_lnl) = run_site_pipeline(
                sim_lp, n_patterns * resample, label=" [bootstrap]"
            )
            lrt_sim = np.maximum(2.0 * (sim_alt_lnl - sim_null_lnl), 0.0).reshape(
                n_patterns, resample
            )
            hits = (lrt_sim >= lrt[:, None] - 1e-10).sum(axis=1)
            boot = (hits + 1.0) / (resample + 1.0)
            pvals = np.where(condition, boot, 1.0)

        _progress("assembling results")
        n_branches_sel = (ebf >= 100.0).sum(axis=1).astype(float)
        n_branches_sel = np.where(condition, n_branches_sel, 0.0)

        # total tested branch length at the alternative fit
        mean_beta = sum(weights[i - 1] * omegas[i - 1] * alpha for i in range(1, K))
        mean_beta = mean_beta + w_plus * beta_plus
        bl = (
            alpha[:, None] * rate_syn + mean_beta[:, None] * rate_non
        ) * np.asarray(alpha_hat)[None, :] / 3.0
        total_bl = bl @ np.asarray(tested_j)

        constant = filt.constant_pattern_mask()
        meme_logl = alt_lnl
        fel_logl = fel_lnl
        lrt_meme_fel = np.maximum(2.0 * (alt_lnl - fel_lnl), 0.0)

        cols = [alpha]
        col_consts = [0.0]
        headers = [["&alpha;", "Synonymous substitution rate at a site"]]
        for i in range(1, K):
            cols += [omegas[i - 1] * alpha, weights[i - 1]]
            col_consts += [0.0, 1.0 if i == 1 else 0.0]
            headers += [
                [f"&beta;<sup>{i}</sup>",
                 f"Non-synonymous substitution rate at a site for the negative/neutral evolution component {i}"],
                [f"p<sup>{i}</sup>",
                 f"Mixture distribution weight allocated to negative/neutral evolution component {i}"],
            ]
        cols += [beta_plus, w_plus, lrt, pvals, n_branches_sel, total_bl,
                 meme_logl, fel_logl, lrt_meme_fel, fa, fb]
        col_consts += [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        headers += [
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
        if mh:
            cols.append(alt_params["delta"] if mh_est else np.full(n_patterns, delta_hat))
            col_consts.append(0.0)
            headers.append(["2H rate", "Site-level rate for 2-nucleotide substitutions"])
            if mh_triple:
                cols.append(alt_params["psi"] if mh_est else np.full(n_patterns, psi_hat))
                col_consts.append(0.0)
                headers.append(["3H rate", "Site-level rate for 3-nucleotide substitutions"])

        cols = [np.array(c, dtype=float, copy=True) for c in cols]
        for arr, cval in zip(cols, col_consts):
            arr[constant] = cval

        dup = filt.duplicate_map
        site_table = np.stack([c[dup] for c in cols], axis=1)
        return site_table, headers

    content = {}
    first_table = first_headers = None
    for p_idx, (pdat, mgp) in enumerate(zip(md.parts, mg.parts)):
        site_table, headers = _solve_partition(pdat, mgp)
        content[str(p_idx)] = site_table.tolist()
        if first_table is None:
            first_table, first_headers = site_table, headers

    fits = {
        "Nucleotide GTR": model_fit_entry(
            gtr.loglik, gtr.n_parameters, md.sample_size,
            frequencies=gtr.parts[0].frequencies, display_order=0,
        ),
        "Global MG94xREV": model_fit_entry(
            mg.loglik, mg.n_parameters, md.sample_size,
            frequencies=mg.parts[0].codon_freqs, display_order=1,
            rate_distributions={
                f"non-synonymous/synonymous rate ratio for *{name}*":
                    [[float(mg.omegas[g]), 1.0]]
                for g, name in enumerate(md.parts[0].group_names)
            },
        ),
    }
    info = ("MEME (Mixed Effects Model of Evolution) estimates a site-wise "
            "synonymous rate and a mixture of omega classes on tested branches")
    extra = {
        "MLE": {"headers": first_headers, "content": content},
        "analysis settings": {
            "rates": K, "multihit": multiple_hits, "resample": resample,
        },
    }
    if md.n_partitions > 1:
        from hyphy_tpu.io.json_out import analysis_json_parts

        json = analysis_json_parts(info=info, version="3.0", md=md,
                                   fits=fits, extra=extra)
    else:
        json = analysis_json(info=info, version="3.0", data=md.parts[0],
                             fits=fits, extra=extra)
    return MEMEResult(json=json, site_table=first_table, data=md.parts[0],
                      gtr=gtr.parts[0], mg94=mg.parts[0])

