"""FEL — Fixed Effects Likelihood site-level selection analysis.

Reference: ``res/TemplateBatchFiles/SelectionAnalyses/FEL.bf``.  Pipeline:
nucleotide GTR fit -> global MG94xREV fit -> per-site 2-parameter
(alpha, beta) fits vs the alpha=beta null, LRT ~ chi^2_1.

Site recipe (parity-critical, FEL.bf:565-820): per branch
``alpha_b := alpha_scaler * synRate_hat_b`` and
``beta_b := beta_scaler_{test|nuisance} * synRate_hat_b`` where
``synRate_hat_b`` are the MG94 MLE branch synonymous rates; without
``--srv`` the alpha scaler is pinned to 1.  The alternative fit is seeded
from a fixed start grid; the null starts from
``alpha <- (min(alpha_hat,100) + 3 min(beta_hat,100))/4``.

TPU structure: all site fits run simultaneously — a vmapped bounded
quasi-Newton over patterns replaces the reference's serial/MPI per-site
queue (``FEL.bf:1188-1228``).  Each site's generator family
``alpha_hat_b * (a*Q_syn + b*Q_nonsyn)`` shares one spectral decomposition
per (site, branch-set).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hyphy_tpu.config import settings
from hyphy_tpu.methods import common
from hyphy_tpu.models.base import fill_diagonal_from_rows
from hyphy_tpu.models.parameters import ParamSpec
from hyphy_tpu.ops import expm as expm_ops
from hyphy_tpu.ops import pruning
from hyphy_tpu.optimize.batched import grid_best_starts
from hyphy_tpu.optimize.nelder_mead import vmapped_nelder_mead
from hyphy_tpu.io.json_out import analysis_json, model_fit_entry

# FEL.bf:609-734 start grids
_SRV_GRID = np.array(
    [
        # (alpha, beta_test/nuisance)
        (0.01, 0.1), (1.0, 0.1), (1.0, 0.5), (1.0, 1.0), (1.0, 5.0),
        (10.0, 0.1), (0.01, 0.5), (0.01, 5.0), (10.0, 0.5), (10.0, 1.0),
        (10.0, 50.0), (100.0, 1.0),
    ]
)
_NOSRV_GRID = np.array([0.01, 0.1, 0.25, 0.5, 1.0, 5.0])


@dataclasses.dataclass
class FELResult:
    json: Dict
    site_table: np.ndarray          # [sites, 6]
    headers: list
    data: common.LoadedData
    gtr: common.GTRFit
    mg94: common.MG94Fit


def _bootstrap_pvalues(
    n_reps, seed, data, filt, model, mg, q_syn_np, q_non_np, alpha_np,
    null_common, null_bg, lrt_obs, loglik_vectors, specs, grid, srv,
    has_background,
):
    """Parametric-bootstrap per-site p-values (FEL.bf:805-820): simulate
    ``n_reps`` columns under each site's null fit, refit alternative and
    null on every replicate as one big vmapped batch, and compare LRTs."""
    import scipy.linalg as sla

    from hyphy_tpu.optimize.nelder_mead import vmapped_nelder_mead
    from hyphy_tpu.parallel.mesh import sharded_site_solve
    from hyphy_tpu.utils import simulate as sim_mod

    rng = np.random.default_rng(seed)
    n_patterns = null_common.shape[0]
    states_dim = q_syn_np.shape[0]
    tree = data.tree
    groups = np.where(data.tested_branches, 0, 1)
    root_freqs = np.asarray(model.frequencies)
    eye = np.eye(states_dim)
    sim_partials = np.ones(
        (filt.n_sequences, n_patterns * n_reps, states_dim)
    )
    constant = filt.constant_pattern_mask()
    for s in range(n_patterns):
        if constant[s]:
            continue  # constant sites are not tested; leave as missing
        betas = [float(null_common[s]), float(null_bg[s])]
        q_groups = []
        for g in range(2 if has_background else 1):
            q = float(null_common[s]) * q_syn_np + betas[g] * q_non_np
            q -= np.diag(q.sum(axis=1))
            q_groups.append(q)
        p = np.stack([
            sla.expm(q_groups[groups[b] if has_background else 0] * alpha_np[b])
            for b in range(tree.n_branches)
        ])
        st = sim_mod.simulate_states(tree, p, root_freqs, n_reps, rng)
        sim_partials[:, s * n_reps : (s + 1) * n_reps, :] = eye[
            st[: filt.n_sequences]
        ]
    sim_lp = jnp.asarray(sim_partials)

    def sim_alt_loglik(i, scalers):
        a = scalers["alpha"] if srv else jnp.ones(())
        betas = [scalers["beta_test"]]
        if has_background:
            betas.append(scalers["beta_nuisance"])
        return loglik_vectors(sim_lp[:, i, :], a, betas)

    def sim_null_loglik(i, scalers):
        betas = [scalers["alpha"]]
        if has_background:
            betas.append(scalers["beta_nuisance"])
        return loglik_vectors(sim_lp[:, i, :], scalers["alpha"], betas)

    def fit_sims(idx, _init):
        starts, _ = grid_best_starts(sim_alt_loglik, grid, idx)
        alt_params, alt_lnl = vmapped_nelder_mead(
            sim_alt_loglik, specs, starts, idx
        )
        alt_alpha = alt_params["alpha"] if srv else jnp.ones(idx.shape[0])
        null_specs = {"alpha": ParamSpec(init=1.0, lower=0.0, upper=10000.0)}
        null_start = {
            "alpha": (jnp.minimum(alt_alpha, 100.0)
                      + 3.0 * jnp.minimum(alt_params["beta_test"], 100.0)) / 4.0
        }
        if has_background:
            null_specs["beta_nuisance"] = specs["beta_nuisance"]
            null_start["beta_nuisance"] = alt_params["beta_nuisance"]
        _, null_lnl = vmapped_nelder_mead(
            sim_null_loglik, null_specs, null_start, idx
        )
        return alt_lnl, null_lnl

    alt_lnl, null_lnl = (
        np.array(x)
        for x in sharded_site_solve(fit_sims, {}, n_patterns * n_reps)
    )
    lrt_sim = np.maximum(2.0 * (alt_lnl - null_lnl), 0.0).reshape(
        n_patterns, n_reps
    )
    hits = (lrt_sim >= lrt_obs[:, None] - 1e-10).sum(axis=1)
    return (hits + 1.0) / (n_reps + 1.0)


_CHI2_95_HALF = 1.9207294  # qchisq(0.95, df=1) / 2 — the 95% profile drop
_OMEGA_CAP = 10000.0       # omega_ratio_for_ci :< 10000 (FEL.bf:746)


def _profile_ci(
    site_loglik, specs, srv, has_background, mh_est, mh_triple,
    alt_alpha, alt_beta, alt_bg, site_delta, site_psi, alt_lnl, n_patterns,
    n_expand: int = 8, n_bisect: int = 25,
):
    """95% profile-likelihood CI on site dN/dS (FEL.bf:738-756).

    The profile REOPTIMIZES the nuisance parameters (alpha, background
    beta, site delta/psi) at every trial ratio — matching the engine's
    COVARIANCE_PARAMETER machinery (likefunc.cpp:6565) rather than the
    fixed-nuisance approximation.  All sites are profiled simultaneously:
    each bisection step is one jitted vmapped Nelder-Mead over patterns."""
    nuis_specs = {k: v for k, v in specs.items() if k != "beta_test"}
    idx = jnp.arange(n_patterns)
    init = {}
    if srv:
        init["alpha"] = jnp.asarray(np.maximum(alt_alpha, 1e-8))
    if has_background:
        init["beta_nuisance"] = jnp.asarray(alt_bg)
    if mh_est:
        init["delta"] = jnp.asarray(site_delta)
        if mh_triple:
            init["psi"] = jnp.asarray(site_psi)

    @jax.jit
    def profile_vec(r):
        """max over nuisance of site lnL with beta_test := r * alpha."""
        def obj(i, p):
            q = dict(p)
            a = q["alpha"] if srv else jnp.ones(())
            q["beta_test"] = r[i] * a
            return site_loglik(i, q)

        if nuis_specs:
            _, lnl = vmapped_nelder_mead(obj, nuis_specs, init, idx,
                                         max_iterations=80)
            return lnl
        return jax.vmap(lambda i: obj(i, {}))(idx)

    r_mle = np.clip(
        alt_beta / np.maximum(alt_alpha if srv else 1.0, 1e-8),
        1e-10, _OMEGA_CAP,
    )
    target = alt_lnl - _CHI2_95_HALF

    # lower bound: bisect g(r) = profile(r) - target on [0, r_mle]
    lo = np.zeros(n_patterns)
    hi = r_mle.copy()
    g_lo = np.array(profile_vec(jnp.asarray(lo))) - target
    at_zero = g_lo >= 0.0     # profile at omega=0 still within the band
    for _ in range(n_bisect):
        mid = 0.5 * (lo + hi)
        g = np.array(profile_vec(jnp.asarray(mid))) - target
        take_hi = g >= 0.0    # mid still inside the CI -> move down
        hi = np.where(take_hi, mid, hi)
        lo = np.where(take_hi, lo, mid)
    lb = np.where(at_zero, 0.0, 0.5 * (lo + hi))

    # upper bound: geometric expansion then log-space bisection
    lo_u = r_mle.copy()
    hi_u = np.minimum(np.maximum(r_mle * 4.0, 1e-4), _OMEGA_CAP)
    for _ in range(n_expand):
        g = np.array(profile_vec(jnp.asarray(hi_u))) - target
        inside = (g >= 0.0) & (hi_u < _OMEGA_CAP)
        lo_u = np.where(inside, hi_u, lo_u)
        hi_u = np.where(inside, np.minimum(hi_u * 4.0, _OMEGA_CAP), hi_u)
    g_cap = np.array(profile_vec(jnp.asarray(hi_u))) - target
    at_cap = g_cap >= 0.0
    llo, lhi = np.log(np.maximum(lo_u, 1e-10)), np.log(hi_u)
    for _ in range(n_bisect):
        lmid = 0.5 * (llo + lhi)
        g = np.array(profile_vec(jnp.asarray(np.exp(lmid)))) - target
        inside = g >= 0.0
        llo = np.where(inside, lmid, llo)
        lhi = np.where(inside, lhi, lmid)
    ub = np.where(at_cap, _OMEGA_CAP, np.exp(0.5 * (llo + lhi)))
    return lb, r_mle.copy(), ub


def run(
    alignment: str,
    genetic_code: str = "Universal",
    tree: Optional[str] = None,
    branches: str = "All",
    srv: bool = True,
    pvalue: float = 0.1,
    precision: float = 1e-5,
    site_precision: float = 1e-4,
    resample: int = 0,
    resample_seed: int = 0,
    multiple_hits: str = "None",
    site_multihit: str = "Estimate",
    ci: bool = False,
) -> FELResult:
    """``resample`` > 0: per-site parametric-bootstrap p-values — simulate
    that many replicate columns under each site's NULL fit, refit
    alternative+null per replicate, and report
    ``p = (1 + #{LRT_sim >= LRT_obs}) / (N + 1)`` instead of the chi^2_1
    asymptotics (reference FEL.bf:805-820, ``--resample``).

    ``multiple_hits``: "Double" / "Double+Triple" adds 2- (delta) and
    3-nucleotide (psi) instantaneous rates to the global MG94 fit and the
    per-site models (reference --multiple-hits, FEL.bf:102-137);
    ``site_multihit`` selects per-site estimated rates ("Estimate") or
    the global-fit plug-in values ("Global") (FEL.bf:163-172).

    ``ci``: 95% profile-likelihood confidence intervals on site dN/dS
    (reference --ci, FEL.bf:738-756) — nuisance parameters are
    REOPTIMIZED at every trial ratio (the engine's COVARIANCE_PARAMETER
    profile, likefunc.cpp:6565), via batched bisection over all sites."""
    mh = multiple_hits not in (None, "None", "")
    mh_triple = multiple_hits == "Double+Triple"
    mh_est = mh and site_multihit == "Estimate"
    md = common.load_codon_data_multi(alignment, genetic_code, tree, branches)
    common.progress("fel", f"{md.n_partitions} partition(s); fitting nucleotide GTR")
    gtr = common.fit_gtr_multi(md, precision=precision)
    md, gtr = common.kill_zero_branches_multi(md, gtr, branches)
    common.progress("fel", f"GTR lnL {gtr.loglik:.3f}; fitting global MG94xREV")
    mg = common.fit_partitioned_mg94_multi(
        md, gtr, precision=precision, multiple_hits=multiple_hits
    )
    common.progress("fel", f"MG94 lnL {mg.loglik:.3f}; per-site fits")

    def _solve_partition(data, mgp):

        filt = data.codon_filter
        tested = data.tested_branches
        has_background = bool((~tested).any())
        n_patterns = filt.n_patterns

        model = mgp.model
        delta_hat = float(mgp.params.get("delta", 0.0)) if mh else 0.0
        psi_hat = float(mgp.params.get("psi", 0.0)) if mh_triple else 0.0
        if mh:
            # folded single+multi-hit bases at the global delta/psi MLEs
            q_syn, q_non = model.combined_basis_matrices(mgp.params)
            q1_syn, q1_non = model.basis_matrices(mgp.params)
            q2_syn, q2_non = model.multihit_basis_matrices(mgp.params, 2)
            q3 = model.multihit_basis_matrices(mgp.params, 3) if mh_triple else None
        else:
            q_syn, q_non = model.basis_matrices(mgp.params)
        rate_syn = q_syn.sum(-1) @ model.frequencies
        rate_non = q_non.sum(-1) @ model.frequencies
        dtype = settings.likelihood_dtype()
        use_spectral = dtype == jnp.float64  # fp32 eigh loses ~1e-2 on 61-state Q
        alpha_hat = jnp.asarray(mgp.alphas, dtype)       # [B] branch synRate MLEs
        freqs = model.frequencies.astype(dtype)
        group_of_branch = jnp.asarray(np.where(tested, 0, 1).astype(np.int32))
        n_groups = 2 if has_background else 1
        leaf_partials = jnp.asarray(filt.leaf_partials(), dtype)  # [taxa, patterns, S]
        pdata = pruning.build_pruning_data(data.tree)
        tested_j = jnp.asarray(tested.astype(np.float64))

        def _bases(scalers):
            """(Q_syn, Q_nonsyn) for one site's fit: global-plug-in folded
            bases, or per-site delta/psi folds when site_multihit=Estimate."""
            if not mh_est:
                return q_syn, q_non
            d = scalers["delta"]
            qs = q1_syn + d * q2_syn
            qn = q1_non + d * q2_non
            if mh_triple:
                qs = qs + scalers["psi"] * q3[0]
                qn = qn + scalers["psi"] * q3[1]
            return qs, qn

        def _loglik_vectors(leaf_vecs, a, beta_list, scalers=None):
            """lnL for explicit [taxa, S] leaf vectors with alpha scaler ``a``
            and per-group beta scalers; branch rates are alpha_hat_b * scaler.
            Spectral factors act on CLV vectors (no P materialization) — the
            per-site fast path."""
            qs, qn = _bases(scalers or {})
            b = jnp.stack(beta_list)                                # [G]
            m = fill_diagonal_from_rows(
                a * qs[None] + b[:, None, None] * qn[None]
            ).astype(dtype)                                          # [G,S,S]
            if not use_spectral:
                # fp32/TPU: Taylor expm applied as VECTOR actions (fp32-
                # exact, no [B,S,S] materialization; reference fp32 expm
                # analogue matrix.cpp:9974)
                qn_g, m2p_g, r_g, j_g = jax.vmap(
                    lambda mg: expm_ops.taylor_action_factors(mg, alpha_hat)
                )(m)                                        # [G,...],[G,B]
                if has_background:
                    rows = jnp.arange(alpha_hat.shape[0])
                    r_b = r_g[group_of_branch, rows]
                    j_b = j_g[group_of_branch, rows]
                else:
                    r_b, j_b = r_g[0], j_g[0]
                return pruning.single_site_log_likelihood_taylor(
                    qn_g, m2p_g, r_b, j_b, group_of_branch,
                    expm_ops.taylor_action_terms(dtype),
                    leaf_vecs, freqs, pdata,
                )
            left, lam, right = expm_ops.reversible_spectral(m, freqs)
            if has_background:
                return pruning.single_site_log_likelihood_spectral(
                    left[group_of_branch], lam[group_of_branch],
                    right[group_of_branch], alpha_hat, leaf_vecs, freqs, pdata,
                )
            return pruning.single_site_log_likelihood_spectral(
                left[0], lam[0], right[0], alpha_hat, leaf_vecs, freqs, pdata,
            )

        def _loglik_core(i, a, beta_list, scalers=None):
            return _loglik_vectors(leaf_partials[:, i, :], a, beta_list, scalers)

        def site_loglik(i, scalers):
            a = scalers["alpha"] if srv else jnp.ones(())
            betas = [scalers["beta_test"]]
            if has_background:
                betas.append(scalers["beta_nuisance"])
            return _loglik_core(i, a, betas, scalers)

        # -- alternative fits ---------------------------------------------------
        if srv:
            specs = {
                "alpha": ParamSpec(init=1.0, lower=0.0, upper=10000.0),
                "beta_test": ParamSpec(init=1.0, lower=0.0, upper=10000.0),
            }
            grid = {
                "alpha": jnp.asarray(_SRV_GRID[:, 0]),
                "beta_test": jnp.asarray(_SRV_GRID[:, 1]),
            }
            if has_background:
                grid["beta_nuisance"] = jnp.asarray(_SRV_GRID[:, 1])
        else:
            specs = {"beta_test": ParamSpec(init=1.0, lower=0.0, upper=10000.0)}
            grid = {"beta_test": jnp.asarray(_NOSRV_GRID)}
            if has_background:
                grid["beta_nuisance"] = jnp.asarray(_NOSRV_GRID)
        if has_background:
            specs["beta_nuisance"] = ParamSpec(init=1.0, lower=0.0, upper=10000.0)
        if mh_est:
            n_grid = next(iter(grid.values())).shape[0]
            specs["delta"] = ParamSpec(init=max(delta_hat, 1e-3), lower=0.0, upper=100.0)
            grid["delta"] = jnp.full((n_grid,), delta_hat)
            if mh_triple:
                specs["psi"] = ParamSpec(init=max(psi_hat, 1e-3), lower=0.0, upper=100.0)
                grid["psi"] = jnp.full((n_grid,), psi_hat)

        def fit_all_sites(idx, _init):
            starts, _ = grid_best_starts(site_loglik, grid, idx)
            alt_params, alt_lnl = vmapped_nelder_mead(
                site_loglik, specs, starts, idx
            )
            alt_alpha = alt_params["alpha"] if srv else jnp.ones(idx.shape[0])
            alt_beta = alt_params["beta_test"]

            # null: beta_test := alpha (a free common scaler even without SRV —
            # the reference's `=` assignment clears the alpha := 1 constraint),
            # started from the reference's blend (FEL.bf:777-785)
            null_specs = {"alpha": ParamSpec(init=1.0, lower=0.0, upper=10000.0)}
            null_start = {
                "alpha": (jnp.minimum(alt_alpha, 100.0) + 3.0 * jnp.minimum(alt_beta, 100.0)) / 4.0
            }
            if has_background:
                null_specs["beta_nuisance"] = specs["beta_nuisance"]
                null_start["beta_nuisance"] = alt_params["beta_nuisance"]
            if mh_est:
                for k in ("delta", "psi") if mh_triple else ("delta",):
                    null_specs[k] = specs[k]
                    null_start[k] = alt_params[k]

            def null_loglik(i, scalers):
                betas = [scalers["alpha"]]
                if has_background:
                    betas.append(scalers["beta_nuisance"])
                return _loglik_core(i, scalers["alpha"], betas, scalers)

            null_params, null_lnl = vmapped_nelder_mead(
                null_loglik, null_specs, null_start, idx
            )
            null_common = null_params["alpha"]

            # per-site total tested branch length at the null fit
            # (reference: BranchLength(tree,-1) . selected_branches, FEL.bf:800)
            a_b = null_common[:, None] * alpha_hat[None, :]
            beta_b = null_common[:, None] * alpha_hat[None, :]
            # /3: codon branch lengths are per nucleotide site
            bl = (a_b * rate_syn + beta_b * rate_non) / 3.0
            total_bl = bl @ tested_j
            null_bg = (
                null_params["beta_nuisance"] if has_background
                else jnp.ones_like(null_common)
            )
            out = (alt_alpha, alt_beta, alt_lnl, null_common, null_lnl,
                   total_bl, null_bg)
            if mh_est:
                out = out + (alt_params["delta"],)
                if mh_triple:
                    out = out + (alt_params["psi"],)
            if ci or has_background:
                out = out + (
                    alt_params["beta_nuisance"] if has_background
                    else jnp.ones_like(null_common),
                )
            return out

        from hyphy_tpu.parallel.mesh import sharded_site_solve

        fit_out = [np.array(x) for x in sharded_site_solve(fit_all_sites, {}, n_patterns)]
        common.progress("fel", "per-site fits done")
        (alt_alpha, alt_beta, alt_lnl, null_common, null_lnl, total_bl,
         null_bg) = fit_out[:7]
        pos = 7
        site_delta = site_psi = None
        if mh_est:
            site_delta = fit_out[pos]; pos += 1
            if mh_triple:
                site_psi = fit_out[pos]; pos += 1
        alt_bg = fit_out[pos] if (ci or has_background) else None
        lrt = np.maximum(2.0 * (alt_lnl - null_lnl), 0.0)
        pvals = np.array([common.chi2_sf(x, 1) for x in lrt])
        p_asymptotic = pvals

        if resample > 0:
            common.progress("fel", f"parametric bootstrap: {resample} replicates/site")
            pvals = _bootstrap_pvalues(
                resample, resample_seed, data, filt, model, mgp, np.asarray(q_syn),
                np.asarray(q_non), np.asarray(alpha_hat), null_common, null_bg,
                lrt, _loglik_vectors, specs, grid, srv, has_background,
            )

        ci_cols = None
        if ci:
            common.progress("fel", "profile-likelihood CIs on site dN/dS")
            ci_cols = _profile_ci(
                site_loglik, specs, srv, has_background, mh_est, mh_triple,
                alt_alpha, alt_beta, alt_bg, site_delta, site_psi, alt_lnl,
                n_patterns,
            )

        # constant patterns are not fit (FEL.bf: is_constant -> zero row)
        constant = filt.constant_pattern_mask()
        for arr, val in (
            (alt_alpha, 0.0), (alt_beta, 0.0), (null_common, 0.0),
            (lrt, 0.0), (pvals, 1.0), (total_bl, 0.0),
        ):
            arr[constant] = val
        if ci_cols is not None:
            for arr in ci_cols:
                arr[constant] = 0.0
        if site_delta is not None:
            site_delta[constant] = 0.0
        if site_psi is not None:
            site_psi[constant] = 0.0

        dup = filt.duplicate_map
        columns = [alt_alpha, alt_beta, null_common, lrt, pvals, total_bl]
        headers = [
            ["alpha", "Synonymous substitution rate at a site"],
            ["beta", "Non-synonymous substitution rate at a site"],
            ["alpha=beta", "The rate estimate under the neutral model"],
            ["LRT", "Likelihood ratio test statistic for beta = alpha, versus beta &neq; alpha"],
            ["p-value", "Likelihood ratio test statistic for beta = alpha, versus beta &neq; alpha"],
            ["Total branch length", "The total length of branches contributing to inference at this site, and used to scale dN-dS"],
        ]
        # column order mirrors FEL.bf:174-270: base, [ci x3], [p-asmp], [2H], [3H]
        if ci:
            columns += list(ci_cols)
            headers += [
                ["dN/dS LB", "95% profile likelihood CI lower bound for dN/dS (if available)"],
                ["dN/dS MLE", "Point estimate for site dN/dS"],
                ["dN/dS UB", "95% profile likelihood CI upper bound for dN/dS (if available)"],
            ]
        if resample > 0:
            columns.append(p_asymptotic)
            headers.append(["p-asmp", "p-value derived from the asymptotic test statistic"])
        if mh:
            columns.append(site_delta if mh_est else np.full(n_patterns, delta_hat))
            headers.append(["2H rate", "Site-level rate for 2-nucleotide substitutions"])
            if mh_triple:
                columns.append(site_psi if mh_est else np.full(n_patterns, psi_hat))
                headers.append(["3H rate", "Site-level rate for 3-nucleotide substitutions"])
        site_table = np.stack([c[dup] for c in columns], axis=1)
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
    info = ("FEL (Fixed Effects Likelihood) estimates site-wise synonymous "
            "(&alpha;) and non-synonymous (&beta;) rates")
    extra = {"MLE": {"headers": first_headers, "content": content}}
    if md.n_partitions > 1:
        from hyphy_tpu.io.json_out import analysis_json_parts

        json = analysis_json_parts(info=info, version="2.1", md=md,
                                   fits=fits, extra=extra)
    else:
        json = analysis_json(info=info, version="2.1", data=md.parts[0],
                             fits=fits, extra=extra)
    return FELResult(
        json=json, site_table=first_table, headers=first_headers,
        data=md.parts[0], gtr=gtr.parts[0], mg94=mg.parts[0],
    )
