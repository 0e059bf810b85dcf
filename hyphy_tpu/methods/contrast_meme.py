"""Contrast-MEME — per-site tests for *different* episodic selective
pressure between branch sets.

Reference: ``res/TemplateBatchFiles/SelectionAnalyses/contrast-meme.bf``.
Pipeline: nucleotide GTR fit -> global MG94xREV fit -> per-site fits of a
2-class BS_REL mixture per branch set: branch b in set g gets

    P_b = prop_g * expm(bl_b * (alpha*Qs + beta1_g*Qn))
        + (1-prop_g) * expm(bl_b * (alpha*Qs + beta2_g*Qn))

with a shared synonymous scaler alpha (free under --srv, else := 1;
contrast-meme.bf:704-722 ``apply_proportional_site_constraint``).

- alternative: all (beta1, beta2, prop) free per set, seeded from a
  Latin-hypercube start grid over [0,1] (contrast-meme.bf:771-784);
- overall null: all *testable* sets share (beta1, beta2, prop)
  (background tied too when only one testable set), started from their
  means (contrast-meme.bf:837-864); LRT df = max(3, 3*(n_testable-1))
  (contrast-meme.bf:905);
- pairwise nulls for >2 testable sets (df=3 each,
  contrast-meme.bf:873-899);
- Holm-Bonferroni within each site's test family
  (contrast-meme.bf:932), Benjamini-Hochberg FDR over sites;
- optional permutation test: for sites with min p <= pvalue the branch
  set assignment is shuffled ``permutations`` times and the minimum
  corrected p-value recomputed; reported as
  (1 + #{perm <= observed}) / (1 + N) (reference early-stops and reports
  1/#permutations-run, contrast-meme.bf:944-958 — same quantity up to
  the early-stop convention).

Per-branch-set substitution counts come from joint ML ancestral
reconstruction, as in contrast-FEL.

TPU structure: per-site fits are one vmapped Nelder-Mead over patterns
(sharded over the device mesh) using the spectral mixture message kernel;
permutation replicates batch the (site, shuffled-assignment) pairs into
one vmapped solve with traced per-job component indices.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hyphy_tpu.methods import common
from hyphy_tpu.methods.contrast_fel import (
    _substitution_counts,
    benjamini_hochberg,
    holm_bonferroni,
    load_multigroup,
)
from hyphy_tpu.models.base import fill_diagonal_from_rows
from hyphy_tpu.models.parameters import ParamSpec
from hyphy_tpu.ops import expm as expm_ops
from hyphy_tpu.ops import pruning
from hyphy_tpu.optimize.batched import grid_best_starts
from hyphy_tpu.optimize.nelder_mead import vmapped_nelder_mead
from hyphy_tpu.io.json_out import analysis_json, model_fit_entry


@dataclasses.dataclass
class ContrastMEMEResult:
    json: Dict
    site_table: np.ndarray
    headers: List
    group_names: List[str]
    data: common.LoadedData


def run(
    alignment: str,
    genetic_code: str = "Universal",
    tree: Optional[str] = None,
    test_labels: Optional[Sequence[str]] = None,
    srv: bool = True,
    pvalue: float = 0.05,
    qvalue: float = 0.20,
    permutations: int = 0,
    permutation_seed: int = 0,
    precision: float = 1e-5,
) -> ContrastMEMEResult:
    data = load_multigroup(alignment, genetic_code, tree, test_labels)
    gtr = common.fit_gtr(data, precision=precision)
    mg = common.fit_partitioned_mg94(data, gtr, precision=precision)

    filt = data.codon_filter
    n_patterns = filt.n_patterns
    n_branches = data.tree.n_branches
    groups = data.branch_groups
    n_testable = len([g for g in data.group_names if g != "background"])
    has_background = "background" in data.group_names
    n_groups = n_testable + (1 if has_background else 0)

    model = mg.model
    q_syn, q_non = model.basis_matrices(mg.params)
    alpha_hat = jnp.asarray(mg.alphas)
    freqs = model.frequencies
    leaf_partials = jnp.asarray(filt.leaf_partials())
    pdata = pruning.build_pruning_data(data.tree)

    # family layout: 2 families per set — (beta1_g, beta2_g)
    def comp_layout(groups_np):
        ci = np.stack([2 * groups_np, 2 * groups_np + 1], axis=1).astype(np.int32)
        return jnp.asarray(ci)

    comp_index = comp_layout(groups)

    def _loglik(i, a, b1, b2, prop, comp_idx=comp_index, groups_j=None):
        """b1/b2/prop: [n_groups] per-set values."""
        betas = jnp.stack([b1, b2], axis=1).reshape(-1)          # [2G]
        m = fill_diagonal_from_rows(
            a * q_syn[None] + betas[:, None, None] * q_non[None]
        )
        left, lam, right = expm_ops.reversible_spectral(m, freqs)
        g_of_b = jnp.asarray(groups) if groups_j is None else groups_j
        pw = prop[g_of_b]
        cw = jnp.stack([pw, 1.0 - pw], axis=1)                   # [B,2]
        return pruning.single_site_log_likelihood_spectral_mixture(
            left, lam, right, comp_idx, cw, alpha_hat,
            leaf_partials[:, i, :], freqs, pdata,
        )

    b1n = [f"b1_{g}" for g in range(n_groups)]
    b2n = [f"b2_{g}" for g in range(n_groups)]
    prn = [f"pr_{g}" for g in range(n_groups)]

    def pack(p):
        return (
            jnp.stack([p[n] for n in b1n]),
            jnp.stack([p[n] for n in b2n]),
            jnp.stack([p[n] for n in prn]),
        )

    def alt_loglik(i, p):
        a = p["alpha"] if srv else jnp.ones(())
        return _loglik(i, a, *pack(p))

    specs = {}
    for n in b1n + b2n:
        specs[n] = ParamSpec(init=0.5, lower=0.0, upper=10000.0)
    for n in prn:
        # terms.range_almost_01 (contrast-meme.bf:389)
        specs[n] = ParamSpec(init=0.7, lower=1e-6, upper=1.0 - 1e-6)
    if srv:
        specs["alpha"] = ParamSpec(init=1.0, lower=0.0, upper=10000.0)

    # Latin-hypercube start grid over [0,1] per scaler (c_meme:771-784)
    rng = np.random.default_rng(7)
    n_lhc = 24
    grid = {}
    for n in b1n + b2n + prn:
        strata = (np.arange(n_lhc) + rng.random(n_lhc)) / n_lhc
        grid[n] = jnp.asarray(rng.permutation(strata))
    if srv:
        grid["alpha"] = jnp.ones(n_lhc)

    def fit_all_sites(idx, _init):
        starts, _ = grid_best_starts(alt_loglik, grid, idx)
        alt_params, alt_lnl = vmapped_nelder_mead(alt_loglik, specs, starts, idx)

        tie_background = has_background and n_testable == 1
        n_tied = n_testable + (1 if tie_background else 0)

        def mean_over_tied(names):
            return sum(alt_params[n] for n in names[:n_tied]) / n_tied

        null_specs = {
            "b1_c": specs[b1n[0]], "b2_c": specs[b2n[0]], "pr_c": specs[prn[0]],
        }
        null_start = {
            "b1_c": mean_over_tied(b1n),
            "b2_c": mean_over_tied(b2n),
            "pr_c": jnp.clip(mean_over_tied(prn), 1e-6, 1 - 1e-6),
        }
        if has_background and not tie_background:
            for pre, names in (("b1", b1n), ("b2", b2n), ("pr", prn)):
                null_specs[f"{pre}_bg"] = specs[names[-1]]
                null_start[f"{pre}_bg"] = alt_params[names[-1]]
        if srv:
            null_specs["alpha"] = specs["alpha"]
            null_start["alpha"] = alt_params["alpha"]

        def null_loglik(i, p):
            a = p["alpha"] if srv else jnp.ones(())
            reps = lambda pre: jnp.concatenate([
                jnp.repeat(p[f"{pre}_c"], n_tied),
                (jnp.zeros(0) if n_tied == n_groups
                 else p[f"{pre}_bg"][None]),
            ])
            return _loglik(i, a, reps("b1"), reps("b2"),
                           jnp.clip(reps("pr"), 1e-6, 1 - 1e-6))

        _, null_lnl = vmapped_nelder_mead(null_loglik, null_specs, null_start, idx)

        # pairwise nulls for >2 testable sets (df=3 each)
        pair_lnls = []
        for (g1, g2) in itertools.combinations(range(n_testable), 2):
            if n_testable <= 2:
                break
            p_specs = dict(specs)
            p_start = dict(alt_params)
            for names in (b1n, b2n, prn):
                del p_specs[names[g2]], p_start[names[g2]]

            def pair_loglik(i, p, g1=g1, g2=g2):
                a = p["alpha"] if srv else jnp.ones(())
                vecs = []
                for names in (b1n, b2n, prn):
                    vecs.append(jnp.stack([
                        p[names[g1]] if g == g2 else p[names[g]]
                        for g in range(n_groups)
                    ]))
                return _loglik(i, a, *vecs)

            _, lnlp = vmapped_nelder_mead(pair_loglik, p_specs, p_start, idx)
            pair_lnls.append(lnlp)
        pair_arr = (
            jnp.stack(pair_lnls, axis=1)
            if pair_lnls else jnp.zeros((idx.shape[0], 0))
        )
        alpha_out = alt_params["alpha"] if srv else jnp.ones(idx.shape[0])
        outs = [alpha_out]
        for names in (b1n, b2n, prn):
            outs.append(jnp.stack([alt_params[n] for n in names], axis=1))
        return tuple(outs) + (alt_lnl, null_lnl, pair_arr)

    from hyphy_tpu.parallel.mesh import sharded_site_solve

    (alpha_alt, b1_alt, b2_alt, pr_alt, alt_lnl, null_lnl, pair_lnl) = (
        np.array(x) for x in sharded_site_solve(fit_all_sites, {}, n_patterns)
    )

    df_overall = max(3, 3 * (n_testable - 1))
    lrt_overall = np.maximum(2.0 * (alt_lnl - null_lnl), 0.0)
    p_overall = np.array([common.chi2_sf(x, df_overall) for x in lrt_overall])

    pairs = list(itertools.combinations(range(n_testable), 2)) if n_testable > 2 else []
    p_pairwise = np.ones((n_patterns, len(pairs)))
    for j in range(len(pairs)):
        lrt_j = np.maximum(2.0 * (alt_lnl - pair_lnl[:, j]), 0.0)
        p_pairwise[:, j] = [common.chi2_sf(x, 3) for x in lrt_j]

    p_corr = np.empty((n_patterns, 1 + len(pairs)))
    for s in range(n_patterns):
        fam = {"overall": p_overall[s]}
        for j, (g1, g2) in enumerate(pairs):
            fam[f"{g1}|{g2}"] = p_pairwise[s, j]
        adj = holm_bonferroni(fam)
        p_corr[s, 0] = adj["overall"]
        for j, (g1, g2) in enumerate(pairs):
            p_corr[s, 1 + j] = adj[f"{g1}|{g2}"]

    constant = filt.constant_pattern_mask()
    p_corr[constant] = 1.0
    alpha_alt[constant] = 0.0
    b1_alt[constant] = 0.0
    b2_alt[constant] = 0.0

    # -- permutation test on significant sites -----------------------------
    perm_p = np.full(n_patterns, -1.0)
    min_p = p_corr.min(axis=1)
    sig_sites = np.nonzero((min_p <= pvalue) & ~constant)[0]
    if permutations > 0 and sig_sites.size:
        rng_p = np.random.default_rng(permutation_seed)
        jobs = []       # (site, permuted groups)
        for s in sig_sites:
            for _ in range(permutations):
                jobs.append((s, rng_p.permutation(groups)))
        job_sites = jnp.asarray(np.array([j[0] for j in jobs]))
        job_groups = jnp.asarray(np.stack([j[1] for j in jobs]).astype(np.int32))

        def perm_loglik_factory(constrained):
            def f(j, p):
                a = p["alpha"] if srv else jnp.ones(())
                g_j = job_groups[j]
                ci = jnp.stack([2 * g_j, 2 * g_j + 1], axis=1)
                if constrained:
                    tie_background = has_background and n_testable == 1
                    n_tied = n_testable + (1 if tie_background else 0)
                    reps = lambda pre: jnp.concatenate([
                        jnp.repeat(p[f"{pre}_c"], n_tied),
                        (jnp.zeros(0) if n_tied == n_groups
                         else p[f"{pre}_bg"][None]),
                    ])
                    vecs = (reps("b1"), reps("b2"),
                            jnp.clip(reps("pr"), 1e-6, 1 - 1e-6))
                else:
                    vecs = pack(p)
                return _loglik(job_sites[j], a, *vecs,
                               comp_idx=ci, groups_j=g_j)
            return f

        idx = jnp.arange(len(jobs))
        alt_f = perm_loglik_factory(False)
        starts, _ = grid_best_starts(alt_f, grid, idx)
        _, p_alt_lnl = vmapped_nelder_mead(alt_f, specs, starts, idx)
        tie_background = has_background and n_testable == 1
        null_specs = {
            "b1_c": specs[b1n[0]], "b2_c": specs[b2n[0]], "pr_c": specs[prn[0]],
        }
        null_start = {
            "b1_c": jnp.full(len(jobs), 0.5),
            "b2_c": jnp.full(len(jobs), 0.5),
            "pr_c": jnp.full(len(jobs), 0.7),
        }
        if has_background and not tie_background:
            for pre in ("b1", "b2", "pr"):
                null_specs[f"{pre}_bg"] = null_specs[f"{pre}_c"]
                null_start[f"{pre}_bg"] = null_start[f"{pre}_c"]
        if srv:
            null_specs["alpha"] = specs["alpha"]
            null_start["alpha"] = jnp.ones(len(jobs))
        _, p_null_lnl = vmapped_nelder_mead(
            perm_loglik_factory(True), null_specs, null_start, idx
        )
        lrt_perm = np.maximum(
            2.0 * (np.array(p_alt_lnl) - np.array(p_null_lnl)), 0.0
        ).reshape(sig_sites.size, permutations)
        p_perm_overall = np.vectorize(lambda x: common.chi2_sf(x, df_overall))(lrt_perm)
        for r, s in enumerate(sig_sites):
            hits = (p_perm_overall[r] <= min_p[s] + 1e-12).sum()
            perm_p[s] = (1.0 + hits) / (1.0 + permutations)

    dup = filt.duplicate_map
    q_overall = benjamini_hochberg(p_corr[dup, 0])
    subs_by_group = _substitution_counts(data, mg, n_groups)

    # alt-fit total tree length (reference: last column, store_results)
    rate_syn = float(q_syn.sum(-1) @ freqs)
    rate_non = float(q_non.sum(-1) @ freqs)
    mean_beta_groups = pr_alt * b1_alt + (1.0 - pr_alt) * b2_alt   # [n, G]
    mean_beta = mean_beta_groups[:, groups]                        # [n, B]
    a_col = np.where(constant, 0.0, alpha_alt)
    bl = (
        a_col[:, None] * rate_syn + mean_beta * rate_non
    ) * np.asarray(alpha_hat)[None, :] / 3.0
    total_bl = bl.sum(axis=1)
    total_bl[constant] = 0.0

    cols = [alpha_alt[dup][:, None]]
    headers = [["alpha", "Synonymous substitution rate at a site"]]
    for g, name in enumerate(data.group_names):
        cols += [b1_alt[dup, g:g+1], b2_alt[dup, g:g+1], pr_alt[dup, g:g+1]]
        headers += [
            [f"beta1 ({name})", f"Non-synonymous rate 1 at a site for {name} branches"],
            [f"beta2 ({name})", f"Non-synonymous rate 2 at a site for {name} branches"],
            [f"prop ({name})", f"Mixture weight on rate 1 for {name} branches"],
        ]
    testable_names = [g for g in data.group_names if g != "background"]
    for g, name in enumerate(testable_names):
        cols.append(subs_by_group[g][:, None])
        headers.append([f"subs ({name})", f"Substitutions mapped to {name} branches"])
    cols += [p_corr[dup, 0:1], q_overall[:, None]]
    headers += [
        ["P-value (overall)", "Overall p-value that selective profiles differ between groups (Holm-Bonferroni)"],
        ["Q-value (overall)", "Benjamini-Hochberg q-value for the overall test"],
    ]
    for (g1, g2) in pairs:
        cols.append(p_corr[dup, 1 + pairs.index((g1, g2)):2 + pairs.index((g1, g2))])
        headers.append(
            [f"P-value for {data.group_names[g1]} vs {data.group_names[g2]}",
             "Pairwise difference test (Holm-Bonferroni corrected)"]
        )
    cols += [perm_p[dup][:, None], total_bl[dup][:, None]]
    headers += [
        ["Permutation p-value", "Permutation significance for sites passing the LRT screen (-1 = not tested)"],
        ["Total branch length", "Total tree length at the alternative fit"],
    ]
    site_table = np.concatenate(cols, axis=1)

    sig = int((p_corr[dup, 0] <= pvalue).sum())
    fdr_sites = int((q_overall <= qvalue).sum())
    json = analysis_json(
        info="Contrast-MEME (Mixed Effects Model of Evolution) investigates "
             "whether or not selective pressures differ between two or more "
             "sets of branches at a site",
        version="0.5",
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
        extra={
            "MLE": {"headers": headers, "content": {"0": site_table.tolist()}},
            "test results": {
                "P-value threshold": pvalue,
                "tested": n_testable,
                "significant sites (LRT)": sig,
                "significant sites (FDR)": fdr_sites,
            },
        },
    )
    return ContrastMEMEResult(
        json=json, site_table=site_table, headers=headers,
        group_names=data.group_names, data=data,
    )
