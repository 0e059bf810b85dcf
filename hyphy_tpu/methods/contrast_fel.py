"""Contrast-FEL — per-site tests for *different* selective pressure
between branch sets.

Reference: ``res/TemplateBatchFiles/SelectionAnalyses/contrast-fel.bf``.
Pipeline: nucleotide GTR fit -> global MG94xREV fit (one omega per branch
set) -> per-site fits with a shared synonymous scaler (alpha) and one
non-synonymous scaler (beta) per branch set:

- alternative: all scalers free, seeded from the cartesian {0.1, 1} grid
  over beta scalers (contrast-fel.bf:747-764);
- overall null: all *testable* betas equal (background tied too when only
  one testable set), started from their mean (contrast-fel.bf:824-845);
  LRT df = max(1, n_testable - 1) (contrast-fel.bf:884-886);
- pairwise nulls for >2 testable sets (df=1 each, contrast-fel.bf:855-880);
- Holm-Bonferroni over the per-site test family (contrast-fel.bf:911),
  Benjamini-Hochberg FDR over sites on the overall p-value
  (contrast-fel.bf:508-517).

Per-branch-set substitution counts come from joint ML ancestral
reconstruction (contrast-fel.bf:786-800), as in SLAC.

TPU structure: identical to FEL — all site fits run simultaneously as one
vmapped Nelder-Mead over patterns, sites sharded across the device mesh.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from hyphy_tpu.methods import common
from hyphy_tpu.models.base import fill_diagonal_from_rows
from hyphy_tpu.models.parameters import ParamSpec
from hyphy_tpu.ops import expm as expm_ops
from hyphy_tpu.ops import pruning
from hyphy_tpu.optimize.batched import grid_best_starts
from hyphy_tpu.optimize.nelder_mead import vmapped_nelder_mead
from hyphy_tpu.io.json_out import analysis_json, model_fit_entry


def holm_bonferroni(pvals: Dict[str, float]) -> Dict[str, float]:
    """math.HolmBonferroniCorrection (libv3/convenience/math.bf)."""
    items = sorted(pvals.items(), key=lambda kv: kv[1])
    n = len(items)
    out, running = {}, 0.0
    for rank, (k, p) in enumerate(items):
        adj = min(1.0, (n - rank) * p)
        running = max(running, adj)
        out[k] = running
    return out


def benjamini_hochberg(pvals: np.ndarray) -> np.ndarray:
    """math.BenjaminiHochbergFDR: q-value per site."""
    n = len(pvals)
    order = np.argsort(pvals)
    q = np.empty(n)
    prev = 1.0
    for rank in range(n - 1, -1, -1):
        i = order[rank]
        prev = min(prev, pvals[i] * n / (rank + 1))
        q[i] = prev
    return q


@dataclasses.dataclass
class ContrastFELResult:
    json: Dict
    site_table: np.ndarray
    headers: List
    group_names: List[str]
    data: common.LoadedData


def load_multigroup(
    alignment: str,
    genetic_code: str,
    tree_newick: Optional[str],
    test_labels: Optional[Sequence[str]] = None,
) -> common.LoadedData:
    """load_file with one group per tested branch label; unlabeled branches
    form the background set (contrast-fel.bf branch-set selection)."""
    from hyphy_tpu.data.alignment import read_alignment
    from hyphy_tpu.data.filter import DataFilter
    from hyphy_tpu.data.genetic_code import GeneticCode
    from hyphy_tpu.tree.topology import Tree

    aln = read_alignment(alignment)
    gc = GeneticCode(genetic_code)
    nuc = DataFilter.from_alignment(aln, "nucleotide")
    cod = DataFilter.from_alignment(aln, "codon", genetic_code=gc)
    if tree_newick is None:
        if not aln.trees:
            raise ValueError("no tree in alignment file; pass tree_newick")
        tree_newick = next(iter(aln.trees.values()))
    tree = Tree.from_newick(tree_newick, leaf_order=nuc.names)

    labels = test_labels or tree.label_set()
    if not labels:
        raise ValueError("contrast-FEL requires >=1 labeled branch set")
    n_branches = tree.n_branches
    groups = np.full(n_branches, len(labels), dtype=np.int32)  # background id
    for g, lbl in enumerate(labels):
        mask = tree.select_branches(lbl)
        groups[mask] = g
    has_background = bool((groups == len(labels)).any())
    group_names = list(labels) + (["background"] if has_background else [])
    tested = groups < len(labels)
    return common.LoadedData(
        alignment=aln, nuc_filter=nuc, codon_filter=cod, tree=tree,
        genetic_code=gc, tested_branches=tested, branch_groups=groups,
        group_names=group_names,
    )


def run(
    alignment: str,
    genetic_code: str = "Universal",
    tree: Optional[str] = None,
    test_labels: Optional[Sequence[str]] = None,
    srv: bool = True,
    pvalue: float = 0.05,
    qvalue: float = 0.20,
    precision: float = 1e-5,
) -> ContrastFELResult:
    data = load_multigroup(alignment, genetic_code, tree, test_labels)
    gtr = common.fit_gtr(data, precision=precision)
    mg = common.fit_partitioned_mg94(data, gtr, precision=precision)

    filt = data.codon_filter
    n_patterns = filt.n_patterns
    groups = data.branch_groups
    n_testable = len([g for g in data.group_names if g != "background"])
    has_background = "background" in data.group_names
    n_groups = n_testable + (1 if has_background else 0)

    model = mg.model
    q_syn, q_non = model.basis_matrices(mg.params)
    alpha_hat = jnp.asarray(mg.alphas)
    freqs = model.frequencies
    group_of_branch = jnp.asarray(groups.astype(np.int32))
    leaf_partials = jnp.asarray(filt.leaf_partials())
    pdata = pruning.build_pruning_data(data.tree)

    def _loglik(i, a, betas_g):
        """betas_g: [n_groups] scaler per branch set."""
        m = fill_diagonal_from_rows(
            a * q_syn[None] + betas_g[:, None, None] * q_non[None]
        )
        left, lam, right = expm_ops.reversible_spectral(m, freqs)
        leaf_vecs = leaf_partials[:, i, :]
        return pruning.single_site_log_likelihood_spectral(
            left[group_of_branch], lam[group_of_branch],
            right[group_of_branch], alpha_hat, leaf_vecs, freqs, pdata,
        )

    beta_names = [f"beta_{g}" for g in range(n_groups)]

    def alt_loglik(i, p):
        a = p["alpha"] if srv else jnp.ones(())
        return _loglik(i, a, jnp.stack([p[name] for name in beta_names]))

    # cartesian {0.1, 1} start grid per beta scaler (contrast-fel.bf:747)
    combos = np.array(list(itertools.product([0.1, 1.0], repeat=n_groups)))
    grid = {name: jnp.asarray(combos[:, g]) for g, name in enumerate(beta_names)}
    specs = {
        name: ParamSpec(init=1.0, lower=0.0, upper=10000.0)
        for name in beta_names
    }
    if srv:
        specs["alpha"] = ParamSpec(init=1.0, lower=0.0, upper=10000.0)
        grid["alpha"] = jnp.ones(len(combos))

    def fit_all_sites(idx, _init):
        starts, _ = grid_best_starts(alt_loglik, grid, idx)
        alt_params, alt_lnl = vmapped_nelder_mead(alt_loglik, specs, starts, idx)

        betas_alt = jnp.stack([alt_params[n] for n in beta_names], axis=1)  # [N,G]
        mean_beta = jnp.mean(betas_alt[:, :n_testable], axis=1)

        # overall null: all testable betas equal (background tied when only
        # one testable set) — contrast-fel.bf:836-845
        tie_background = has_background and n_testable == 1
        null_specs = {"beta_common": ParamSpec(init=1.0, lower=0.0, upper=10000.0)}
        null_start = {"beta_common": mean_beta}
        if has_background and not tie_background:
            null_specs["beta_bg"] = specs[beta_names[-1]]
            null_start["beta_bg"] = alt_params[beta_names[-1]]
        if srv:
            null_specs["alpha"] = specs["alpha"]
            denom = n_testable + (1 if has_background else 0)
            null_start["alpha"] = jnp.minimum(
                10.0,
                (alt_params["alpha"] + denom * jnp.sum(betas_alt, axis=1)) / denom,
            )

        def null_loglik(i, p):
            a = p["alpha"] if srv else jnp.ones(())
            parts = [p["beta_common"]] * n_testable
            if has_background:
                parts.append(p["beta_common"] if tie_background else p["beta_bg"])
            return _loglik(i, a, jnp.stack(parts))

        null_params, null_lnl = vmapped_nelder_mead(
            null_loglik, null_specs, null_start, idx
        )

        # pairwise nulls for >2 testable sets (df=1 each)
        pair_lnls = []
        for (g1, g2) in itertools.combinations(range(n_testable), 2):
            if n_testable <= 2:
                break
            p_specs = dict(specs)
            p_start = dict(alt_params)
            del p_specs[beta_names[g2]], p_start[beta_names[g2]]

            def pair_loglik(i, p, g1=g1, g2=g2):
                a = p["alpha"] if srv else jnp.ones(())
                parts = [
                    p[beta_names[g1]] if g == g2 else p[beta_names[g]]
                    for g in range(n_groups)
                ]
                return _loglik(i, a, jnp.stack(parts))

            _, lnlp = vmapped_nelder_mead(pair_loglik, p_specs, p_start, idx)
            pair_lnls.append(lnlp)
        pair_arr = (
            jnp.stack(pair_lnls, axis=1)
            if pair_lnls
            else jnp.zeros((idx.shape[0], 0))
        )
        alpha_out = alt_params["alpha"] if srv else jnp.ones(idx.shape[0])
        return alpha_out, betas_alt, alt_lnl, null_lnl, pair_arr

    from hyphy_tpu.parallel.mesh import sharded_site_solve

    alpha_alt, betas_alt, alt_lnl, null_lnl, pair_lnl = (
        np.array(x)
        for x in sharded_site_solve(fit_all_sites, {}, n_patterns)
    )

    df_overall = max(1, n_testable - 1)
    lrt_overall = np.maximum(2.0 * (alt_lnl - null_lnl), 0.0)
    p_overall = np.array([common.chi2_sf(x, df_overall) for x in lrt_overall])

    pairs = list(itertools.combinations(range(n_testable), 2)) if n_testable > 2 else []
    p_pairwise = np.ones((n_patterns, len(pairs)))
    for j in range(len(pairs)):
        lrt_j = np.maximum(2.0 * (alt_lnl - pair_lnl[:, j]), 0.0)
        p_pairwise[:, j] = [common.chi2_sf(x, 1) for x in lrt_j]

    # per-site Holm-Bonferroni over {overall} + pairwise (contrast-fel.bf:911)
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
    betas_alt[constant] = 0.0

    dup = filt.duplicate_map
    q_overall = benjamini_hochberg(p_corr[dup, 0])

    # per-branch-set substitution counts from joint ancestral states
    subs_by_group = _substitution_counts(data, mg, n_groups)

    cols = (
        [alpha_alt[dup][:, None], betas_alt[dup]]
        + [subs_by_group.T]
        + [p_corr[dup, 0:1], q_overall[:, None]]
        + ([p_corr[dup, 1:]] if pairs else [])
    )
    site_table = np.concatenate(cols, axis=1)

    headers = [["alpha", "Synonymous substitution rate at a site"]]
    for name in data.group_names:
        headers.append(
            [f"beta ({name})",
             f"Non-synonymous substitution rate at a site for {name} branches"]
        )
    for name in data.group_names:
        headers.append(
            [f"subs ({name})", f"Substitutions mapped to {name} branches"]
        )
    headers.append(["P-value (overall)", "Overall p-value that non-synonymous rates differ between groups (Holm-Bonferroni)"])
    headers.append(["Q-value (overall)", "Benjamini-Hochberg q-value for the overall test"])
    for (g1, g2) in pairs:
        headers.append(
            [f"P-value for {data.group_names[g1]} vs {data.group_names[g2]}",
             "Pairwise difference test (Holm-Bonferroni corrected)"]
        )

    sig = int((p_corr[dup, 0] <= pvalue).sum())
    fdr_sites = int((q_overall <= qvalue).sum())
    json = analysis_json(
        info="Contrast-FEL (Fixed Effects Likelihood) investigates whether "
             "selective pressures differ between two or more sets of branches "
             "at a site",
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
    return ContrastFELResult(
        json=json, site_table=site_table, headers=headers,
        group_names=data.group_names, data=data,
    )


def _substitution_counts(
    data: common.LoadedData, mg: common.MG94Fit, n_groups: int
) -> np.ndarray:
    """[n_groups, sites] substitution counts from joint ML ancestral states
    (contrast-fel.bf:786-800 via ancestral.ComputeSubstitutionCounts)."""
    from hyphy_tpu.methods.slac import _leaf_state_coding
    from hyphy_tpu.ops import ancestral

    filt = data.codon_filter
    model = mg.model
    params = {k: jnp.asarray(v) for k, v in mg.params.items()}
    out = model.build(params, data.tree.n_branches)
    lp = jnp.asarray(filt.leaf_partials())
    joint = ancestral.joint_reconstruct(
        out.p_matrices, lp, out.root_freqs,
        pruning.build_pruning_data(data.tree),
    )
    states = np.concatenate(
        [_leaf_state_coding(filt), np.asarray(joint.internal_states)], axis=0
    )  # [nodes, patterns]; <0 = unresolved/ambiguous (not counted)
    parent = data.tree.parent
    dup = filt.duplicate_map
    counts = np.zeros((n_groups, len(dup)))
    for b in range(data.tree.n_branches):
        child = states[b][dup]
        par = states[parent[b]][dup]
        g = data.branch_groups[b]
        counts[g] += (child != par) & (child >= 0) & (par >= 0)
    return counts
