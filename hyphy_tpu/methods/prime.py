"""PRIME — PRoperty Informed Model of Evolution.

Reference: ``res/TemplateBatchFiles/SelectionAnalyses/PRIME.bf`` with the
property model ``libv3/models/codon/MG_REV_PROPERTIES.bf``.  Per site, the
non-synonymous rate from amino acid X to Y is

    beta(X, Y) = beta * Exp(-sum_p lambda_p * |prop_p(X) - prop_p(Y)|)

(local-form rate entry, ``MG_REV_PROPERTIES.bf:857-871``) with properties
from the Atchley et al. 2005 factor analysis (five factors, values
embedded at ``MG_REV_PROPERTIES.bf:30-141``; PNAS 102(18):6395).  Each
property's importance lambda_p in [-10, 10] is LRT-tested against the
lambda_p := 0 null (chi^2_1), Holm-Bonferroni corrected within a site
(``PRIME.bf:658``).

TPU structure mirrors FEL: per-site fits are batched (vmapped
Nelder-Mead — derivative-free, so the per-site eigendecomposition inside
the objective needs no AD rule) and sharded over the site axis.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from hyphy_tpu.data.genetic_code import AMINO_ACIDS
from hyphy_tpu.methods import common
from hyphy_tpu.models.base import fill_diagonal_from_rows
from hyphy_tpu.models.parameters import ParamSpec
from hyphy_tpu.ops import expm as expm_ops
from hyphy_tpu.ops import pruning
from hyphy_tpu.optimize.batched import grid_best_starts
from hyphy_tpu.optimize.nelder_mead import vmapped_nelder_mead
from hyphy_tpu.io.json_out import analysis_json, model_fit_entry

# Atchley et al. 2005 five-factor amino-acid property scores
# (MG_REV_PROPERTIES.bf:30-141; PNAS 102(18):6395, Table 2), keyed by the
# one-letter code in AMINO_ACIDS order below.
ATCHLEY = {
    "Factor I bipolar": {
        "A": -0.591, "C": -1.343, "D": 1.05, "E": 1.357, "F": -1.006,
        "G": -0.384, "H": 0.336, "I": -1.239, "K": 1.831, "L": -1.019,
        "M": -0.663, "N": 0.945, "P": 0.189, "Q": 0.931, "R": 1.538,
        "S": -0.228, "T": -0.032, "V": -1.337, "W": -0.595, "Y": 0.26,
    },
    "Factor II secondary structure": {
        "A": -1.302, "C": 0.465, "D": 0.302, "E": -1.453, "F": -0.59,
        "G": 1.652, "H": -0.417, "I": -0.547, "K": -0.561, "L": -0.987,
        "M": -1.524, "N": 0.828, "P": 2.081, "Q": -0.179, "R": -0.055,
        "S": 1.399, "T": 0.326, "V": -0.279, "W": 0.009, "Y": 0.83,
    },
    "Factor III volume": {
        "A": -0.733, "C": -0.862, "D": -3.656, "E": 1.477, "F": 1.891,
        "G": 1.33, "H": -1.673, "I": 2.131, "K": 0.533, "L": -1.505,
        "M": 2.219, "N": 1.299, "P": -1.628, "Q": -3.005, "R": 1.502,
        "S": -4.76, "T": 2.213, "V": -0.544, "W": 0.672, "Y": 3.097,
    },
    "Factor IV composition": {
        "A": 1.57, "C": -1.02, "D": -0.259, "E": 0.113, "F": -0.397,
        "G": 1.045, "H": -1.474, "I": 0.393, "K": -0.277, "L": 1.266,
        "M": -1.005, "N": -0.169, "P": 0.421, "Q": -0.503, "R": 0.44,
        "S": 0.67, "T": 0.908, "V": 1.242, "W": -2.128, "Y": -0.838,
    },
    "Factor V charge": {
        "A": -0.146, "C": -0.255, "D": -3.242, "E": -0.837, "F": 0.412,
        "G": 2.064, "H": -0.078, "I": 0.816, "K": 1.648, "L": -0.912,
        "M": 1.212, "N": 0.933, "P": -1.392, "Q": -1.853, "R": 2.897,
        "S": -2.647, "T": 1.313, "V": -1.262, "W": -0.184, "Y": 1.512,
    },
}


def property_distance_tensors(gc, properties=None) -> List[np.ndarray]:
    """[P] dense [S, S] |prop(X) - prop(Y)| tables over sense codons."""
    aa_idx = gc.sense_amino_acids                      # [S] index into AMINO_ACIDS
    out = []
    for name, values in (properties or ATCHLEY).items():
        v = np.array([values[AMINO_ACIDS[i]] for i in aa_idx])
        out.append(np.abs(v[:, None] - v[None, :]))
    return out


@dataclasses.dataclass
class PRIMEResult:
    json: Dict
    site_table: np.ndarray
    headers: list
    data: common.LoadedData


def run(
    alignment: str,
    genetic_code: str = "Universal",
    tree: Optional[str] = None,
    branches: str = "All",
    pvalue: float = 0.1,
    precision: float = 1e-5,
    properties: Optional[Dict[str, Dict[str, float]]] = None,
) -> PRIMEResult:
    """``properties``: optional custom property set (name -> one-letter-code
    -> value), the reference's "Custom" option (MG_REV_PROPERTIES.bf:693);
    default Atchley."""
    properties = properties or ATCHLEY
    data = common.load_codon_data(alignment, genetic_code, tree, branches)
    gtr = common.fit_gtr(data, precision=precision)
    mg = common.fit_partitioned_mg94(data, gtr, precision=precision)

    filt = data.codon_filter
    tested = data.tested_branches
    has_background = bool((~tested).any())
    n_patterns = filt.n_patterns
    model = mg.model
    q_syn, q_non = model.basis_matrices(mg.params)
    freqs = model.frequencies
    alpha_hat = jnp.asarray(mg.alphas)
    leaf_partials = jnp.asarray(filt.leaf_partials())
    pdata = pruning.build_pruning_data(data.tree)
    group_of_branch = jnp.asarray(np.where(tested, 0, 1).astype(np.int32))
    dists = jnp.asarray(
        np.stack(property_distance_tensors(data.genetic_code, properties))
    )
    prop_names = list(properties)
    n_props = len(prop_names)

    def _site_loglik(i, p, zero_mask):
        """zero_mask [P]: 1 = property active, 0 = lambda pinned to 0."""
        lam = jnp.stack([p[f"lambda_{k}"] for k in range(n_props)]) * zero_mask
        # exponent clamped like the reference's Min(10000, ...) rate cap
        mod = jnp.exp(jnp.clip(-(lam[:, None, None] * dists).sum(0), -23.0, 9.2))
        q_t = fill_diagonal_from_rows(
            p["alpha"] * q_syn + p["beta"] * q_non * mod
        )
        leaf_vecs = leaf_partials[:, i, :]
        if has_background:
            q_bg = fill_diagonal_from_rows(
                p["alpha"] * q_syn + p["beta_bg"] * q_non
            )
            m = jnp.stack([q_t, q_bg])
            left, lam_e, right = expm_ops.reversible_spectral(m, freqs)
            return pruning.single_site_log_likelihood_spectral(
                left[group_of_branch], lam_e[group_of_branch],
                right[group_of_branch], alpha_hat, leaf_vecs, freqs, pdata,
            )
        left, lam_e, right = expm_ops.reversible_spectral(q_t, freqs)
        return pruning.single_site_log_likelihood_spectral(
            left, lam_e, right, alpha_hat, leaf_vecs, freqs, pdata,
        )

    specs = {
        "alpha": ParamSpec(init=1.0, lower=0.0, upper=10000.0),
        "beta": ParamSpec(init=1.0, lower=0.0, upper=10000.0),
    }
    for k in range(n_props):
        specs[f"lambda_{k}"] = ParamSpec(init=0.1, lower=-10.0, upper=10.0)
    if has_background:
        specs["beta_bg"] = ParamSpec(init=1.0, lower=0.0, upper=10000.0)

    start_ab = np.array([(1.0, 0.5), (1.0, 1.0), (0.5, 2.0), (2.0, 0.25)])
    grid = {
        "alpha": jnp.asarray(start_ab[:, 0]),
        "beta": jnp.asarray(start_ab[:, 1]),
    }
    for k in range(n_props):
        grid[f"lambda_{k}"] = jnp.full(len(start_ab), 0.1)
    if has_background:
        grid["beta_bg"] = jnp.asarray(start_ab[:, 1])

    ones_mask = jnp.ones(n_props)

    def fit_all_sites(idx, _init):
        full_obj = lambda i, p: _site_loglik(i, p, ones_mask)
        starts, _ = grid_best_starts(full_obj, grid, idx)
        full_params, full_lnl = vmapped_nelder_mead(
            full_obj, specs, starts, idx, max_iterations=400
        )
        outs = [full_lnl]
        for k in range(n_props):
            outs.append(full_params[f"lambda_{k}"])
        outs.extend([full_params["alpha"], full_params["beta"]])
        # per-property nulls: lambda_k := 0, warm-started from the full fit
        for k in range(n_props):
            mask = ones_mask.at[k].set(0.0)
            null_obj = lambda i, p, m=mask: _site_loglik(i, p, m)
            null_params, null_lnl = vmapped_nelder_mead(
                null_obj, specs, full_params, idx, max_iterations=250
            )
            outs.append(null_lnl)
        return tuple(outs)

    from hyphy_tpu.parallel.mesh import sharded_site_solve

    results = [np.array(x) for x in sharded_site_solve(fit_all_sites, {}, n_patterns)]
    full_lnl = results[0]
    lambdas = np.stack(results[1 : 1 + n_props], axis=1)        # [N, P]
    alpha = results[1 + n_props]
    beta = results[2 + n_props]
    null_lnls = np.stack(results[3 + n_props :], axis=1)        # [N, P]

    lrt = np.maximum(2.0 * (full_lnl[:, None] - null_lnls), 0.0)
    pvals = np.vectorize(lambda x: common.chi2_sf(x, 1))(lrt)

    constant = filt.constant_pattern_mask()
    alpha[constant] = 0.0
    beta[constant] = 0.0
    lambdas[constant] = 0.0
    lrt[constant] = 0.0
    pvals[constant] = 1.0

    dup = filt.duplicate_map
    cols = [alpha[dup], beta[dup], full_lnl[dup]]
    headers = [
        ["alpha;", "Synonymous substitution rate at a site"],
        ["&beta;", "Non-synonymous substitution rate at a site"],
        ["log L", "Site log likelihood under the full property model"],
    ]
    for k, name in enumerate(prop_names):
        cols.extend([lambdas[dup, k], lrt[dup, k], pvals[dup, k]])
        headers.extend([
            [f"lambda{k + 1}", f"Importance of {name}"],
            [f"LRT{k + 1}", f"LRT statistic for lambda ({name}) = 0"],
            [f"p{k + 1}", f"p-value for non-zero importance of {name}"],
        ])
    site_table = np.stack(cols, axis=1)

    json = analysis_json(
        info="PRIME (PRoperty Informed Model of Evolution): tests whether "
             "non-synonymous substitution rates at a site depend on five "
             "amino-acid properties (Atchley factors)",
        version="0.1",
        data=data,
        fits={
            "Nucleotide GTR": model_fit_entry(
                gtr.loglik, gtr.n_parameters, data.sample_size,
                frequencies=gtr.frequencies, display_order=0,
            ),
            "Global MG94xREV": model_fit_entry(
                mg.loglik, mg.n_parameters, data.sample_size,
                frequencies=mg.codon_freqs, display_order=1,
            ),
        },
        extra={
            "MLE": {"headers": headers, "content": {"0": site_table.tolist()}},
            "analysis properties": prop_names,
        },
    )
    return PRIMEResult(json=json, site_table=site_table, headers=headers, data=data)
