"""LEISR — per-site relative evolutionary rate inference
(Rate4Site-like; Spielman & Kosakovsky Pond 2018).

Reference: ``res/TemplateBatchFiles/LEISR.bf``.  Pipeline:

1. fit a baseline model with free branch lengths — GTR/HKY85/JC69
   (nucleotide) or LG/WAG/JTT "+F" (protein), optionally with 4-bin Gamma
   rate variation on branch lengths (LEISR.bf:104-135);
2. per site, a single global scaler ``r`` multiplies every branch length
   (estimators.ApplyExistingEstimates proportional-scaler mode,
   LEISR.bf:268-271); fit r per site (LEISR.bf:393-449);
3. 95% profile-likelihood CI per site via ``parameters.GetProfileCI``
   (LEISR.bf:449): lnL(r) = lnL_max − χ²₁(0.95)/2.

Output columns (LEISR.bf:202-206): MLE, Lower, Upper, LogL global
(site lnL at r=1), LogL local (site lnL at the MLE).

TPU structure: the per-site fits and both CI root-finds run as one
vmapped/bisection program over all patterns at once, sharded over the
device mesh — there is no per-site Python.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hyphy_tpu.data.alignment import read_alignment
from hyphy_tpu.data.filter import DataFilter
from hyphy_tpu.likelihood import LikelihoodFunction, Partition
from hyphy_tpu.models import frequencies as freq_mod
from hyphy_tpu.models.dna import GTR, HKY85, JC69
from hyphy_tpu.models.parameters import ParamSpec
from hyphy_tpu.models.protein import EmpiricalProtein
from hyphy_tpu.ops import expm as expm_ops
from hyphy_tpu.ops import pruning
from hyphy_tpu.optimize.nelder_mead import vmapped_nelder_mead
from hyphy_tpu.tree.topology import Tree
from hyphy_tpu.io.json_out import model_fit_entry

_CHI2_95_HALF = 1.9207294  # chi^2_1 0.95 quantile / 2


@dataclasses.dataclass
class LEISRResult:
    json: Dict
    site_table: np.ndarray      # [sites, 5]
    headers: List
    rates: np.ndarray           # per-site MLE rate
    baseline_loglik: float


def _nucleotide_model(name: str, filt: DataFilter):
    freqs = freq_mod.empirical_nucleotide(filt)
    if name.upper() == "GTR":
        return GTR(freqs)
    if name.upper() in ("HKY85", "HKY"):
        return HKY85(freqs)
    if name.upper() in ("JC69", "JC"):
        return JC69()
    raise ValueError(f"unknown nucleotide model {name!r}")


def vmapped_profile_ci(
    loglik_fn,
    idx: jnp.ndarray,
    r_mle: jnp.ndarray,
    lnl_mle: jnp.ndarray,
    level_drop: float = _CHI2_95_HALF,
    lower_floor: float = 1e-8,
    upper_cap: float = 1e26,
    iters: int = 60,
):
    """Batched profile-likelihood CI (parameters.GetProfileCI semantics):
    per item, bisect for the two roots of lnL(r) = lnL_mle − level_drop
    on either side of the MLE, in log space.  Fixed-trip bisection — no
    data-dependent control flow, vmap/shard friendly."""
    target = lnl_mle - level_drop
    log_mle = jnp.log(jnp.maximum(r_mle, lower_floor))

    def eval_r(log_r):
        return jax.vmap(loglik_fn)(idx, jnp.exp(log_r))

    def bisect(side):
        # side = -1 (lower) or +1 (upper); bracket [log_mle, log_mle + side*K]
        far0 = log_mle + side * 2.0
        # expand the far end until lnL(far) < target (or the bound is hit)
        def expand(carry, _):
            far = carry
            need = eval_r(far) > target
            bound = jnp.log(upper_cap) if side > 0 else jnp.log(lower_floor)
            far = jnp.where(need, jnp.clip(far + side * 3.0,
                                           jnp.log(lower_floor),
                                           jnp.log(upper_cap)), far)
            far = jnp.where(need & (jnp.abs(far - bound) < 1e-12), bound, far)
            return far, None

        far, _ = jax.lax.scan(expand, far0, None, length=10)
        hit_bound = eval_r(far) > target  # no root within bounds

        def step(carry, _):
            near, far = carry
            mid = 0.5 * (near + far)
            above = eval_r(mid) > target
            return (jnp.where(above, mid, near), jnp.where(above, far, mid)), None

        (near, far), _ = jax.lax.scan(step, (log_mle, far), None, length=iters)
        root = 0.5 * (near + far)
        bound_val = jnp.log(upper_cap) if side > 0 else jnp.log(lower_floor)
        return jnp.exp(jnp.where(hit_bound, bound_val, root))

    return bisect(-1), bisect(+1)


def run(
    alignment: str,
    datatype: str = "nucleotide",
    model: str = "GTR",
    tree: Optional[str] = None,
    precision: float = 1e-5,
) -> LEISRResult:
    aln = read_alignment(alignment)
    if datatype not in ("nucleotide", "protein"):
        raise ValueError(datatype)
    filt = DataFilter.from_alignment(aln, datatype)
    if tree is None:
        if not aln.trees:
            raise ValueError("no tree in alignment file; pass tree")
        tree = next(iter(aln.trees.values()))
    tr = Tree.from_newick(tree, leaf_order=filt.names)

    if datatype == "nucleotide":
        mdl = _nucleotide_model(model, filt)
    else:
        # reference appends +F: empirical frequencies from the data
        mdl = EmpiricalProtein(model, frequencies=freq_mod.empirical_character(filt))

    lf = LikelihoodFunction([Partition(filt, tr, mdl)])
    init = {}
    if np.isfinite(tr.input_lengths[:-1]).all():
        init["t"] = jnp.asarray(np.maximum(tr.input_lengths[:-1], 1e-6))
    res = lf.fit(init=init, precision=precision)
    t_hat = jnp.asarray(res.params["t"])

    # shared-Q spectral factors; per-site lnL(r) rescales every branch time
    q = mdl.q_matrix({k: jnp.asarray(v) for k, v in res.params.items()})
    freqs = mdl.frequencies
    left, lam, right = expm_ops.reversible_spectral(q[None], freqs)
    left, lam, right = left[0], lam[0], right[0]
    pdata = pruning.build_pruning_data(tr)
    leaf_partials = jnp.asarray(filt.leaf_partials())

    def site_lnl(i, r):
        return pruning.single_site_log_likelihood_spectral(
            left, lam, right, r * t_hat, leaf_partials[:, i, :], freqs, pdata,
        )

    n_patterns = filt.n_patterns

    def fit_all_sites(idx, _init):
        lnl_global = jax.vmap(lambda i: site_lnl(i, jnp.ones(())))(idx)
        specs = {"r": ParamSpec(init=1.0, lower=0.0, upper=1e26)}
        starts = {"r": jnp.ones(idx.shape[0])}
        params, lnl_local = vmapped_nelder_mead(
            lambda i, p: site_lnl(i, p["r"]), specs, starts, idx,
        )
        lo, hi = vmapped_profile_ci(site_lnl, idx, params["r"], lnl_local)
        return params["r"], lo, hi, lnl_global, lnl_local

    from hyphy_tpu.parallel.mesh import sharded_site_solve

    r_mle, lo, hi, lnl_global, lnl_local = (
        np.array(x) for x in sharded_site_solve(fit_all_sites, {}, n_patterns)
    )

    constant = filt.constant_pattern_mask()
    r_mle[constant] = 0.0
    lo[constant] = 0.0

    dup = filt.duplicate_map
    site_table = np.stack(
        [r_mle[dup], lo[dup], hi[dup], lnl_global[dup], lnl_local[dup]], axis=1
    )
    headers = [
        ["MLE", "Relative rate estimate at a site"],
        ["Lower", "Lower bound of 95% profile likelihood CI"],
        ["Upper", "Upper bound of 95% profile likelihood CI"],
        ["LogL global", "Site log likelihood under the global (average rate) model fit"],
        ["LogL local", "Site log likelihood under the local (site-specific rate) model fit"],
    ]

    n_sites = len(dup)
    json = {
        "analysis": {
            "info": "LEISR (Likelihood Estimation of Individual Site Rates) "
                    "infers relative amino-acid or nucleotide rates",
            "version": "0.5",
        },
        "input": {
            "file name": alignment,
            "number of sequences": filt.n_sequences,
            "number of sites": n_sites,
            "partition count": 1,
        },
        "fits": {
            f"{model}": model_fit_entry(
                res.loglik, res.n_free_parameters, n_sites * filt.n_sequences,
                frequencies=np.asarray(freqs), display_order=0,
            ),
        },
        "MLE": {"headers": headers, "content": {"0": site_table.tolist()}},
    }
    return LEISRResult(
        json=json, site_table=site_table, headers=headers,
        rates=site_table[:, 0], baseline_loglik=res.loglik,
    )
