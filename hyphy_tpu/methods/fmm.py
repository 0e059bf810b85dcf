"""FitMultiModel (FMM) — compare codon models with double / triple
instantaneous substitutions.

Reference: ``res/TemplateBatchFiles/FitMultiModel.bf``.  Pipeline:
nucleotide GTR fit -> standard MG94xREV fit -> MG94xREV + double-hit rate
(delta, ``MG_REV_MH.bf``) -> MG94xREV + double & triple hits (delta, psi,
``MG_REV_TRIP.bf``); LRTs between nested pairs (chi^2 with 1 / 1 / 2 df)
and per-site evidence ratios exp(site lnL_MH - site lnL_standard) flag
sites driving multi-hit support (FitMultiModel.bf ~"Evidence Ratios").
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from hyphy_tpu.io.json_out import analysis_json, model_fit_entry
from hyphy_tpu.likelihood import LikelihoodFunction, Partition
from hyphy_tpu.methods import common
from hyphy_tpu.models.codon import MG94xREVMultiHit


@dataclasses.dataclass
class FMMResult:
    json: Dict
    loglik_standard: float
    loglik_double: float
    loglik_triple: float
    delta: float
    psi: float
    data: common.LoadedData


def _fit_mh(data, mg, triple: bool, precision: float):
    model = MG94xREVMultiHit(
        data.genetic_code,
        mg.corner_freqs,
        mg.codon_freqs,
        branch_groups=data.branch_groups,
        n_groups=int(data.branch_groups.max()) + 1,
        triple=triple,
    )
    lf = LikelihoodFunction([Partition(data.codon_filter, data.tree, model)])
    init = {k: jnp.asarray(v) for k, v in mg.params.items() if k.startswith("theta")}
    init["omega"] = jnp.asarray(mg.omegas)
    init["alpha"] = jnp.asarray(mg.alphas)
    init["delta"] = jnp.asarray(0.05)
    if triple:
        init["psi"] = jnp.asarray(0.05)
    res = lf.fit(init=init, precision=precision)
    site_lnl = np.asarray(lf.site_log_likelihoods(res.params)[0])
    return res, model, site_lnl


def run(
    alignment: str,
    genetic_code: str = "Universal",
    tree: Optional[str] = None,
    precision: float = 1e-5,
) -> FMMResult:
    data = common.load_codon_data(alignment, genetic_code, tree, "All")
    gtr = common.fit_gtr(data, precision=precision)
    mg = common.fit_partitioned_mg94(data, gtr, precision=precision)

    # per-site vectors under the standard model
    lf_std = LikelihoodFunction(
        [Partition(data.codon_filter, data.tree, mg.model)]
    )
    std_site_lnl = np.asarray(
        lf_std.site_log_likelihoods(
            {k: jnp.asarray(v) for k, v in mg.params.items()}
        )[0]
    )

    res2, model2, site2 = _fit_mh(data, mg, triple=False, precision=precision)
    res3, model3, site3 = _fit_mh(data, mg, triple=True, precision=precision)

    lrt21, p21 = common.lrt(res2.loglik, mg.loglik, 1)
    lrt32, p32 = common.lrt(res3.loglik, res2.loglik, 1)
    lrt31, p31 = common.lrt(res3.loglik, mg.loglik, 2)

    dup = data.codon_filter.duplicate_map
    er_double = np.exp(np.clip(site2[dup] - std_site_lnl[dup], -700, 700))
    er_triple = np.exp(np.clip(site3[dup] - site2[dup], -700, 700))

    delta2 = float(res2.params["delta"])
    delta3 = float(res3.params["delta"])
    psi3 = float(res3.params["psi"])

    json = analysis_json(
        info="FitMultiModel fits MG94xREV models allowing double and triple "
             "instantaneous nucleotide substitutions within a codon and "
             "compares them to the standard single-hit model",
        version="0.3",
        data=data,
        fits={
            "Nucleotide GTR": model_fit_entry(
                gtr.loglik, gtr.n_parameters, data.sample_size,
                frequencies=gtr.frequencies, display_order=0,
            ),
            "Standard MG94": model_fit_entry(
                mg.loglik, mg.n_parameters, data.sample_size,
                frequencies=mg.codon_freqs, display_order=1,
            ),
            "MG94 with double instantaneous substitutions": model_fit_entry(
                res2.loglik, res2.n_free_parameters + 9, data.sample_size,
                frequencies=mg.codon_freqs, display_order=2,
                rate_distributions={"rate at which 2 nucleotides are changed instantly within a single codon": [[delta2, 1.0]]},
            ),
            "MG94 with double and triple instantaneous substitutions": model_fit_entry(
                res3.loglik, res3.n_free_parameters + 9, data.sample_size,
                frequencies=mg.codon_freqs, display_order=3,
                rate_distributions={
                    "rate at which 2 nucleotides are changed instantly within a single codon": [[delta3, 1.0]],
                    "rate at which 3 nucleotides are changed instantly within a single codon": [[psi3, 1.0]],
                },
            ),
        },
        extra={
            "test results": {
                "Double-hit vs single-hit": {"LRT": lrt21, "p-value": p21},
                "Triple-hit vs double-hit": {"LRT": lrt32, "p-value": p32},
                "Triple-hit vs single-hit": {"LRT": lrt31, "p-value": p31},
            },
            "Evidence Ratios": {
                "Two-hit": [er_double.tolist()],
                "Three-hit": [er_triple.tolist()],
            },
            "Site Log Likelihood": {
                "Standard": [std_site_lnl[dup].tolist()],
                "Double-hit": [site2[dup].tolist()],
                "Triple-hit": [site3[dup].tolist()],
            },
        },
    )
    return FMMResult(
        json=json,
        loglik_standard=mg.loglik,
        loglik_double=res2.loglik,
        loglik_triple=res3.loglik,
        delta=delta3,
        psi=psi3,
        data=data,
    )
