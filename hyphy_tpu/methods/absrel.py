"""aBSREL — adaptive Branch-Site Random Effects Likelihood.

Reference: ``SelectionAnalyses/aBSREL.bf``.  Pipeline: GTR -> MG94 ->
per-branch one-omega baseline -> step-up complexity selection (branches
sorted by length; add omega classes while AIC-c improves, max 5;
``aBSREL.bf:385-460``) -> per-branch LRTs (max-omega := 1 null) with
p = 0.5 * (1 - 0.4 chi2_1 - 0.6 chi2_2) (``aBSREL.bf:935-939``) and
Holm-Bonferroni correction over tested branches.

TPU structure: ragged per-branch class counts are padded to KMAX with
stick-breaking fractions forced to 1 at the branch's last active class
(zero weight beyond) — `n_classes` is a traced array, so one compiled
likelihood serves every step-up state.
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

from hyphy_tpu.io.json_out import analysis_json, model_fit_entry, aic_c
from hyphy_tpu.methods import common
from hyphy_tpu.models.bsrel import BSRELEngine
from hyphy_tpu.models.codon import MG94Base
from hyphy_tpu.models.parameters import ParamSpec, Specs
from hyphy_tpu.ops import pruning
# mixture-model fits (bounded omegas/weights at vertices of the box)
# optimize far better under the logit-remapped jittable L-BFGS than
# under raw-space L-BFGS-B, which stalls on projected corner steps
from hyphy_tpu.optimize.core import maximize_jax as maximize

KMAX = 5  # reference: at most 5 rate classes per branch (aBSREL.bf:29)


def _progress(msg):
    if os.environ.get("HYPHY_TPU_PROGRESS", "1") != "0":
        print(f"[absrel {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def holm_bonferroni(p_values: Dict[str, float]) -> Dict[str, float]:
    """Holm-Bonferroni correction (reference: math.HolmBonferroniCorrection)."""
    items = sorted(p_values.items(), key=lambda kv: kv[1])
    m = len(items)
    corrected = {}
    running = 0.0
    for rank, (name, p) in enumerate(items):
        adj = min(1.0, p * (m - rank))
        running = max(running, adj)
        corrected[name] = running
    return corrected


@dataclasses.dataclass
class ABSRELResult:
    json: Dict
    full_lnl: float
    baseline_lnl: float
    n_classes: np.ndarray
    branch_lrt: Dict[str, float]
    branch_p: Dict[str, float]
    branch_p_corrected: Dict[str, float]
    positive_branches: list
    data: common.LoadedData
    gtr: common.GTRFit
    mg94: common.MG94Fit


def _srv_json(engine, params, branch_distributions, srv_dist, n_classes, filt):
    """Fitted synonymous-rate GDD + per-site class posteriors
    (reference aBSREL.bf:1371-1390 _report_srv + "Synonymous
    site-posteriors", aBSREL.bf:44)."""
    import jax.numpy as jnp

    rates, wsrv = srv_dist(params)
    omegas, weights = branch_distributions(params, jnp.asarray(n_classes))
    class_sll = np.asarray(engine.class_site_log_likelihoods(
        params, omegas, weights, params["t"], rates
    ))                                                     # [C, patterns]
    logw = np.log(np.maximum(np.asarray(wsrv), 1e-300))[:, None]
    lp = class_sll + logw
    lp -= lp.max(axis=0, keepdims=True)
    post = np.exp(lp) / np.exp(lp).sum(axis=0, keepdims=True)
    return {
        "Synonymous site-posteriors": post[:, filt.duplicate_map].tolist(),
        "Synonymous site-to-site rates": [
            [float(r), float(w)]
            for r, w in zip(np.asarray(rates), np.asarray(wsrv))
        ],
    }


def run(
    alignment: str,
    genetic_code: str = "Universal",
    tree: Optional[str] = None,
    branches: str = "All",
    pvalue: float = 0.05,
    precision: float = 1e-4,
    multiple_hits: str = "None",
    srv: bool = False,
    srv_classes: int = 3,
) -> ABSRELResult:
    """``multiple_hits``: "Double"/"Double+Triple" adds BRANCH-SPECIFIC
    2-hit (delta) and 3-hit (psi) substitution rates to every branch's
    rate-class mixture (reference --multiple-hits, aBSREL.bf:124-133;
    golden ABSREL-MH.wbf).

    ``srv``: layer a shared ``srv_classes``-bin unit-mean GDD synonymous
    rate distribution over every model in the pipeline (reference --srv,
    aBSREL.bf:135-157,216-229: rate_variation.types.GDD wrapped around the
    model generator); per-site class posteriors are reported under
    "Synonymous site-posteriors" (aBSREL.bf:44)."""
    mh = multiple_hits not in (None, "None", "")
    mh_triple = multiple_hits == "Double+Triple"
    data = common.load_codon_data(alignment, genetic_code, tree, branches)
    _progress("fitting nucleotide GTR")
    gtr = common.fit_gtr(data, precision=1e-5)
    _progress(f"GTR lnL {gtr.loglik:.3f}; fitting global MG94xREV")
    mg = common.fit_partitioned_mg94(
        data, gtr, precision=1e-5, multiple_hits=multiple_hits
    )
    _progress(f"MG94 lnL {mg.loglik:.3f}")

    filt = data.codon_filter
    gc = data.genetic_code
    tree_obj = data.tree
    n_branches = tree_obj.n_branches
    tested = data.tested_branches
    sample_size = data.sample_size

    mg94 = MG94Base(gc, mg.corner_freqs, mg.codon_freqs)
    basis_fn = None
    if mh:
        # per-branch delta/psi fold into that branch's bases ([B,S,S]):
        # Q_{b,k} = t_b [ (Q1s + d_b Q2s + p_b Q3s)
        #                 + omega_{b,k} (Q1n + d_b Q2n + p_b Q3n) ]
        def basis_fn(params):
            q1s, q1n = mg94.basis_matrices(params)
            q2s, q2n = mg94.multihit_basis_matrices(params, 2)
            d = params["delta"][:, None, None]
            qs = q1s[None] + d * q2s[None]
            qn = q1n[None] + d * q2n[None]
            if mh_triple:
                q3s, q3n = mg94.multihit_basis_matrices(params, 3)
                p = params["psi"][:, None, None]
                qs = qs + p * q3s[None]
                qn = qn + p * q3n[None]
            return qs, qn

    pdata = pruning.build_pruning_data(tree_obj)
    c_srv = srv_classes if srv else 1
    engine = BSRELEngine(
        mg94, pdata, jnp.asarray(filt.leaf_partials()), filt.pattern_weights,
        np.arange(n_branches, dtype=np.int32), srv_classes=c_srv,
        basis_fn=basis_fn,
    )

    specs: Specs = dict(MG94Base.theta_specs())
    specs["t"] = ParamSpec(init=0.05, lower=0.0, upper=10000.0, shape=(n_branches,))
    specs["omega_last"] = ParamSpec(init=0.3, lower=0.0, upper=10000.0, shape=(n_branches,))
    specs["omega_raw"] = ParamSpec(init=0.2, lower=0.0, upper=1.0, shape=(n_branches, KMAX - 1))
    specs["fracs"] = ParamSpec(init=0.5, lower=0.0, upper=1.0, shape=(n_branches, KMAX - 1))
    if mh:
        specs["delta"] = ParamSpec(init=0.05, lower=0.0, upper=100.0, shape=(n_branches,))
        if mh_triple:
            specs["psi"] = ParamSpec(init=0.05, lower=0.0, upper=100.0, shape=(n_branches,))
    if srv:
        for i in range(1, c_srv + 1):
            specs[f"srv_rate_{i}"] = ParamSpec(init=0.3 * i, lower=0.0, upper=10000.0)
        for i in range(1, c_srv):
            specs[f"srv_w_{i}"] = ParamSpec(init=1.0 / c_srv, lower=0.0, upper=1.0)

    idx_k = jnp.arange(KMAX)

    def branch_distributions(params, n_classes):
        """(omegas [B,KMAX], weights [B,KMAX]) with padding beyond the
        branch's active class count."""
        n = jnp.asarray(n_classes)[:, None]                  # [B,1]
        omegas = jnp.where(
            idx_k[None, :] < n - 1,
            jnp.pad(params["omega_raw"], ((0, 0), (0, 1)), constant_values=1.0),
            jnp.where(idx_k[None, :] == n - 1, params["omega_last"][:, None], 1.0),
        )
        fr = jnp.where(
            idx_k[None, : KMAX - 1] >= n - 1, 1.0, params["fracs"]
        )
        rem = jnp.concatenate(
            [jnp.ones((n_branches, 1)), jnp.cumprod(1.0 - fr, axis=1)], axis=1
        )
        weights = jnp.concatenate([fr, jnp.ones((n_branches, 1))], axis=1) * rem
        return omegas, weights

    def srv_dist(params):
        if not srv:
            return jnp.ones((1,)), jnp.ones((1,))
        from hyphy_tpu.models.bsrel import srv_distribution

        return srv_distribution(params, c_srv)

    def loglik(params, n_classes):
        omegas, weights = branch_distributions(params, n_classes)
        rates, wsrv = srv_dist(params)
        return engine.loglik(
            params, omegas, weights, params["t"], rates, wsrv
        )

    def fit(init, n_classes, fixed=None, prec=precision, max_iterations=None):
        fixed = fixed or {}
        free_specs = {k: v for k, v in specs.items() if k not in fixed}
        free_init = {k: v for k, v in init.items() if k in free_specs}

        def obj(free):
            merged = dict(free)
            merged.update(fixed)
            return loglik(merged, jnp.asarray(n_classes))

        p, v, _ = maximize(obj, free_specs, free_init, precision=prec,
                           max_iterations=max_iterations)
        out = dict(p)
        out.update(fixed)
        return out, float(v)

    def n_params(n_classes):
        # per branch: t + n omegas + (n-1) weights [+ delta/psi];
        # + 5 thetas + 9 empirical
        per_branch_mh = (1 if mh else 0) + (1 if mh_triple else 0)
        shared_srv = (2 * c_srv - 1) if srv else 0
        return int(
            5 + 9 + shared_srv + sum(2 * int(c) + per_branch_mh for c in n_classes)
        )

    # -- baseline: one omega per branch ------------------------------------
    n_classes = np.ones(n_branches, dtype=np.int64)
    init = {k: s.initial() for k, s in specs.items()}
    init.update({k: jnp.asarray(v) for k, v in mg.params.items() if k.startswith("theta")})
    init["t"] = jnp.asarray(np.maximum(mg.alphas, 1e-6))
    init["omega_last"] = jnp.full((n_branches,), float(np.mean(mg.omegas)))
    if mh:
        init["delta"] = jnp.full((n_branches,), float(mg.params.get("delta", 0.05)))
        if mh_triple:
            init["psi"] = jnp.full((n_branches,), float(mg.params.get("psi", 0.05)))
    _progress("fitting baseline (one omega per branch)")
    base_params, base_lnl = fit(init, n_classes, prec=precision)
    best_aicc = aic_c(base_lnl, n_params(n_classes), sample_size)
    _progress(f"baseline lnL {base_lnl:.3f}, AIC-c {best_aicc:.2f}")

    # -- step-up complexity selection --------------------------------------
    base_bl = mg.branch_lengths
    order = np.argsort(-base_bl)
    params = base_params
    current_lnl = base_lnl
    for b in order:
        while n_classes[b] < KMAX:
            trial = n_classes.copy()
            trial[b] += 1
            # seed the new class: previous last omega becomes the new last;
            # earlier classes keep values
            trial_init = dict(params)
            cand_params, cand_lnl = fit(trial_init, trial, prec=0.01,
                                        max_iterations=250)
            cand_aicc = aic_c(cand_lnl, n_params(trial), sample_size)
            if cand_aicc < best_aicc:
                n_classes = trial
                params, current_lnl = cand_params, cand_lnl
                best_aicc = cand_aicc
                _progress(
                    f"branch {tree_obj.names[b]} -> {n_classes[b]} classes "
                    f"(lnL {cand_lnl:.3f}, AIC-c {cand_aicc:.2f})"
                )
            else:
                break

    # polish the full adaptive model
    params, full_lnl = fit(params, n_classes, prec=precision)
    _progress(f"full adaptive model lnL {full_lnl:.3f}")

    # -- per-branch tests ---------------------------------------------------
    omegas_mle, weights_mle = (np.asarray(x) for x in branch_distributions(params, n_classes))
    branch_lrt, branch_p = {}, {}
    for b in range(n_branches):
        name = tree_obj.names[b]
        if not tested[b]:
            continue
        max_omega = omegas_mle[b, n_classes[b] - 1]
        if max_omega <= 1.0:
            branch_lrt[name] = 0.0
            branch_p[name] = 1.0
            continue
        # null: the branch's last active omega := 1
        null_init = dict(params)
        null_init["omega_last"] = params["omega_last"].at[b].set(1.0) \
            if hasattr(params["omega_last"], "at") else params["omega_last"]
        fixed_omega_last = jnp.asarray(null_init["omega_last"])

        def null_obj(free):
            merged = dict(free)
            merged["omega_last"] = jnp.asarray(merged["omega_last"]).at[b].set(1.0)
            return loglik(merged, jnp.asarray(n_classes))

        free_specs = dict(specs)
        free_init = {k: v for k, v in null_init.items() if k in free_specs}
        p_null, v_null, _ = maximize(null_obj, free_specs, free_init,
                                     precision=precision)
        lrt = max(2.0 * (full_lnl - float(v_null)), 0.0)
        branch_lrt[name] = lrt
        branch_p[name] = 0.5 * (
            1.0
            - 0.4 * (1.0 - common.chi2_sf(lrt, 1))
            - 0.6 * (1.0 - common.chi2_sf(lrt, 2))
        )
        _progress(f"tested {name}: LRT {lrt:.3f}, p {branch_p[name]:.4f}")

    corrected = holm_bonferroni(branch_p) if branch_p else {}
    positives = [n for n, p in corrected.items() if p <= pvalue]

    # -- JSON ---------------------------------------------------------------
    t_mle = np.asarray(params["t"])
    mean_omega_b = (omegas_mle * weights_mle).sum(axis=1)
    if mh:
        qs_b, qn_b = (np.asarray(x) for x in basis_fn(params))   # [B,S,S]
        freqs_np = np.asarray(mg94.frequencies)
        rs_b = qs_b.sum(-1) @ freqs_np
        rn_b = qn_b.sum(-1) @ freqs_np
        full_bl = t_mle * (rs_b + mean_omega_b * rn_b) / 3.0
    else:
        rate_syn, rate_non = (float(x) for x in mg94.syn_nonsyn_unit_rates(params))
        full_bl = t_mle * (rate_syn + mean_omega_b * rate_non) / 3.0

    branch_attributes = {"0": {}}
    for b in range(n_branches):
        name = tree_obj.names[b]
        dist = [
            [float(omegas_mle[b, i]), float(weights_mle[b, i])]
            for i in range(n_classes[b])
        ]
        entry = {
            "Rate classes": int(n_classes[b]),
            "Rate Distributions": dist,
            "Full adaptive model": float(full_bl[b]),
            "Baseline MG94xREV": float(base_bl[b]),
        }
        if mh:
            # all-terms.bf:490-491 vocabulary, as in the reference JSON
            entry["rate at which 2 nucleotides are changed instantly within a single codon"] = \
                float(np.asarray(params["delta"])[b])
            if mh_triple:
                entry["rate at which 3 nucleotides are changed instantly within a single codon"] = \
                    float(np.asarray(params["psi"])[b])
        if name in branch_lrt:
            entry["LRT"] = branch_lrt[name]
            entry["Uncorrected P-value"] = branch_p[name]
            entry["Corrected P-value"] = corrected[name]
        branch_attributes["0"][name] = entry

    json = analysis_json(
        info="aBSREL (Adaptive branch-site random effects likelihood) uses an "
             "adaptive random effects branch-site model framework",
        version="2.3",
        data=data,
        fits={
            "Nucleotide GTR": model_fit_entry(
                gtr.loglik, gtr.n_parameters, sample_size,
                frequencies=gtr.frequencies, display_order=0,
            ),
            "Baseline MG94xREV": model_fit_entry(
                base_lnl, n_params(np.ones(n_branches)) , sample_size, display_order=1,
            ),
            "Full adaptive model": model_fit_entry(
                full_lnl, n_params(n_classes), sample_size, display_order=2,
            ),
        },
        extra={
            "test results": {
                "positive test results": len(positives),
                "tested": int(tested.sum()),
                "P-value threshold": pvalue,
            },
            "branch attributes": branch_attributes,
            **(_srv_json(engine, params, branch_distributions, srv_dist,
                         n_classes, filt) if srv else {}),
        },
    )
    return ABSRELResult(
        json=json, full_lnl=full_lnl, baseline_lnl=base_lnl,
        n_classes=n_classes, branch_lrt=branch_lrt, branch_p=branch_p,
        branch_p_corrected=corrected, positive_branches=positives,
        data=data, gtr=gtr, mg94=mg,
    )
