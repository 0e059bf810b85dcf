"""BUSTED — Branch-Site Unrestricted Statistical Test for Episodic
Diversification.

Reference: ``SelectionAnalyses/BUSTED.bf``.  Pipeline: GTR -> global
MG94xREV -> unconstrained 3-class BS_REL fit on tested branches (separate
3-class distribution on background branches; optional 3-class GDD
synonymous rate variation shared by all) -> constrained (omega_3 := 1)
refit -> LRT with p = 0.5 * (chi^2_0 + chi^2_2) (BUSTED.bf:1427) and
per-site evidence ratios exp(siteL_alt - siteL_null).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hyphy_tpu.io.json_out import analysis_json, model_fit_entry
from hyphy_tpu.methods import common
from hyphy_tpu.models.bsrel import BSRELEngine, omega_distribution, srv_distribution
from hyphy_tpu.models.codon import MG94Base
from hyphy_tpu.models.parameters import ParamSpec, Specs
from hyphy_tpu.ops import pruning
# mixture-model fits (bounded omegas/weights at vertices of the box)
# optimize far better under the logit-remapped jittable L-BFGS than
# under raw-space L-BFGS-B, which stalls on projected corner steps
from hyphy_tpu.optimize.core import maximize_jax as maximize


@dataclasses.dataclass
class BUSTEDResult:
    json: Dict
    unconstrained_lnl: float
    null_lnl: float
    lrt: float
    p_value: float
    evidence_ratios: np.ndarray
    alt_params: Dict
    data: common.LoadedData
    gtr: common.GTRFit
    mg94: common.MG94Fit
    # fit context for derived analyses (BUSTED-PH refits under extra
    # constraints): {"loglik", "specs", "unpack", "k", "error_sink",
    # "has_background", "precision"}
    context: Optional[Dict] = None


def _distribution_specs(
    prefix: str,
    k: int,
    error_sink: bool = False,
    error_sink_bound: float = 100.0,
    error_sink_weight: float = 0.01,
) -> Specs:
    """BS_REL omega distribution: omega_1..k-1 in [0,1], omega_k >= 1.

    ``error_sink`` adds class 0 — high dN/dS (>= ``error_sink_bound``),
    tiny weight (<= ``error_sink_weight``) — that absorbs misalignment
    artifacts; the positive class is then capped at the error bound
    (reference ``BUSTED.bf:196-226``: error_class_range/terms.range_high,
    positive_class_range upper := error bound)."""
    specs = {}
    pos_upper = 10000.0
    if error_sink:
        specs[f"{prefix}_omega_0"] = ParamSpec(
            init=2.0 * error_sink_bound, lower=error_sink_bound, upper=1e6
        )
        specs[f"{prefix}_w_0"] = ParamSpec(
            init=min(1e-4, error_sink_weight), lower=0.0, upper=error_sink_weight
        )
        pos_upper = error_sink_bound
    for i in range(1, k):
        specs[f"{prefix}_omega_{i}"] = ParamSpec(init=0.1 * i, lower=0.0, upper=1.0)
    specs[f"{prefix}_omega_{k}"] = ParamSpec(init=1.5, lower=1.0, upper=pos_upper)
    for i in range(1, k):
        specs[f"{prefix}_w_{i}"] = ParamSpec(init=0.7 if i == 1 else 0.75, lower=0.0, upper=1.0)
    return specs


def _srv_specs(k: int) -> Specs:
    specs = {}
    for i in range(1, k + 1):
        specs[f"srv_rate_{i}"] = ParamSpec(init=0.3 * i, lower=0.0, upper=10000.0)
    for i in range(1, k):
        specs[f"srv_w_{i}"] = ParamSpec(init=1.0 / k, lower=0.0, upper=1.0)
    return specs


def _hmm_viterbi_path(engine, unpack, params, c_srv, filt):
    """Most probable synonymous-rate class per site (RunViterbi,
    likefunc2.cpp:1284)."""
    from hyphy_tpu.ops import hmm as hmm_ops

    omegas, weights, rates, wsrv = unpack(params)
    class_sll = engine.class_site_log_likelihoods(
        params, omegas, weights, params["t"], rates
    )
    trans = hmm_ops.uniform_switching_matrix(c_srv, params["srv_lambda"])
    path, _ = hmm_ops.viterbi_path(class_sll, filt.duplicate_map, trans, wsrv)
    return [int(x) for x in path]


def run(
    alignment: str,
    genetic_code: str = "Universal",
    tree: Optional[str] = None,
    branches: str = "All",
    srv: bool = True,
    rate_classes: int = 3,
    srv_classes: int = 3,
    starting_points: int = 5,
    precision: float = 1e-4,
    seed: int = 1,
    save_fit: Optional[str] = None,
    srv_hmm: bool = False,
    srv_branchsite: bool = False,
    multiple_hits: str = "None",
    error_sink: bool = False,
    error_sink_bound: float = 100.0,
    error_sink_weight: float = 0.01,
    branch_site_posteriors: bool = False,
) -> BUSTEDResult:
    """``save_fit``: path for a full-model snapshot — written after the
    unconstrained fit and reused (skipping that fit) on reruns against the
    same data (reference --save-fit / busted.use_cached_full_model,
    BUSTED.bf:680-733).

    ``srv_hmm``: the synonymous rate classes follow a hidden Markov chain
    along the alignment (uniform switching with an estimated rate
    ``srv_lambda``) instead of mixing independently per site — the
    reference's HMM SRV option (BUSTED.bf:137-158; engine
    ``SumUpHiddenMarkov``, likefunc2.cpp:1166).  The fitted Viterbi class
    path is reported under "Site Log Likelihood"/"hmm path".

    ``srv_branchsite``: SRV mode "Branch-site" (BUSTED.bf:137-141,
    models.codon.BS_REL_SRV): both the omega class and the synonymous rate
    class are drawn independently per branch-site, so the K x C product
    mixture folds into each branch's transition matrix.

    ``multiple_hits``: "Double" or "Double+Triple" adds global delta
    (psi) rates for 2 (3)-nucleotide instantaneous changes to every
    mixture component (reference --multiple-hits, BUSTED.bf:160-166,
    model BUSTED.bf:329-352; golden BUSTED-MH.wbf).

    ``error_sink``: adds the BUSTED-E misalignment-absorbing class
    (omega >= error_sink_bound, weight <= error_sink_weight; reference
    --error-sink, BUSTED.bf:196-226)."""
    if srv_hmm or srv_branchsite:
        srv = True
    mh = multiple_hits not in (None, "None", "")
    triple = multiple_hits == "Double+Triple"
    if srv_branchsite and (mh or error_sink or srv_hmm):
        # reference asserts the same incompatibilities (BUSTED.bf:393-394)
        raise ValueError(
            "branch-site SRV cannot combine with multiple-hits, "
            "error-sink, or HMM SRV"
        )
    data = common.load_codon_data(alignment, genetic_code, tree, branches)
    common.progress("busted", "fitting nucleotide GTR")
    gtr = common.fit_gtr(data, precision=1e-5)
    common.progress("busted", f"GTR lnL {gtr.loglik:.3f}; fitting global MG94xREV")
    mg = common.fit_partitioned_mg94(data, gtr, precision=1e-5)
    common.progress("busted", f"MG94 lnL {mg.loglik:.3f}; unconstrained BS-REL fit")

    filt = data.codon_filter
    gc = data.genetic_code
    has_background = bool((~data.tested_branches).any())
    n_groups = 2 if has_background else 1
    group_of_branch = np.where(data.tested_branches, 0, 1).astype(np.int32)
    k = rate_classes
    c_srv = srv_classes if srv else 1

    mg94 = MG94Base(gc, mg.corner_freqs, mg.codon_freqs)
    pdata = pruning.build_pruning_data(data.tree)

    if mh:
        def basis_fn(params):
            q1s, q1n = mg94.basis_matrices(params)
            q2s, q2n = mg94.multihit_basis_matrices(params, 2)
            qs = q1s + params["delta"] * q2s
            qn = q1n + params["delta"] * q2n
            if triple:
                q3s, q3n = mg94.multihit_basis_matrices(params, 3)
                qs = qs + params["psi"] * q3s
                qn = qn + params["psi"] * q3n
            return qs, qn
    else:
        basis_fn = None

    engine = BSRELEngine(
        mg94, pdata, jnp.asarray(filt.leaf_partials()),
        filt.pattern_weights, group_of_branch, c_srv, basis_fn=basis_fn,
    )

    # -- parameter space ----------------------------------------------------
    specs: Specs = dict(MG94Base.theta_specs())
    specs.update(_distribution_specs(
        "test", k, error_sink, error_sink_bound, error_sink_weight
    ))
    if has_background:
        specs.update(_distribution_specs(
            "bkg", k, error_sink, error_sink_bound, error_sink_weight
        ))
    if srv:
        specs.update(_srv_specs(c_srv))
    if srv_hmm:
        specs["srv_lambda"] = ParamSpec(init=0.2, lower=1e-4, upper=1.0 - 1e-4)
    if mh:
        # reference rate bounds: delta/psi in [0, 100] (MG_REV_MH.bf)
        specs["delta"] = ParamSpec(init=0.05, lower=0.0, upper=100.0)
        if triple:
            specs["psi"] = ParamSpec(init=0.05, lower=0.0, upper=100.0)
    specs["t"] = ParamSpec(init=0.1, lower=0.0, upper=10000.0,
                           shape=(data.tree.n_branches,))

    def unpack(params):
        om_t, w_t = omega_distribution(params, "test", k, error_sink)
        if has_background:
            om_b, w_b = omega_distribution(params, "bkg", k, error_sink)
            omegas = jnp.stack([om_t, om_b])
            weights = jnp.stack([w_t, w_b])
        else:
            omegas = om_t[None]
            weights = w_t[None]
        if srv:
            rates, wsrv = srv_distribution(params, c_srv)
        else:
            rates, wsrv = jnp.ones((1,)), jnp.ones((1,))
        return omegas, weights, rates, wsrv

    if srv_hmm:
        from hyphy_tpu.ops import hmm as hmm_ops

        dup_map = filt.duplicate_map

        def loglik(params):
            omegas, weights, rates, wsrv = unpack(params)
            class_sll = engine.class_site_log_likelihoods(
                params, omegas, weights, params["t"], rates
            )
            trans = hmm_ops.uniform_switching_matrix(c_srv, params["srv_lambda"])
            return hmm_ops.forward_log_likelihood(class_sll, dup_map, trans, wsrv)
    elif srv_branchsite:
        def loglik(params):
            omegas, weights, rates, wsrv = unpack(params)
            sll = engine.branchsite_srv_site_log_likelihoods(
                params, omegas, weights, params["t"], rates, wsrv
            )
            return jnp.dot(sll, engine.pattern_weights)
    else:
        def loglik(params):
            omegas, weights, rates, wsrv = unpack(params)
            return engine.loglik(params, omegas, weights, params["t"], rates, wsrv)

    if srv_branchsite:
        def site_logliks(params):
            omegas, weights, rates, wsrv = unpack(params)
            return engine.branchsite_srv_site_log_likelihoods(
                params, omegas, weights, params["t"], rates, wsrv
            )
    else:
        def site_logliks(params):
            omegas, weights, rates, wsrv = unpack(params)
            return engine.site_log_likelihoods(
                params, omegas, weights, params["t"], rates, wsrv
            )

    # -- initial values -----------------------------------------------------
    base_init = {k2: jnp.asarray(v) for k2, v in mg.params.items() if k2.startswith("theta")}
    base_init["t"] = jnp.asarray(mg.alphas)
    mean_omega = float(mg.omegas[0])

    rng = np.random.default_rng(seed)
    candidates = []
    for i in range(max(4 * starting_points, 8)):
        cand = dict(base_init)
        for name, spec in specs.items():
            if name in cand:
                continue
            if name.endswith("_omega_0"):  # error-sink class
                cand[name] = jnp.asarray(rng.uniform(error_sink_bound, 10 * error_sink_bound))
            elif name.endswith("_w_0"):
                cand[name] = jnp.asarray(rng.uniform(0.0, 0.5 * error_sink_weight))
            elif name.endswith("_omega_" + str(k)):
                hi = 1.0 + rng.exponential(max(mean_omega, 0.5))
                cand[name] = jnp.asarray(min(hi, spec.upper - 1e-6))
            elif "_omega_" in name:
                cand[name] = jnp.asarray(rng.uniform(0.0, min(1.0, max(mean_omega, 0.2))))
            elif "_w_" in name or name.startswith("srv_w"):
                cand[name] = jnp.asarray(rng.uniform(0.05, 0.95))
            elif name.startswith("srv_rate"):
                cand[name] = jnp.asarray(rng.uniform(0.2, 2.0))
            elif name in ("delta", "psi"):
                cand[name] = jnp.asarray(rng.uniform(0.01, 0.5))
            else:
                cand[name] = spec.initial()
        candidates.append(cand)

    # cached full-model fit (reference --save-fit /
    # busted.use_cached_full_model, BUSTED.bf:680-733)
    fingerprint = ""
    if save_fit:
        from hyphy_tpu.io import serialize

        fingerprint = serialize.data_fingerprint(
            data.alignment.names, data.alignment.sequences
        )
        cached = serialize.load_snapshot(
            save_fit, expect_fingerprint=fingerprint, expect_model="BUSTED"
        )
    else:
        cached = None

    if cached is not None and set(cached["parameters"]) == set(specs):
        alt_params = {k2: jnp.asarray(v) for k2, v in cached["parameters"].items()}
        alt_lnl = float(cached["log_likelihood"])
    else:
        ll_fn = jax.jit(loglik)
        scored = sorted(
            ((float(ll_fn(c)), i) for i, c in enumerate(candidates)), reverse=True
        )
        # coarse fits from the best few candidates, then polish the winners
        # (the BS_REL surface is multimodal; the reference uses an initial
        # grid + Nelder-Mead passes + random restarts, BUSTED.bf:835-909)
        coarse = []
        for _, idx in scored[: max(starting_points, 2)]:
            p0, v0, _ = maximize(loglik, specs, candidates[idx], precision=0.05,
                                 max_iterations=400)
            coarse.append((float(v0), p0))
        coarse.sort(key=lambda x: -x[0])
        alt_params, alt_lnl = None, -np.inf
        for v0, p0 in coarse[:2]:
            p1, v1, _ = maximize(loglik, specs, p0, precision=precision)
            if float(v1) > alt_lnl:
                alt_lnl, alt_params = float(v1), p1
        if save_fit:
            from hyphy_tpu.io import serialize

            serialize.save_snapshot(
                save_fit, alt_params, alt_lnl, model="BUSTED",
                model_config={"rate_classes": k, "srv_classes": c_srv,
                              "srv": srv, "branches": branches},
                tree=data.tree.newick_string,
                fingerprint=fingerprint,
            )

    # -- null: omega_3 := 1 -------------------------------------------------
    null_fixed = {f"test_omega_{k}": jnp.asarray(1.0)}
    null_specs = {k2: v for k2, v in specs.items() if k2 not in null_fixed}
    null_init = {k2: v for k2, v in alt_params.items() if k2 not in null_fixed}

    def null_loglik(free):
        merged = dict(free)
        merged.update(null_fixed)
        return loglik(merged)

    null_params, null_lnl, _ = maximize(
        null_loglik, null_specs, null_init, precision=precision
    )
    null_lnl = float(null_lnl)

    lrt = max(2.0 * (alt_lnl - null_lnl), 0.0)
    p_value = 0.5 * common.chi2_sf(lrt, 2)

    # -- site log likelihoods + evidence ratios -----------------------------
    sll_alt = np.asarray(site_logliks(alt_params))[filt.duplicate_map]
    full_null = dict(null_params)
    full_null.update(null_fixed)
    sll_null = np.asarray(site_logliks(full_null))[filt.duplicate_map]
    er_optimized = np.exp(sll_alt - sll_null)
    # 'constrained': omega_3 clamped at 1 without refitting
    constrained = dict(alt_params)
    constrained[f"test_omega_{k}"] = jnp.asarray(1.0)
    sll_con = np.asarray(site_logliks(constrained))[filt.duplicate_map]
    er_constrained = np.exp(sll_alt - sll_con)

    # -- error-sink support blocks: per-branch class posteriors + ancestral
    #    substitution map (consumed by the error-filter analysis;
    #    reference BUSTED.bf:1040-1140 + error-filter.bf)
    branch_attr = None
    substitutions = None
    if (error_sink or branch_site_posteriors) and not (srv_hmm or srv_branchsite):
        common.progress("busted", "branch-site class posteriors + ancestors")
        omegas_a, weights_a, rates_a, wsrv_a = unpack(alt_params)
        tested_ids = np.nonzero(data.tested_branches)[0]
        sll_bk = engine.branch_class_site_logliks(
            alt_params, omegas_a, weights_a, alt_params["t"], rates_a,
            wsrv_a, data.tree.children, tested_ids,
        )                                                    # [n_sel, K+1, pat]
        post = np.asarray(
            BSRELEngine.class_posteriors(sll_bk, weights_a[0])
        )[:, :, filt.duplicate_map]                          # [n_sel, K+1, sites]
        # branch-level class posterior from the pattern-weighted totals
        # (engine weights: mesh padding appends zero-weight patterns, so
        # the padded sll_bk columns contribute nothing)
        tot = np.asarray(sll_bk) @ np.asarray(engine.pattern_weights)  # [n_sel,K+1]
        logw = np.log(np.maximum(np.asarray(weights_a[0]), 1e-300))
        lp = tot + logw[None, :]
        lp -= lp.max(axis=1, keepdims=True)
        branch_post = np.exp(lp) / np.exp(lp).sum(axis=1, keepdims=True)
        branch_attr = {"0": {}}
        bl = np.asarray(mg.branch_lengths)
        for row, b in enumerate(tested_ids):
            branch_attr["0"][data.tree.names[b]] = {
                "Posterior prob omega class": [[float(x)] for x in branch_post[row]],
                "Posterior prob omega class by site": post[row].tolist(),
                # per-branch length under the MG94 fit (clade_support reads
                # this key for its annotated tree, clade_support.bf:74)
                "MG94xREV with separate rates for branch sets": float(bl[b]),
            }
        # joint ancestral substitution map under the class-mixed propagators
        from hyphy_tpu.data.genetic_code import codon_string
        from hyphy_tpu.ops import ancestral as anc_mod

        times = rates_a[:, None] * alt_params["t"][None, :]
        p_cls = engine.mixture_propagators(
            alt_params, omegas_a, weights_a, times
        )                                                    # [C, B, S, S]
        p_bar = jnp.einsum("c,cbij->bij", wsrv_a, p_cls)
        joint = anc_mod.joint_reconstruct(
            p_bar, engine.leaf_partials, engine.freqs, pdata
        )
        internal = np.asarray(joint.internal_states)[:, filt.duplicate_map]
        sense = data.genetic_code.sense_codons
        n_leaves = data.tree.n_leaves
        parent = data.tree.parent

        def state_str(node, site):
            if node < n_leaves:
                code = filt.leaf_codes[node, filt.duplicate_map[site]]
                vec = filt.resolution_table[code]
                nz = np.nonzero(vec)[0]
                if nz.size == 1:
                    return codon_string(int(sense[nz[0]]))
                return "---" if nz.size == 0 or nz.size == vec.size else "NNN"
            st = internal[node - n_leaves, site]
            return codon_string(int(sense[st])) if st >= 0 else "---"

        substitutions = {"0": {}}
        root_id = data.tree.n_nodes - 1
        for site in range(filt.n_units):
            entry = {"root": state_str(root_id, site)}
            for node in range(data.tree.n_nodes - 1):
                s_n = state_str(node, site)
                s_p = state_str(parent[node], site)
                if s_n != s_p:
                    entry[data.tree.names[node]] = s_n
            substitutions["0"][str(site)] = entry

    omegas, weights, rates, wsrv = unpack(alt_params)
    n_classes = int(omegas.shape[1])  # k, or k+1 with the error sink
    # reference schema: class-index-keyed dicts with omega/proportion
    # (BUSTED.bf selection.io.report_dnds) so downstream consumers
    # (error-filter, clade-support, user tooling) read either binary's
    # output interchangeably
    rate_dists = {
        "Test": {
            str(i): {"omega": float(omegas[0, i]),
                     "proportion": float(weights[0, i])}
            for i in range(n_classes)
        },
    }
    if has_background:
        rate_dists["Background"] = {
            str(i): {"omega": float(omegas[1, i]),
                     "proportion": float(weights[1, i])}
            for i in range(n_classes)
        }
    if mh:
        mh_rates = {
            "rate at which 2 nucleotides are changed instantly within a single codon":
                float(alt_params["delta"]),
        }
        if triple:
            mh_rates[
                "rate at which 3 nucleotides are changed instantly within a single codon"
            ] = float(alt_params["psi"])
        rate_dists["Multiple hit rates"] = mh_rates
    if srv:
        rate_dists["Synonymous site-to-site rates"] = [
            [float(rates[i]), float(wsrv[i])] for i in range(c_srv)
        ]

    n_free = sum(
        int(np.prod(s.shape)) if s.shape else 1 for s in specs.values()
    )
    json = analysis_json(
        info="BUSTED (branch-site unrestricted statistical test of episodic "
             "diversification) uses a random effects branch-site model",
        version="4.5",
        data=data,
        fits={
            "Nucleotide GTR": model_fit_entry(
                gtr.loglik, gtr.n_parameters, data.sample_size,
                frequencies=gtr.frequencies, display_order=0,
            ),
            "MG94xREV with separate rates for branch sets": model_fit_entry(
                mg.loglik, mg.n_parameters, data.sample_size,
                frequencies=mg.codon_freqs, display_order=1,
            ),
            "Unconstrained model": model_fit_entry(
                alt_lnl, n_free + 9, data.sample_size,
                rate_distributions=rate_dists, display_order=2,
            ),
            "Constrained model": model_fit_entry(
                null_lnl, n_free + 8, data.sample_size, display_order=3,
            ),
        },
        extra={
            "test results": {
                "LRT": lrt,
                "p-value": p_value,
            },
            "Evidence Ratios": {
                "optimized null": [er_optimized.tolist()],
                "constrained": [er_constrained.tolist()],
            },
            "Site Log Likelihood": {
                "unconstrained": [sll_alt.tolist()],
                "optimized null": [sll_null.tolist()],
            },
            **({"branch attributes": branch_attr} if branch_attr else {}),
            **({"substitutions": substitutions} if substitutions else {}),
            **(
                {
                    "Synonymous rate HMM": {
                        "switching rate": float(alt_params["srv_lambda"]),
                        "Viterbi path": _hmm_viterbi_path(
                            engine, unpack, alt_params, c_srv, filt
                        ),
                    }
                }
                if srv_hmm else {}
            ),
        },
    )
    if error_sink:
        json.setdefault("analysis", {}).setdefault("settings", {})["error-sink"] = 1
    return BUSTEDResult(
        json=json, unconstrained_lnl=alt_lnl, null_lnl=null_lnl,
        lrt=lrt, p_value=p_value, evidence_ratios=er_optimized,
        alt_params=alt_params, data=data, gtr=gtr, mg94=mg,
        context={
            "loglik": loglik, "specs": specs, "unpack": unpack, "k": k,
            "error_sink": error_sink, "has_background": has_background,
            "precision": precision,
        },
    )
