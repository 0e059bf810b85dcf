"""RELAX — test for relaxation/intensification of selection.

Reference: ``SelectionAnalyses/RELAX.bf``.  Classic mode: test vs
reference branch sets (unclassified branches get their own nuisance
distribution).  Models (``--models All``):

  * General descriptive: shared K-class omega distribution, per-branch
    exponent k_b (omega_i ^ k_b) — golden lnL -3420.63 on CD2
  * RELAX alternative: reference {omega_i, w_i}; test {omega_i ^ K};
    shared weights; K free in (0, 50]
  * RELAX null: K := 1  (LRT ~ chi^2_1)
  * Partitioned descriptive: independent distributions per branch set
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
from hyphy_tpu.models.bsrel import BSRELEngine
from hyphy_tpu.models.codon import MG94Base
from hyphy_tpu.models.parameters import ParamSpec, Specs, stick_breaking_weights
from hyphy_tpu.ops import pruning
# mixture-model fits (bounded omegas/weights at vertices of the box)
# optimize far better under the logit-remapped jittable L-BFGS than
# under raw-space L-BFGS-B, which stalls on projected corner steps
from hyphy_tpu.optimize.core import maximize_jax as maximize


def _progress(msg):
    if os.environ.get("HYPHY_TPU_PROGRESS", "1") != "0":
        print(f"[relax {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


@dataclasses.dataclass
class RELAXResult:
    json: Dict
    k: float
    lrt: float
    p_value: float
    fits: Dict[str, float]
    distributions: Dict
    data: common.LoadedData
    gtr: common.GTRFit
    mg94: common.MG94Fit


def _omega_specs(prefix: str, k: int) -> Specs:
    """omega_1..k-1 in [0,1), omega_k >= 1 (RELAX ge ranges)."""
    specs = {}
    for i in range(1, k):
        specs[f"{prefix}_omega_{i}"] = ParamSpec(init=0.2 * i, lower=0.0, upper=1.0)
    specs[f"{prefix}_omega_{k}"] = ParamSpec(init=1.5, lower=1.0, upper=10000.0)
    return specs


def _weight_specs(prefix: str, k: int) -> Specs:
    return {
        f"{prefix}_w_{i}": ParamSpec(init=0.6 if i == 1 else 0.5, lower=0.0, upper=1.0)
        for i in range(1, k)
    }


def _get_omegas(params, prefix, k):
    return jnp.stack([params[f"{prefix}_omega_{i}"] for i in range(1, k + 1)])


def _get_weights(params, prefix, k):
    if k == 1:
        return jnp.ones((1,))
    fracs = jnp.stack([params[f"{prefix}_w_{i}"] for i in range(1, k)])
    return stick_breaking_weights(fracs)


def run(
    alignment: str,
    genetic_code: str = "Universal",
    tree: Optional[str] = None,
    test: str = "Group1",
    reference: Optional[str] = "Group2",
    rate_classes: int = 3,
    models: str = "All",
    precision: float = 1e-5,
    seed: int = 3,
    groups: Optional[list] = None,
) -> RELAXResult:
    """``groups``: RELAX group mode (>= 3 labeled branch sets;
    ``RELAX.bf:91-94`` kGroupMode / ``RELAX-Groups.bf``) — pass the list of
    set labels; ``reference`` names the reference set (K := 1), every other
    set g gets its own relaxation parameter K_g (omega_i ^ K_g, shared
    weights).  Alternative = free {K_g}; null = all K_g := 1; LRT ~
    chi^2_(N-1) (``RELAX.bf:1437-1449``).  Group mode runs Minimal-style
    (alternative + null)."""
    if groups is not None:
        return _run_groups(alignment, genetic_code, tree, groups, reference,
                           rate_classes, precision, seed)
    data = common.load_codon_data(alignment, genetic_code, tree, branches=test)
    tree_obj = data.tree
    n_branches = tree_obj.n_branches
    # branch sets: 0 = test, 1 = reference, 2 = unclassified
    test_mask = tree_obj.select_branches(test)
    ref_mask = (
        tree_obj.select_branches(reference) if reference else ~test_mask
    )
    group = np.full(n_branches, 2, dtype=np.int32)
    group[ref_mask] = 1
    group[test_mask] = 0
    has_unclassified = bool((group == 2).any())
    n_groups = 3 if has_unclassified else 2
    data.tested_branches = test_mask
    data.branch_groups = group

    _progress("fitting nucleotide GTR")
    gtr = common.fit_gtr(data, precision=precision)
    _progress(f"GTR lnL {gtr.loglik:.3f}; fitting global MG94xREV")
    mg = common.fit_partitioned_mg94(data, gtr, precision=precision)
    _progress(f"MG94 lnL {mg.loglik:.3f}")

    filt = data.codon_filter
    gc = data.genetic_code
    k = rate_classes
    mg94 = MG94Base(gc, mg.corner_freqs, mg.codon_freqs)
    pdata = pruning.build_pruning_data(tree_obj)
    lp = jnp.asarray(filt.leaf_partials())

    theta_init = {k2: jnp.asarray(v) for k2, v in mg.params.items() if k2.startswith("theta")}
    t_init = jnp.asarray(mg.alphas)
    mean_omega = float(np.mean(mg.omegas))
    rng = np.random.default_rng(seed)

    # ---------------- general descriptive: per-branch k_b ------------------
    ge_engine = BSRELEngine(
        mg94, pdata, lp, filt.pattern_weights,
        np.arange(n_branches, dtype=np.int32),
    )
    ge_specs: Specs = dict(MG94Base.theta_specs())
    ge_specs.update(_omega_specs("ge", k))
    ge_specs.update(_weight_specs("ge", k))
    ge_specs["k_branch"] = ParamSpec(init=1.0, lower=0.0, upper=50.0, shape=(n_branches,))
    ge_specs["t"] = ParamSpec(init=0.1, lower=0.0, upper=10000.0, shape=(n_branches,))

    def ge_loglik(params):
        om = _get_omegas(params, "ge", k)
        w = _get_weights(params, "ge", k)
        omegas = jnp.power(
            jnp.maximum(om, 1e-10)[None, :], params["k_branch"][:, None]
        )
        weights = jnp.broadcast_to(w, (n_branches, k))
        return ge_engine.loglik(
            params, omegas, weights, params["t"], jnp.ones((1,)), jnp.ones((1,))
        )

    ge_params, ge_lnl = None, -np.inf
    if models == "All":
        # the general-descriptive fit belongs to All mode only
        # (RELAX.bf --models: Minimal = alternative + null)
        _progress("fitting general descriptive model")
        coarse = []
        for trial in range(5):
            init = dict(theta_init)
            init["t"] = t_init
            init["k_branch"] = jnp.ones(n_branches)
            for i in range(1, k):
                init[f"ge_omega_{i}"] = jnp.asarray(
                    min(0.95, rng.uniform(0.1, 0.8) * max(mean_omega, 0.3)) if trial else 0.25 * i * min(mean_omega * 2, 1.0) + 1e-3
                )
                init[f"ge_w_{i}"] = jnp.asarray(rng.uniform(0.4, 0.8) if trial else 0.6)
            init[f"ge_omega_{k}"] = jnp.asarray(1.0 + rng.exponential(1.0) if trial else max(1.1, mean_omega * 2))
            p0, v0, _ = maximize(ge_loglik, ge_specs, init, precision=0.1, max_iterations=500)
            coarse.append((float(v0), p0))
        coarse.sort(key=lambda x: -x[0])
        for v0, p0 in coarse[:2]:
            p1, v1, _ = maximize(ge_loglik, ge_specs, p0, precision=precision)
            if float(v1) > ge_lnl:
                ge_lnl, ge_params = float(v1), p1
        _progress(f"general descriptive lnL {ge_lnl:.3f}")

    # ---------------- alternative: test = reference ^ K --------------------
    alt_engine = BSRELEngine(mg94, pdata, lp, filt.pattern_weights, group)
    alt_specs: Specs = dict(MG94Base.theta_specs())
    alt_specs.update(_omega_specs("ref", k))
    alt_specs.update(_weight_specs("ref", k))
    if has_unclassified:
        alt_specs.update(_omega_specs("unc", k))
    alt_specs["K"] = ParamSpec(init=1.0, lower=0.0, upper=50.0)
    alt_specs["t"] = ParamSpec(init=0.1, lower=0.0, upper=10000.0, shape=(n_branches,))

    def alt_omega_rows(params, k_value):
        om_ref = jnp.maximum(_get_omegas(params, "ref", k), 1e-10)
        w = _get_weights(params, "ref", k)
        rows = [jnp.power(om_ref, k_value), om_ref]
        if has_unclassified:
            rows.append(_get_omegas(params, "unc", k))
        omegas = jnp.stack(rows)
        weights = jnp.broadcast_to(w, (n_groups, k))
        return omegas, weights

    def alt_loglik(params):
        omegas, weights = alt_omega_rows(params, params["K"])
        return alt_engine.loglik(
            params, omegas, weights, params["t"], jnp.ones((1,)), jnp.ones((1,))
        )

    # init from the GD fit when available (All mode), else from MG94
    alt_init = {}
    if ge_params is not None:
        alt_init.update({k2: v for k2, v in ge_params.items()
                         if k2.startswith("theta")})
        alt_init["t"] = ge_params["t"]
        alt_init["K"] = jnp.asarray(1.0)
        for i in range(1, k + 1):
            alt_init[f"ref_omega_{i}"] = ge_params[f"ge_omega_{i}"]
            if has_unclassified:
                alt_init[f"unc_omega_{i}"] = ge_params[f"ge_omega_{i}"]
        for i in range(1, k):
            alt_init[f"ref_w_{i}"] = ge_params[f"ge_w_{i}"]
    else:
        alt_init.update(theta_init)
        alt_init["t"] = t_init
        alt_init["K"] = jnp.asarray(1.0)
        for i in range(1, k + 1):
            val = (min(0.25 * i * max(mean_omega * 2, 0.2), 0.95)
                   if i < k else max(1.1, mean_omega * 2))
            alt_init[f"ref_omega_{i}"] = jnp.asarray(val)
            if has_unclassified:
                alt_init[f"unc_omega_{i}"] = jnp.asarray(val)
        for i in range(1, k):
            alt_init[f"ref_w_{i}"] = jnp.asarray(0.6)

    _progress("fitting RELAX alternative model")
    alt_params, alt_lnl = None, -np.inf
    for k_start in (1.0, 0.3, 3.0):
        start = dict(alt_init)
        start["K"] = jnp.asarray(k_start)
        p0, v0, _ = maximize(alt_loglik, alt_specs, start, precision=0.1, max_iterations=400)
        p1, v1, _ = maximize(alt_loglik, alt_specs, p0, precision=precision)
        if float(v1) > alt_lnl:
            alt_lnl, alt_params = float(v1), p1
    k_mle = float(alt_params["K"])
    _progress(f"alternative lnL {alt_lnl:.3f}, K = {k_mle:.3f}")

    # ---------------- null: K := 1 -----------------------------------------
    null_specs = {k2: v for k2, v in alt_specs.items() if k2 != "K"}
    null_init = {k2: v for k2, v in alt_params.items() if k2 != "K"}

    def null_loglik(free):
        merged = dict(free)
        merged["K"] = jnp.asarray(1.0)
        return alt_loglik(merged)

    _progress("fitting RELAX null model")
    null_params, null_lnl, _ = maximize(null_loglik, null_specs, null_init, precision=precision)
    null_lnl = float(null_lnl)

    lrt = max(2.0 * (alt_lnl - null_lnl), 0.0)
    p_value = common.chi2_sf(lrt, 1)
    _progress(f"null lnL {null_lnl:.3f}; LRT {lrt:.3f}, p {p_value:.4f}")

    # ---------------- partitioned descriptive ------------------------------
    pd_lnl, pd_dists = None, None
    if models == "All":
        pd_specs: Specs = dict(MG94Base.theta_specs())
        prefixes = ["pd_test", "pd_ref"] + (["pd_unc"] if has_unclassified else [])
        for pref in prefixes:
            pd_specs.update(_omega_specs(pref, k))
            pd_specs.update(_weight_specs(pref, k))
        pd_specs["t"] = ParamSpec(init=0.1, lower=0.0, upper=10000.0, shape=(n_branches,))

        def pd_loglik(params):
            omegas = jnp.stack([_get_omegas(params, p, k) for p in prefixes])
            weights = jnp.stack([_get_weights(params, p, k) for p in prefixes])
            return alt_engine.loglik(
                params, omegas, weights, params["t"], jnp.ones((1,)), jnp.ones((1,))
            )

        pd_init = {k2: v for k2, v in alt_params.items() if k2.startswith("theta")}
        pd_init["t"] = alt_params["t"]
        k_clip = min(max(k_mle, 1e-3), 50.0)
        for i in range(1, k + 1):
            ref_om = float(alt_params[f"ref_omega_{i}"])
            pd_init[f"pd_ref_omega_{i}"] = jnp.asarray(ref_om)
            pd_init[f"pd_test_omega_{i}"] = jnp.asarray(
                min(max(ref_om ** k_clip, 1.0 if i == k else 0.0), 1.0 - 1e-6 if i < k else 10000.0)
            )
            if has_unclassified:
                pd_init[f"pd_unc_omega_{i}"] = alt_params[f"unc_omega_{i}"]
        for i in range(1, k):
            for pref in prefixes:
                pd_init[f"{pref}_w_{i}"] = alt_params[f"ref_w_{i}"]

        _progress("fitting partitioned descriptive model")
        p0, _, _ = maximize(pd_loglik, pd_specs, pd_init, precision=0.1, max_iterations=400)
        pd_params, pd_lnl_v, _ = maximize(pd_loglik, pd_specs, p0, precision=precision)
        pd_lnl = float(pd_lnl_v)
        pd_dists = {
            "Test": _dist_json(pd_params, "pd_test", k),
            "Reference": _dist_json(pd_params, "pd_ref", k),
        }
        _progress(f"partitioned descriptive lnL {pd_lnl:.3f}")

    # ---------------- results ---------------------------------------------
    om_ref = np.asarray(_get_omegas(alt_params, "ref", k))
    w_ref = np.asarray(_get_weights(alt_params, "ref", k))
    alt_dists = {
        "Test": {
            str(i): {"omega": float(om_ref[i] ** k_mle), "proportion": float(w_ref[i])}
            for i in range(k)
        },
        "Reference": {
            str(i): {"omega": float(om_ref[i]), "proportion": float(w_ref[i])}
            for i in range(k)
        },
    }

    def count(specs):
        return sum(int(np.prod(s.shape)) if s.shape else 1 for s in specs.values())

    fits = {
        "Nucleotide GTR": model_fit_entry(
            gtr.loglik, gtr.n_parameters, data.sample_size,
            frequencies=gtr.frequencies, display_order=0,
        ),
        "MG94xREV with separate rates for branch sets": model_fit_entry(
            mg.loglik, mg.n_parameters, data.sample_size, display_order=1,
        ),
        **({"General descriptive": model_fit_entry(
            ge_lnl, count(ge_specs) + 9, data.sample_size, display_order=4,
            rate_distributions={"Shared": _dist_json(ge_params, "ge", k)},
        )} if ge_params is not None else {}),
        "RELAX alternative": model_fit_entry(
            alt_lnl, count(alt_specs) + 9, data.sample_size, display_order=2,
            rate_distributions=alt_dists,
        ),
        "RELAX null": model_fit_entry(
            null_lnl, count(null_specs) + 9, data.sample_size, display_order=3,
        ),
    }
    if pd_lnl is not None:
        fits["RELAX partitioned descriptive"] = model_fit_entry(
            pd_lnl, count(pd_specs) + 9, data.sample_size, display_order=5,
            rate_distributions=pd_dists,
        )

    json = analysis_json(
        info="RELAX (a random effects test of selection relaxation) uses a "
             "random effects branch-site model framework",
        version="4.1",
        data=data,
        fits=fits,
        extra={
            "test results": {
                "LRT": lrt,
                "p-value": p_value,
                "relaxation or intensification parameter": k_mle,
            },
        },
    )
    return RELAXResult(
        json=json, k=k_mle, lrt=lrt, p_value=p_value,
        fits={name: entry["Log Likelihood"] for name, entry in fits.items()},
        distributions={"alternative": alt_dists, "partitioned descriptive": pd_dists},
        data=data, gtr=gtr, mg94=mg,
    )


def _dist_json(params, prefix, k):
    om = np.asarray(_get_omegas(params, prefix, k))
    w = np.asarray(_get_weights(params, prefix, k))
    return {
        str(i): {"omega": float(om[i]), "proportion": float(w[i])} for i in range(k)
    }


def _run_groups(
    alignment, genetic_code, tree, groups, reference, rate_classes,
    precision, seed,
):
    """RELAX group mode: N >= 3 labeled sets, per-group K vs all-K=1 null
    (``RELAX.bf`` kGroupMode, ``RELAX-Groups.bf``)."""
    if reference is None or reference not in groups:
        raise ValueError("group mode needs reference to be one of groups")
    if len(groups) < 3:
        raise ValueError("group mode needs >= 3 branch sets; use test/"
                         "reference for the classic 2-set analysis")
    k = rate_classes
    # order: reference first (K = 1 identically)
    ordered = [reference] + [g for g in groups if g != reference]
    data = common.load_codon_data(alignment, genetic_code, tree, branches=ordered[1])
    tree_obj = data.tree
    n_branches = tree_obj.n_branches
    group = np.full(n_branches, -1, dtype=np.int32)
    for gi, label in enumerate(ordered):
        mask = tree_obj.select_branches(label)
        group[mask] = gi
    n_groups = len(ordered)
    # unlabeled branches form the reference's "unclassified (nuisance)
    # set" (RELAX.bf:264-267, :952-982): their own independent BS_REL
    # distribution, present identically in alternative and null so it
    # cancels in the LRT
    has_unc = bool((group < 0).any())
    if has_unc:
        group[group < 0] = n_groups
    data.tested_branches = group == 1
    data.branch_groups = group

    _progress("fitting nucleotide GTR")
    gtr = common.fit_gtr(data, precision=precision)
    _progress(f"GTR lnL {gtr.loglik:.3f}; fitting global MG94xREV")
    mg = common.fit_partitioned_mg94(data, gtr, precision=precision)
    _progress(f"MG94 lnL {mg.loglik:.3f}")

    filt = data.codon_filter
    mg94 = MG94Base(data.genetic_code, mg.corner_freqs, mg.codon_freqs)
    pdata = pruning.build_pruning_data(tree_obj)
    lp = jnp.asarray(filt.leaf_partials())
    engine = BSRELEngine(mg94, pdata, lp, filt.pattern_weights, group)

    specs: Specs = dict(MG94Base.theta_specs())
    specs.update(_omega_specs("ref", k))
    specs.update(_weight_specs("ref", k))
    if has_unc:
        specs.update(_omega_specs("unc", k))
        specs.update(_weight_specs("unc", k))
    for gi in range(1, n_groups):
        specs[f"K_{gi}"] = ParamSpec(init=1.0, lower=0.0, upper=50.0)
    specs["t"] = ParamSpec(init=0.1, lower=0.0, upper=10000.0,
                           shape=(n_branches,))

    def omega_rows(params, k_values):
        om_ref = jnp.maximum(_get_omegas(params, "ref", k), 1e-10)
        w = _get_weights(params, "ref", k)
        rows = [om_ref] + [
            jnp.power(om_ref, k_values[gi - 1]) for gi in range(1, n_groups)
        ]
        w_rows = [w] * n_groups
        if has_unc:
            rows.append(jnp.maximum(_get_omegas(params, "unc", k), 1e-10))
            w_rows.append(_get_weights(params, "unc", k))
        return jnp.stack(rows), jnp.stack(w_rows)

    def alt_loglik(params):
        ks = [params[f"K_{gi}"] for gi in range(1, n_groups)]
        omegas, weights = omega_rows(params, ks)
        return engine.loglik(
            params, omegas, weights, params["t"], jnp.ones((1,)), jnp.ones((1,))
        )

    mean_omega = float(np.mean(mg.omegas))
    init = {k2: jnp.asarray(v) for k2, v in mg.params.items()
            if k2.startswith("theta")}
    init["t"] = jnp.asarray(mg.alphas)
    for i in range(1, k + 1):
        init[f"ref_omega_{i}"] = jnp.asarray(
            min(0.25 * i * max(mean_omega * 2, 0.2), 0.95)
            if i < k else max(1.1, mean_omega * 2)
        )
    for i in range(1, k):
        init[f"ref_w_{i}"] = jnp.asarray(0.6)
    if has_unc:
        for i in range(1, k + 1):
            init[f"unc_omega_{i}"] = init[f"ref_omega_{i}"]
        for i in range(1, k):
            init[f"unc_w_{i}"] = jnp.asarray(0.6)
    for gi in range(1, n_groups):
        init[f"K_{gi}"] = jnp.asarray(1.0)

    _progress(f"fitting group-mode alternative ({n_groups} sets)")
    alt_params, alt_lnl = None, -np.inf
    for k_start in (1.0, 0.3, 3.0):
        start = dict(init)
        for gi in range(1, n_groups):
            start[f"K_{gi}"] = jnp.asarray(k_start)
        p0, _, _ = maximize(alt_loglik, specs, start, precision=0.1,
                            max_iterations=400)
        p1, v1, _ = maximize(alt_loglik, specs, p0, precision=precision)
        if float(v1) > alt_lnl:
            alt_lnl, alt_params = float(v1), p1
    k_mles = {ordered[gi]: float(alt_params[f"K_{gi}"])
              for gi in range(1, n_groups)}
    _progress(f"alternative lnL {alt_lnl:.3f}, K = {k_mles}")

    # null: every K_g := 1
    null_fixed = {f"K_{gi}": jnp.asarray(1.0) for gi in range(1, n_groups)}
    null_specs = {k2: v for k2, v in specs.items() if k2 not in null_fixed}
    null_init = {k2: v for k2, v in alt_params.items() if k2 not in null_fixed}

    def null_loglik(free):
        merged = dict(free)
        merged.update(null_fixed)
        return alt_loglik(merged)

    _progress("fitting group-mode null (all K := 1)")
    _, null_lnl, _ = maximize(null_loglik, null_specs, null_init,
                              precision=precision)
    null_lnl = float(null_lnl)
    df = n_groups - 1
    lrt = max(2.0 * (alt_lnl - null_lnl), 0.0)
    p_value = common.chi2_sf(lrt, df)
    _progress(f"null lnL {null_lnl:.3f}; LRT {lrt:.3f} (df {df}), p {p_value:.4f}")

    om_ref = np.asarray(_get_omegas(alt_params, "ref", k))
    w_ref = np.asarray(_get_weights(alt_params, "ref", k))
    alt_dists = {
        ordered[0]: {str(i): {"omega": float(om_ref[i]),
                              "proportion": float(w_ref[i])}
                     for i in range(k)},
    }
    for gi in range(1, n_groups):
        kg = float(alt_params[f"K_{gi}"])
        alt_dists[ordered[gi]] = {
            str(i): {"omega": float(om_ref[i] ** kg),
                     "proportion": float(w_ref[i])}
            for i in range(k)
        }
    if has_unc:
        om_u = np.asarray(_get_omegas(alt_params, "unc", k))
        w_u = np.asarray(_get_weights(alt_params, "unc", k))
        alt_dists["Unclassified"] = {
            str(i): {"omega": float(om_u[i]), "proportion": float(w_u[i])}
            for i in range(k)
        }

    def count(sp):
        return sum(int(np.prod(s.shape)) if s.shape else 1 for s in sp.values())

    fits = {
        "Nucleotide GTR": model_fit_entry(
            gtr.loglik, gtr.n_parameters, data.sample_size,
            frequencies=gtr.frequencies, display_order=0,
        ),
        "MG94xREV with separate rates for branch sets": model_fit_entry(
            mg.loglik, mg.n_parameters, data.sample_size, display_order=1,
        ),
        "RELAX alternative": model_fit_entry(
            alt_lnl, count(specs) + 9, data.sample_size, display_order=2,
            rate_distributions=alt_dists,
        ),
        "RELAX null": model_fit_entry(
            null_lnl, count(null_specs) + 9, data.sample_size, display_order=3,
        ),
    }
    json = analysis_json(
        info="RELAX (group mode): tests for differences of selective "
             "pressures among 3 or more branch groups",
        version="4.1",
        data=data,
        fits=fits,
        extra={
            "test results": {
                "LRT": lrt,
                "p-value": p_value,
                "relaxation or intensification parameter": k_mles,
                "degrees of freedom": df,
            },
        },
    )
    return RELAXResult(
        json=json, k=k_mles.get(ordered[1], 1.0), lrt=lrt, p_value=p_value,
        fits={name: entry["Log Likelihood"] for name, entry in fits.items()},
        distributions={"alternative": alt_dists, "partitioned descriptive": None},
        data=data, gtr=gtr, mg94=mg,
    )
