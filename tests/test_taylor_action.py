"""The vector-action Taylor expm path (fp32/TPU per-site engine) against
exact scipy propagators, in select (branch-group) and mixture modes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import scipy.linalg as sla

from hyphy_tpu.ops import expm as expm_ops, pruning
from hyphy_tpu.tree.topology import Tree


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(1)
    tree = Tree.from_newick("((a:0.1,b:0.6):0.05,(c:0.3,d:1.2):0.4,e:2.5)")
    pdata = pruning.build_pruning_data(tree)
    s = 61
    qs = []
    for scale in (0.1, 0.17, 0.05):
        q = np.abs(rng.normal(size=(s, s))) * scale
        np.fill_diagonal(q, 0)
        q -= np.diag(q.sum(1))
        qs.append(q)
    times = np.maximum(np.abs(np.asarray(tree.input_lengths[:-1])), 1e-6) * 3
    lv = np.abs(rng.normal(size=(tree.n_leaves, s))) + 0.1
    pi = np.full(s, 1.0 / s)
    return tree, pdata, qs, times, lv, pi


def test_select_mode_matches_scipy(setup):
    tree, pdata, qs, times, lv, pi = setup
    group = (np.arange(tree.n_branches) % 2).astype(np.int32)
    p_exact = np.stack([
        sla.expm(qs[group[b]] * times[b]) for b in range(tree.n_branches)
    ])
    ref = float(pruning.single_site_log_likelihood_dense(
        jnp.asarray(p_exact), jnp.asarray(lv), jnp.asarray(pi), pdata))

    m = jnp.stack([jnp.asarray(q) for q in qs[:2]])
    qn, m2p, r, j = jax.vmap(
        lambda mg: expm_ops.taylor_action_factors(mg, jnp.asarray(times))
    )(m)
    rows = jnp.arange(tree.n_branches)
    v = float(pruning.single_site_log_likelihood_taylor(
        qn, m2p, r[group, rows], j[group, rows], jnp.asarray(group),
        expm_ops.taylor_action_terms(jnp.float64),
        jnp.asarray(lv), jnp.asarray(pi), pdata))
    assert abs(v - ref) < 1e-10


def test_mixture_mode_matches_scipy(setup):
    tree, pdata, qs, times, lv, pi = setup
    rng = np.random.default_rng(3)
    w = rng.dirichlet(np.ones(3), size=tree.n_branches)  # [B, 3]
    p_exact = np.stack([
        sum(w[b, g] * sla.expm(qs[g] * times[b]) for g in range(3))
        for b in range(tree.n_branches)
    ])
    ref = float(pruning.single_site_log_likelihood_dense(
        jnp.asarray(p_exact), jnp.asarray(lv), jnp.asarray(pi), pdata))

    m = jnp.stack([jnp.asarray(q) for q in qs])
    qn, m2p, r, j = jax.vmap(
        lambda mg: expm_ops.taylor_action_factors(mg, jnp.asarray(times))
    )(m)                                                  # r/j: [G, B]
    v = float(pruning.single_site_log_likelihood_taylor(
        qn, m2p, r.T, j.T, jnp.zeros(tree.n_branches, jnp.int32),
        expm_ops.taylor_action_terms(jnp.float64),
        jnp.asarray(lv), jnp.asarray(pi), pdata,
        mix_weights=jnp.asarray(w)))
    assert abs(v - ref) < 1e-10


def test_fp32_accuracy(setup):
    tree, pdata, qs, times, lv, pi = setup
    group = np.zeros(tree.n_branches, dtype=np.int32)
    p_exact = np.stack([
        sla.expm(qs[0] * times[b]) for b in range(tree.n_branches)
    ])
    ref = float(pruning.single_site_log_likelihood_dense(
        jnp.asarray(p_exact), jnp.asarray(lv), jnp.asarray(pi), pdata))
    m = jnp.asarray(qs[0], jnp.float32)[None]
    qn, m2p, r, j = jax.vmap(
        lambda mg: expm_ops.taylor_action_factors(
            mg, jnp.asarray(times, jnp.float32))
    )(m)
    rows = jnp.arange(tree.n_branches)
    v = float(pruning.single_site_log_likelihood_taylor(
        qn, m2p, r[group, rows], j[group, rows], jnp.asarray(group),
        expm_ops.taylor_action_terms(jnp.float32),
        jnp.asarray(lv, jnp.float32), jnp.asarray(pi, jnp.float32), pdata))
    # fp32 expm+pruning round-off stays ~1e-5 in log units (vs ~1e-2 for
    # the fp32 eigh spectral path this replaces)
    assert abs(v - ref) < 1e-3
