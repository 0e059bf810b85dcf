"""Ancestral state reconstruction: joint ML (Pupko), marginal, sampled.

Behavioral port of the reference engine's
``_TheTree::RecoverAncestralSequences`` (joint max-product DP,
``src/core/tree.cpp:4209``), ``RecoverAncestralSequencesMarginal``
(``src/core/likefunc2.cpp:932``) and ``SampleAncestorsBySequence``
(``tree.cpp:4086``), vectorized over site patterns:

  * up pass: per branch, per pattern, per parent state p:
    ``max_c P[p,c] * child[c]`` with argmax cached; completely-unresolved
    child vectors (all ones) contribute nothing and propagate state -1,
  * root: argmax of ``pi_c * cond[c]`` (or -1 when unresolved),
  * traceback: child state = cache[child, pattern, parent_state].
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyphy_tpu.ops.pruning import PruningData


class JointReconstruction(NamedTuple):
    internal_states: jnp.ndarray   # [n_internal, patterns] int32, -1 = unresolved
    root_loglik: jnp.ndarray       # [patterns] max-product log-likelihood


def joint_reconstruct(
    p_matrices: jnp.ndarray,       # [n_nodes(+1), S, S] (row above each node)
    leaf_partials: jnp.ndarray,    # [n_leaves, patterns, S]
    root_freqs: jnp.ndarray,
    data: PruningData,
) -> JointReconstruction:
    n_nodes = data.n_nodes
    patterns, states = leaf_partials.shape[1], leaf_partials.shape[2]
    dtype = leaf_partials.dtype

    eye = jnp.eye(states, dtype=dtype)
    if p_matrices.shape[0] < n_nodes + 1:
        pad = jnp.broadcast_to(eye, (n_nodes + 1 - p_matrices.shape[0], states, states))
        p_all = jnp.concatenate([p_matrices.astype(dtype), pad], axis=0)
    else:
        p_all = p_matrices.astype(dtype).at[n_nodes].set(eye)

    total = n_nodes + 1 + data.max_width
    cond = jnp.ones((total, patterns, states), dtype=dtype)
    cond = cond.at[: data.n_leaves].set(leaf_partials)
    # argmax cache: best child state given parent state
    cache = jnp.full((total, patterns, states), -1, dtype=jnp.int32)

    def up_step(carry, level):
        cond, cache = carry
        node_ids, child_ids = level
        flat = child_ids.reshape(-1)
        cp = p_all[flat]                                   # [B, S, S]
        cc = cond[flat]                                    # [B, patterns, S]
        # vals[b, p, parent] = max_c P[b, parent, c] * cc[b, p, c]
        prods = cp[:, None, :, :] * cc[:, :, None, :]      # [B, patterns, S, S]
        vals = jnp.max(prods, axis=-1)
        args = jnp.argmax(prods, axis=-1).astype(jnp.int32)
        unresolved = jnp.all(cc == 1.0, axis=-1)           # [B, patterns]
        vals = jnp.where(unresolved[..., None], 1.0, vals)
        args = jnp.where(unresolved[..., None], -1, args)
        cache = cache.at[flat].set(args)
        contrib = vals.reshape(child_ids.shape[0], data.arity, patterns, states)
        prod = jnp.prod(contrib, axis=1)
        mx = jnp.max(prod, axis=-1, keepdims=True)
        mx = jnp.where(mx > 0, mx, 1.0)
        # keep exactly-unresolved nodes at exactly 1.0 (degeneracy check)
        all_unres = jnp.all(prod == 1.0, axis=-1, keepdims=True)
        prod = jnp.where(all_unres, prod, prod / mx)
        log_scale_inc = jnp.where(all_unres[..., 0], 0.0, jnp.log(mx[..., 0]))
        cond = cond.at[node_ids].set(prod)
        return (cond, cache), jnp.sum(log_scale_inc, axis=0)

    (cond, cache), log_scales = jax.lax.scan(
        up_step, (cond, cache), (data.node_ids, data.child_ids)
    )

    root_cond = cond[n_nodes - 1]                          # [patterns, S]
    root_unresolved = jnp.all(root_cond == 1.0, axis=-1)
    weighted = root_cond * root_freqs.astype(dtype)[None, :]
    root_state = jnp.where(
        root_unresolved, -1, jnp.argmax(weighted, axis=-1).astype(jnp.int32)
    )
    root_loglik = jnp.log(jnp.maximum(jnp.max(weighted, axis=-1), jnp.finfo(dtype).tiny)) + jnp.sum(log_scales, axis=0)

    # traceback, top-down (reversed levels)
    states_arr = jnp.full((total, patterns), -1, dtype=jnp.int32)
    states_arr = states_arr.at[n_nodes - 1].set(root_state)

    def down_step(states_arr, level):
        node_ids, child_ids = level
        parent_state = states_arr[node_ids]                # [W, patterns]
        flat = child_ids.reshape(-1)                       # [W*K]
        ps = jnp.repeat(parent_state, data.arity, axis=0)  # [W*K, patterns]
        child_cache = cache[flat]                          # [W*K, patterns, S]
        cs = jnp.take_along_axis(
            child_cache, jnp.maximum(ps, 0)[..., None], axis=-1
        )[..., 0]
        cs = jnp.where(ps < 0, -1, cs)
        # don't overwrite the root row; scratch writes are harmless
        states_arr = states_arr.at[flat].set(cs)
        return states_arr, None

    rev = (data.node_ids[::-1], data.child_ids[::-1])
    states_arr, _ = jax.lax.scan(down_step, states_arr, rev)

    internal = states_arr[data.n_leaves : n_nodes]
    return JointReconstruction(internal_states=internal, root_loglik=root_loglik)


def marginal_posteriors(
    p_matrices: jnp.ndarray,
    leaf_partials: jnp.ndarray,
    root_freqs: jnp.ndarray,
    data: PruningData,
    children: list,
    parent: np.ndarray,
) -> jnp.ndarray:
    """Posterior state probabilities for every internal node:
    ``P(state_n = s | data)`` via inside (CLV) x outside vectors
    (reference: RecoverAncestralSequencesMarginal, likefunc2.cpp:932).

    Returns [n_internal, patterns, S] normalized posteriors.
    Implemented with numpy-driven recursion over the (static) topology on
    top of jitted inside CLVs — outside pass is a per-node loop (cheap
    relative to the inside pass, and runs once per analysis).
    """
    n_nodes = data.n_nodes
    patterns, states = leaf_partials.shape[1], leaf_partials.shape[2]
    dtype = leaf_partials.dtype
    eye = jnp.eye(states, dtype=dtype)
    if p_matrices.shape[0] < n_nodes + 1:
        pad = jnp.broadcast_to(eye, (n_nodes + 1 - p_matrices.shape[0], states, states))
        p_all = jnp.concatenate([p_matrices.astype(dtype), pad], axis=0)
    else:
        p_all = p_matrices.astype(dtype)

    # inside pass: per-node CLVs (unscaled in log-sum form)
    clv = [None] * n_nodes
    log_sc = [None] * n_nodes
    for i in range(data.n_leaves):
        clv[i] = leaf_partials[i]
        log_sc[i] = jnp.zeros((patterns,), dtype)
    order = []
    done = set(range(data.n_leaves))
    # children lists are static; simple post-order
    pending = [n for n in range(data.n_leaves, n_nodes)]
    while pending:
        for n in list(pending):
            if all(c in done for c in children[n]):
                order.append(n)
                done.add(n)
                pending.remove(n)
    for n in order:
        acc = jnp.ones((patterns, states), dtype)
        sc = jnp.zeros((patterns,), dtype)
        for c in children[n]:
            acc = acc * (clv[c] @ p_all[c].T)
            sc = sc + log_sc[c]
        mx = jnp.maximum(jnp.max(acc, axis=-1, keepdims=True), 1e-300)
        clv[n] = acc / mx
        log_sc[n] = sc + jnp.log(mx[..., 0])

    # outside pass
    outside = [None] * n_nodes
    root = n_nodes - 1
    outside[root] = jnp.broadcast_to(root_freqs.astype(dtype), (patterns, states))
    for n in reversed(order):
        for c in children[n]:
            # sibling product at n excluding c
            acc = outside[n]
            for sib in children[n]:
                if sib != c:
                    acc = acc * (clv[sib] @ p_all[sib].T)
            out_c = acc @ p_all[c]
            mx = jnp.maximum(jnp.max(out_c, axis=-1, keepdims=True), 1e-300)
            outside[c] = out_c / mx

    post = []
    for n in range(data.n_leaves, n_nodes):
        joint = clv[n] * outside[n]
        z = jnp.maximum(jnp.sum(joint, axis=-1, keepdims=True), 1e-300)
        post.append(joint / z)
    return jnp.stack(post)

def branch_flux_vectors(
    p_matrices: jnp.ndarray,     # [n_nodes(+1), S, S]
    leaf_partials: jnp.ndarray,  # [n_leaves, patterns, S]
    root_freqs: jnp.ndarray,
    data: PruningData,
    children: list,
) -> tuple:
    """Inside CLVs and parent-side outside vectors for EVERY branch, with
    explicit log-scales, so a single branch's model can be swapped without
    re-pruning:

        siteL(P_b -> M) = sum_ij up[b,p,i] M[i,j] clv[b,p,j]
                          * exp(log_clv[b,p] + log_up[b,p])

    This is the engine behind the reference's per-branch mixture-class
    profiling (``BUSTED.bf:1060-1092``: refit site likelihoods with one
    branch's mixture weights pinned per class) — here each branch costs two
    matvec batches instead of a full LF re-evaluation.

    Returns ``(clv [n_nodes, patterns, S], log_clv [n_nodes, patterns],
    up [n_nodes, patterns, S], log_up [n_nodes, patterns])`` where row b
    describes the branch ABOVE node b (the root row is unused).
    """
    n_nodes = data.n_nodes
    patterns, states = leaf_partials.shape[1], leaf_partials.shape[2]
    dtype = leaf_partials.dtype
    eye = jnp.eye(states, dtype=dtype)
    if p_matrices.shape[0] < n_nodes + 1:
        pad = jnp.broadcast_to(eye, (n_nodes + 1 - p_matrices.shape[0], states, states))
        p_all = jnp.concatenate([p_matrices.astype(dtype), pad], axis=0)
    else:
        p_all = p_matrices.astype(dtype)

    clv = [None] * n_nodes
    log_clv = [None] * n_nodes
    for i in range(data.n_leaves):
        clv[i] = leaf_partials[i]
        log_clv[i] = jnp.zeros((patterns,), dtype)
    order = []
    done = set(range(data.n_leaves))
    pending = [n for n in range(data.n_leaves, n_nodes)]
    while pending:
        for n in list(pending):
            if all(c in done for c in children[n]):
                order.append(n)
                done.add(n)
                pending.remove(n)

    def message(c):
        return clv[c] @ p_all[c].T  # [patterns, S]

    for n in order:
        acc = jnp.ones((patterns, states), dtype)
        sc = jnp.zeros((patterns,), dtype)
        for c in children[n]:
            acc = acc * message(c)
            sc = sc + log_clv[c]
        mx = jnp.maximum(jnp.max(acc, axis=-1, keepdims=True), 1e-300)
        clv[n] = acc / mx
        log_clv[n] = sc + jnp.log(mx[..., 0])

    up = [None] * n_nodes
    log_up = [None] * n_nodes
    root = n_nodes - 1
    up[root] = jnp.broadcast_to(root_freqs.astype(dtype), (patterns, states))
    log_up[root] = jnp.zeros((patterns,), dtype)
    for n in reversed(order):
        # outside vector AT node n (its own state space): the parent-side
        # vector pushed through n's branch matrix; the root's outside is pi
        if n == root:
            o_n = up[root]
        else:
            o_n = up[n] @ p_all[n]           # O_n[j] = sum_i U_n[i] P_n[i,j]
        for c in children[n]:
            acc = o_n
            sc = log_up[n]
            for sib in children[n]:
                if sib != c:
                    acc = acc * message(sib)
                    sc = sc + log_clv[sib]
            mx = jnp.maximum(jnp.max(acc, axis=-1, keepdims=True), 1e-300)
            up[c] = acc / mx
            log_up[c] = sc + jnp.log(mx[..., 0])

    zeros_v = jnp.zeros((patterns, states), dtype)
    zeros_s = jnp.zeros((patterns,), dtype)
    up[root] = zeros_v
    log_up[root] = zeros_s
    return (
        jnp.stack(clv), jnp.stack(log_clv), jnp.stack(up), jnp.stack(log_up)
    )


def sample_ancestors(
    p_matrices,
    leaf_partials,
    root_freqs,
    data: PruningData,
    children: list,
    n_samples: int,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Sample internal-node states from the joint posterior
    (reference: ``SampleAncestorsBySequence``, ``src/core/tree.cpp:4086``;
    driven by ``ancestral.build(lf, part, {"sample": TRUE})``).

    Top-down sampling: root ~ pi_s * CLV_root[s]; each child given its
    sampled parent state q ~ P_child[q, s] * CLV_child[s].  Returns
    [n_samples, n_internal, patterns] int32.  Host NumPy — the inside CLVs
    dominate and are one batched pass; per-sample work is cumsum draws.
    """
    rng = rng or np.random.default_rng(0)
    n_nodes = data.n_nodes
    lp = np.asarray(leaf_partials, dtype=np.float64)
    patterns, states = lp.shape[1], lp.shape[2]
    p_all = np.asarray(p_matrices, dtype=np.float64)

    clv = np.ones((n_nodes, patterns, states))
    clv[: data.n_leaves] = lp
    order = []
    done = set(range(data.n_leaves))
    pending = [n for n in range(data.n_leaves, n_nodes)]
    while pending:
        for n in list(pending):
            if all(c in done for c in children[n]):
                order.append(n)
                done.add(n)
                pending.remove(n)
    for n in order:
        acc = np.ones((patterns, states))
        for c in children[n]:
            acc = acc * np.einsum("ij,pj->pi", p_all[c], clv[c])
        mx = np.maximum(acc.max(axis=-1, keepdims=True), 1e-300)
        clv[n] = acc / mx

    root = n_nodes - 1
    out = np.empty((n_samples, n_nodes - data.n_leaves, patterns), dtype=np.int32)

    def draw(prob):
        """prob [patterns, S] unnormalized -> [patterns] int samples."""
        z = np.maximum(prob.sum(axis=-1, keepdims=True), 1e-300)
        cdf = np.cumsum(prob / z, axis=-1)
        u = rng.uniform(size=(patterns, 1))
        return np.argmax(u < cdf, axis=-1).astype(np.int32)

    for s in range(n_samples):
        state = np.empty((n_nodes, patterns), dtype=np.int32)
        state[root] = draw(clv[root] * np.asarray(root_freqs)[None, :])
        for n in reversed(order):          # preorder: parents before children
            for c in children[n]:
                if c < data.n_leaves:
                    continue
                prob = p_all[c][state[n]] * clv[c]
                state[c] = draw(prob)
        out[s] = state[data.n_leaves :]
    return out
