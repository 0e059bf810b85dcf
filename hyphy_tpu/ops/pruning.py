"""Felsenstein pruning as a level-scheduled scan of batched matmuls.

TPU-native replacement of the reference's post-order SIMD kernel
(``ComputeTreeBlockByBranch``, ``src/core/tree_evaluator.cpp:3556``) and its
underflow machinery (2^64 scalers, ``src/core/tree.cpp:126-128``):

  * conditional likelihood vectors (CLVs) for all nodes live in one tensor
    ``[n_nodes+1, patterns, states]`` (last row = all-ones scratch used for
    level padding),
  * one scan step per tree level gathers the level's child CLVs + transition
    matrices, does a batched ``einsum`` (MXU), multiplies siblings together
    with ``segment_prod``, and renormalizes per (node, pattern) with a
    running log-scale accumulator — no data-dependent control flow, exact in
    log space, no 2^64 counters needed.

Rate-class mixing (`[classes]` leading axis) is vmapped on top.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hyphy_tpu.tree.topology import LevelSchedule, Tree

# All CLV contractions pin lax.Precision.HIGH (bf16x3 passes): on TPU the
# DEFAULT f32 matmul runs a single reduced-precision bf16 pass whose ~1e-3
# per-dot rounding compounds across a deep tree into ~0.1 lnL/site error
# (measured, 1000 taxa, |dlnL| 197).  HIGH restores the fp32 round-off
# floor of the rest of the path — measured on the 1000-taxon bench
# workload |dlnL| 3.4 vs 7.9 for HIGHEST (bf16x6), i.e. the matmul is no
# longer the dominant error term — at 2.2x the HIGHEST throughput
# (13.1 vs 28.2 ms/eval).  On CPU the flag is a no-op.
_PRECISION = jax.lax.Precision.HIGH


class PruningData(NamedTuple):
    """Static (per-topology) arrays driving the pruning scan."""

    node_ids: jnp.ndarray     # [depth, maxW] int32, pad -> n_nodes (scratch)
    child_ids: jnp.ndarray    # [depth, maxW, arity] int32, pad -> scratch
    n_nodes: int
    n_leaves: int
    max_width: int
    arity: int
    # exact-width unrolled schedule (None when shape-bucketing is requested):
    # tuple of (storage_offset, child_storage [W,K], child_branch [W,K]) per
    # level, with internal-node CLVs stored level-contiguously so each level
    # writes one static slice instead of scattering into the full buffer.
    ulevels: tuple = None


def build_pruning_data(tree: Tree, min_depth: int = 0, min_width: int = 0) -> PruningData:
    sched = LevelSchedule.build(tree, min_depth=min_depth, min_width=min_width)
    ulevels = None
    if min_depth == 0 and min_width == 0:
        n_nodes, n_leaves = tree.n_nodes, tree.n_leaves
        storage = np.full(n_nodes + 1, n_nodes, dtype=np.int64)
        storage[:n_leaves] = np.arange(n_leaves)
        next_slot = n_leaves
        levels = []
        for lv in tree.levels():
            w = len(lv)
            storage[lv] = next_slot + np.arange(w)
            child_storage = np.full((w, sched.arity), n_nodes, dtype=np.int32)
            child_branch = np.full((w, sched.arity), n_nodes, dtype=np.int32)
            for slot, nd in enumerate(lv):
                for k, c in enumerate(tree.children[nd]):
                    child_storage[slot, k] = storage[c]
                    child_branch[slot, k] = c
            levels.append((next_slot, child_storage, child_branch))
            next_slot += w
        ulevels = tuple(levels)
    return PruningData(
        node_ids=jnp.asarray(sched.node_ids),
        child_ids=jnp.asarray(sched.child_ids),
        n_nodes=sched.n_nodes,
        n_leaves=sched.n_leaves,
        max_width=sched.node_ids.shape[1],
        arity=sched.arity,
        ulevels=ulevels,
    )


def site_log_likelihoods(
    p_matrices: jnp.ndarray,   # [n_nodes(+1), S, S]; row above each node
    leaf_partials: jnp.ndarray,  # [n_leaves, patterns, S]
    root_freqs: jnp.ndarray,   # [S]
    data: PruningData,
) -> jnp.ndarray:
    """Per-pattern log-likelihood ``log sum_s pi_s CLV_root[p, s]``.

    ``p_matrices`` may have ``n_nodes`` rows (root row unused) or
    ``n_nodes + 1``; an identity row is appended/overwritten at the scratch
    index so padded gathers are no-ops.
    """
    n_nodes = data.n_nodes
    patterns, states = leaf_partials.shape[1], leaf_partials.shape[2]
    dtype = leaf_partials.dtype

    eye = jnp.eye(states, dtype=dtype)
    if p_matrices.shape[0] < n_nodes + 1:
        pad = jnp.broadcast_to(eye, (n_nodes + 1 - p_matrices.shape[0], states, states))
        p_all = jnp.concatenate([p_matrices.astype(dtype), pad], axis=0)
    else:
        p_all = p_matrices.astype(dtype).at[n_nodes].set(eye)

    if data.ulevels is not None:
        return _site_log_likelihoods_unrolled(
            p_all, leaf_partials, root_freqs, data
        )

    clv = jnp.ones((n_nodes + 1 + data.max_width, patterns, states), dtype=dtype)
    clv = clv.at[: data.n_leaves].set(leaf_partials)
    # the running log-scale sums ~O(tree depth) terms to a large magnitude;
    # accumulate in fp64 (per-level log/sum stay in the compute dtype) so an
    # fp32 CLV path does not quantize site lnL at the accumulator
    log_scale = jnp.zeros((patterns,), dtype=jnp.float64)

    def level_step(carry, level):
        clv, log_scale = carry
        node_ids, child_ids = level            # [W], [W, K]
        flat = child_ids.reshape(-1)           # [W*K]
        cp = p_all[flat]                       # [W*K, S, S]
        cc = clv[flat]                         # [W*K, patterns, S]
        # child message to parent: m[b, p, i] = sum_j P[b, i, j] c[b, p, j]
        contrib = jnp.einsum(
            "bij,bpj->bpi", cp, cc, preferred_element_type=dtype,
            precision=_PRECISION,
        ).reshape(child_ids.shape[0], data.arity, patterns, states)
        prod = jnp.prod(contrib, axis=1)       # [W, patterns, S]
        mx = jnp.max(prod, axis=-1, keepdims=True)
        mx = jnp.where(mx > 0, mx, 1.0)
        prod = prod / mx
        log_scale = log_scale + jnp.sum(
            jnp.log(mx[..., 0]), axis=0
        ).astype(jnp.float64)
        clv = clv.at[node_ids].set(prod, unique_indices=True)
        return (clv, log_scale), None

    (clv, log_scale), _ = jax.lax.scan(
        level_step,
        (clv, log_scale),
        (data.node_ids, data.child_ids),
    )
    root_like = clv[n_nodes - 1] @ root_freqs.astype(dtype)  # [patterns]
    root_like = jnp.maximum(root_like, jnp.finfo(dtype).tiny)
    return jnp.log(root_like.astype(jnp.float64)) + log_scale


def _site_log_likelihoods_unrolled(
    p_all: jnp.ndarray,          # [n_nodes+1, S, S], identity at scratch row
    leaf_partials: jnp.ndarray,  # [n_leaves, patterns, S]
    root_freqs: jnp.ndarray,
    data: PruningData,
) -> jnp.ndarray:
    """Exact-width per-level pruning (no scan padding).

    Each level is its own batched einsum over exactly the level's nodes, and
    internal CLVs are stored level-contiguously so writes are static slices
    (XLA updates the buffer in place) instead of full-buffer scatters — on a
    1000-taxon tree the padded-scan variant moves ~8x more HBM bytes than
    the CLVs it actually produces.
    """
    n_nodes = data.n_nodes
    patterns, states = leaf_partials.shape[1], leaf_partials.shape[2]
    dtype = leaf_partials.dtype

    buf = jnp.concatenate(
        [
            leaf_partials,
            jnp.ones((n_nodes + 1 - data.n_leaves, patterns, states), dtype=dtype),
        ],
        axis=0,
    )
    # fp64 log-scale accumulator (see site_log_likelihoods)
    log_scale = jnp.zeros((patterns,), dtype=jnp.float64)

    use_pallas = False
    if dtype == jnp.float32 and __import__("os").environ.get(
        "HYPHY_TPU_PALLAS"
    ) == "1":
        # opt-in fused level kernel; differentiable via a custom VJP whose
        # backward is the einsum formulation (pallas_call has no AD rule)
        from hyphy_tpu.ops import pallas_pruning

        use_pallas = pallas_pruning.available()

    for offset, child_storage, child_branch in data.ulevels:
        w, k = child_storage.shape
        if use_pallas:
            from hyphy_tpu.ops import pallas_pruning

            cc4 = buf[child_storage]                   # [W, K, patterns, S]
            cp4 = p_all[child_branch]                  # [W, K, S, S]
            prod = pallas_pruning.level_products(cc4, cp4, k)
            mx = jnp.max(prod, axis=-1, keepdims=True)
            mx = jnp.where(mx > 0, mx, 1.0)
            prod = prod / mx
            log_scale = log_scale + jnp.sum(
                jnp.log(mx[..., 0]), axis=0
            ).astype(jnp.float64)
            buf = jax.lax.dynamic_update_slice(buf, prod, (offset, 0, 0))
            continue
        # one einsum per child slot with the sibling product fused into the
        # second GEMM's consumer instead of materializing the full
        # [W, K, patterns, S] contrib tensor and prod-reducing it: measured
        # 12% faster on the 1000-taxon bench (11.45 vs 13.08 ms/eval) —
        # the level loop is HBM-bound and this skips one round trip of the
        # contrib intermediate
        prod = None
        for kk in range(k):
            m = jnp.einsum(
                "bij,bpj->bpi",
                p_all[child_branch[:, kk]], buf[child_storage[:, kk]],
                preferred_element_type=dtype, precision=_PRECISION,
            )
            prod = m if prod is None else prod * m     # [W, patterns, S]
        mx = jnp.max(prod, axis=-1, keepdims=True)
        mx = jnp.where(mx > 0, mx, 1.0)
        prod = prod / mx
        log_scale = log_scale + jnp.sum(
            jnp.log(mx[..., 0]), axis=0
        ).astype(jnp.float64)
        buf = jax.lax.dynamic_update_slice(buf, prod, (offset, 0, 0))

    root_like = buf[n_nodes - 1] @ root_freqs.astype(dtype)
    root_like = jnp.maximum(root_like, jnp.finfo(dtype).tiny)
    return jnp.log(root_like.astype(jnp.float64)) + log_scale


def mixture_site_log_likelihoods(
    p_matrices: jnp.ndarray,     # [C, n_nodes(+1), S, S]
    class_weights: jnp.ndarray,  # [C] (or [C, patterns] for site-varying)
    leaf_partials: jnp.ndarray,
    root_freqs: jnp.ndarray,     # [S] or [C, S]
    data: PruningData,
) -> jnp.ndarray:
    """log sum_c w_c * siteL_c — rate-class mixture over vmapped pruning
    (reference: ``PopulateConditionalProbabilities``,
    ``src/core/likefunc2.cpp:484``)."""
    if root_freqs.ndim == 1:
        root_freqs = jnp.broadcast_to(
            root_freqs, (p_matrices.shape[0],) + root_freqs.shape
        )
    per_class = jax.vmap(
        lambda p, f: site_log_likelihoods(p, leaf_partials, f, data)
    )(p_matrices, root_freqs)                                # [C, patterns]
    if class_weights.ndim == 1:
        logw = jnp.log(jnp.maximum(class_weights, 1e-300))[:, None]
    else:
        logw = jnp.log(jnp.maximum(class_weights, 1e-300))
    return jax.scipy.special.logsumexp(per_class + logw, axis=0)


def total_log_likelihood(site_loglik: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """lnL = sum_patterns freq_p * lnL_p (reference: likefunc.cpp:11123)."""
    return jnp.dot(site_loglik, weights)


def single_site_log_likelihood_spectral_mixture(
    left: jnp.ndarray,          # [M, S, S] spectral factors per generator family
    lam: jnp.ndarray,           # [M, S]
    right: jnp.ndarray,         # [M, S, S]
    comp_index: jnp.ndarray,    # [n_branches, K] family index per branch component
    comp_weight: jnp.ndarray,   # [n_branches, K] mixture weight per component
    times: jnp.ndarray,         # [n_branches] per-branch expm times
    leaf_vectors: jnp.ndarray,  # [n_leaves, S]
    root_freqs: jnp.ndarray,
    data: PruningData,
) -> jnp.ndarray:
    """One site's log-likelihood when each branch's transition matrix is a
    mixture of exponentials sharing M generator families:
    ``P_b = sum_k w[b,k] expm(t_b * Q_{comp_index[b,k]})`` (BS_REL /
    MEME branch-site mixtures, reference tree.cpp:2999-3008) — with the
    spectral factors acting on CLV vectors.

    Internally the (comp_index, comp_weight) pairs become a dense
    ``[n_branches, M]`` weight table so every family's message is one
    shared matmul over all children (no per-branch matrix gathers).
    """
    n_nodes = data.n_nodes
    states = leaf_vectors.shape[-1]
    dtype = leaf_vectors.dtype
    n_b, n_k = comp_index.shape
    n_fam = left.shape[0]

    # dense weights [n_nodes+1, M]; scratch rows get weight 0 everywhere
    # (their message is fixed to the identity: t=0 on every family and the
    # mixture then sums to ... handled by putting full weight on family 0)
    w_dense = jnp.zeros((n_nodes + 1, n_fam), dtype=dtype)
    rows = jnp.repeat(jnp.arange(n_b), n_k)
    w_dense = w_dense.at[rows, comp_index.reshape(-1)].add(comp_weight.reshape(-1))
    w_dense = w_dense.at[n_b:, 0].set(1.0)  # scratch rows: family 0, t=0
    t_all = jnp.zeros((n_nodes + 1,), dtype=dtype).at[:n_b].set(times)
    el_all = jnp.exp(lam[None, :, :] * t_all[:, None, None])  # [n_nodes+1, M, S]

    clv = jnp.ones((n_nodes + 1 + data.max_width, states), dtype=dtype)
    clv = clv.at[: data.n_leaves].set(leaf_vectors)
    log_scale = jnp.zeros((), dtype=dtype)

    def level_step(carry, level):
        clv, log_scale = carry
        node_ids, child_ids = level
        flat = child_ids.reshape(-1)                 # [F]
        cc = clv[flat]                               # [F, S]
        # all families share the child vectors: [M, F, S] via matmuls
        v = jnp.einsum("fs,mks->mfk", cc, right)     # right action
        v = v * jnp.swapaxes(el_all[flat], 0, 1)     # [M, F, S] scale
        msg_m = jnp.einsum("mfk,mik->mfi", v, left)  # left action
        msg = jnp.einsum("mfi,fm->fi", msg_m, w_dense[flat])
        prod = jnp.prod(
            msg.reshape(child_ids.shape[0], data.arity, states), axis=1
        )
        mx = jnp.max(prod, axis=-1, keepdims=True)
        mx = jnp.where(mx > 0, mx, 1.0)
        prod = prod / mx
        log_scale = log_scale + jnp.sum(jnp.log(mx))
        clv = clv.at[node_ids].set(prod, unique_indices=True)
        return (clv, log_scale), None

    (clv, log_scale), _ = jax.lax.scan(
        level_step, (clv, log_scale), (data.node_ids, data.child_ids)
    )
    root_like = clv[n_nodes - 1] @ root_freqs.astype(dtype)
    root_like = jnp.maximum(root_like, jnp.finfo(dtype).tiny)
    return jnp.log(root_like) + log_scale


def single_site_log_likelihood_dense(
    p_matrices: jnp.ndarray,    # [n_branches, S, S] per-branch propagators
    leaf_vectors: jnp.ndarray,  # [n_leaves, S] this site's leaf partials
    root_freqs: jnp.ndarray,
    data: PruningData,
) -> jnp.ndarray:
    """Log-likelihood of ONE site from materialized per-branch transition
    matrices.

    The fp32/TPU companion of :func:`single_site_log_likelihood_spectral`:
    the per-site methods build P_b with the shared-power Taylor propagators
    (``ops/expm.py``) — which hold fp32 round-off where the fp32 ``eigh``
    spectral path loses ~1e-2 on 61-state codon generators — and then prune
    with plain gathered matvecs.  Padded (scratch) gathers hit an appended
    identity row.
    """
    n_nodes = data.n_nodes
    states = leaf_vectors.shape[-1]
    dtype = leaf_vectors.dtype

    eye = jnp.eye(states, dtype=dtype)
    pad_rows = n_nodes + 1 - p_matrices.shape[0]
    if pad_rows > 0:
        pad = jnp.broadcast_to(eye, (pad_rows, states, states))
        p_all = jnp.concatenate([p_matrices.astype(dtype), pad], axis=0)
    else:
        p_all = p_matrices.astype(dtype).at[n_nodes].set(eye)

    clv = jnp.ones((n_nodes + 1 + data.max_width, states), dtype=dtype)
    clv = clv.at[: data.n_leaves].set(leaf_vectors)
    log_scale = jnp.zeros((), dtype=dtype)

    def level_step(carry, level):
        clv, log_scale = carry
        node_ids, child_ids = level                  # [W], [W, K]
        flat = child_ids.reshape(-1)
        cc = clv[flat]                               # [W*K, S]
        msg = jnp.einsum(
            "bij,bj->bi", p_all[flat], cc, precision=_PRECISION
        )
        prod = jnp.prod(
            msg.reshape(child_ids.shape[0], data.arity, states), axis=1
        )
        mx = jnp.max(prod, axis=-1, keepdims=True)
        mx = jnp.where(mx > 0, mx, 1.0)
        prod = prod / mx
        log_scale = log_scale + jnp.sum(jnp.log(mx))
        clv = clv.at[node_ids].set(prod, unique_indices=True)
        return (clv, log_scale), None

    (clv, log_scale), _ = jax.lax.scan(
        level_step, (clv, log_scale), (data.node_ids, data.child_ids)
    )
    root_like = clv[n_nodes - 1] @ root_freqs.astype(dtype)
    root_like = jnp.maximum(root_like, jnp.finfo(dtype).tiny)
    return jnp.log(root_like) + log_scale


def single_site_log_likelihood_taylor(
    qn: jnp.ndarray,            # [G, S, S] normalized generators per group
    m2p: jnp.ndarray,           # [G, L, S, S] squaring-ladder matrices
    r: jnp.ndarray,             # [n_branches] fractional Taylor times
    j: jnp.ndarray,             # [n_branches] int ladder exponents
    group_of_branch: jnp.ndarray,  # [n_branches] int32 in [0, G)
    n_terms: int,
    leaf_vectors: jnp.ndarray,  # [n_leaves, S] this site's leaf partials
    root_freqs: jnp.ndarray,
    data: PruningData,
    mix_weights: jnp.ndarray = None,  # [n_branches, G]: P_b = sum_g w expm_g
) -> jnp.ndarray:
    """One site's log-likelihood with each branch's propagator applied as
    a VECTOR action from :func:`ops.expm.taylor_action_factors` — ladder
    steps ``v <- m2p[g,k] v`` by the bits of ``j_b``, then a Horner Taylor
    recurrence ``acc <- v + (r_b/k) qn_g acc``.

    fp32-exact like the dense Taylor path but without materializing
    ``[branches, S, S]`` (vmapped over sites that tensor is tens of GB at
    1000 taxa); uses the exact-width unrolled level schedule (the padded
    scan wastes ~7x compute on wide-level trees).  Branch groups (G small:
    tested/background) each run the shared-matrix action and the result is
    selected per branch — G x compute but MXU-shaped matmuls throughout.
    """
    n_nodes = data.n_nodes
    states = leaf_vectors.shape[-1]
    dtype = leaf_vectors.dtype
    assert data.ulevels is not None, "taylor action path needs ulevels"
    n_groups = qn.shape[0]

    if mix_weights is not None:
        # mixture mode: r/j are PER (branch, component) — every component
        # generator has its own norm scaling
        r_all = jnp.zeros((n_nodes + 1, n_groups), dtype).at[: r.shape[0]].set(r)
        j_all = jnp.zeros((n_nodes + 1, n_groups), jnp.int32).at[
            : j.shape[0]
        ].set(j)
        # scratch branches mix to the identity action: full weight on
        # component 0 with r = 0, j = 0
        w_pad = jnp.zeros((n_nodes + 1, n_groups), dtype)
        w_pad = w_pad.at[: mix_weights.shape[0]].set(mix_weights.astype(dtype))
        w_pad = w_pad.at[mix_weights.shape[0] :, 0].set(1.0)
        w_all = w_pad
    else:
        r_all = jnp.zeros((n_nodes + 1,), dtype).at[: r.shape[0]].set(r)
        j_all = jnp.zeros((n_nodes + 1,), jnp.int32).at[: j.shape[0]].set(j)
    g_all = jnp.zeros((n_nodes + 1,), jnp.int32).at[
        : group_of_branch.shape[0]
    ].set(group_of_branch.astype(jnp.int32))
    n_ladder = m2p.shape[1]

    buf = jnp.concatenate(
        [leaf_vectors,
         jnp.ones((n_nodes + 1 - data.n_leaves, states), dtype=dtype)],
        axis=0,
    )
    log_scale = jnp.zeros((), dtype=dtype)

    def action(v, rb, jb, g):
        """expm action for one group's shared matrices on [F, S] rows.

        The squaring ladder walks only as many bits as the LARGEST ``j``
        in the batch sets (a ``while_loop``; under the per-site ``vmap``
        the trip count is the max over sites) — typical site fits have
        ``t_eff`` of a few, so 1-2 steps run instead of the full depth.
        Derivative-free callers only (FEL/MEME Nelder-Mead): reverse-mode
        AD cannot cross a ``while_loop``."""
        def ladder_cond(carry):
            k, _ = carry
            return jnp.logical_and(k < n_ladder, jnp.any((jb >> k) > 0))

        def ladder_step(carry):
            k, v = carry
            bit = ((jb >> k) & 1).astype(bool)
            mv = jnp.matmul(v, m2p[g, k].T, precision=_PRECISION)
            return k + 1, jnp.where(bit[:, None], mv, v)

        _, v = jax.lax.while_loop(
            ladder_cond, ladder_step, (jnp.zeros((), jnp.int32), v)
        )
        acc = v
        for k in range(n_terms, 0, -1):
            acc = v + (rb / k)[:, None] * jnp.matmul(
                acc, qn[g].T, precision=_PRECISION
            )
        return acc

    for offset, child_storage, child_branch in data.ulevels:
        w, karity = child_storage.shape
        flat_s = child_storage.reshape(-1)
        flat_b = child_branch.reshape(-1)
        v = buf[flat_s]                                   # [F, S]
        if mix_weights is not None:
            wb = w_all[flat_b]                            # [F, G]
            rb2 = r_all[flat_b]                           # [F, G]
            jb2 = j_all[flat_b]
            msg = wb[:, 0:1] * action(v, rb2[:, 0], jb2[:, 0], 0)
            for g in range(1, n_groups):
                msg = msg + wb[:, g : g + 1] * action(
                    v, rb2[:, g], jb2[:, g], g
                )
        else:
            jb = j_all[flat_b]                            # [F]
            rb = r_all[flat_b]
            gb = g_all[flat_b]
            msg = action(v, rb, jb, 0)
            for g in range(1, n_groups):
                msg = jnp.where(
                    (gb == g)[:, None], action(v, rb, jb, g), msg
                )
        msg = jnp.maximum(msg, 0.0)
        prod = jnp.prod(msg.reshape(w, karity, states), axis=1)
        mx = jnp.max(prod, axis=-1, keepdims=True)
        mx = jnp.where(mx > 0, mx, 1.0)
        prod = prod / mx
        log_scale = log_scale + jnp.sum(jnp.log(mx))
        buf = jax.lax.dynamic_update_slice(buf, prod, (offset, 0))

    root_like = buf[n_nodes - 1] @ root_freqs.astype(dtype)
    root_like = jnp.maximum(root_like, jnp.finfo(dtype).tiny)
    return jnp.log(root_like) + log_scale


def single_site_log_likelihood_spectral(
    left: jnp.ndarray,        # [S, S]  spectral factors of the shared Q
    lam: jnp.ndarray,         # [S]
    right: jnp.ndarray,       # [S, S]
    times: jnp.ndarray,       # [n_branches] per-branch expm times
    leaf_vectors: jnp.ndarray,  # [n_leaves, S] this site's leaf partials
    root_freqs: jnp.ndarray,
    data: PruningData,
) -> jnp.ndarray:
    """Log-likelihood of ONE site when every branch shares one generator
    up to a per-branch time scale (P_b = left diag(e^{lam t_b}) right).

    The spectral factors act on CLV *vectors* (3 x S^2 flops per branch)
    instead of materializing P_b (2 x S^3) — the dominant-cost fix for
    vmapped per-site fits (FEL/MEME site models).  Padded branches use
    t = 0, so e^{lam*0} = 1 and left@right = I: a no-op message.
    """
    n_nodes = data.n_nodes
    states = leaf_vectors.shape[-1]
    dtype = leaf_vectors.dtype
    # per-branch spectral scale factors; scratch row (index n_nodes) = t=0
    t_all = jnp.zeros((n_nodes + 1,), dtype=dtype).at[: times.shape[0]].set(times)
    if lam.ndim == 2:  # per-branch eigenvalues
        lam_all = jnp.zeros((n_nodes + 1, states), dtype=dtype)
        lam_all = lam_all.at[: lam.shape[0]].set(lam)
        el = jnp.exp(lam_all * t_all[:, None])       # [n_nodes+1, S]
    else:
        el = jnp.exp(lam[None, :] * t_all[:, None])  # [n_nodes+1, S]

    clv = jnp.ones((n_nodes + 1 + data.max_width, states), dtype=dtype)
    clv = clv.at[: data.n_leaves].set(leaf_vectors)
    log_scale = jnp.zeros((), dtype=dtype)

    per_branch = left.ndim == 3
    if per_branch:
        # pad factor arrays with identity rows for scratch gathers
        eye = jnp.eye(states, dtype=dtype)
        pad_rows = n_nodes + 1 - left.shape[0]
        if pad_rows > 0:
            pad = jnp.broadcast_to(eye, (pad_rows, states, states))
            left = jnp.concatenate([left.astype(dtype), pad], axis=0)
            right = jnp.concatenate([right.astype(dtype), pad], axis=0)

    def level_step(carry, level):
        clv, log_scale = carry
        node_ids, child_ids = level                  # [W], [W, K]
        flat = child_ids.reshape(-1)
        cc = clv[flat]                               # [W*K, S]
        if per_branch:
            v = jnp.einsum("bks,bs->bk", right[flat], cc) * el[flat]
            msg = jnp.einsum("bks,bs->bk", left[flat], v)
        else:
            v = (cc @ right.T) * el[flat]            # right action + scale
            msg = v @ left.T                         # [W*K, S]
        prod = jnp.prod(
            msg.reshape(child_ids.shape[0], data.arity, states), axis=1
        )
        mx = jnp.max(prod, axis=-1, keepdims=True)
        mx = jnp.where(mx > 0, mx, 1.0)
        prod = prod / mx
        log_scale = log_scale + jnp.sum(jnp.log(mx))
        clv = clv.at[node_ids].set(prod, unique_indices=True)
        return (clv, log_scale), None

    (clv, log_scale), _ = jax.lax.scan(
        level_step, (clv, log_scale), (data.node_ids, data.child_ids)
    )
    root_like = clv[n_nodes - 1] @ root_freqs.astype(dtype)
    root_like = jnp.maximum(root_like, jnp.finfo(dtype).tiny)
    return jnp.log(root_like) + log_scale
