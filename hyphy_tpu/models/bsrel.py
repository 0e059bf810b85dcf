"""BS_REL: branch-site random-effects likelihood machinery.

Reference: ``libv3/models/codon/BS_REL.bf`` — "explicit form" models whose
per-branch transition matrix is a mixture of exponentials

    P_b(t) = sum_k w_k(b) expm(t_b * (Q_syn + omega_k(b) * Q_nonsyn))

(each branch-site combination draws its omega class independently, so the
mixture happens at the matrix level; ``tree.cpp:2999-3008``).  Site-level
synonymous rate variation (BUSTED --srv) multiplies every rate entry by a
unit-mean GDD class value (``rate_variation.modifier_everything``),
producing a site-level mixture on top.

TPU structure: for G branch groups x K omega classes there are G*K
generator families sharing spectral decompositions; propagators for all
(srv class, omega class, branch) combinations come from batched
two-matmul reconstructions, mixed with class weights, then pruned once
per srv class.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hyphy_tpu.models.base import fill_diagonal_from_rows
from hyphy_tpu.models.codon import MG94Base
from hyphy_tpu.models.parameters import stick_breaking_weights
from hyphy_tpu.ops import expm as expm_ops
from hyphy_tpu.ops import pruning


def omega_distribution(params: Dict, prefix: str, k: int, error_sink: bool = False):
    """(omegas [k(+1)], weights [k(+1)]) from params ``{prefix}_omega_i``
    and stick-breaking fractions ``{prefix}_w_i``.

    ``error_sink`` prepends class 0 — the BUSTED-E misalignment-absorber
    (omega >= 100, weight <= 0.01; reference ``BUSTED.bf:196-226``, class
    index 0 in ``busted.init_grid_setup``)."""
    lo = 0 if error_sink else 1
    omegas = jnp.stack([params[f"{prefix}_omega_{i}"] for i in range(lo, k + 1)])
    if omegas.shape[0] == 1:
        return omegas, jnp.ones((1,))
    fracs = jnp.stack([params[f"{prefix}_w_{i}"] for i in range(lo, k)])
    return omegas, stick_breaking_weights(fracs)


def srv_distribution(params: Dict, k: int, prefix: str = "srv"):
    """Unit-mean GDD synonymous-rate classes (rate_variation.bf GDD)."""
    rates = jnp.stack([params[f"{prefix}_rate_{i}"] for i in range(1, k + 1)])
    if k == 1:
        return jnp.ones((1,)), jnp.ones((1,))
    fracs = jnp.stack([params[f"{prefix}_w_{i}"] for i in range(1, k)])
    weights = stick_breaking_weights(fracs)
    mean = jnp.sum(rates * weights)
    return rates / jnp.maximum(mean, 1e-30), weights


class BSRELEngine:
    """Per-partition BS_REL likelihood evaluator.

    ``group_omegas(params) -> (omegas [G,K], weights [G,K])`` is supplied
    by the method (BUSTED: test/background 3-class; RELAX: reference +
    K-power test; aBSREL: per-branch adaptive classes are handled with
    G = n_branches).
    """

    def __init__(
        self,
        mg94: MG94Base,
        pdata: pruning.PruningData,
        leaf_partials: jnp.ndarray,
        pattern_weights: jnp.ndarray,
        group_of_branch: np.ndarray,    # [B] int
        srv_classes: int = 1,
        basis_fn=None,
        mesh="auto",
    ):
        """``basis_fn(params) -> (q_syn, q_nonsyn)`` overrides the plain
        one-step MG94 bases — the BUSTED --multiple-hits options add
        delta/psi-scaled 2/3-hit entries (``BUSTED.bf:329-352`` via
        ``MG_REV_MH._GenerateRate_generic``).

        ``mesh``: 1-D device mesh sharding the pattern axis (default
        ``"auto"`` = ``settings.default_mesh()`` — on automatically when
        more than one device is visible, like the reference's MPI modes
        inside Optimize, ``likefunc.cpp:3747``; ``None`` forces
        single-device).  Patterns are padded to a device multiple with
        zero-weight all-ones columns; site-level outputs keep the padded
        width — every consumer either reduces with the (zero-padded)
        weights or gathers true sites via ``duplicate_map``."""
        from hyphy_tpu.config import settings

        self.model = mg94
        self.pdata = pdata
        # compute dtype: fp64 on CPU (parity), fp32 on accelerators — the
        # CLV tensors and generators follow it; the pattern-weighted
        # reduction stays fp64 (likelihood.py semantics)
        self.dtype = settings.likelihood_dtype()
        self.leaf_partials = jnp.asarray(leaf_partials, self.dtype)
        self.pattern_weights = jnp.asarray(pattern_weights)
        if isinstance(mesh, str) and mesh == "auto":
            mesh = settings.default_mesh(for_dtype=self.dtype)
        self.mesh = mesh
        self.n_true_patterns = self.leaf_partials.shape[1]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            axis = mesh.axis_names[0]
            n_dev = mesh.devices.size
            n_pat = self.leaf_partials.shape[1]
            if n_pat % n_dev:
                pad = (n_pat + n_dev - 1) // n_dev * n_dev - n_pat
                self.leaf_partials = jnp.concatenate(
                    [self.leaf_partials,
                     jnp.ones((self.leaf_partials.shape[0], pad,
                               self.leaf_partials.shape[2]), self.dtype)],
                    axis=1)
                self.pattern_weights = jnp.concatenate(
                    [self.pattern_weights,
                     jnp.zeros(pad, self.pattern_weights.dtype)])
            self.leaf_partials = jax.device_put(
                self.leaf_partials,
                NamedSharding(mesh, PartitionSpec(None, axis, None)))
            self.pattern_weights = jax.device_put(
                self.pattern_weights, NamedSharding(mesh, PartitionSpec(axis)))
        self.group_of_branch = jnp.asarray(group_of_branch.astype(np.int32))
        self.n_groups = int(group_of_branch.max()) + 1
        self.srv_classes = srv_classes
        self.freqs = mg94.frequencies.astype(self.dtype)
        self.basis_fn = basis_fn or mg94.basis_matrices

    def _family_generators(self, params, omegas):
        """[G*K, S, S] generators; per-group bases (``basis_fn`` returning
        [G,S,S] pairs — aBSREL's per-branch multiple-hit rates) broadcast
        along the class axis, shared bases along both."""
        g, k = omegas.shape
        q_syn, q_non = self.basis_fn(params)
        if q_syn.ndim == 3:                                     # per-group
            m = q_syn[:, None] + omegas[:, :, None, None] * q_non[:, None]
            m = fill_diagonal_from_rows(m.reshape(g * k, *m.shape[2:]))
        else:
            m = fill_diagonal_from_rows(
                q_syn[None] + omegas.reshape(g * k)[:, None, None] * q_non[None]
            )
        return m.astype(self.dtype)

    def mixture_propagators(self, params, omegas, weights, times):
        """P_mix [C, B, S, S] for srv-scaled times.

        omegas/weights: [G, K]; times: [C, B] (srv rate x branch time).

        fp64 (CPU parity): one eigendecomposition per mixture family with
        shared-factor matmuls.  fp32 (accelerators): shared-power Taylor
        per family — the fp32 ``eigh`` loses ~1e-2 absolute on 61-state
        generators (see ops/expm.py).
        """
        g, k = omegas.shape
        m = self._family_generators(params, omegas)             # [G*K, S, S]
        if m.dtype != jnp.float64:
            return self._mixture_propagators_taylor(
                m, g, k, weights, times
            )
        left, lam, right = expm_ops.reversible_spectral(m, self.freqs)
        s = m.shape[-1]
        left = left.reshape(g, k, s, s)[self.group_of_branch]    # [B,K,S,S]
        right = right.reshape(g, k, s, s)[self.group_of_branch]
        lam_b = lam.reshape(g, k, s)[self.group_of_branch]       # [B,K,S]
        w_b = weights[self.group_of_branch]                      # [B,K]
        # el: [C,B,K,S]; fold the class weights into the scaled eigenbasis so
        # the mixture sum contracts in the same einsum
        el = jnp.exp(lam_b[None] * times[:, :, None, None])
        el = el * w_b[None, :, :, None]
        p_mix = jnp.einsum("bkij,cbkj,bkjl->cbil", left, el, right)
        p_mix = jnp.maximum(p_mix, 0.0)
        return expm_ops.row_renormalize(p_mix)

    def _mixture_propagators_taylor(self, m, g, k, weights, times):
        """fp32 path: P_f(t) per family via shared-power Taylor, then the
        class-weighted mix — no eigh on device."""
        c, b = times.shape
        flat_t = times.reshape(-1).astype(m.dtype)              # [C*B]

        def family(mf):
            return expm_ops.shared_taylor_propagators(mf, flat_t)

        p_f = jax.vmap(family)(m)                               # [G*K, C*B, S, S]
        s = m.shape[-1]
        p_f = p_f.reshape(g, k, c, b, s, s)
        gb = self.group_of_branch                               # [B]
        p_sel = p_f[gb, :, :, jnp.arange(b)]                    # [B, K, C, S, S]
        w_b = weights[gb]                                       # [B, K]
        p_mix = jnp.einsum("bkcij,bk->cbij", p_sel, w_b)
        p_mix = jnp.maximum(p_mix, 0.0)
        return expm_ops.row_renormalize(p_mix)

    def branchsite_srv_propagators(
        self, params, omegas, weights, t_b, srv_rates, srv_weights
    ):
        """P_b [B, S, S] when BOTH the omega class and the synonymous rate
        class are drawn independently per branch-site (the reference's
        "Branch-site" SRV mode, ``models.codon.BS_REL_SRV`` selected at
        ``BUSTED.bf:393``): the mixture over the K x C product distribution
        happens inside each branch matrix, and pruning runs once (no
        site-level outer mixture)."""
        g, k = omegas.shape
        c = srv_rates.shape[0]
        m = self._family_generators(params, omegas)              # [G*K, S, S]
        left, lam, right = expm_ops.reversible_spectral(m, self.freqs)
        s = m.shape[-1]
        left = left.reshape(g, k, s, s)[self.group_of_branch]    # [B,K,S,S]
        right = right.reshape(g, k, s, s)[self.group_of_branch]
        lam_b = lam.reshape(g, k, s)[self.group_of_branch]       # [B,K,S]
        w_b = weights[self.group_of_branch]                      # [B,K]
        # scaled spectral factors summed over both class axes:
        # el[b,k,s] = sum_c wsrv_c exp(lam[b,k,s] * r_c * t_b)  (then the
        # omega-class weights fold in as in the independent-SRV path)
        t_scaled = srv_rates[:, None] * t_b[None, :]             # [C, B]
        el = jnp.einsum(
            "c,cbks->bks",
            srv_weights,
            jnp.exp(lam_b[None] * t_scaled[:, :, None, None]),
        )
        el = el * w_b[:, :, None]                                # [B,K,S]
        p = jnp.einsum("bkij,bkj,bkjl->bil", left, el, right)
        p = jnp.maximum(p, 0.0)
        return expm_ops.row_renormalize(p)

    def branchsite_srv_site_log_likelihoods(
        self, params, omegas, weights, t_b, srv_rates, srv_weights
    ):
        p = self.branchsite_srv_propagators(
            params, omegas, weights, t_b, srv_rates, srv_weights
        )
        return pruning.site_log_likelihoods(
            p, self.leaf_partials, self.freqs, self.pdata
        )

    def class_site_log_likelihoods(self, params, omegas, weights, t_b, srv_rates):
        """[C, patterns] per-synonymous-rate-class site log-likelihoods —
        the lattice consumed by independent mixing (below) or by the HMM
        across sites (reference ``SumUpHiddenMarkov``, likefunc2.cpp:1166;
        BUSTED's HMM SRV option, BUSTED.bf:137-158)."""
        times = srv_rates[:, None] * t_b[None, :]                # [C, B]
        p_mix = self.mixture_propagators(params, omegas, weights, times)
        return jax.vmap(
            lambda p: pruning.site_log_likelihoods(
                p, self.leaf_partials, self.freqs, self.pdata
            )
        )(p_mix)                                                 # [C, patterns]

    def site_log_likelihoods(self, params, omegas, weights, t_b, srv_rates, srv_weights):
        """[patterns] log-likelihood vector for the mixture model."""
        sll = self.class_site_log_likelihoods(
            params, omegas, weights, t_b, srv_rates
        )
        logw = jnp.log(jnp.maximum(srv_weights, 1e-300))[:, None]
        return jax.scipy.special.logsumexp(sll + logw, axis=0)

    def loglik(self, params, omegas, weights, t_b, srv_rates, srv_weights):
        sll = self.site_log_likelihoods(
            params, omegas, weights, t_b, srv_rates, srv_weights
        )
        return jnp.dot(
            sll.astype(self.pattern_weights.dtype), self.pattern_weights
        )

    def _per_class_propagators(self, params, omegas, times):
        """[C, B, K, S, S] unmixed per-class propagators at srv-scaled
        times — spectral in fp64, shared-power Taylor otherwise (fp32
        ``eigh`` on 61-state codon generators loses ~1e-2 absolute; the
        same guard :meth:`mixture_propagators` applies)."""
        g, k = omegas.shape
        m = self._family_generators(params, omegas)              # [G*K, S, S]
        s = m.shape[-1]
        c, b = times.shape
        gb = self.group_of_branch
        if m.dtype == jnp.float64:
            left, lam, right = expm_ops.reversible_spectral(m, self.freqs)
            left = left.reshape(g, k, s, s)[gb]                  # [B,K,S,S]
            right = right.reshape(g, k, s, s)[gb]
            lam_b = lam.reshape(g, k, s)[gb]                     # [B,K,S]
            el = jnp.exp(lam_b[None] * times[:, :, None, None])  # [C,B,K,S]
            p = jnp.einsum("bkij,cbkj,bkjl->cbkil", left, el, right)
        else:
            flat_t = times.reshape(-1).astype(m.dtype)           # [C*B]
            p_f = jax.vmap(
                lambda mf: expm_ops.shared_taylor_propagators(mf, flat_t)
            )(m)                                                 # [G*K,C*B,S,S]
            p_f = p_f.reshape(g, k, c, b, s, s)
            p_sel = p_f[gb, :, :, jnp.arange(b)]                 # [B,K,C,S,S]
            p = jnp.transpose(p_sel, (2, 0, 1, 3, 4))            # [C,B,K,S,S]
        return expm_ops.row_renormalize(jnp.maximum(p, 0.0))

    def branch_class_site_logliks(
        self, params, omegas, weights, t_b, srv_rates, srv_weights,
        children, branch_ids,
    ):
        """[n_sel, K, patterns] site log-likelihoods with ONE branch's
        omega-mixture pinned to each class in turn (all other branches
        keep the fitted mixture; the synonymous-rate mixture still applies
        site-wise).

        Reference: ``BUSTED.bf:1060-1092`` — per tested branch, the
        mixture weights are set to a delta on class k and the whole LF
        re-evaluated; here each (branch, class) costs two matvecs against
        precomputed inside/outside flux vectors
        (:func:`ops.ancestral.branch_flux_vectors`).

        ``children``: static per-node child lists; ``branch_ids``: [n_sel]
        node indices whose branch is profiled.
        """
        from hyphy_tpu.ops.ancestral import branch_flux_vectors

        w_b = weights[self.group_of_branch]                      # [B,K]
        c_srv = srv_rates.shape[0]
        times = srv_rates[:, None] * t_b[None, :]                # [C, B]
        p_all = self._per_class_propagators(params, omegas, times)

        out = []
        for ci in range(c_srv):
            # mixed propagators for this srv class (all branches)
            p_mix = jnp.einsum("bkij,bk->bij", p_all[ci], w_b)
            p_mix = expm_ops.row_renormalize(jnp.maximum(p_mix, 0.0))
            clv, log_clv, up, log_up = branch_flux_vectors(
                p_mix, self.leaf_partials, self.freqs, self.pdata, children
            )
            # per selected branch: per-class propagator [K,S,S]
            sel = []
            for b in [int(x) for x in branch_ids]:
                p_k = p_all[ci, b]
                flux = jnp.einsum(
                    "pi,kij,pj->kp", up[b], p_k, clv[b]
                )                                               # [K, patterns]
                sel.append(
                    jnp.log(jnp.maximum(flux, 1e-300))
                    + (log_clv[b] + log_up[b])[None, :]
                )
            out.append(jnp.stack(sel))                           # [n_sel,K,pat]
        stack = jnp.stack(out)                                   # [C,n_sel,K,pat]
        logw = jnp.log(jnp.maximum(srv_weights, 1e-300))
        return jax.scipy.special.logsumexp(
            stack + logw[:, None, None, None], axis=0
        )

    @staticmethod
    def class_posteriors(sll_bk, weights_k):
        """w_k exp(sll_k) normalized over k — the reference's
        ``busted.mixture_site_logl`` posterior (BUSTED.bf:1098)."""
        logw = jnp.log(jnp.maximum(weights_k, 1e-300))
        lp = sll_bk + logw[None, :, None]
        return jnp.exp(lp - jax.scipy.special.logsumexp(lp, axis=1, keepdims=True))
