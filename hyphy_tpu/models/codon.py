"""Codon substitution models: the MG94xREV family.

Q construction (parity-critical, reference ``MG_REV.bf:66-105`` +
``frequencies.codon.multiply_in_frequencies``): entry (x -> y) is nonzero
iff codons differ at exactly one nucleotide position, and equals

    theta_<nucpair> * (alpha | beta or omega) * n_pos(target_nucleotide)

with ``theta_AG := 1`` and ``n`` the (CF3x4 corner / F3x4 observed)
position-specific nucleotide frequencies.  The model is NOT canonical
(``canonical: 0``, MG_REV.bf:25) — codon frequencies are not multiplied
into the rates; the diagonal is -row-sum (``_Matrix::MultByFreqs``,
``matrix.cpp:1546``).

TPU structure: every variant's per-branch generator is
``Q_b = alpha_b * Q_syn + beta_b * Q_nonsyn`` — two fixed sparse basis
matrices scaled per branch.  When ``beta_b/alpha_b`` takes only G distinct
values (global-omega and proportional fits, FEL site fits) all branches
share G eigendecompositions and each P(t) costs two MXU matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hyphy_tpu.data.genetic_code import GeneticCode
from hyphy_tpu.models.base import (
    ModelOutput,
    SubstitutionModel,
    fill_diagonal_from_rows,
)
from hyphy_tpu.models.dna import GTR_RATES
from hyphy_tpu.models.parameters import ParamSpec, Params, Specs
from hyphy_tpu.ops import expm as expm_ops

_PAIR_INDEX = {p: i for i, p in enumerate(GTR_RATES)}
_NUC = "ACGT"


class MG94Base(SubstitutionModel):
    """Shared machinery: sparse basis matrices Q_syn / Q_nonsyn."""

    datatype = "codon"
    reversible = True

    def __init__(
        self,
        gc: GeneticCode,
        corner_freqs: np.ndarray,
        codon_freqs: np.ndarray,
        theta_classes: Optional[str] = None,
    ):
        """``theta_classes``: optional 6-digit class string over the pairs
        AC,AG,AT,CG,CT,GT — pairs sharing a digit share one exchangeability,
        and AG's class is the reference (:= 1).  This is the reference's
        custom-nucleotide-model crossing (e.g. MG94x"012232",
        ``TemplateModels/MG94custom.mdl``; fixture
        ``tests/hbltests/SimpleOptimizations/SmallCodon.bf:47-52`` frees
        AC/AT/CT with CG:=AT, GT:=AT).  None = full REV (5 free thetas)."""
        self.gc = gc
        self.theta_classes = theta_classes
        if theta_classes is not None:
            if len(theta_classes) != 6:
                raise ValueError("theta_classes must have 6 digits")
            ag_class = theta_classes[GTR_RATES.index("AG")]
            rep = {}
            for pair, digit in zip(GTR_RATES, theta_classes):
                if digit != ag_class and digit not in rep:
                    rep[digit] = pair
            self._theta_class_reps = rep      # digit -> parameter pair name
            self._theta_ag_class = ag_class
        self.n_states = gc.n_states
        self.corner_freqs = np.asarray(corner_freqs)  # [4, 3]
        self.frequencies = jnp.asarray(np.asarray(codon_freqs).reshape(-1))
        tbl = gc.one_step_table
        self._pair_i = jnp.asarray(tbl["pairs"][:, 0])
        self._pair_j = jnp.asarray(tbl["pairs"][:, 1])
        theta_idx = []
        for fn, tn in zip(tbl["from_nuc"], tbl["to_nuc"]):
            a, b = _NUC[min(fn, tn)], _NUC[max(fn, tn)]
            theta_idx.append(_PAIR_INDEX[a + b])
        self._theta_idx = jnp.asarray(np.array(theta_idx, dtype=np.int32))
        # position-specific frequency of the *target* nucleotide
        self._multiplier = jnp.asarray(
            self.corner_freqs[tbl["to_nuc"], tbl["position"]]
        )
        self._syn = jnp.asarray(tbl["synonymous"].astype(np.float64))

    # -- construction pieces ------------------------------------------------

    @staticmethod
    def theta_specs() -> Specs:
        """GTR exchangeabilities shared with the nucleotide fit; AG := 1."""
        return {
            f"theta_{p}": ParamSpec(init=0.25, lower=0.0, upper=10000.0)
            for p in GTR_RATES
            if p != "AG"
        }

    def theta_parameter_specs(self) -> Specs:
        """Instance-aware variant: honors ``theta_classes`` sharing."""
        if getattr(self, "theta_classes", None) is None:
            return self.theta_specs()
        return {
            f"theta_{pair}": ParamSpec(init=1.0, lower=0.0, upper=10000.0)
            for pair in self._theta_class_reps.values()
        }

    def _theta_vector(self, params: Params) -> jnp.ndarray:
        if getattr(self, "theta_classes", None) is not None:
            free = [params[f"theta_{p}"] for p in self._theta_class_reps.values()]
            one = jnp.ones((), dtype=free[0].dtype) if free else jnp.ones(())
            return jnp.stack([
                one if d == self._theta_ag_class
                else params[f"theta_{self._theta_class_reps[d]}"]
                for d in self.theta_classes
            ])
        dtype = params["theta_AC"].dtype
        one = jnp.ones((), dtype=dtype)
        return jnp.stack(
            [one if p == "AG" else params[f"theta_{p}"] for p in GTR_RATES]
        )

    def basis_matrices(self, params: Params):
        """(Q_syn, Q_nonsyn) [S,S] with zero diagonals.  Computed in the
        parameter dtype so fp32 TPU evaluations don't silently upcast the
        whole Q/expm pipeline to fp64 (x64 is globally enabled for parity)."""
        theta = self._theta_vector(params)
        dtype = theta.dtype
        entries = theta[self._theta_idx] * self._multiplier.astype(dtype)
        s = self.n_states
        zeros = jnp.zeros((s, s), dtype=dtype)
        syn = self._syn.astype(dtype)
        q_syn = zeros.at[self._pair_i, self._pair_j].set(entries * syn)
        q_non = zeros.at[self._pair_i, self._pair_j].set(entries * (1.0 - syn))
        return q_syn, q_non

    def propagators_grouped(
        self,
        params: Params,
        alpha_b: jnp.ndarray,       # [B] branch syn rates (the expm time)
        ratio_groups: jnp.ndarray,  # [G] beta/alpha per group
        group_of_branch: jnp.ndarray,  # [B] int32 in [0, G)
    ) -> jnp.ndarray:
        """P_b = expm(alpha_b * (Q_syn + r_{g(b)} * Q_nonsyn)) — G
        eigendecompositions shared by all branches.

        The group assignment is static (a concrete array), so branches are
        partitioned per group at trace time and each group's propagators use
        *shared* spectral factors (a broadcasted matmul) instead of gathering
        per-branch [S,S] factor copies — the gather costs ~3x the result
        itself in HBM traffic on large trees."""
        q_syn, q_non = self.basis_matrices(params)
        m = fill_diagonal_from_rows(
            q_syn[None] + ratio_groups[:, None, None] * q_non[None]
        )  # [G,S,S]
        # fp64 (CPU parity path): one eigh per group, shared-factor matmuls.
        # fp32 (TPU perf path): shared-power Taylor — TPU fp32 eigh loses
        # ~1e-2 absolute accuracy on 61-state generators.
        use_spectral = m.dtype == jnp.float64
        if use_spectral:
            left, lam, right = expm_ops.reversible_spectral(m, self.frequencies)

        def group_propagators(g, times):
            if use_spectral:
                return expm_ops.spectral_propagators(
                    left[g], lam[g], right[g], times
                )
            return expm_ops.shared_taylor_propagators(m[g], times)

        try:
            groups = np.asarray(group_of_branch)
        except jax.errors.TracerArrayConversionError:
            if not use_spectral:
                left, lam, right = expm_ops.reversible_spectral(m, self.frequencies)
            return expm_ops.spectral_propagators(
                left[group_of_branch], lam[group_of_branch],
                right[group_of_branch], alpha_b,
            )
        n_groups = int(ratio_groups.shape[0])
        if n_groups == 1:
            return group_propagators(0, alpha_b)
        parts = []
        order = []
        for g in range(n_groups):
            idx = np.nonzero(groups == g)[0]
            if idx.size == 0:
                continue
            order.append(idx)
            parts.append(group_propagators(g, alpha_b[jnp.asarray(idx)]))
        perm = np.argsort(np.concatenate(order), kind="stable").astype(np.int32)
        return jnp.concatenate(parts, axis=0)[jnp.asarray(perm)]

    def propagators_local(
        self, params: Params, alpha_b: jnp.ndarray, beta_b: jnp.ndarray
    ) -> jnp.ndarray:
        """General path: per-branch Q -> batched spectral expm."""
        q_syn, q_non = self.basis_matrices(params)
        q = fill_diagonal_from_rows(
            alpha_b[:, None, None] * q_syn[None] + beta_b[:, None, None] * q_non[None]
        )
        left, lam, right = expm_ops.reversible_spectral(q, self.frequencies)
        return expm_ops.spectral_propagators(
            left, lam, right, jnp.ones_like(alpha_b)
        )

    def rate_per_branch(self, params: Params, alpha_b, beta_b) -> jnp.ndarray:
        """Branch length in expected substitutions per NUCLEOTIDE site —
        codon-model branch lengths carry a 1/3 factor (reference:
        ``model.BranchLengthExpression``, model_functions.bf:696)."""
        q_syn, q_non = self.basis_matrices(params)
        rs = q_syn.sum(-1) @ self.frequencies
        rn = q_non.sum(-1) @ self.frequencies
        return (alpha_b * rs + beta_b * rn) / 3.0

    def syn_nonsyn_unit_rates(self, params: Params):
        """(rate_syn, rate_nonsyn) per unit alpha / beta."""
        q_syn, q_non = self.basis_matrices(params)
        return q_syn.sum(-1) @ self.frequencies, q_non.sum(-1) @ self.frequencies

    # -- multiple instantaneous hits (MG_REV_MH.bf / MG_REV_TRIP.bf) --------

    def _multihit_tables(self):
        """Static index arrays for codon pairs differing at 2 or 3
        positions: rate entry = prod(theta per changed position) *
        prod(target-nuc position frequency) * (alpha|beta) * delta[*psi]
        (``MG_REV_MH.bf:60-107``)."""
        if getattr(self, "_mh_tables", None) is not None:
            return self._mh_tables
        sense = self.gc.sense_codons
        n = len(sense)
        out = {2: [], 3: []}
        corner = self.corner_freqs
        trans = self.gc.translation
        for a in range(n):
            ca = int(sense[a])
            na = (ca // 16, (ca // 4) % 4, ca % 4)
            for b in range(n):
                if a == b:
                    continue
                cb = int(sense[b])
                nb = (cb // 16, (cb // 4) % 4, cb % 4)
                diff = [p for p in range(3) if na[p] != nb[p]]
                d = len(diff)
                if d < 2:
                    continue
                th = [6, 6, 6]  # index 6 = padding (theta == 1)
                mult = 1.0
                for k, p in enumerate(diff):
                    x, y = _NUC[min(na[p], nb[p])], _NUC[max(na[p], nb[p])]
                    th[k] = _PAIR_INDEX[x + y]
                    mult *= corner[nb[p], p]
                out[d].append((a, b, th, mult, trans[ca] == trans[cb]))
        # cache plain numpy (NOT jnp): device constants created while
        # tracing are tracers and must not outlive the trace
        tables = {}
        for d in (2, 3):
            rows = out[d]
            tables[d] = dict(
                pair_i=np.array([r[0] for r in rows], dtype=np.int32),
                pair_j=np.array([r[1] for r in rows], dtype=np.int32),
                theta_idx=np.array([r[2] for r in rows], dtype=np.int32),
                multiplier=np.array([r[3] for r in rows]),
                syn=np.array([float(r[4]) for r in rows]),
            )
        self._mh_tables = tables
        return tables

    def multihit_basis_matrices(self, params: Params, hits: int):
        """(Q_syn, Q_nonsyn) for the 2- or 3-hit entry set (no diagonal)."""
        tbl = self._multihit_tables()[hits]
        theta7 = jnp.concatenate([self._theta_vector(params), jnp.ones(1)])
        entries = (
            jnp.prod(theta7[tbl["theta_idx"]], axis=1) * tbl["multiplier"]
        )
        s = self.n_states
        zeros = jnp.zeros((s, s), dtype=entries.dtype)
        q_syn = zeros.at[tbl["pair_i"], tbl["pair_j"]].set(entries * tbl["syn"])
        q_non = zeros.at[tbl["pair_i"], tbl["pair_j"]].set(
            entries * (1.0 - tbl["syn"])
        )
        return q_syn, q_non


class MG94xREVMultiHit(MG94Base):
    """MG94xREV with double- (delta) and optionally triple-hit (psi)
    instantaneous substitutions (reference: ``models/codon/MG_REV_MH.bf``,
    ``MG_REV_TRIP.bf``; used by FitMultiModel and the --multiple-hits
    options of FEL/MEME/BUSTED/aBSREL).

    Q = alpha_b*(Q1s + d*Q2s + p*Q3s) + beta_b*(Q1n + d*Q2n + p*Q3n),
    beta_b = alpha_b * omega_{group(b)}; delta/psi are global rates.
    """

    def __init__(
        self,
        gc: GeneticCode,
        corner_freqs: np.ndarray,
        codon_freqs: np.ndarray,
        branch_groups: np.ndarray,
        n_groups: int,
        triple: bool = False,
    ):
        super().__init__(gc, corner_freqs, codon_freqs)
        self.branch_groups = jnp.asarray(np.asarray(branch_groups, dtype=np.int32))
        self.n_groups = n_groups
        self.triple = triple

    def parameter_specs(self, n_branches: int) -> Specs:
        specs = self.theta_parameter_specs()
        specs["omega"] = ParamSpec(init=0.25, lower=0.0, upper=10000.0, shape=(self.n_groups,))
        specs["alpha"] = ParamSpec(init=0.15, lower=0.0, upper=10000.0, shape=(n_branches,))
        # reference rate bounds: delta/psi in [0, 100] (MG_REV_MH.bf)
        specs["delta"] = ParamSpec(init=0.05, lower=0.0, upper=100.0)
        if self.triple:
            specs["psi"] = ParamSpec(init=0.05, lower=0.0, upper=100.0)
        return specs

    def _combined_bases(self, params: Params):
        q1s, q1n = self.basis_matrices(params)
        q2s, q2n = self.multihit_basis_matrices(params, 2)
        qs = q1s + params["delta"] * q2s
        qn = q1n + params["delta"] * q2n
        if self.triple:
            q3s, q3n = self.multihit_basis_matrices(params, 3)
            qs = qs + params["psi"] * q3s
            qn = qn + params["psi"] * q3n
        return qs, qn

    def build(self, params: Params, n_branches: int) -> ModelOutput:
        qs, qn = self._combined_bases(params)
        m = fill_diagonal_from_rows(
            qs[None] + params["omega"][:, None, None] * qn[None]
        )
        left, lam, right = expm_ops.reversible_spectral(m, self.frequencies)
        g = self.branch_groups
        p = expm_ops.spectral_propagators(
            left[g], lam[g], right[g], params["alpha"]
        )
        return ModelOutput(p_matrices=p, root_freqs=self.frequencies)

    def branch_lengths(self, params: Params) -> jnp.ndarray:
        qs, qn = self._combined_bases(params)
        rs = qs.sum(-1) @ self.frequencies
        rn = qn.sum(-1) @ self.frequencies
        beta = params["alpha"] * params["omega"][self.branch_groups]
        return (params["alpha"] * rs + beta * rn) / 3.0


class MG94xREVMultiHitGDD(MG94xREVMultiHit):
    """MG94xREV(+MH) with a K-class general-discrete (GDD) site-level
    omega distribution — FitMultiModel's default model shape
    (``FitMultiModel.bf:25`` rate_classes = 3; GDD factory at ``:210``).

    Omega classes are free rates with stick-breaking weights; each class
    is a site-level category (``ModelOutput.class_weights``), i.e. the
    reference's ``_CategoryVariable`` machinery, not a branch-site
    mixture.  ``multiple_hits``/``triple`` rates are shared by all
    classes; ``triple_islands`` adds a separate rate for synonymous
    3-hit substitutions (``terms.parameters.triple_hit_rate_syn``).
    """

    def __init__(self, gc, corner_freqs, codon_freqs, branch_groups,
                 n_groups, hits="None", rate_classes=3,
                 triple_islands=False):
        triple = hits == "Double+Triple"
        super().__init__(gc, corner_freqs, codon_freqs, branch_groups,
                         n_groups, triple=triple)
        self.hits = hits
        self.rate_classes = rate_classes
        self.triple_islands = triple_islands and triple

    def parameter_specs(self, n_branches: int) -> Specs:
        specs = super().parameter_specs(n_branches)
        if self.hits == "None":
            del specs["delta"]
        k = self.rate_classes
        if k > 1:
            del specs["omega"]
            specs["omega_c"] = ParamSpec(
                init=0.25, lower=0.0, upper=10000.0, shape=(k,)
            )
            specs["omega_w"] = ParamSpec(
                init=0.5, lower=1e-6, upper=1.0 - 1e-6, shape=(k - 1,)
            )
        if self.triple_islands:
            specs["psi_syn"] = ParamSpec(init=0.05, lower=0.0, upper=100.0)
        return specs

    def _combined_bases(self, params: Params):
        if self.hits == "None":
            return self.basis_matrices(params)
        if not self.triple_islands:
            return super()._combined_bases(params)
        q1s, q1n = self.basis_matrices(params)
        q2s, q2n = self.multihit_basis_matrices(params, 2)
        q3s, q3n = self.multihit_basis_matrices(params, 3)
        qs = q1s + params["delta"] * q2s + params["psi_syn"] * q3s
        qn = q1n + params["delta"] * q2n + params["psi"] * q3n
        return qs, qn

    def class_distribution(self, params: Params):
        from hyphy_tpu.models.parameters import stick_breaking_weights

        if self.rate_classes == 1:
            return params["omega"][None], jnp.ones((1,))
        return params["omega_c"], stick_breaking_weights(params["omega_w"])

    def build(self, params: Params, n_branches: int) -> ModelOutput:
        omegas, weights = self.class_distribution(params)
        qs, qn = self._combined_bases(params)
        m = fill_diagonal_from_rows(
            qs[None] + omegas[:, None, None] * qn[None]
        )                                                    # [K,S,S]
        left, lam, right = expm_ops.reversible_spectral(m, self.frequencies)
        # [K, B, S, S]: per-class propagators at the branch times
        p = jax.vmap(
            lambda l, e, r: expm_ops.spectral_propagators(l, e, r, params["alpha"])
        )(left, lam, right)
        return ModelOutput(
            p_matrices=p, root_freqs=self.frequencies, class_weights=weights
        )

    def branch_lengths(self, params: Params) -> jnp.ndarray:
        omegas, weights = self.class_distribution(params)
        qs, qn = self._combined_bases(params)
        rs = qs.sum(-1) @ self.frequencies
        rn = qn.sum(-1) @ self.frequencies
        mean_omega = jnp.sum(omegas * weights)
        return params["alpha"] * (rs + mean_omega * rn) / 3.0


class MG94xREV(MG94Base):
    """'Global' model type: one omega, per-branch time t
    (reference: model_type = terms.global)."""

    def parameter_specs(self, n_branches: int) -> Specs:
        specs = self.theta_parameter_specs()
        specs["omega"] = ParamSpec(init=0.25, lower=0.0, upper=10000.0)
        specs["t"] = ParamSpec(init=0.05, lower=0.0, upper=10000.0, shape=(n_branches,))
        return specs

    def build(self, params: Params, n_branches: int) -> ModelOutput:
        p = self.propagators_grouped(
            params,
            params["t"],
            params["omega"][None],
            np.zeros(n_branches, dtype=np.int32),
        )
        return ModelOutput(p_matrices=p, root_freqs=self.frequencies)

    def branch_lengths(self, params: Params) -> jnp.ndarray:
        return self.rate_per_branch(
            params, params["t"], params["t"] * params["omega"]
        )


class MG94xREVLocal(MG94Base):
    """'Local' model type: per-branch (alpha, beta) = (synRate, nonSynRate)."""

    def parameter_specs(self, n_branches: int) -> Specs:
        specs = self.theta_parameter_specs()
        specs["alpha"] = ParamSpec(init=0.05, lower=0.0, upper=10000.0, shape=(n_branches,))
        specs["beta"] = ParamSpec(init=0.05, lower=0.0, upper=10000.0, shape=(n_branches,))
        return specs

    def build(self, params: Params, n_branches: int) -> ModelOutput:
        p = self.propagators_local(params, params["alpha"], params["beta"])
        return ModelOutput(p_matrices=p, root_freqs=self.frequencies)

    def branch_lengths(self, params: Params) -> jnp.ndarray:
        return self.rate_per_branch(params, params["alpha"], params["beta"])


class MG94xREVPartitionedOmega(MG94Base):
    """The 'Global MG94xREV' fit of the selection methods
    (``estimators.FitCodonModel`` with partitioned_omega +
    proportional_branch_length_scaler, ``shared-load-file.bf:706``):

      beta_b  := alpha_b * omega_{group(b)}
      alpha_b := scaler * nuc_branch_length_b   (from the GTR fit)

    Free parameters: 5 thetas, one omega per branch group, one scaler
    (initialized at 3 — the x3 nucleotide->codon branch-length boost,
    ``MG_REV.bf:126-137``).
    """

    def __init__(
        self,
        gc: GeneticCode,
        corner_freqs: np.ndarray,
        codon_freqs: np.ndarray,
        nuc_lengths: np.ndarray,        # [B] GTR branch lengths
        branch_groups: np.ndarray,      # [B] int group per branch
        n_groups: int,
        free_lengths: bool = False,     # if True, alpha_b free (init from nuc)
        theta_classes: Optional[str] = None,
        multiple_hits: str = "None",    # "None" | "Double" | "Double+Triple"
    ):
        super().__init__(gc, corner_freqs, codon_freqs, theta_classes=theta_classes)
        self.nuc_lengths = jnp.asarray(np.asarray(nuc_lengths, dtype=np.float64))
        self.branch_groups = jnp.asarray(np.asarray(branch_groups, dtype=np.int32))
        self.n_groups = n_groups
        self.free_lengths = free_lengths
        self.multiple_hits = multiple_hits

    def parameter_specs(self, n_branches: int) -> Specs:
        specs = self.theta_parameter_specs()
        # omega is shared across partitions in a joint fit (the reference's
        # single global omega, doPartitionedMG); the branch-length scaler is
        # per-partition (scaler_prefix_k, shared-load-file.bf:716)
        specs["omega"] = ParamSpec(
            init=0.25, lower=0.0, upper=10000.0, shape=(self.n_groups,), shared=True
        )
        if self.free_lengths:
            specs["alpha"] = ParamSpec(init=0.15, lower=0.0, upper=10000.0, shape=(n_branches,))
        else:
            specs["scaler"] = ParamSpec(init=3.0, lower=0.0, upper=10000.0, shared=False)
        if self.multiple_hits != "None":
            # global 2-hit (delta) / 3-hit (psi) rates shared across
            # branches and partitions (MG_REV_MH.bf / MG_REV_TRIP.bf)
            specs["delta"] = ParamSpec(init=0.05, lower=0.0, upper=100.0, shared=True)
            if self.multiple_hits == "Double+Triple":
                specs["psi"] = ParamSpec(init=0.05, lower=0.0, upper=100.0, shared=True)
        return specs

    def _alphas(self, params: Params) -> jnp.ndarray:
        if self.free_lengths:
            return params["alpha"]
        return params["scaler"] * self.nuc_lengths

    def combined_basis_matrices(self, params: Params):
        """(Q_syn, Q_nonsyn) including the multiple-hit entry sets scaled
        by delta (2-hit) and psi (3-hit) when enabled."""
        qs, qn = self.basis_matrices(params)
        if self.multiple_hits != "None":
            q2s, q2n = self.multihit_basis_matrices(params, 2)
            qs = qs + params["delta"] * q2s
            qn = qn + params["delta"] * q2n
            if self.multiple_hits == "Double+Triple":
                q3s, q3n = self.multihit_basis_matrices(params, 3)
                qs = qs + params["psi"] * q3s
                qn = qn + params["psi"] * q3n
        return qs, qn

    def build(self, params: Params, n_branches: int) -> ModelOutput:
        if self.multiple_hits != "None":
            qs, qn = self.combined_basis_matrices(params)
            m = fill_diagonal_from_rows(
                qs[None] + params["omega"][:, None, None] * qn[None]
            )
            left, lam, right = expm_ops.reversible_spectral(m, self.frequencies)
            g = self.branch_groups
            p = expm_ops.spectral_propagators(
                left[g], lam[g], right[g], self._alphas(params)
            )
            return ModelOutput(p_matrices=p, root_freqs=self.frequencies)
        p = self.propagators_grouped(
            params, self._alphas(params), params["omega"], self.branch_groups
        )
        return ModelOutput(p_matrices=p, root_freqs=self.frequencies)

    def branch_lengths(self, params: Params) -> jnp.ndarray:
        alpha = self._alphas(params)
        beta = alpha * params["omega"][self.branch_groups]
        if self.multiple_hits != "None":
            qs, qn = self.combined_basis_matrices(params)
            rs = qs.sum(-1) @ self.frequencies
            rn = qn.sum(-1) @ self.frequencies
            return (alpha * rs + beta * rn) / 3.0
        return self.rate_per_branch(params, alpha, beta)
