"""Substitution-model interface.

The reference represents a model as a matrix of HBL formula strings
re-evaluated on every parameter change (``_Matrix`` formula storage,
``src/core/matrix.cpp:1708``; Model statement ``batchlan.cpp:5535``).  Here a
model is a plain Python object whose ``build`` method is a JAX-traceable
function from a flat parameter dict to per-branch transition matrices — the
"formula VM" becomes XLA.

Canonical-form semantics (parity-critical, SURVEY §8.1): for a canonical
model the engine multiplies each off-diagonal ``q_xy`` by ``pi_y`` and then
sets the diagonal to minus the row sum (reference ``_Matrix::MultByFreqs``,
``matrix.cpp:1546-1620``).  Model classes here do both explicitly.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp

from hyphy_tpu.models.parameters import ParamSpec, Params, Specs
from hyphy_tpu.ops import expm as expm_ops


@dataclasses.dataclass
class ModelOutput:
    """Everything the pruning engine needs for one partition.

    ``p_matrices``: ``[n_branches, S, S]`` or ``[C, n_branches, S, S]`` for
    C rate classes; ``class_weights``: ``[C]`` or None;
    ``root_freqs``: ``[S]`` or ``[C, S]``.
    """

    p_matrices: jnp.ndarray
    root_freqs: jnp.ndarray
    class_weights: Optional[jnp.ndarray] = None


def fill_diagonal_from_rows(q: jnp.ndarray) -> jnp.ndarray:
    """diag(Q) = -sum of off-diagonals (the generator condition)."""
    n = q.shape[-1]
    eye = jnp.eye(n, dtype=q.dtype)
    q = q * (1.0 - eye)
    return q - eye * jnp.sum(q, axis=-1, keepdims=True)


def expected_rate(q: jnp.ndarray, pi: jnp.ndarray) -> jnp.ndarray:
    """sum_x pi_x sum_{y!=x} q_xy = -sum_x pi_x q_xx — the substitutions/
    site per unit time (reference: ``_Matrix::BranchLengthExpression``,
    ``matrix.cpp:2644``)."""
    diag = jnp.diagonal(q, axis1=-2, axis2=-1)
    return -jnp.sum(pi * diag, axis=-1)


class SubstitutionModel:
    """Base class; subclasses define the state space and Q construction."""

    n_states: int
    reversible: bool = True
    datatype: str = "nucleotide"

    def parameter_specs(self, n_branches: int) -> Specs:
        raise NotImplementedError

    def build(self, params: Params, n_branches: int) -> ModelOutput:
        raise NotImplementedError

    def branch_lengths(self, params: Params) -> jnp.ndarray:
        """Expected substitutions/site per branch at the current params."""
        raise NotImplementedError

    # helper shared by reversible models
    def _propagate(self, q, pi, t):
        """P(t_b) for all branches from one Q.

        Small-state models (nucleotide 4x4, amino-acid 20x20) use the
        shared-power Taylor propagator: the eigendecomposition path's AD
        rule divides by eigenvalue gaps, so any symmetric-spectrum point
        (JC69 always; HKY85 at kappa=1, i.e. the default starting point)
        yields NaN gradients and silently kills the fit.  Codon models
        (61x61, where the Taylor ladder is ~30x more expensive) keep the
        spectral route via their own propagator entry points."""
        if q.shape[-1] <= 20:
            return expm_ops.shared_taylor_propagators(q, t)
        if self.reversible:
            left, lam, right = expm_ops.reversible_spectral(q, pi)
            return expm_ops.spectral_propagators(left, lam, right, t)
        return expm_ops.transition_matrix(q, t)
