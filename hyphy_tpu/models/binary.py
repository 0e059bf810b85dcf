"""Binary (2-state) substitution model.

Reference: ``libv3/models/binary.bf`` — a reversible 0/1 character model
with empirical or equal frequencies and per-branch time ``t`` (used for
presence/absence and morphological-style characters)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from hyphy_tpu.models.base import (
    ModelOutput,
    SubstitutionModel,
    expected_rate,
    fill_diagonal_from_rows,
)
from hyphy_tpu.models.parameters import ParamSpec, Params, Specs


class Binary(SubstitutionModel):
    """q_01 = pi_1, q_10 = pi_0 (canonical: rate x target frequency),
    diagonal = -row sum; one local time parameter per branch."""

    n_states = 2
    datatype = "binary"
    reversible = True

    def __init__(self, frequencies=None):
        freqs = np.asarray(
            [0.5, 0.5] if frequencies is None else frequencies, dtype=np.float64
        ).reshape(2)
        self.frequencies = jnp.asarray(freqs / freqs.sum())

    def parameter_specs(self, n_branches: int) -> Specs:
        return {
            "t": ParamSpec(init=0.1, lower=0.0, upper=10000.0, shape=(n_branches,))
        }

    def q_matrix(self, params: Params) -> jnp.ndarray:
        pi = self.frequencies
        q = jnp.array([[0.0, 1.0], [1.0, 0.0]], dtype=pi.dtype) * pi[None, :]
        return fill_diagonal_from_rows(q)

    def build(self, params: Params, n_branches: int) -> ModelOutput:
        q = self.q_matrix(params)
        p = self._propagate(q, self.frequencies, params["t"])
        return ModelOutput(p_matrices=p, root_freqs=self.frequencies)

    def branch_lengths(self, params: Params) -> jnp.ndarray:
        return params["t"] * expected_rate(self.q_matrix(params), self.frequencies)
