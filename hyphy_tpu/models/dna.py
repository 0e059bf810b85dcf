"""Nucleotide substitution models: JC69, HKY85, GTR.

Parity notes (reference ``res/TemplateBatchFiles/libv3/models/DNA/*.bf``):
all are canonical models (``q_xy = rate_xy * pi_y``, diagonal = -row sum);
GTR's exchangeabilities are ``theta_<XY>`` with ``theta_AG := 1``
(``GTR.bf:75-80``); HKY85 uses ``kappa`` on transitions, 1 on transversions;
branch time is the local parameter ``t``.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from hyphy_tpu.data.genetic_code import NUCLEOTIDES
from hyphy_tpu.models.base import (
    ModelOutput,
    SubstitutionModel,
    expected_rate,
    fill_diagonal_from_rows,
)
from hyphy_tpu.models.parameters import ParamSpec, Params, Specs

# unordered nucleotide pairs in reference naming order
GTR_RATES = ["AC", "AG", "AT", "CG", "CT", "GT"]
TRANSITIONS = {"AG", "CT"}


class NucleotideREV(SubstitutionModel):
    """General reversible nucleotide model with a configurable set of free
    exchangeabilities (GTR = all but AG; HKY = single kappa; JC = none)."""

    n_states = 4
    datatype = "nucleotide"
    reversible = True

    def __init__(self, frequencies: np.ndarray, equal_frequencies: bool = False):
        self.frequencies = jnp.asarray(np.asarray(frequencies).reshape(4))
        self.equal_frequencies = equal_frequencies

    # subclasses override
    def _rate_multipliers(self, params: Params) -> jnp.ndarray:
        """[6] rate multipliers in GTR_RATES order."""
        raise NotImplementedError

    def parameter_specs(self, n_branches: int) -> Specs:
        specs = self._rate_specs()
        specs["t"] = ParamSpec(init=0.1, lower=0.0, upper=10000.0, shape=(n_branches,))
        return specs

    def _rate_specs(self) -> Specs:
        return {}

    def q_matrix(self, params: Params) -> jnp.ndarray:
        rates = self._rate_multipliers(params)
        freqs = self.frequencies.astype(rates.dtype)  # keep fp32 path fp32
        q = jnp.zeros((4, 4), dtype=rates.dtype)
        for k, pair in enumerate(GTR_RATES):
            i, j = NUCLEOTIDES.index(pair[0]), NUCLEOTIDES.index(pair[1])
            q = q.at[i, j].set(rates[k] * freqs[j])
            q = q.at[j, i].set(rates[k] * freqs[i])
        return fill_diagonal_from_rows(q)

    def build(self, params: Params, n_branches: int) -> ModelOutput:
        q = self.q_matrix(params)
        p = self._propagate(q, self.frequencies, params["t"])
        return ModelOutput(p_matrices=p, root_freqs=self.frequencies)

    def branch_lengths(self, params: Params) -> jnp.ndarray:
        return params["t"] * expected_rate(self.q_matrix(params), self.frequencies)


class GTR(NucleotideREV):
    """theta_AC..theta_GT free, theta_AG := 1 (GTR.bf)."""

    free_rates = ["AC", "AT", "CG", "CT", "GT"]

    def _rate_specs(self) -> Specs:
        return {f"theta_{p}": ParamSpec(init=0.25, lower=0.0, upper=10000.0)
                for p in self.free_rates}

    def _rate_multipliers(self, params: Params) -> jnp.ndarray:
        free = [params[f"theta_{p}"] for p in GTR_RATES if p != "AG"]
        one = jnp.ones((), dtype=free[0].dtype) if free else jnp.ones(())
        vals = []
        for pair in GTR_RATES:
            vals.append(one if pair == "AG" else params[f"theta_{pair}"])
        return jnp.stack(vals)


class HKY85(NucleotideREV):
    """kappa on transitions (AG, CT), 1 on transversions (HKY85.bf)."""

    def _rate_specs(self) -> Specs:
        return {"kappa": ParamSpec(init=1.0, lower=0.0, upper=10000.0)}

    def _rate_multipliers(self, params: Params) -> jnp.ndarray:
        k = params["kappa"]
        one = jnp.ones_like(k)
        return jnp.stack([one if p not in TRANSITIONS else k for p in GTR_RATES])


class JC69(NucleotideREV):
    """Equal rates, equal frequencies (JC69.bf)."""

    def __init__(self):
        super().__init__(np.full(4, 0.25), equal_frequencies=True)

    def _rate_specs(self) -> Specs:
        return {}

    def _rate_multipliers(self, params: Params) -> jnp.ndarray:
        return jnp.ones(6)
