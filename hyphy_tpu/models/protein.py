"""Amino-acid substitution models: empirical matrices (JTT, WAG, LG, ...)
and the general REV protein model.

The empirical models' pairwise rates and default frequencies are published
scientific constants (Jones-Taylor-Thornton 1992, Whelan-Goldman 2001,
Le-Gascuel 2008, ...) stored as JSON under ``hyphy_tpu/resources/protein``
(reference counterparts: ``libv3/models/protein/matrices/*.ibf``).

All are canonical models: ``q_xy = r_xy * pi_y``, diagonal = -row sum.
Frequency variants mirror the reference naming: base (model frequencies),
``+F`` (empirical from data), ``ML`` (optimized — via the general
machinery, reference ``frequencies.mle``).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from hyphy_tpu.data.genetic_code import AMINO_ACIDS
from hyphy_tpu.models.base import (
    ModelOutput,
    SubstitutionModel,
    expected_rate,
    fill_diagonal_from_rows,
)
from hyphy_tpu.models.parameters import ParamSpec, Params, Specs

_RESOURCE_DIR = os.path.join(os.path.dirname(__file__), "..", "resources", "protein")

EMPIRICAL_MODELS = ["LG", "WAG", "JTT", "JC69", "Dayhoff", "rtREV", "mtMAM", "mtREV24", "mtMet", "mtVer", "mtInv", "gcpREV", "HIVBm", "HIVWm"]


@functools.lru_cache(maxsize=None)
def load_empirical(name: str) -> Dict:
    path = os.path.join(_RESOURCE_DIR, f"{name}.json")
    if not os.path.exists(path):
        raise ValueError(f"unknown empirical protein model {name!r}; "
                         f"options: {EMPIRICAL_MODELS}")
    with open(path) as fh:
        return json.load(fh)


def rate_matrix_from_pairs(rates: Dict[str, float]) -> np.ndarray:
    """Symmetric 20x20 exchangeability matrix from {'AC': r, ...} pairs."""
    r = np.zeros((20, 20))
    for pair, v in rates.items():
        i, j = AMINO_ACIDS.index(pair[0]), AMINO_ACIDS.index(pair[1])
        r[i, j] = r[j, i] = v
    return r


class EmpiricalProtein(SubstitutionModel):
    """Fixed-exchangeability protein model with per-branch time t."""

    n_states = 20
    datatype = "protein"
    reversible = True

    def __init__(self, name: str = "LG", frequencies: Optional[np.ndarray] = None):
        data = load_empirical(name)
        self.name = name
        self.exchangeabilities = rate_matrix_from_pairs(data["rates"])
        if frequencies is None:
            frequencies = np.asarray(data["frequencies"])
        self.frequencies = jnp.asarray(np.asarray(frequencies).reshape(20))

    def parameter_specs(self, n_branches: int) -> Specs:
        return {"t": ParamSpec(init=0.1, lower=0.0, upper=10000.0, shape=(n_branches,))}

    def q_matrix(self, params: Params = None) -> jnp.ndarray:
        q = jnp.asarray(self.exchangeabilities) * self.frequencies[None, :]
        return fill_diagonal_from_rows(q)

    def build(self, params: Params, n_branches: int) -> ModelOutput:
        q = self.q_matrix(params)
        p = self._propagate(q, self.frequencies, params["t"])
        return ModelOutput(p_matrices=p, root_freqs=self.frequencies)

    def branch_lengths(self, params: Params) -> jnp.ndarray:
        return params["t"] * expected_rate(self.q_matrix(params), self.frequencies)


class ProteinREV(SubstitutionModel):
    """Fully general reversible protein model: 189 free exchangeabilities
    (one pinned) — the reference's ``models.protein.REV`` used by
    ProteinGTRFit workflows."""

    n_states = 20
    datatype = "protein"
    reversible = True

    PINNED = "IL"  # reference normalizes against one rate

    def __init__(self, frequencies: np.ndarray, baseline: str = "LG"):
        self.frequencies = jnp.asarray(np.asarray(frequencies).reshape(20))
        base = load_empirical(baseline)
        self._init_rates = base["rates"]
        self._pairs = [
            AMINO_ACIDS[i] + AMINO_ACIDS[j]
            for i in range(20)
            for j in range(i + 1, 20)
        ]

    def parameter_specs(self, n_branches: int) -> Specs:
        specs = {
            f"r_{p}": ParamSpec(
                init=max(self._init_rates.get(p, self._init_rates.get(p[::-1], 0.1)), 1e-4),
                lower=0.0, upper=10000.0,
            )
            for p in self._pairs
            if p != self.PINNED
        }
        specs["t"] = ParamSpec(init=0.1, lower=0.0, upper=10000.0, shape=(n_branches,))
        return specs

    def q_matrix(self, params: Params) -> jnp.ndarray:
        free = [params[f"r_{p}"] for p in self._pairs if p != self.PINNED]
        one = jnp.ones((), dtype=free[0].dtype) if free else jnp.ones(())
        vals = jnp.stack(
            [one if p == self.PINNED else params[f"r_{p}"] for p in self._pairs]
        )
        ii = jnp.asarray([AMINO_ACIDS.index(p[0]) for p in self._pairs])
        jj = jnp.asarray([AMINO_ACIDS.index(p[1]) for p in self._pairs])
        q = jnp.zeros((20, 20), dtype=vals.dtype)
        q = q.at[ii, jj].set(vals).at[jj, ii].set(vals)
        q = q * self.frequencies[None, :]
        return fill_diagonal_from_rows(q)

    def build(self, params: Params, n_branches: int) -> ModelOutput:
        q = self.q_matrix(params)
        p = self._propagate(q, self.frequencies, params["t"])
        return ModelOutput(p_matrices=p, root_freqs=self.frequencies)

    def branch_lengths(self, params: Params) -> jnp.ndarray:
        return params["t"] * expected_rate(self.q_matrix(params), self.frequencies)
