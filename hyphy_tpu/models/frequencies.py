"""Equilibrium frequency estimators: F (empirical), F1x4, F3x4, CF3x4.

Behavioral ports of ``res/TemplateBatchFiles/libv3/models/frequencies.bf``:

  * F3x4 (``frequencies.bf:283``): observed position-specific nucleotide
    frequencies; codon frequency = product / (1 - sum of stop products)
    (``codon_from_nuc``).
  * CF3x4 (``frequencies.bf:351``; solver ``:510``): 9 stick-breaking corner
    parameters per codon position fit by least squares so the *implied*
    observable position frequencies (after removing stop-codon mass) match
    the observed 3x4 table; the Q-matrix multiplier uses the raw corner
    frequencies ``n_pos(target)``, NOT the corrected ones.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyphy_tpu.data.filter import DataFilter
from hyphy_tpu.data.genetic_code import GeneticCode
from hyphy_tpu.models.parameters import ParamSpec, initial_params
from hyphy_tpu.optimize.core import maximize


def _combined_harvest(filts, unit: int, atom: int, position_specific: bool) -> np.ndarray:
    """Frequency harvest over one filter or a list of them.  Multiple
    filters (multi-partition analyses) pool their counts weighted by
    column count — the reference defines ONE model whose frequencies are
    harvested across all partition filters (``estimators.CreateLFObject``,
    ``estimators.bf:982``)."""
    if isinstance(filts, DataFilter):
        return filts.harvest_frequencies(unit, atom, position_specific)
    total, weight = None, 0.0
    for f in filts:
        w = float(f.n_units * f.n_sequences)
        h = f.harvest_frequencies(unit, atom, position_specific) * w
        total = h if total is None else total + h
        weight += w
    return total / max(weight, 1e-300)


def empirical_nucleotide(filt) -> np.ndarray:
    """4x1 pooled nucleotide frequencies (GTR's estimator).  Accepts one
    DataFilter or a list (multi-partition pooling)."""
    return _combined_harvest(filt, 1, 1, False)[:, 0]


def empirical_character(filt: DataFilter) -> np.ndarray:
    """Pooled single-character frequencies (protein models)."""
    return filt.harvest_frequencies(1, 1, False)[:, 0]


def _codon_from_corners(corners: np.ndarray, gc: GeneticCode) -> np.ndarray:
    """pi_c = n0[c0] n1[c1] n2[c2] / (1 - sum_stops n0 n1 n2)
    (reference: ``codon_from_nuc``, frequencies.bf)."""
    stops = gc.stop_codons
    sense = gc.sense_codons
    d = 1.0 - np.sum(
        corners[stops // 16, 0] * corners[(stops // 4) % 4, 1] * corners[stops % 4, 2]
    )
    pi = (
        corners[sense // 16, 0]
        * corners[(sense // 4) % 4, 1]
        * corners[sense % 4, 2]
        / d
    )
    return pi


def f3x4(filt, gc: GeneticCode) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (corner_freqs [4,3], codon_freqs [n_sense])."""
    obs = _combined_harvest(filt, 3, 1, True)  # [4, 3]
    return obs, _codon_from_corners(obs, gc)


def f1x4(filt: DataFilter, gc: GeneticCode) -> Tuple[np.ndarray, np.ndarray]:
    pooled = filt.harvest_frequencies(1, 1, False)[:, 0]
    corners = np.tile(pooled[:, None], (1, 3))
    return corners, _codon_from_corners(corners, gc)


def _stick_break(p: jnp.ndarray) -> jnp.ndarray:
    """[3] fractions in (0,1) -> [4] frequencies summing to 1."""
    rem = jnp.concatenate([jnp.ones((1,), p.dtype), jnp.cumprod(1.0 - p)])
    return jnp.concatenate([p, jnp.ones((1,), p.dtype)]) * rem


def _stick_init(freqs: np.ndarray) -> np.ndarray:
    """Invert stick-breaking for initial values (reference:
    ``parameters.helper.stick_breaking`` initialization)."""
    p = np.zeros(3)
    acc = 1.0
    for k in range(3):
        p[k] = min(max(freqs[k] / acc, 1e-8), 1 - 1e-8)
        acc *= 1.0 - p[k]
    return p


def cf3x4(filt, gc: GeneticCode) -> Tuple[np.ndarray, np.ndarray]:
    """Corrected F3x4: returns (corner_freqs n [4,3], codon_freqs [n_sense]).

    Solves the least-squares problem of ``frequencies._aux.CF3x4``
    (frequencies.bf:510): find corner frequencies n such that the implied
    position-specific frequencies of the *sense-codon-conditioned* process
    match the observed 3x4 table.
    """
    obs = _combined_harvest(filt, 3, 1, True)  # [4, 3] observed
    stops = gc.stop_codons
    s0, s1, s2 = stops // 16, (stops // 4) % 4, stops % 4

    def implied(n: jnp.ndarray) -> jnp.ndarray:
        """n [4,3] -> N [4,3] implied observable frequencies."""
        d = 1.0 - jnp.sum(n[s0, 0] * n[s1, 1] * n[s2, 2])
        # stop-mass correction per (base, position)
        corr = jnp.ones((4, 3), dtype=n.dtype)
        corr = corr.at[s0, 0].add(-(n[s1, 1] * n[s2, 2]))
        corr = corr.at[s1, 1].add(-(n[s0, 0] * n[s2, 2]))
        corr = corr.at[s2, 2].add(-(n[s0, 0] * n[s1, 1]))
        return n * corr / d

    obs_j = jnp.asarray(obs)

    def objective(params):
        n = jnp.stack(
            [_stick_break(params[f"p{k}"]) for k in range(3)], axis=1
        )  # [4, 3]
        err = implied(n) - obs_j
        return -jnp.sum(err * err)

    specs = {f"p{k}": ParamSpec(init=0.25, lower=0.0, upper=1.0, shape=(3,)) for k in range(3)}
    init = {f"p{k}": jnp.asarray(_stick_init(obs[:, k])) for k in range(3)}
    best, val, _ = maximize(objective, specs, init, precision=1e-14)
    n = np.stack(
        [np.asarray(_stick_break(best[f"p{k}"])) for k in range(3)], axis=1
    )
    return n, _codon_from_corners(n, gc)
