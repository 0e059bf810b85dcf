"""Dense linear-algebra utilities mirroring the reference's `_Matrix` ops.

The reference exposes `Eigensystem`, `Inverse`, `LUDecompose`/`LUSolve`
(``src/core/matrix.cpp``), an LP solver `SimplexSolve`
(``src/core/matrix.cpp:9326``) and `FisherExact`
(``src/core/fisher_exact.cpp``) as HBL builtins.  Here they are thin,
batched, jit-friendly wrappers over XLA/LAPACK primitives — the TPU-native
stance is that generic dense linalg belongs to the compiler/runtime, not to
hand-rolled kernels; only the phylogenetic hot path (expm, pruning) gets
custom treatment.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def eigensystem(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigenvalues/vectors of a general square matrix (reference HBL
    ``Eigensystem``, ``matrix.cpp``; symmetric input uses the symmetric
    path).  Returns (values, vectors) with columns as eigenvectors."""
    a = jnp.asarray(a)
    sym = bool(np.allclose(np.asarray(a), np.asarray(a).T, atol=1e-12))
    if sym:
        return jnp.linalg.eigh(a)
    w, v = np.linalg.eig(np.asarray(a, dtype=np.float64))
    return jnp.asarray(w), jnp.asarray(v)


def inverse(a: jnp.ndarray) -> jnp.ndarray:
    """Matrix inverse (reference HBL ``Inverse``)."""
    return jnp.linalg.inv(jnp.asarray(a))


def lu_decompose(a: jnp.ndarray):
    """LU factorization with partial pivoting (reference ``LUDecompose``,
    ``matrix.cpp``).  Returns (lu, pivots) in LAPACK layout."""
    import jax.scipy.linalg as jsl

    lu, piv = jsl.lu_factor(jnp.asarray(a))
    return lu, piv


def lu_solve(lu_and_piv, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b from an LU factorization (reference ``LUSolve``)."""
    import jax.scipy.linalg as jsl

    return jsl.lu_solve(lu_and_piv, jnp.asarray(b))


def simplex_solve(
    objective: np.ndarray,
    a_ub: Optional[np.ndarray] = None,
    b_ub: Optional[np.ndarray] = None,
    a_eq: Optional[np.ndarray] = None,
    b_eq: Optional[np.ndarray] = None,
    maximize: bool = False,
    bounds=(0, None),
):
    """Linear program (reference ``SimplexSolve``, ``matrix.cpp:9326`` —
    a Numerical-Recipes-style two-phase simplex over x >= 0).  Host-side
    (scipy HiGHS backend); returns (optimum, x) or None when infeasible."""
    from scipy.optimize import linprog

    c = np.asarray(objective, dtype=np.float64)
    res = linprog(
        -c if maximize else c,
        A_ub=a_ub, b_ub=b_ub, A_eq=a_eq, b_eq=b_eq,
        bounds=bounds, method="highs",
    )
    if not res.success:
        return None
    value = -res.fun if maximize else res.fun
    return float(value), np.asarray(res.x)


def fisher_exact_2x2(table: np.ndarray, alternative: str = "two-sided") -> float:
    """Exact p-value for a 2x2 contingency table (reference
    ``_Matrix::FisherExact``, ``src/core/fisher_exact.cpp`` — the network
    algorithm; the 2x2 case reduces to the hypergeometric tail)."""
    from scipy.stats import fisher_exact as _fe

    return float(_fe(np.asarray(table, dtype=np.int64), alternative=alternative)[1])


def fisher_exact(table: np.ndarray, n_simulations: int = 100000, seed: int = 0) -> float:
    """Exact (2x2) or Monte-Carlo (RxC) contingency-table p-value.

    The reference implements the FEXACT network algorithm for general RxC
    tables (``fisher_exact.cpp``); for R,C > 2 we estimate the same
    p-value by simulating tables with fixed margins (Patefield sampling via
    scipy) — the consumers (BGM diagnostics) use it as a screening
    statistic, not for parity-critical output."""
    t = np.asarray(table, dtype=np.int64)
    if t.shape == (2, 2):
        return fisher_exact_2x2(t)
    from scipy.stats import random_table

    rows, cols = t.sum(axis=1), t.sum(axis=0)
    rng = np.random.default_rng(seed)
    from scipy.special import gammaln

    def log_prob(x):
        return (
            gammaln(rows + 1).sum() + gammaln(cols + 1).sum()
            - gammaln(t.sum() + 1) - gammaln(x + 1).sum()
        )

    obs = log_prob(t)
    sims = random_table(rows, cols).rvs(n_simulations, random_state=rng)
    hits = sum(1 for s in np.atleast_3d(sims) if log_prob(s) <= obs + 1e-12)
    return (hits + 1) / (n_simulations + 1)
