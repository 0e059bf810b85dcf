"""Batched matrix exponentials for transition-probability matrices.

Two paths, mirroring the reference's split between the generic
scaling-and-squaring Taylor exponential (``src/core/matrix.cpp:5537``) and
its reversible-model shortcuts (``ASSUME_REVERSIBLE_MODELS``):

  * :func:`expm` — differentiable batched scaling-and-squaring with a Taylor
    core.  Static structure (fixed term count, masked squaring ladder) so it
    jits, vmaps, and reverse-differentiates cleanly.
  * :func:`reversible_spectral` / :func:`spectral_propagators` — for a
    reversible ``Q`` with stationary ``pi``, one symmetric eigendecomposition
    yields ``P(t)`` for *every* branch as two small matmuls — the dominant
    cost model on TPU (MXU) since all branches share the spectrum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# true-fp32 matmul accumulation on TPU (bf16-pass default rounding would
# leak ~1e-3 relative error into every propagator); no-op on CPU
_PRECISION = jax.lax.Precision.HIGHEST

# enough Taylor terms that a matrix scaled to ||A|| <= 1/2 converges past
# fp64 machine epsilon: 0.5^18/18! ~ 2e-21
_TAYLOR_TERMS = 18
# squaring ladder depth: supports ||Q*t|| up to 2^_MAX_SQUARINGS / 2
_MAX_SQUARINGS = 14


def expm(a: jnp.ndarray) -> jnp.ndarray:
    """Matrix exponential of ``a`` ([..., n, n]), batched over leading dims.

    Scaling-and-squaring: scale by 2^-s so the scaled norm is <= 1/2, run a
    fixed-length Horner Taylor evaluation, then a masked squaring ladder
    (per-batch-element s, static trip count). The reference's row
    renormalization (``matrix.cpp:5837``) is applied by the caller for
    transition matrices, not here, because `expm` is also used on
    non-generator matrices.
    """
    dtype = a.dtype
    n = a.shape[-1]
    norm = jnp.max(jnp.sum(jnp.abs(a), axis=-1), axis=-1)  # inf-norm [...]
    # s = number of squarings so norm / 2^s <= 0.5
    s = jnp.ceil(jnp.log2(jnp.maximum(norm, 1e-30)) + 1.0)
    s = jnp.clip(s, 0, _MAX_SQUARINGS).astype(jnp.int32)
    scale = jnp.exp2(-s.astype(dtype))
    a_scaled = a * scale[..., None, None]

    eye = jnp.eye(n, dtype=dtype)
    eye = jnp.broadcast_to(eye, a.shape)

    # Horner: exp(A) ~ I + A(I + A/2 (I + A/3 (...)))
    def horner(carry, k):
        acc = eye + carry @ a_scaled / k
        return acc, None

    ks = jnp.arange(_TAYLOR_TERMS, 0, -1, dtype=dtype)
    acc, _ = jax.lax.scan(horner, eye, ks)
    p = acc

    # masked squaring ladder
    def square(carry, k):
        p = carry
        need = (k < s)[..., None, None]
        p = jnp.where(need, p @ p, p)
        return p, None

    p, _ = jax.lax.scan(square, p, jnp.arange(_MAX_SQUARINGS, dtype=jnp.int32))
    return p


def row_renormalize(p: jnp.ndarray) -> jnp.ndarray:
    """Restore exact row-stochasticity: P_ii += 1 - sum_j P_ij
    (reference: ``matrix.cpp:5837-5852`` diag_populator)."""
    n = p.shape[-1]
    deficit = 1.0 - jnp.sum(p, axis=-1)
    return p + deficit[..., None] * jnp.eye(n, dtype=p.dtype)


def transition_matrix(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """P(t) = expm(Q * t) for Q [..., n, n] and t broadcastable to [...]."""
    return row_renormalize(expm(q * t[..., None, None]))


def shared_taylor_propagators(
    q: jnp.ndarray,              # [S, S] one shared generator
    t: jnp.ndarray,              # [B] per-branch times
    terms: int = None,
    max_squarings: int = None,
) -> jnp.ndarray:
    """P(t_b) = expm(q * t_b) for ONE generator and MANY times.

    The expensive objects — powers q^k — are shared by every branch: K
    matmuls of a single SxS matrix.  Each branch then sums the series with
    per-branch coefficients (one small [B,K]x[K,S^2] contraction) and runs a
    masked squaring ladder.  Unlike the TPU fp32 ``eigh`` path (which loses
    ~1e-2 absolute accuracy on 61-state codon generators), this stays at
    fp32 round-off, so it is the fp32/TPU route for grouped propagators;
    reference semantics follow ``_Matrix::Exponentiate``
    (``src/core/matrix.cpp:5537``: scale / Taylor / square / renormalize).
    """
    dtype = q.dtype
    if terms is None:
        # series tail after K terms at argument 2: 2^(K+1)/(K+1)!
        # (fp32: 2^17/17! ~ 4e-10 — comfortably past fp32 round-off)
        terms = 28 if dtype == jnp.float64 else 16
    if max_squarings is None:
        # ladder/bit depth: supports ||Q t|| up to ~2^(s+1) before the
        # saturation clamp below.  Depth 11 covers ||Q t|| ~ 4096 — an
        # omega at its 1e4 bound times realistic branch lengths still
        # resolves (a shallower ladder clamped such mixtures ~19 lnL off
        # their spectral value); each extra level costs one SxS matmul.
        max_squarings = 11
    s_dim = q.shape[-1]
    # normalize the generator to unit inf-norm; fold the factor into t
    norm = jnp.maximum(jnp.max(jnp.sum(jnp.abs(q), axis=-1)), 1e-30)
    m = jnp.ceil(jnp.log2(norm))
    qn = q * jnp.exp2(-m).astype(dtype)
    t_eff = t * jnp.exp2(m).astype(dtype)
    # saturate beyond the ladder's range: at ||Q t|| ~ 2^(s+1) the chain is
    # essentially mixed (P ~ stationary), and an un-saturated argument would
    # make the truncated series diverge — producing huge finite "likelihoods"
    # that derail line searches probing large branch lengths
    t_eff = jnp.minimum(
        t_eff, jnp.asarray(2.0 ** (max_squarings + 1) - 0.01, dtype)
    )

    eye = jnp.eye(s_dim, dtype=dtype)

    def next_pow(p, _):
        p = jnp.matmul(p, qn, precision=_PRECISION)
        return p, p

    _, pows = jax.lax.scan(next_pow, eye, None, length=terms)
    pows = jnp.concatenate([eye[None], pows], axis=0)      # [K+1, S, S]
    ks = jnp.arange(1, terms + 1, dtype=dtype)

    # Because every branch shares ONE generator, all P(t) commute:
    # P(t) = Taylor(r) @ expm(2 qn)^j with t_eff = r + 2j, r in [0,2).
    # The integer part is applied as a binary product against SHARED
    # right-hand matrices M_k = expm(2 qn)^(2^k) — each bit step is one
    # large [B*S, S] x [S, S] GEMM (full MXU tiles) instead of the
    # per-branch P @ P batched-matmul squaring ladder.
    j_int = jnp.floor(t_eff * 0.5)
    j = j_int.astype(jnp.int32)
    r = t_eff - 2.0 * j_int.astype(dtype)                  # [B], in [0, 2)

    # coef[b, k] = r_b^k / k! via a stable running product
    ratios = r[:, None] / ks[None, :]                      # [B, K]
    coef = jnp.cumprod(ratios, axis=1)
    coef = jnp.concatenate([jnp.ones((t.shape[0], 1), dtype=dtype), coef], axis=1)
    p = jnp.einsum(
        "bk,kij->bij", coef, pows, preferred_element_type=dtype,
        precision=_PRECISION,
    )

    coef2 = jnp.cumprod(2.0 / ks)                          # Taylor at r = 2
    coef2 = jnp.concatenate([jnp.ones((1,), dtype), coef2])
    m2 = jnp.einsum("k,kij->ij", coef2, pows, precision=_PRECISION)              # expm(2 qn)

    def bit_step(carry, k):
        p, mk = carry
        bit = ((j >> k) & 1).astype(bool)
        pnew = jnp.matmul(
            p.reshape(-1, s_dim), mk, precision=_PRECISION
        ).reshape(p.shape)
        p = jnp.where(bit[:, None, None], pnew, p)
        return (p, jnp.matmul(mk, mk, precision=_PRECISION)), None

    (p, _), _ = jax.lax.scan(
        bit_step, (p, m2), jnp.arange(max_squarings, dtype=jnp.int32)
    )
    p = jnp.maximum(p, 0.0)
    return row_renormalize(p)


def taylor_action_factors(
    q: jnp.ndarray,              # [S, S] one generator (e.g. one site's Q)
    t: jnp.ndarray,              # [B] per-branch times
    terms: int = None,
    max_squarings: int = None,
):
    """Factors for applying ``expm(q t_b)`` to VECTORS without ever
    materializing the per-branch matrices.

    Returns ``(qn [S,S], m2p [L,S,S], r [B], j [B] int32)`` with
    ``P(t_b) = Taylor(r_b qn) @ prod_k (m2p[k])^{bit_k(j_b)}`` (everything
    commutes — one shared generator).  ``m2p[k] = expm(qn)^(2^k)``.
    Apply to a CLV vector v as: ladder steps ``v <- m2p[k] v`` where bit k
    of ``j_b`` is set, then Horner ``acc <- v + (r_b/k) qn acc``.

    The Horner radius is 1 (``r in [0,1)``), not the squaring-ladder's 2:
    at radius 1 the fp32 series tail closes at 12 terms instead of 16, and
    the extra ladder bit this costs is nearly free because the pruning
    kernel walks only as many bits as the LARGEST ``j`` in the batch
    actually sets (typical per-site fits: 1-2 bits, not the full depth).

    The per-site methods use this to keep the memory footprint at
    ``[sites, nodes, S]`` instead of the ``[sites, branches, S, S]``
    (tens of GB at 1000 taxa) the dense propagator path needs.
    """
    dtype = q.dtype
    if terms is None:
        terms = taylor_action_terms(dtype)
    if max_squarings is None:
        # one more bit than shared_taylor_propagators' 11: radius-1 halves
        # the per-bit step, so depth 12 covers the same ||Q t|| ~ 4096
        max_squarings = 12
    s_dim = q.shape[-1]
    norm = jnp.maximum(jnp.max(jnp.sum(jnp.abs(q), axis=-1)), 1e-30)
    m = jnp.ceil(jnp.log2(norm))
    qn = q * jnp.exp2(-m).astype(dtype)
    t_eff = t * jnp.exp2(m).astype(dtype)
    t_eff = jnp.minimum(
        t_eff, jnp.asarray(2.0 ** max_squarings - 0.01, dtype)
    )
    j_int = jnp.floor(t_eff)
    j = j_int.astype(jnp.int32)
    r = t_eff - j_int.astype(dtype)

    eye = jnp.eye(s_dim, dtype=dtype)
    # expm(qn) via the shared Taylor series at argument 1
    ks = jnp.arange(1, terms + 1, dtype=dtype)
    coef1 = jnp.cumprod(1.0 / ks)
    pk = eye
    m1 = eye
    for k in range(terms):
        pk = jnp.matmul(pk, qn, precision=_PRECISION)
        m1 = m1 + coef1[k] * pk
    m2p = [m1]
    for _ in range(max_squarings - 1):
        m2p.append(jnp.matmul(m2p[-1], m2p[-1], precision=_PRECISION))
    return qn, jnp.stack(m2p), r, j


def taylor_action_terms(dtype) -> int:
    """The Taylor term count :func:`taylor_action_factors` assumes for
    ``dtype`` (kept separate so the factor function stays vmappable).
    Tail bound at the radius-1 Horner argument: 1/(K+1)! * e — 4e-10 at
    K=12 (under fp32 eps), 8e-18 at K=19 (under fp64 eps)."""
    return 19 if jnp.dtype(dtype) == jnp.float64 else 12


# ---------------------------------------------------------------------------
# reversible fast path

def reversible_spectral(q: jnp.ndarray, pi: jnp.ndarray):
    """Spectral decomposition of a reversible generator.

    For reversible Q with stationary pi, ``B = D^{1/2} Q D^{-1/2}`` is
    symmetric (D = diag(pi)); then ``expm(Qt) = D^{-1/2} U e^{L t} U^T
    D^{1/2}``.  Returns ``(left [..,n,n], eigenvalues [..,n], right
    [..,n,n])`` with ``P(t) = left @ diag(exp(L t)) @ right``.

    Zero-frequency states are guarded with a floor so absent states stay
    inert rather than producing NaNs.
    """
    pi_safe = jnp.maximum(pi.astype(q.dtype), jnp.finfo(q.dtype).tiny)
    sqrt_pi = jnp.sqrt(pi_safe)
    b = q * (sqrt_pi[..., :, None] / sqrt_pi[..., None, :])
    b = 0.5 * (b + jnp.swapaxes(b, -1, -2))  # kill asymmetric round-off
    lam, u = jnp.linalg.eigh(b)
    left = u / sqrt_pi[..., :, None]
    right = jnp.swapaxes(u, -1, -2) * sqrt_pi[..., None, :]
    return left, lam, right


def spectral_propagators(left, lam, right, t):
    """P(t) for a batch of times from one spectral decomposition.

    ``t[..., None]`` must broadcast against ``lam``: e.g. shared Q
    (lam [n], t [B]) -> [B, n, n]; per-branch Q (lam [B, n], t [B]) ->
    [B, n, n]; per-class Q with per-branch t: pass t as [B, 1].
    """
    el = jnp.exp(lam * t[..., None])
    p = jnp.matmul(left * el[..., None, :], right, precision=_PRECISION)
    # clip tiny negative round-off; renormalize rows exactly
    p = jnp.maximum(p, 0.0)
    return row_renormalize(p)
