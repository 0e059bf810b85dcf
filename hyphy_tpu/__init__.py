"""hyphy_tpu — a TPU-native phylogenetic likelihood framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of HyPhy
(veg/hyphy): maximum-likelihood fitting of nucleotide / amino-acid / codon
substitution models on phylogenetic trees, and the standard selection
analyses built on top (FEL, SLAC, MEME, FUBAR, BUSTED, RELAX, aBSREL, ...).

Design (TPU-first, not a port):
  * Felsenstein pruning = level-scheduled batched ``einsum`` over a
    ``[patterns, states]`` conditional-likelihood tensor (MXU work), not
    per-site scalar loops (reference: ``src/core/tree_evaluator.cpp``).
  * Per-branch transition matrices via batched matrix exponentials —
    symmetric-eigendecomposition fast path for reversible models, batched
    scaling-and-squaring for the general case (reference:
    ``src/core/matrix.cpp:5537``).
  * The outer ML fit uses JAX autodiff + bounded quasi-Newton instead of the
    reference's derivative-free coordinate/Brent machinery
    (``src/core/likefunc.cpp:4629``).
  * Sites are sharded data-parallel over a ``jax.sharding.Mesh``; per-shard
    log-likelihood contributions merge with ``psum`` — replacing the
    reference's OpenMP/MPI backends (``src/core/likefunc.cpp:3747``).
"""

import os

# fp64 must be enabled before any JAX array is created. The likelihood path
# needs fp64 for lnL parity with the (all-double) reference engine; the TPU
# benchmark path explicitly down-casts where profitable.
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: analysis pipelines build fresh jitted
# closures per run, so the in-memory jit cache never hits across runs; the
# disk cache keys on HLO content and makes warm runs skip compilation
# entirely (essential on remote accelerators where one 61-state codon
# program compiles for ~30s).
_cache_dir = os.environ.get(
    "HYPHY_TPU_XLA_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "hyphy_tpu", "xla"),
)
try:
    _backend_is_cpu = jax.default_backend() == "cpu"
except Exception:
    _backend_is_cpu = True
# accelerator backends only: CPU compiles are cheap, and XLA:CPU AOT cache
# entries embed host-feature sets that can mismatch across processes
# (risking SIGILL on load)
if _cache_dir and _cache_dir != "0" and not _backend_is_cpu:
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization, never a requirement
        pass

# Some environments force a platform via jax.config at interpreter start
# (overriding JAX_PLATFORMS); HYPHY_TPU_PLATFORM re-overrides for tests and
# CPU parity runs: e.g. HYPHY_TPU_PLATFORM=cpu.
_platform = os.environ.get("HYPHY_TPU_PLATFORM")
if _platform:
    jax.config.update("jax_platforms", _platform)

# Persistent XLA compilation cache: analyses recompile the same likelihood
# programs on every invocation; caching makes repeat runs compile-free
# (whole-gene fits and the bench benefit most; per-site fit stages are
# compute-dominated).
# Auto-enabled for accelerator backends; on the CPU backend XLA's AOT
# loader can resurrect executables with mismatched machine features
# (risking SIGILL), so CPU runs only cache when HYPHY_TPU_COMPILE_CACHE
# is set explicitly.  Disable entirely with HYPHY_TPU_COMPILE_CACHE=0.
_cache = os.environ.get("HYPHY_TPU_COMPILE_CACHE")
if _cache is None and _platform and _platform != "cpu":
    _cache = os.path.join(os.path.expanduser("~"), ".cache", "hyphy_tpu", "xla")
if _cache and _cache != "0":
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 1000)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover — cache is best-effort
        pass

__version__ = "0.1.0"

from hyphy_tpu.config import settings  # noqa: E402
from hyphy_tpu.data.genetic_code import GeneticCode  # noqa: E402
from hyphy_tpu.data.alignment import Alignment, read_alignment  # noqa: E402
from hyphy_tpu.data.filter import DataFilter  # noqa: E402
from hyphy_tpu.tree.topology import Tree  # noqa: E402
from hyphy_tpu.likelihood import LikelihoodFunction  # noqa: E402

__all__ = [
    "Alignment",
    "DataFilter",
    "GeneticCode",
    "LikelihoodFunction",
    "Tree",
    "read_alignment",
    "settings",
]
