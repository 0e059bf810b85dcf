"""hyphy_tpu — a TPU-native phylogenetic likelihood framework.

A brand-new JAX/XLA implementation (with an opt-in Pallas pruning
kernel, ``ops/pallas_pruning.py``) of the capabilities of HyPhy
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

# Some environments force a platform via jax.config at interpreter start
# (overriding JAX_PLATFORMS); HYPHY_TPU_PLATFORM re-overrides for tests and
# CPU parity runs: e.g. HYPHY_TPU_PLATFORM=cpu.
_platform = os.environ.get("HYPHY_TPU_PLATFORM")
if _platform:
    jax.config.update("jax_platforms", _platform)

# Persistent XLA compilation cache: analysis pipelines build fresh jitted
# closures per run, so the in-memory jit cache never hits across runs; the
# disk cache keys on HLO content and makes warm runs skip compilation
# (essential on remote accelerators where one 61-state codon program
# compiles for ~30s).  Accelerator platforms only: XLA:CPU's AOT loader
# can resurrect executables with mismatched machine-feature strings
# (SIGILL risk) and CPU compiles are cheap anyway.  The effective platform
# is decided WITHOUT initializing a backend (jax.default_backend() here
# would lock the platform before the override above could matter).
_effective = (_platform or str(
    getattr(jax.config, "jax_platforms", None) or ""
)).split(",")[0]
if not _effective or _effective == "None":
    # No platform configured anywhere: jax will auto-detect.  Recognize an
    # accelerator from its plugin environment (still without initializing a
    # backend) so the cache is not silently skipped on auto-detected TPUs.
    _effective = ""
    if any(k.startswith(("TPU_", "PALLAS_AXON")) for k in os.environ):
        _effective = "tpu"
_on_accelerator = bool(_effective) and _effective != "cpu"
_cache_dir = os.environ.get(
    "HYPHY_TPU_XLA_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "hyphy_tpu", "xla"),
)
# an explicitly set HYPHY_TPU_XLA_CACHE is an unconditional opt-in
_explicit_cache = bool(os.environ.get("HYPHY_TPU_XLA_CACHE", "")) and \
    os.environ.get("HYPHY_TPU_XLA_CACHE") != "0"
if _cache_dir and _cache_dir != "0" and (_on_accelerator or _explicit_cache):
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization, never a requirement
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
