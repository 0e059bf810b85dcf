"""Benchmark: site-lnL evaluations/sec/chip on a 1000-taxon codon alignment.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is the framework's hot loop — one full MG94xREV likelihood
evaluation (Q build -> spectral expm -> level-scan pruning over all
branches -> weighted reduction) on a 1000-taxon x 300-codon alignment.
``value`` counts site-pattern likelihood evaluations per second
(patterns x full-evals / sec).  ``vs_baseline`` compares against the
reference HyPhy binary's LFCompute rate measured on this host
(``bench_baseline.json``; regenerate with ``python bench.py --measure-baseline``).
"""

import json
import os
import sys
import time

N_TAXA = int(os.environ.get("BENCH_TAXA", 1000))
N_CODONS = int(os.environ.get("BENCH_CODONS", 300))
N_EVALS = int(os.environ.get("BENCH_EVALS", 20))
_BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def build_problem(dtype_name: str):
    import jax.numpy as jnp
    import numpy as np

    from hyphy_tpu.data.filter import DataFilter
    from hyphy_tpu.data.genetic_code import GeneticCode
    from hyphy_tpu.models import frequencies as freq_mod
    from hyphy_tpu.models.codon import MG94xREVPartitionedOmega
    from hyphy_tpu.ops import pruning
    from hyphy_tpu.tree.topology import Tree
    from hyphy_tpu.utils.synth import random_tree_newick, synthetic_codon_alignment

    dtype = jnp.dtype(dtype_name)
    gc = GeneticCode("Universal")
    aln = synthetic_codon_alignment(N_TAXA, N_CODONS, seed=11)
    filt = DataFilter.from_alignment(aln, "codon", genetic_code=gc)
    tree = Tree.from_newick(random_tree_newick(N_TAXA, seed=11), leaf_order=filt.names)
    corners, codon_freqs = freq_mod.f3x4(filt, gc)
    nb = tree.n_branches
    model = MG94xREVPartitionedOmega(
        gc, corners, codon_freqs,
        nuc_lengths=np.maximum(np.abs(np.asarray(tree.input_lengths[:-1])), 1e-3),
        branch_groups=np.zeros(nb, dtype=np.int32),
        n_groups=1,
        free_lengths=True,
    )
    pdata = pruning.build_pruning_data(tree)
    specs = model.parameter_specs(nb)
    params = {k: s.initial().astype(dtype) for k, s in specs.items()}
    params["alpha"] = jnp.asarray(model.nuc_lengths, dtype=dtype)
    leaf_partials = jnp.asarray(filt.leaf_partials(), dtype=dtype)
    weights = jnp.asarray(filt.pattern_weights, dtype=dtype)

    def loglik(params, scale):
        p2 = dict(params)
        p2["omega"] = params["omega"] * scale  # vary params across evals
        out = model.build(p2, nb)
        sll = pruning.site_log_likelihoods(
            out.p_matrices, leaf_partials, out.root_freqs, pdata
        )
        return jnp.dot(sll, weights)

    return loglik, params, filt.n_patterns


def run_bench():
    import hyphy_tpu  # noqa: F401  (applies HYPHY_TPU_PLATFORM override)
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    dtype = "float32" if backend != "cpu" else "float64"
    loglik, params, n_patterns = build_problem(dtype)
    f = jax.jit(loglik)
    # warmup / compile
    v = f(params, jnp.asarray(1.0, dtype))
    v.block_until_ready()
    t0 = time.time()
    for k in range(N_EVALS):
        v = f(params, jnp.asarray(1.0 + 1e-4 * k, dtype))
    v.block_until_ready()
    dt = time.time() - t0
    evals_per_sec = N_EVALS / dt
    value = n_patterns * evals_per_sec

    vs_baseline = None
    if os.path.exists(_BASELINE_FILE):
        try:
            with open(_BASELINE_FILE) as fh:
                base = json.load(fh)
            ref = base.get("site_lnl_evals_per_sec")
            if ref:
                vs_baseline = value / ref
        except Exception:
            pass

    print(json.dumps({
        "metric": "site-lnL evals/sec/chip (1000-taxon codon MG94xREV)",
        "value": round(value, 2),
        "unit": "site-pattern lnL evals/sec",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "detail": {
            "backend": backend, "dtype": dtype, "taxa": N_TAXA,
            "codons": N_CODONS, "patterns": n_patterns,
            "full_evals_per_sec": round(evals_per_sec, 4),
            "final_lnL": float(v),
        },
    }))


if __name__ == "__main__":
    if "--measure-baseline" in sys.argv:
        from benchmarks.reference_baseline import measure  # noqa

        measure(N_TAXA, N_CODONS, _BASELINE_FILE)
    else:
        run_bench()
