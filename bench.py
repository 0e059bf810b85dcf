"""Benchmark: site-lnL evaluations/sec/chip on a 1000-taxon codon alignment.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is the framework's hot loop — one full MG94xREV likelihood
evaluation (Q build -> shared-generator Taylor propagators -> level-scan
pruning over all branches -> weighted reduction) on a 1000-taxon x
2048-codon alignment.  ``value`` counts site-pattern likelihood
evaluations per second (patterns x full-evals / sec).  ``vs_baseline``
compares against the reference HyPhy binary's LFCompute rate measured on
this host on the SAME workload (``bench_baseline.json``; regenerate with
``python bench.py --measure-baseline``).

Accuracy is tracked alongside speed: every run also evaluates the
identical parameter vector on the CPU fp64 path and reports
``|delta_lnl|`` (total and per-site) between the accelerator dtype and
fp64, plus the fp64-vs-reference-binary parity gap when the baseline file
carries a ``reference_lnL`` for this workload (branch synRates pinned to
identical values on both sides).
"""

import json
import os
import sys
import time

N_TAXA = int(os.environ.get("BENCH_TAXA", 1000))
N_CODONS = int(os.environ.get("BENCH_CODONS", 2048))
N_EVALS = int(os.environ.get("BENCH_EVALS", 20))
N_REPEATS = int(os.environ.get("BENCH_REPEATS", 5))
_BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
_FEL_E2E_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "benchmarks", "fel_e2e.json"
)


def build_problem():
    """Returns (loglik(params, lp, w, scale), params_np, filt, model, tree).

    ``params_np`` is a plain-numpy fp64 parameter dict; callers cast to the
    evaluation dtype.  Branch synRates ('alpha') are set so the expected
    substitutions/site per branch equal the synthetic tree's input lengths
    — the same values the reference-baseline HBL program pins, so lnL
    values are comparable across implementations.
    """
    import numpy as np

    from hyphy_tpu.data.filter import DataFilter
    from hyphy_tpu.data.genetic_code import GeneticCode
    from hyphy_tpu.models import frequencies as freq_mod
    from hyphy_tpu.models.codon import MG94xREVPartitionedOmega
    from hyphy_tpu.tree.topology import Tree
    from hyphy_tpu.utils.synth import random_tree_newick, synthetic_codon_alignment

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
    specs = model.parameter_specs(nb)
    params = {k: np.asarray(s.initial(), np.float64) for k, s in specs.items()}
    params["alpha"] = np.asarray(model.nuc_lengths, np.float64)
    return params, filt, model, tree


def make_loglik(model, tree, nb):
    import jax.numpy as jnp

    from hyphy_tpu.ops import pruning

    pdata = pruning.build_pruning_data(tree)

    def loglik(params, lp, w, scale):
        p2 = dict(params)
        p2["omega"] = params["omega"] * scale  # vary params across evals
        out = model.build(p2, nb)
        sll = pruning.site_log_likelihoods(out.p_matrices, lp, out.root_freqs, pdata)
        # fp64 accumulation of the weighted reduction: at |lnL| ~ 5e6 a
        # fp32 sum quantizes at ~0.5 lnL, swamping the CLV-path error
        # (reference: Neumaier-compensated sum, likefunc.cpp:11059)
        return jnp.dot(sll.astype(jnp.float64), w.astype(jnp.float64))

    return loglik


def run_bench():
    import hyphy_tpu  # noqa: F401  (applies HYPHY_TPU_PLATFORM override)
    import jax
    import jax.numpy as jnp
    import numpy as np

    backend = jax.default_backend()
    dtype = jnp.float32 if backend != "cpu" else jnp.float64
    # ALL setup on the host CPU device: problem construction and model
    # init create small arrays eagerly, and un-jitted ops on a tunneled
    # TPU cost a ~100ms round-trip each
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params_np, filt, model, tree = build_problem()
        nb = tree.n_branches
        loglik = make_loglik(model, tree, nb)
        n_patterns = filt.n_patterns
        leaf_np = filt.leaf_partials()

        # fp64 reference value at the identical parameter point
        lp64 = jnp.asarray(leaf_np, jnp.float64)
        w64 = jnp.asarray(filt.pattern_weights, jnp.float64)
        p64 = {k: jax.device_put(v, cpu) for k, v in params_np.items()}
        lnl_fp64 = float(loglik(p64, lp64, w64, jnp.asarray(1.0, jnp.float64)))

    params = {k: jnp.asarray(v, dtype=dtype) for k, v in params_np.items()}
    lp = jnp.asarray(leaf_np.astype("float32" if dtype == jnp.float32 else "float64"))
    w = jnp.asarray(filt.pattern_weights, dtype=dtype)
    f = jax.jit(loglik)

    # timing loop as ONE on-device lax.scan: each eval's scale chains off
    # the previous result (no iteration can be cached or elided) and no
    # per-eval host->device traffic happens.  Per-dispatch timing through a
    # remote-tunneled accelerator measures the tunnel (~15 ms/call transfer
    # latency for each fresh scalar — observed swamping the ~13 ms device
    # time); the chip-throughput metric this benchmark reports must time
    # the chip.
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def scan_evals(params, lp, w, n, base):
        def step(carry, i):
            s = base + 1e-4 * i.astype(dtype) + 1e-15 * carry.astype(dtype)
            return loglik(params, lp, w, s), None

        last, _ = jax.lax.scan(
            step, jnp.zeros((), jnp.float64), jnp.arange(n, dtype=jnp.int32)
        )
        return last

    # warmup / compile (both programs); fetches — not block_until_ready —
    # force completion: the remote relay's readiness signal was observed
    # returning before execution finished, and a float() of a value that
    # data-depends on every eval is the only airtight barrier
    lnl_dev = float(f(params, lp, w, jnp.asarray(1.0, dtype)))
    base = jnp.asarray(1.0, dtype)
    float(scan_evals(params, lp, w, N_EVALS, base))
    # best-of-N: the tunneled accelerator's effective rate swings several-x
    # run to run (relay contention; the identical cached program was
    # observed at 12.7 and 33 ms/eval minutes apart) — the min over
    # repeats estimates the chip, the spread is reported alongside
    times = []
    for rep in range(N_REPEATS):
        t0 = time.time()
        float(scan_evals(
            params, lp, w, N_EVALS,
            base * jnp.asarray(1.0000019 + 1e-7 * rep, dtype)
        ))
        times.append(time.time() - t0)
    dt = min(times)
    evals_per_sec = N_EVALS / dt
    value = n_patterns * evals_per_sec

    vs_baseline = None
    base = {}
    if os.path.exists(_BASELINE_FILE):
        try:
            with open(_BASELINE_FILE) as fh:
                base = json.load(fh)
        except Exception:
            base = {}
        ref = base.get("site_lnl_evals_per_sec")
        if ref and base.get("taxa") == N_TAXA and base.get("codons") == N_CODONS:
            vs_baseline = value / ref

    delta = abs(lnl_dev - lnl_fp64)
    detail = {
        "backend": backend, "dtype": str(np.dtype(dtype)), "taxa": N_TAXA,
        "codons": N_CODONS, "patterns": n_patterns,
        "full_evals_per_sec": round(evals_per_sec, 4),
        "timing_repeats_ms_per_eval": [round(t / N_EVALS * 1e3, 2) for t in times],
        "lnl_fp64": lnl_fp64,
        "lnl_device": lnl_dev,
        "delta_lnl_abs": round(delta, 6),
        "delta_lnl_per_site": round(delta / N_CODONS, 9),
        "delta_lnl_rel": round(delta / abs(lnl_fp64), 12),
    }
    if base.get("reference_lnL") is not None and base.get("codons") == N_CODONS:
        detail["reference_lnL"] = base["reference_lnL"]
        detail["fp64_vs_reference_lnL"] = round(
            abs(lnl_fp64 - base["reference_lnL"]), 6
        )
    if os.path.exists(_FEL_E2E_FILE):
        try:
            with open(_FEL_E2E_FILE) as fh:
                detail["fel_end_to_end"] = json.load(fh)
        except Exception:
            pass

    print(json.dumps({
        "metric": "site-lnL evals/sec/chip (1000-taxon codon MG94xREV)",
        "value": round(value, 2),
        "unit": "site-pattern lnL evals/sec",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "detail": detail,
    }))


if __name__ == "__main__":
    if "--measure-baseline" in sys.argv:
        from benchmarks.reference_baseline import measure  # noqa

        measure(N_TAXA, N_CODONS, _BASELINE_FILE)
    else:
        run_bench()
