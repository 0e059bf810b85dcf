"""End-to-end FEL wall-clock: this framework vs the reference binary.

Measures the full analysis (data load -> GTR -> MG94 -> all per-site
fits -> JSON) on the same inputs:

  * CD2.nex (10 taxa x 187 codons, the reference's canonical fixture)
  * a synthetic 100-taxon x 300-codon alignment
  * (optional, ``--large``) a synthetic 1000-taxon x 300-codon alignment
    — the BASELINE.md north-star workload; the reference side can take
    hours, so it is opt-in

For each workload the reference binary (CPU, OpenMP) and this framework
are run once each and wall-clock seconds recorded.  The framework side
runs on whatever backend JAX selects (TPU when available; set
HYPHY_TPU_PLATFORM=cpu to force the fp64 CPU path).  Results are written
to ``benchmarks/fel_e2e.json``, which ``bench.py`` folds into its detail
block.

Usage: python benchmarks/fel_e2e.py [--large] [--skip-reference]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_OUT = os.path.join(_HERE, "fel_e2e.json")
_CD2 = "/root/reference/tests/hbltests/libv3/data/CD2.nex"


def _find_binary():
    from benchmarks.reference_baseline import _find_binary as fb

    return fb()


def _synth_workload(n_taxa, n_codons, seed=11, simulated=False):
    """``simulated=True``: codons evolved ALONG the tree (finite distances;
    required at 1000 taxa, where iid-random sequences saturate the tree
    past the reference binary's numeric limits and it aborts)."""
    from hyphy_tpu.utils.synth import (
        random_tree_newick,
        simulated_codon_alignment,
        synthetic_codon_alignment,
    )

    d = tempfile.mkdtemp(prefix="fel_e2e_")
    if simulated:
        aln, newick = simulated_codon_alignment(n_taxa, n_codons, seed=seed)
    else:
        aln = synthetic_codon_alignment(n_taxa, n_codons, seed=seed)
        newick = random_tree_newick(n_taxa, seed=seed)
    fa = os.path.join(d, f"synth{n_taxa}.fasta")
    with open(fa, "w") as fh:
        for name, seq in zip(aln.names, aln.sequences):
            fh.write(f">{name}\n{seq}\n")
    tr = os.path.join(d, f"synth{n_taxa}.nwk")
    with open(tr, "w") as fh:
        fh.write(newick)
    return fa, tr


def time_reference(binary, alignment, tree=None, timeout=14400):
    args = [binary, "LIBPATH=/root/reference/res", "fel",
            "--code", "Universal", "--alignment", alignment,
            "--full-model", "Yes"]
    if tree:
        args += ["--tree", tree]
    env = dict(os.environ)
    t0 = time.time()
    res = subprocess.run(args, capture_output=True, text=True,
                         timeout=timeout, env=env, cwd=tempfile.gettempdir())
    dt = time.time() - t0
    if res.returncode != 0:
        raise RuntimeError(f"reference FEL failed:\n{res.stdout[-1500:]}\n{res.stderr[-800:]}")
    return dt


def time_ours(alignment, tree=None):
    """(cold_seconds, warm_seconds): the first run pays XLA compilation
    (amortized across runs by the persistent compilation cache); the
    second run measures the compute-only cost the cache delivers."""
    from hyphy_tpu.methods import fel

    nwk = open(tree).read().strip() if tree else None
    t0 = time.time()
    fel.run(alignment, tree=nwk)
    cold = time.time() - t0
    t0 = time.time()
    fel.run(alignment, tree=nwk)
    warm = time.time() - t0
    return cold, warm


def main(argv):
    import hyphy_tpu  # noqa: F401  (applies HYPHY_TPU_PLATFORM before jax init)
    import jax

    large = "--large" in argv
    skip_ref = "--skip-reference" in argv
    out = {
        "host": f"{os.uname().nodename} ({os.cpu_count()} cpus)",
        "framework_backend": jax.default_backend(),
        "workloads": {},
    }
    binary = None if skip_ref else _find_binary()

    workloads = [("CD2 (10 taxa x 187 codons)", _CD2, None)]
    fa, tr = _synth_workload(100, 300)
    workloads.append(("synthetic 100 taxa x 300 codons", fa, tr))
    if large:
        fa, tr = _synth_workload(1000, 300, simulated=True)
        workloads.append(("simulated 1000 taxa x 300 codons", fa, tr))

    for label, aln, tree in workloads:
        entry = {}
        print(f"[fel_e2e] ours: {label}", file=sys.stderr, flush=True)
        cold, warm = time_ours(aln, tree)
        entry["ours_seconds_cold"] = round(cold, 2)
        entry["ours_seconds_warm"] = round(warm, 2)
        if binary:
            print(f"[fel_e2e] reference: {label}", file=sys.stderr, flush=True)
            entry["reference_seconds"] = round(time_reference(binary, aln, tree), 2)
            entry["speedup_cold"] = round(entry["reference_seconds"] / cold, 2)
            entry["speedup_warm"] = round(entry["reference_seconds"] / warm, 2)
        out["workloads"][label] = entry
        with open(_OUT, "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps({label: entry}), flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(_HERE))
    main(sys.argv[1:])
