"""End-to-end MEME / BUSTED wall-clock + positive-site FEL parity.

Extends ``fel_e2e.py`` to the other two north-star methods (BASELINE.md:
">=10x end-to-end FEL/MEME/BUSTED") and adds the positive-selection
parity workload VERDICT r4 flagged: the existing 1000-taxon agreement was
measured on an all-negative dataset, which exercises only one tail of the
classifier.

Workloads (1000 taxa x 300 codons, simulated along the tree):
  * ``meme`` / ``busted``: the fel_e2e --large dataset (seed 11, shared
    omega 0.3), reference binary vs ours-TPU wall-clock.
  * ``fel-pos``: 10% of sites simulated at omega = 5 (seed 23); both
    sides run FEL and the detected positive/negative site sets are
    compared against each other and against the simulation truth.

Usage:
  python benchmarks/methods_e2e.py meme|busted|fel-pos
      [--skip-reference] [--skip-ours] [--taxa N] [--codons N]

Each invocation updates its key in ``benchmarks/methods_e2e.json``
(repeated runs merge, so the reference and ours legs can run on
different schedules / hosts).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_OUT = os.path.join(_HERE, "methods_e2e.json")


def _workload(n_taxa, n_codons, seed=11, positive=False):
    from hyphy_tpu.utils.synth import simulated_codon_alignment

    d = tempfile.mkdtemp(prefix="methods_e2e_")
    site_omegas = None
    true_pos = []
    if positive:
        rng = np.random.default_rng(seed)
        site_omegas = np.full(n_codons, 0.2)
        true_pos = sorted(rng.choice(n_codons, n_codons // 10, replace=False))
        site_omegas[true_pos] = 5.0
    aln, newick = simulated_codon_alignment(
        n_taxa, n_codons, seed=seed, site_omegas=site_omegas
    )
    fa = os.path.join(d, f"sim{n_taxa}.fasta")
    with open(fa, "w") as fh:
        for name, seq in zip(aln.names, aln.sequences):
            fh.write(f">{name}\n{seq}\n")
    tr = os.path.join(d, f"sim{n_taxa}.nwk")
    with open(tr, "w") as fh:
        fh.write(newick)
    return fa, tr, [int(x) for x in true_pos]


def _reference(binary, method, alignment, tree, timeout=6 * 3600):
    args = [binary, "LIBPATH=/root/reference/res", method,
            "--code", "Universal", "--alignment", alignment, "--tree", tree]
    if method == "fel":
        args += ["--full-model", "Yes"]
    if method == "busted":
        args += ["--srv", "No"]
    t0 = time.time()
    res = subprocess.run(args, capture_output=True, text=True,
                         timeout=timeout, cwd=tempfile.gettempdir())
    dt = time.time() - t0
    if res.returncode != 0:
        raise RuntimeError(
            f"reference {method} failed:\n{res.stdout[-1500:]}\n{res.stderr[-800:]}")
    json_path = alignment + f".{method.upper()}.json"
    out = json.load(open(json_path)) if os.path.exists(json_path) else None
    return dt, out


def _ours(method, alignment, tree):
    nwk = open(tree).read().strip()
    if method == "fel":
        from hyphy_tpu.methods import fel as mod

        def run():
            return mod.run(alignment, tree=nwk)
    elif method == "meme":
        from hyphy_tpu.methods import meme as mod

        def run():
            return mod.run(alignment, tree=nwk)
    elif method == "busted":
        from hyphy_tpu.methods import busted as mod

        def run():
            return mod.run(alignment, tree=nwk, srv=False)
    t0 = time.time()
    r1 = run()
    cold = time.time() - t0
    t0 = time.time()
    r1 = run()
    warm = time.time() - t0
    return cold, warm, r1


def _site_calls(mle_content, p_col, pvalue=0.1, direction=None):
    """Positive / negative site index sets from an MLE content table."""
    tab = np.asarray(mle_content)
    alpha, beta, p = tab[:, 0], tab[:, 1], tab[:, p_col]
    sig = p <= pvalue
    pos = sorted(int(i) for i in np.where(sig & (beta > alpha))[0])
    neg = sorted(int(i) for i in np.where(sig & (beta < alpha))[0])
    return pos, neg


def main(argv):
    what = argv[1] if len(argv) > 1 else "meme"
    skip_ref = "--skip-reference" in argv
    skip_ours = "--skip-ours" in argv

    def flag(name, default):
        return int(argv[argv.index(name) + 1]) if name in argv else default

    n_taxa, n_codons = flag("--taxa", 1000), flag("--codons", 300)

    out = {}
    if os.path.exists(_OUT):
        out = json.load(open(_OUT))
    entry = out.setdefault(what, {})
    entry["workload"] = f"simulated {n_taxa} taxa x {n_codons} codons"

    if what == "fel-pos":
        fa, tr, true_pos = _workload(n_taxa, n_codons, seed=23, positive=True)
        entry["true_positive_sites"] = true_pos
        method = "fel"
    else:
        fa, tr, _ = _workload(n_taxa, n_codons, seed=11)
        method = what

    if not skip_ours:
        cold, warm, r = _ours(method, fa, tr)
        entry["ours_tpu_seconds_cold"] = round(cold, 1)
        entry["ours_tpu_seconds_warm"] = round(warm, 1)
        if method == "fel":
            pos, neg = _site_calls(r.json["MLE"]["content"]["0"], 4)
            entry["ours_positive_sites"] = pos
            entry["ours_negative_count"] = len(neg)
        elif method == "meme":
            tab = np.asarray(r.json["MLE"]["content"]["0"])
            names = [h[0] for h in r.json["MLE"]["headers"]]
            p = tab[:, names.index("p-value")]
            entry["ours_positive_sites"] = sorted(
                int(i) for i in np.where(p <= 0.1)[0])
        elif method == "busted":
            entry["ours_p_value"] = float(r.p_value)
            entry["ours_unconstrained_lnl"] = float(r.unconstrained_lnl)

    if not skip_ref:
        from benchmarks.reference_baseline import _find_binary

        dt, rjson = _reference(_find_binary(), method, fa, tr)
        entry["reference_seconds"] = round(dt, 1)
        if rjson is not None:
            if method in ("fel", "meme"):
                content = rjson["MLE"]["content"]["0"]
                names = [h[0] for h in rjson["MLE"]["headers"]]
                tab = np.asarray(content)
                p = tab[:, names.index("p-value")]
                if method == "fel":
                    a = tab[:, names.index("alpha")]
                    b = tab[:, names.index("beta")]
                    entry["reference_positive_sites"] = sorted(
                        int(i) for i in np.where((p <= 0.1) & (b > a))[0])
                    entry["reference_negative_count"] = int(
                        ((p <= 0.1) & (b < a)).sum())
                else:
                    entry["reference_positive_sites"] = sorted(
                        int(i) for i in np.where(p <= 0.1)[0])
            elif method == "busted":
                entry["reference_p_value"] = float(
                    rjson["test results"]["p-value"])

    if "ours_tpu_seconds_warm" in entry and "reference_seconds" in entry:
        entry["speedup_tpu_warm"] = round(
            entry["reference_seconds"] / entry["ours_tpu_seconds_warm"], 2)
        entry["speedup_tpu_cold"] = round(
            entry["reference_seconds"] / entry["ours_tpu_seconds_cold"], 2)
    with open(_OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(entry.get("speedup_tpu_warm"), default=str))
    print(f"updated {_OUT}: {what}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(_HERE))
    main(sys.argv)
