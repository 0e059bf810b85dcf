"""Measure the reference HyPhy binary's full-likelihood evaluation rate on
the bench workload (1000-taxon x 300-codon MG94xREV), for bench.py's
``vs_baseline``.

The harness generates the exact synthetic alignment/tree the bench uses,
emits a self-contained HBL program that declares the same MG94xREV model
(formula-valued 61x61 matrix, F3x4 multipliers — the structure of the
reference's own ``MG94custom`` fixtures), and times N ``LFCompute`` calls
with a changed global parameter per call so every branch matrix is
re-exponentiated and the full pruning pass re-runs — the same work our
jitted evaluation does per call.

Usage: ``python bench.py --measure-baseline`` (writes bench_baseline.json).
The binary is located via $HYPHY_BIN, PATH, or a cmake build at
/tmp/hyphy_build/hyphy.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import tempfile

import numpy as np

_NUC = "ACGT"


def _find_binary() -> str:
    cand = os.environ.get("HYPHY_BIN")
    if cand and os.path.exists(cand):
        return cand
    on_path = shutil.which("hyphy")
    if on_path:
        return on_path
    for c in ("/tmp/hyphy_build/hyphy", "/usr/local/bin/hyphy"):
        if os.path.exists(c):
            return c
    raise FileNotFoundError(
        "reference hyphy binary not found; build it with cmake and set HYPHY_BIN"
    )


def _mg94_matrix_lines(gc, corners) -> list:
    """Formula entries 'Q[i][j]:=theta_XY*(R*)synRate*mult;' over sense
    codons (the reference's MG94xREV structure; cf. its own
    SimpleOptimizations fixtures)."""
    tbl = gc.one_step_table
    lines = []
    pair_names = ["AC", "AG", "AT", "CG", "CT", "GT"]
    for k in range(len(tbl["pairs"])):
        i, j = int(tbl["pairs"][k][0]), int(tbl["pairs"][k][1])
        fn, tn = int(tbl["from_nuc"][k]), int(tbl["to_nuc"][k])
        a, b = _NUC[min(fn, tn)], _NUC[max(fn, tn)]
        theta = "" if a + b == "AG" else f"theta_{a}{b}*"
        omega = "" if tbl["synonymous"][k] else "R*"
        mult = corners[tn, int(tbl["position"][k])]
        lines.append(f"Q[{i}][{j}]:={theta}{omega}synRate*{mult:.17g};")
    assert pair_names  # documented order only
    return lines


def measure(n_taxa: int, n_codons: int, out_path: str, n_evals: int = 10) -> dict:
    from hyphy_tpu.data.filter import DataFilter
    from hyphy_tpu.data.genetic_code import GeneticCode
    from hyphy_tpu.models import frequencies as freq_mod
    from hyphy_tpu.tree.topology import Tree
    from hyphy_tpu.utils.synth import random_tree_newick, synthetic_codon_alignment

    binary = _find_binary()
    gc = GeneticCode("Universal")
    aln = synthetic_codon_alignment(n_taxa, n_codons, seed=11)
    filt = DataFilter.from_alignment(aln, "codon", genetic_code=gc)
    tree = Tree.from_newick(random_tree_newick(n_taxa, seed=11), leaf_order=filt.names)
    corners, codon_freqs = freq_mod.f3x4(filt, gc)

    workdir = tempfile.mkdtemp(prefix="hyphy_baseline_")
    fasta = os.path.join(workdir, "data.fas")
    with open(fasta, "w") as fh:
        for name, seq in zip(aln.names, aln.sequences):
            fh.write(f">{name}\n{seq}\n")
    alphas = np.maximum(np.abs(np.asarray(tree.input_lengths)), 1e-3)

    # The bench tree is rooted-bifurcating; HyPhy unroots on input,
    # merging the two root branches into one.  Emit the unrooted form
    # explicitly with the merged branch rate la + lb — for a reversible
    # model with stationary root frequencies the likelihood is identical
    # (pulley principle), so FIRST_LNL is directly comparable to the
    # framework's fp64 lnL at the same parameter point.
    rates = {tree.names[b]: float(alphas[b]) for b in range(tree.n_branches)}
    ra, rb = tree.children[tree.root]
    if tree.is_leaf(ra):          # keep an internal node as the new top
        ra, rb = rb, ra
    rates[tree.names[rb]] = float(alphas[ra] + alphas[rb])

    def fmt(node):
        if tree.is_leaf(node):
            return tree.names[node]
        inner = ",".join(fmt(c) for c in tree.children[node])
        return f"({inner}){tree.names[node]}"

    top = [fmt(c) for c in tree.children[ra]] + [fmt(rb)]
    newick = "(" + ",".join(top) + ")" + tree.names[tree.root]
    branch_names = [
        tree.names[b] for b in range(tree.n_branches) if b != ra
    ]

    # pin each branch's synRate to the exact values the bench evaluates
    # (bench.py build_problem: alpha = clamped input lengths)
    rate_lines = "\n".join(
        f"benchTree.{name}.synRate = {rates[name]:.17g};"
        for name in branch_names
    )

    freq_lines = "\n".join(f"{{{x:.17g}}}" for x in np.asarray(codon_freqs))
    q_lines = "\n".join(_mg94_matrix_lines(gc, np.asarray(corners)))
    script = f"""
global theta_AC = 0.25; global theta_AT = 0.25; global theta_CG = 0.25;
global theta_CT = 0.25; global theta_GT = 0.25; global R = 0.25;
Q = {{{gc.n_states},{gc.n_states}}};
{q_lines}
freqs = {{{freq_lines}}};
Model MG94 = (Q, freqs, 0);
UseModel (MG94);
DataSet ds = ReadDataFile ("{fasta}");
DataSetFilter filtered = CreateFilter (ds, 3, "", "", "TAA,TAG,TGA");
Tree benchTree = "{newick}";
LikelihoodFunction lf = (filtered, benchTree);
{rate_lines}
LFCompute (lf, LF_START_COMPUTE);
LFCompute (lf, logl);
fprintf (stdout, "FIRST_LNL\t", logl, "\\n");
t0 = Time (1);
for (k = 0; k < {n_evals}; k += 1) {{
    R = 0.25 + 0.0001 * (k + 1);
    LFCompute (lf, logl);
}}
dt = Time (1) - t0;
LFCompute (lf, LF_DONE_COMPUTE);
fprintf (stdout, "EVALS_PER_SEC\t", {n_evals} / dt, "\\n");
fprintf (stdout, "LAST_LNL\t", logl, "\\n");
"""
    bf = os.path.join(workdir, "bench.bf")
    with open(bf, "w") as fh:
        fh.write(script)
    env = dict(os.environ)
    res = subprocess.run(
        [binary, "LIBPATH=/root/reference/res", bf],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    m = re.search(r"EVALS_PER_SEC\s+([0-9.eE+-]+|inf)", res.stdout)
    if not m:
        raise RuntimeError(
            f"baseline run failed:\n{res.stdout[-2000:]}\n{res.stderr[-2000:]}"
        )
    evals_per_sec = float(m.group(1))  # inf = workload too small to time
    lnl = re.search(r"FIRST_LNL\s+(-?[0-9.eE+-]+)", res.stdout)
    out = {
        "binary": binary,
        "taxa": n_taxa,
        "codons": n_codons,
        "patterns": filt.n_patterns,
        "full_evals_per_sec": evals_per_sec,
        "site_lnl_evals_per_sec": evals_per_sec * filt.n_patterns,
        # lnL at the pinned parameter point (theta=0.25, R=0.25,
        # synRate_b = clamped input lengths) — the bench's parity anchor
        "reference_lnL": float(lnl.group(1)) if lnl else None,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    return out
