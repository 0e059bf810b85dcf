"""Shared analysis scaffolding: data loading, staged fits, LRTs.

Python counterpart of the reference's
``SelectionAnalyses/modules/shared-load-file.bf`` (load_file, doGTR,
doPartitionedMG) and ``libv3/tasks/estimators.bf`` (FitGTR, FitCodonModel,
ApplyExistingEstimates).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from hyphy_tpu.data.alignment import Alignment, read_alignment
from hyphy_tpu.data.filter import DataFilter
from hyphy_tpu.data.genetic_code import GeneticCode
from hyphy_tpu.likelihood import FitResult, LikelihoodFunction, Partition
from hyphy_tpu.models import frequencies as freq_mod
from hyphy_tpu.models.codon import MG94xREVPartitionedOmega
from hyphy_tpu.models.dna import GTR
from hyphy_tpu.tree.topology import Tree

def progress(method: str, msg: str) -> None:
    """Uniform stderr progress line, one per pipeline stage, across every
    analysis (reference: ``io.ReportProgressMessageMD``).  Silence with
    HYPHY_TPU_PROGRESS=0."""
    import os
    import sys
    import time

    if os.environ.get("HYPHY_TPU_PROGRESS", "1") != "0":
        print(
            f"[{method} {time.strftime('%H:%M:%S')}] {msg}",
            file=sys.stderr, flush=True,
        )


try:  # scipy is available in the image; chi2 sf for LRT p-values
    from scipy.stats import chi2 as _chi2

    def chi2_sf(x: float, df: float) -> float:
        return float(_chi2.sf(max(x, 0.0), df))

except Exception:  # pragma: no cover

    def chi2_sf(x: float, df: float) -> float:
        from math import erfc, exp, sqrt

        if df == 1:
            return erfc(sqrt(max(x, 0.0) / 2))
        if df == 2:
            return exp(-max(x, 0.0) / 2)
        raise NotImplementedError


def rate_distribution(dist):
    """[(omega, proportion)] from either rate-distribution JSON schema:
    the reference's class-index-keyed dicts
    (``{"0": {"omega": .., "proportion": ..}}``, selection.io.report_dnds)
    or the legacy list-of-pairs this framework emitted before round 5 —
    post-processors accept both so they run on either binary's output."""
    if isinstance(dist, dict):
        return [
            (float(dist[k]["omega"]), float(dist[k]["proportion"]))
            for k in sorted(dist, key=int)
        ]
    return [(float(r[0]), float(r[1])) for r in dist]


@dataclasses.dataclass
class LoadedData:
    """load_file equivalent (shared-load-file.bf:153)."""

    alignment: Alignment
    nuc_filter: DataFilter
    codon_filter: Optional[DataFilter]
    tree: Tree
    genetic_code: GeneticCode
    tested_branches: np.ndarray  # bool mask over branches ("test" set)
    branch_groups: np.ndarray    # int group id per branch (0 = test/default)
    group_names: List[str]

    @property
    def n_sequences(self) -> int:
        return self.nuc_filter.n_sequences

    @property
    def n_sites(self) -> int:
        return (
            self.codon_filter.n_units
            if self.codon_filter is not None
            else self.nuc_filter.n_units
        )

    @property
    def sample_size(self) -> int:
        """sites x sequences (the reference's AIC-c sample size)."""
        return self.n_sites * self.n_sequences


def _branch_selection(tree: Tree, branches: str):
    """tested mask / group ids / group names for a branch-set selector."""
    tested = tree.select_branches(branches)
    groups = np.where(tested, 0, 1).astype(np.int32)
    if branches.strip().lower() == "all" and tested.all():
        return tested, groups, ["test"]
    return tested, groups, ["test", "background"]


def load_codon_data(
    alignment_path: str,
    genetic_code: str = "Universal",
    tree_newick: Optional[str] = None,
    branches: str = "All",
) -> LoadedData:
    """Load alignment + tree, build nucleotide and codon filters, select
    tested branches (reference: load_file + selection set prompts)."""
    aln = read_alignment(alignment_path)
    gc = GeneticCode(genetic_code)
    nuc = DataFilter.from_alignment(aln, "nucleotide")
    cod = DataFilter.from_alignment(aln, "codon", genetic_code=gc)
    if tree_newick is None:
        if not aln.trees:
            raise ValueError("no tree in alignment file; pass tree_newick")
        tree_newick = next(iter(aln.trees.values()))
    tree = Tree.from_newick(tree_newick, leaf_order=nuc.names)
    tested, groups, group_names = _branch_selection(tree, branches)
    return LoadedData(
        alignment=aln, nuc_filter=nuc, codon_filter=cod, tree=tree,
        genetic_code=gc, tested_branches=tested, branch_groups=groups,
        group_names=group_names,
    )


@dataclasses.dataclass
class MultiLoadedData:
    """Partitioned load_file equivalent: one LoadedData per NEXUS CHARSET
    partition, each paired with its own tree (reference:
    ``shared-load-file.bf:153`` + ``trees.LoadAnnotatedTreeTopology
    .match_partitions``), plus whole-alignment filters for joint
    frequency harvesting (the reference defines ONE model over all
    partition filters, ``estimators.CreateLFObject``)."""

    alignment: Alignment
    genetic_code: GeneticCode
    parts: List[LoadedData]
    partition_names: List[str]
    full_nuc: DataFilter
    full_codon: Optional[DataFilter]

    @property
    def n_partitions(self) -> int:
        return len(self.parts)

    @property
    def n_sequences(self) -> int:
        return self.full_nuc.n_sequences

    @property
    def n_sites(self) -> int:
        return sum(p.n_sites for p in self.parts)

    @property
    def sample_size(self) -> int:
        return self.n_sites * self.n_sequences


def _adjust_codon_partition(sites: Sequence[int], n_sites: int) -> List[int]:
    """Snap a contiguous 0-based site range onto codon boundaries —
    start to a multiple of 3 (nearest), end to ``% 3 == 2`` — exactly as
    ``selection.io.adjust_partition_string`` (io_functions.ibf:487) does
    before codon filters are built.  Non-contiguous sets pass through."""
    sites = list(sites)
    if not sites or sites != list(range(sites[0], sites[-1] + 1)):
        return sites
    start, end = sites[0], sites[-1]
    if start % 3 == 2:
        start += 1
    elif start % 3 == 1:
        start -= 1
    if end % 3 != 2:
        end += 1 if end % 3 == 1 else -1
        if end >= n_sites:
            end = (n_sites // 3) * 3 - 1
    if start >= end:
        raise ValueError("partition does not span a codon after adjustment")
    return list(range(start, end + 1))


def load_codon_data_multi(
    alignment_path: str,
    genetic_code: str = "Universal",
    tree_newick: Optional[str] = None,
    branches: str = "All",
) -> MultiLoadedData:
    """Partition-aware loader: NEXUS CHARSET definitions become
    partitions, trees pair with partitions in declaration order
    (TREE_1 <-> first CHARSET, ...); without charsets this is a
    single-partition wrapper around ``load_codon_data``."""
    aln = read_alignment(alignment_path)
    gc = GeneticCode(genetic_code)
    full_nuc = DataFilter.from_alignment(aln, "nucleotide")
    full_cod = DataFilter.from_alignment(aln, "codon", genetic_code=gc)

    charsets = list(aln.charsets.items())
    if not charsets:
        single = load_codon_data(alignment_path, genetic_code, tree_newick, branches)
        return MultiLoadedData(
            alignment=aln, genetic_code=gc, parts=[single],
            partition_names=["default"], full_nuc=full_nuc, full_codon=full_cod,
        )

    tree_list = list(aln.trees.values())
    parts: List[LoadedData] = []
    for k, (name, sites) in enumerate(charsets):
        sites = _adjust_codon_partition(sites, aln.n_sites)
        nuc_k = DataFilter.from_alignment(aln, "nucleotide", sites=sites)
        cod_k = DataFilter.from_alignment(aln, "codon", genetic_code=gc, sites=sites)
        if tree_newick is not None:
            nk = tree_newick
        elif len(tree_list) >= len(charsets):
            nk = tree_list[k]
        elif tree_list:
            nk = tree_list[0]
        else:
            raise ValueError("no tree for partition " + name)
        tree = Tree.from_newick(nk, leaf_order=nuc_k.names)
        tested, groups, group_names = _branch_selection(tree, branches)
        parts.append(LoadedData(
            alignment=aln, nuc_filter=nuc_k, codon_filter=cod_k, tree=tree,
            genetic_code=gc, tested_branches=tested, branch_groups=groups,
            group_names=group_names,
        ))
    return MultiLoadedData(
        alignment=aln, genetic_code=gc, parts=parts,
        partition_names=[name for name, _ in charsets],
        full_nuc=full_nuc, full_codon=full_cod,
    )


@dataclasses.dataclass
class GTRFit:
    loglik: float
    params: Dict[str, jnp.ndarray]
    branch_lengths: np.ndarray      # expected substitutions/site per branch
    frequencies: np.ndarray
    n_parameters: int
    model: GTR


def _host_cpu_context():
    """Nucleotide-stage fits run on the HOST CPU even when the session's
    accelerator is a TPU: 4-state pruning is latency-bound there (tiny
    kernels over many sequential tree levels under-fill the MXU/VPU) and
    runs faster in fp64 on the host, which also keeps the GTR hand-off
    numerically identical to the CPU parity path.  Codon-stage (61-state)
    programs stay on the accelerator."""
    import contextlib

    import jax

    if jax.default_backend() == "cpu":
        return contextlib.nullcontext()
    return jax.default_device(jax.devices("cpu")[0])


def fit_gtr(data: LoadedData, precision: float = 1e-5) -> GTRFit:
    """Nucleotide GTR fit (doGTR, shared-load-file.bf:448).

    Small trees fit on the host CPU in fp64 (4-state pruning under-fills
    the accelerator and the hand-off stays bit-comparable to the parity
    path); large trees (>250 leaves) fit on the accelerator — at that
    scale the host's fp64 fit costs minutes (measured 144 s for 1000 taxa
    on the 2-vCPU reference host) while the device L-BFGS runs the whole
    fit as one jitted program, and the GTR stage only seeds the codon
    fits (branch lengths + thetas), where fp32 is ample."""
    import jax as _jax

    if _jax.default_backend() != "cpu" and data.tree.n_leaves > 250:
        # fp32 on device: fp64 generators would route through device eigh
        return _fit_gtr_impl(data, precision, dtype=None)
    with _host_cpu_context():
        return _fit_gtr_impl(data, precision)


def _fit_gtr_impl(data: LoadedData, precision: float, dtype="float64") -> GTRFit:
    freqs = freq_mod.empirical_nucleotide(data.nuc_filter)
    model = GTR(freqs)
    lf = LikelihoodFunction(
        [Partition(data.nuc_filter, data.tree, model)], dtype=dtype,
    )
    init = {}
    # reference initial values: CT=1, others 0.25 (doGTR)
    for pair in ("AC", "AT", "CG", "GT"):
        init[f"theta_{pair}"] = jnp.asarray(0.25)
    init["theta_CT"] = jnp.asarray(1.0)
    if np.isfinite(data.tree.input_lengths[:-1]).all():
        rate = 1.0  # input lengths are substitutions/site; t ~= bl / rate
        init["t"] = jnp.asarray(
            np.maximum(data.tree.input_lengths[:-1], 1e-6) / rate
        )
    res = lf.fit(init=init, precision=precision)
    bl = np.asarray(model.branch_lengths(res.params))
    # +3 empirical frequency parameters (GTR.bf terms.model.empirical)
    return GTRFit(
        loglik=res.loglik,
        params=res.params,
        branch_lengths=bl,
        frequencies=np.asarray(freqs),
        n_parameters=res.n_free_parameters + 3,
        model=model,
    )


@dataclasses.dataclass
class MG94Fit:
    loglik: float
    params: Dict[str, jnp.ndarray]
    branch_lengths: np.ndarray
    alphas: np.ndarray              # per-branch synRate values
    betas: np.ndarray               # per-branch nonSynRate values
    omegas: np.ndarray              # per-group omega MLEs
    corner_freqs: np.ndarray
    codon_freqs: np.ndarray
    n_parameters: int
    model: MG94xREVPartitionedOmega


def fit_partitioned_mg94(
    data: LoadedData,
    gtr: GTRFit,
    precision: float = 1e-5,
    frequency_method: str = "CF3x4",
    refit_lengths: bool = True,
    multiple_hits: str = "None",
) -> MG94Fit:
    """The 'Global MG94xREV' fit: stage 1 (doPartitionedMG,
    shared-load-file.bf:706) constrains alpha_b := scaler * GTR branch
    length with beta_b := alpha_b * omega_group; stage 2 (the selection
    methods' final refit, e.g. FEL.bf:450) frees the per-branch alphas,
    initialized from stage 1."""
    gc = data.genetic_code
    if frequency_method == "CF3x4":
        corners, codon_freqs = freq_mod.cf3x4(data.codon_filter, gc)
    elif frequency_method == "F3x4":
        corners, codon_freqs = freq_mod.f3x4(data.codon_filter, gc)
    else:
        raise ValueError(frequency_method)
    n_groups = int(data.branch_groups.max()) + 1
    model = MG94xREVPartitionedOmega(
        gc, corners, codon_freqs,
        nuc_lengths=gtr.branch_lengths,
        branch_groups=data.branch_groups,
        n_groups=n_groups,
        multiple_hits=multiple_hits,
    )
    lf = LikelihoodFunction([Partition(data.codon_filter, data.tree, model)])
    # stage 1 holds the nucleotide biases at the GTR MLEs (reference:
    # estimators.fixSubsetOfEstimates(gtr_results, ...) before
    # doPartitionedMG in every method, e.g. FEL.bf:395); the full refit
    # below ("codon-refit") frees them again
    fixed_thetas = {
        k: v for k, v in gtr.params.items()
        if k.startswith("theta") and k in lf.specs
    }
    init = {"scaler": jnp.asarray(3.0), "omega": jnp.full((n_groups,), 0.25)}
    if multiple_hits != "None":
        init["delta"] = jnp.asarray(0.05)
        if multiple_hits == "Double+Triple":
            init["psi"] = jnp.asarray(0.05)
    res = lf.fit(init=init, fixed=fixed_thetas, precision=precision)
    res = dataclasses.replace(
        res,
        params={**res.params, **{k: jnp.asarray(v) for k, v in fixed_thetas.items()}},
        # fixed thetas still count as estimated (ApplyExistingEstimates
        # df_correction, estimators.bf:194)
        n_free_parameters=res.n_free_parameters + len(fixed_thetas),
    )

    if refit_lengths:
        model = MG94xREVPartitionedOmega(
            gc, corners, codon_freqs,
            nuc_lengths=gtr.branch_lengths,
            branch_groups=data.branch_groups,
            n_groups=n_groups,
            free_lengths=True,
            multiple_hits=multiple_hits,
        )
        lf = LikelihoodFunction([Partition(data.codon_filter, data.tree, model)])
        init2 = {k: v for k, v in res.params.items() if k != "scaler"}
        init2["alpha"] = res.params["scaler"] * jnp.asarray(gtr.branch_lengths)
        res = lf.fit(init=init2, precision=precision)

    alphas = np.asarray(model._alphas(res.params))
    omegas = np.asarray(res.params["omega"])
    betas = alphas * omegas[data.branch_groups]
    return MG94Fit(
        loglik=res.loglik,
        params=res.params,
        branch_lengths=np.asarray(model.branch_lengths(res.params)),
        alphas=alphas,
        betas=betas,
        omegas=omegas,
        corner_freqs=np.asarray(corners),
        codon_freqs=np.asarray(codon_freqs),
        # 9 empirical CF3x4 parameters (frequencies.bf) counted on top of
        # the optimized ones (reference df bookkeeping)
        n_parameters=res.n_free_parameters + 9,
        model=model,
    )


def kill_zero_branches(
    data: LoadedData,
    gtr: GTRFit,
    branches: str = "All",
    tol: float = 1e-7,
) -> Tuple[LoadedData, GTRFit]:
    """The reference's default ``kill-zero-lengths=Yes`` step
    (``shared-load-file.bf:495-532``): internal branches whose GTR branch
    length is effectively zero are deleted (collapsed into polytomies)
    before the codon stages; the remaining branches keep their GTR
    lengths.  The reference threshold is 1e-10 against MLEs parked
    exactly at the zero bound; our logit-space optimizer floors bounded
    parameters a few nano-substitutions above it, hence 1e-7 (still 4+
    orders below any resolvable branch length)."""
    bl = np.asarray(gtr.branch_lengths)
    drop = [
        b for b in range(data.tree.n_leaves, data.tree.n_branches)
        if bl[b] < tol
    ]
    if not drop:
        return data, gtr
    new_tree = data.tree.collapse_internal_branches(drop)
    keep = [b for b in range(data.tree.n_branches) if b not in set(drop)]
    new_bl = bl[keep]
    new_tree.newick_string = new_tree.to_newick(new_bl)
    tested, groups, group_names = _branch_selection(new_tree, branches)
    new_data = dataclasses.replace(
        data, tree=new_tree, tested_branches=tested, branch_groups=groups,
        group_names=group_names,
    )
    new_params = dict(gtr.params)
    if "t" in new_params and np.asarray(new_params["t"]).shape:
        new_params["t"] = jnp.asarray(np.asarray(new_params["t"])[keep])
    new_gtr = dataclasses.replace(
        gtr, branch_lengths=new_bl, params=new_params
    )
    return new_data, new_gtr


@dataclasses.dataclass
class MultiGTRFit:
    loglik: float
    parts: List[GTRFit]
    n_parameters: int


def kill_zero_branches_multi(
    md: MultiLoadedData,
    gtr: MultiGTRFit,
    branches: str = "All",
) -> Tuple[MultiLoadedData, MultiGTRFit]:
    """Apply the kill-zero-lengths collapse per partition."""
    new_parts, new_gtrs = [], []
    for p, g in zip(md.parts, gtr.parts):
        np_, ng = kill_zero_branches(p, g, branches)
        new_parts.append(np_)
        new_gtrs.append(ng)
    return (
        dataclasses.replace(md, parts=new_parts),
        dataclasses.replace(gtr, parts=new_gtrs),
    )


def fit_gtr_multi(md: MultiLoadedData, precision: float = 1e-5) -> MultiGTRFit:
    """Joint nucleotide GTR fit over all partitions: shared substitution
    rates, per-partition branch lengths, one frequency vector harvested
    from the whole alignment (reference: ``estimators.FitGTR`` builds one
    model over all partition filters)."""
    if md.n_partitions == 1:
        g = fit_gtr(md.parts[0], precision=precision)
        return MultiGTRFit(loglik=g.loglik, parts=[g], n_parameters=g.n_parameters)
    with _host_cpu_context():
        return _fit_gtr_multi_impl(md, precision)


def _fit_gtr_multi_impl(md: MultiLoadedData, precision: float) -> MultiGTRFit:
    # pool frequency counts over the per-partition filters (NOT the raw
    # full alignment: partition boundaries may shift the reading frame)
    freqs = freq_mod.empirical_nucleotide([p.nuc_filter for p in md.parts])
    models = [GTR(freqs) for _ in md.parts]
    lf = LikelihoodFunction([
        Partition(p.nuc_filter, p.tree, m) for p, m in zip(md.parts, models)
    ], dtype="float64")
    init = {f"theta_{pair}": jnp.asarray(0.25) for pair in ("AC", "AT", "CG", "GT")}
    init["theta_CT"] = jnp.asarray(1.0)
    for i, p in enumerate(md.parts):
        if np.isfinite(p.tree.input_lengths[:-1]).all():
            init[lf.partition_key(i, "t")] = jnp.asarray(
                np.maximum(p.tree.input_lengths[:-1], 1e-6)
            )
    res = lf.fit(init=init, precision=precision)
    parts = []
    for i, (p, m) in enumerate(zip(md.parts, models)):
        local = lf.partition_local_params(res.params, i)
        parts.append(GTRFit(
            loglik=res.loglik,  # joint lnL (per-partition split unused)
            params=local,
            branch_lengths=np.asarray(m.branch_lengths(local)),
            frequencies=np.asarray(freqs),
            n_parameters=res.n_free_parameters + 3,
            model=m,
        ))
    return MultiGTRFit(
        loglik=res.loglik, parts=parts, n_parameters=res.n_free_parameters + 3
    )


@dataclasses.dataclass
class MultiMG94Fit:
    loglik: float
    parts: List[MG94Fit]
    omegas: np.ndarray
    n_parameters: int


def fit_partitioned_mg94_multi(
    md: MultiLoadedData,
    gtr: MultiGTRFit,
    precision: float = 1e-5,
    frequency_method: str = "CF3x4",
    refit_lengths: bool = True,
    multiple_hits: str = "None",
) -> MultiMG94Fit:
    """Joint 'Global MG94xREV' fit across partitions: shared thetas and
    omega(s), per-partition branch-length scalers then (stage 2) free
    per-partition branch rates (reference: ``doPartitionedMG``,
    ``shared-load-file.bf:706`` with per-partition ``scaler_prefix_k``)."""
    if md.n_partitions == 1:
        f = fit_partitioned_mg94(
            md.parts[0], gtr.parts[0], precision=precision,
            frequency_method=frequency_method, refit_lengths=refit_lengths,
            multiple_hits=multiple_hits,
        )
        return MultiMG94Fit(
            loglik=f.loglik, parts=[f], omegas=f.omegas,
            n_parameters=f.n_parameters,
        )

    gc = md.genetic_code
    codon_filters = [p.codon_filter for p in md.parts]
    if frequency_method == "CF3x4":
        corners, codon_freqs = freq_mod.cf3x4(codon_filters, gc)
    else:
        corners, codon_freqs = freq_mod.f3x4(codon_filters, gc)
    n_groups = max(int(p.branch_groups.max()) + 1 for p in md.parts)

    def make_models(free_lengths: bool):
        return [
            MG94xREVPartitionedOmega(
                gc, corners, codon_freqs,
                nuc_lengths=g.branch_lengths,
                branch_groups=p.branch_groups,
                n_groups=n_groups,
                free_lengths=free_lengths,
                multiple_hits=multiple_hits,
            )
            for p, g in zip(md.parts, gtr.parts)
        ]

    models = make_models(False)
    lf = LikelihoodFunction([
        Partition(p.codon_filter, p.tree, m) for p, m in zip(md.parts, models)
    ])
    # nucleotide biases held at the joint-GTR MLEs during stage 1
    # (fixSubsetOfEstimates before doPartitionedMG; cf. the exported
    # reference LF partitioned.nex.SLAC.bf where theta_* are `:=`)
    fixed_thetas = {
        k: v for k, v in gtr.parts[0].params.items()
        if k.startswith("theta") and k in lf.specs
    }
    init: Dict[str, jnp.ndarray] = {"omega": jnp.full((n_groups,), 0.25)}
    if multiple_hits != "None":
        init["delta"] = jnp.asarray(0.05)
        if multiple_hits == "Double+Triple":
            init["psi"] = jnp.asarray(0.05)
    for i in range(md.n_partitions):
        init[lf.partition_key(i, "scaler")] = jnp.asarray(3.0)
    res = lf.fit(init=init, fixed=fixed_thetas, precision=precision)
    res = dataclasses.replace(
        res,
        params={**res.params, **{k: jnp.asarray(v) for k, v in fixed_thetas.items()}},
        n_free_parameters=res.n_free_parameters + len(fixed_thetas),
    )

    if refit_lengths:
        scalers = [
            res.params[lf.partition_key(i, "scaler")]
            for i in range(md.n_partitions)
        ]
        models = make_models(True)
        lf = LikelihoodFunction([
            Partition(p.codon_filter, p.tree, m) for p, m in zip(md.parts, models)
        ])
        init2 = {
            k: v for k, v in res.params.items()
            if k in ("omega", "delta", "psi") or k.startswith("theta")
        }
        for i, g in enumerate(gtr.parts):
            init2[lf.partition_key(i, "alpha")] = scalers[i] * jnp.asarray(
                g.branch_lengths
            )
        res = lf.fit(init=init2, precision=precision)

    omegas = np.asarray(res.params["omega"])
    parts = []
    for i, (p, m) in enumerate(zip(md.parts, models)):
        local = lf.partition_local_params(res.params, i)
        alphas = np.asarray(m._alphas(local))
        parts.append(MG94Fit(
            loglik=res.loglik,
            params=local,
            branch_lengths=np.asarray(m.branch_lengths(local)),
            alphas=alphas,
            betas=alphas * omegas[p.branch_groups],
            omegas=omegas,
            corner_freqs=np.asarray(corners),
            codon_freqs=np.asarray(codon_freqs),
            n_parameters=res.n_free_parameters + 9,
            model=m,
        ))
    return MultiMG94Fit(
        loglik=res.loglik, parts=parts, omegas=omegas,
        n_parameters=res.n_free_parameters + 9,
    )


def lrt(alternative_lnl: float, null_lnl: float, df: int):
    """LRT statistic + chi^2 p-value (estimators.LRT)."""
    stat = 2.0 * (alternative_lnl - null_lnl)
    return stat, chi2_sf(stat, df)
