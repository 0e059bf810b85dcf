"""Shared analysis scaffolding: data loading, staged fits, LRTs.

Python counterpart of the reference's
``SelectionAnalyses/modules/shared-load-file.bf`` (load_file, doGTR,
doPartitionedMG) and ``libv3/tasks/estimators.bf`` (FitGTR, FitCodonModel,
ApplyExistingEstimates).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

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

    n_branches = tree.n_branches
    if branches.strip().lower() in ("all", "internal", "leaves"):
        tested = tree.select_branches(branches)
        groups = np.where(tested, 0, 1).astype(np.int32)
        group_names = ["test", "background"] if (~tested).any() else ["test"]
    else:
        tested = tree.select_branches(branches)
        groups = np.where(tested, 0, 1).astype(np.int32)
        group_names = ["test", "background"]
    return LoadedData(
        alignment=aln, nuc_filter=nuc, codon_filter=cod, tree=tree,
        genetic_code=gc, tested_branches=tested, branch_groups=groups,
        group_names=group_names,
    )


@dataclasses.dataclass
class GTRFit:
    loglik: float
    params: Dict[str, jnp.ndarray]
    branch_lengths: np.ndarray      # expected substitutions/site per branch
    frequencies: np.ndarray
    n_parameters: int
    model: GTR


def fit_gtr(data: LoadedData, precision: float = 1e-5) -> GTRFit:
    """Nucleotide GTR fit (doGTR, shared-load-file.bf:448)."""
    freqs = freq_mod.empirical_nucleotide(data.nuc_filter)
    model = GTR(freqs)
    lf = LikelihoodFunction([Partition(data.nuc_filter, data.tree, model)])
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
    )
    lf = LikelihoodFunction([Partition(data.codon_filter, data.tree, model)])
    init = {k: v for k, v in gtr.params.items() if k.startswith("theta")}
    init["scaler"] = jnp.asarray(3.0)
    init["omega"] = jnp.full((n_groups,), 0.25)
    res = lf.fit(init=init, precision=precision)

    if refit_lengths:
        model = MG94xREVPartitionedOmega(
            gc, corners, codon_freqs,
            nuc_lengths=gtr.branch_lengths,
            branch_groups=data.branch_groups,
            n_groups=n_groups,
            free_lengths=True,
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


def lrt(alternative_lnl: float, null_lnl: float, df: int):
    """LRT statistic + chi^2 p-value (estimators.LRT)."""
    stat = 2.0 * (alternative_lnl - null_lnl)
    return stat, chi2_sf(stat, df)
