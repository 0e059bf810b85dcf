"""General parameter-constraint surface for likelihood fits.

The reference exposes two batch-language constraint machines this module
re-expresses declaratively:

* ``ReplicateConstraint ("this1.?.synRate := this2.?.synRate * R", ...)``
  (``batchlan.cpp`` ``HY_HBL_COMMAND_REPLICATE_CONSTRAINT``): tie one set
  of parameters to another through a shared expression — here a
  :class:`Proportional` constraint, where the target parameter (vector)
  becomes ``ratio * source`` with ``ratio`` optionally a NEW free scalar.

* ``MolecularClock (tree, {"t"})`` (``batchlan.cpp``
  ``HY_HBL_COMMAND_MOLECULAR_CLOCK``, driver
  ``TemplateBatchFiles/MolecularClock.bf``): constrain the branch-time
  parameters of a (rooted) tree so every root-to-tip path has equal
  length.  Implemented as a reparameterization — free parameters are
  per-internal-node HEIGHTS (root height free, tip heights 0, each child
  height a stick-breaking fraction of its parent's so the non-negativity
  t_b >= 0 is enforced by construction) and the constrained branch
  parameter is ``t_b = h(parent) - h(node)``.

A constraint is an object with two methods consumed by
``LikelihoodFunction.fit(constraints=[...])``:

* ``transform_specs(specs) -> specs``: drop the constrained (dependent)
  keys, add any new free keys;
* ``apply(params) -> params``: reconstruct the dependent parameters from
  the free ones (runs inside the jitted objective; must be traceable).

The reference's dependent-variable machinery re-evaluates formula
constraints inside every ``Compute`` (``PreCompute``, likefunc.h:419);
``apply`` is the same hook, fused into the XLA program.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from hyphy_tpu.models.parameters import ParamSpec, Params, Specs


class Proportional:
    """``target := ratio * source`` (ReplicateConstraint's most common
    template, e.g. ``this1.?.nonSynRate := R * this2.?.synRate``).

    ``ratio_key``: name of a new free scalar multiplier (bounds
    [lower, upper]); pass ``ratio=value`` instead to pin a fixed factor
    with no new free parameter.
    """

    def __init__(
        self,
        target: str,
        source: str,
        ratio_key: Optional[str] = None,
        ratio: Optional[float] = None,
        ratio_init: float = 1.0,
        lower: float = 0.0,
        upper: float = 10000.0,
    ):
        if (ratio_key is None) == (ratio is None):
            raise ValueError("exactly one of ratio_key / ratio is required")
        self.target = target
        self.source = source
        self.ratio_key = ratio_key
        self.ratio = ratio
        self.ratio_init = ratio_init
        self.lower = lower
        self.upper = upper

    def transform_specs(self, specs: Specs) -> Specs:
        if self.target not in specs:
            raise KeyError(f"constraint target {self.target!r} not in specs")
        if self.source not in specs:
            raise KeyError(f"constraint source {self.source!r} not in specs")
        out = {k: v for k, v in specs.items() if k != self.target}
        if self.ratio_key is not None:
            out[self.ratio_key] = ParamSpec(
                init=self.ratio_init, lower=self.lower, upper=self.upper
            )
        return out

    def apply(self, params: Params) -> Params:
        out = dict(params)
        factor = (
            out[self.ratio_key] if self.ratio_key is not None
            else jnp.asarray(self.ratio, jnp.result_type(out[self.source]))
        )
        out[self.target] = factor * out[self.source]
        return out


class MolecularClock:
    """Equal root-to-tip path lengths for a branch-time parameter vector.

    ``tree``: the partition's :class:`~hyphy_tpu.tree.topology.Tree`;
    ``target``: the per-branch parameter key (shape ``[n_branches]``,
    branch b = node b's edge to its parent).  Free parameters introduced:

    * ``{target}_clock_height``: the root height (total tree depth), in
      the same units as the branch parameter;
    * ``{target}_clock_frac`` [n_internal]: each internal node's height
      as a fraction of its parent's height (bounds (0, 1)), so every
      branch time ``h(parent) - h(node) >= 0`` by construction.
    """

    def __init__(self, tree, target: str = "t",
                 height_init: float = 0.3, height_upper: float = 10000.0):
        self.tree = tree
        self.target = target
        self.height_init = height_init
        self.height_upper = height_upper
        n = tree.n_nodes
        self.n_branches = tree.n_branches
        self.n_leaves = tree.n_leaves
        self.root = tree.root
        # internal non-root nodes, in a parent-before-child order
        internal = [nd for nd in range(n) if nd >= tree.n_leaves and nd != tree.root]
        order = sorted(internal, key=lambda nd: -nd)   # post-order ids: parents have larger ids
        self.internal_order = np.asarray(order, dtype=np.int32)
        self.parent = np.asarray(tree.parent, dtype=np.int32)
        self.frac_key = f"{target}_clock_frac"
        self.height_key = f"{target}_clock_height"

    def transform_specs(self, specs: Specs) -> Specs:
        if self.target not in specs:
            raise KeyError(f"clock target {self.target!r} not in specs")
        out = {k: v for k, v in specs.items() if k != self.target}
        out[self.height_key] = ParamSpec(
            init=self.height_init, lower=1e-8, upper=self.height_upper
        )
        out[self.frac_key] = ParamSpec(
            init=0.5, lower=1e-6, upper=1.0 - 1e-6,
            shape=(len(self.internal_order),),
        )
        return out

    def apply(self, params: Params) -> Params:
        out = dict(params)
        h_root = out[self.height_key]
        fracs = out[self.frac_key]
        n = self.parent.shape[0]
        heights = jnp.zeros((n,), dtype=jnp.result_type(h_root))
        heights = heights.at[self.root].set(h_root)
        # parent-before-child: each internal node's height = frac * parent's
        for i, nd in enumerate(self.internal_order):
            heights = heights.at[nd].set(fracs[i] * heights[self.parent[nd]])
        # leaves stay at height 0 (contemporaneous tips)
        t = heights[self.parent[np.arange(self.n_branches)]] - heights[
            np.arange(self.n_branches)
        ]
        # aux keys stay in the dict (loglik ignores unknown keys; the fit
        # result then reports the height/fraction MLEs alongside t)
        out[self.target] = jnp.maximum(t, 1e-12)
        return out
