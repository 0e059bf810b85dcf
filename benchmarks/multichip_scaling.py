"""Scaling-efficiency measurement for the sharded gene-level likelihood.

Measures full-likelihood evaluations/sec of the REAL ``LikelihoodFunction``
(100-taxon MG94xREV, fixed total patterns) at 1/2/4/8 shards of a virtual
CPU mesh (or real devices when available), plus the sharded per-site
solver fan-out, and writes the efficiency curve the driver records as
``MULTICHIP_r{N}.json`` detail.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python benchmarks/multichip_scaling.py

Correctness is asserted at every width (sharded lnL == 1-device lnL), so
the curve cannot silently drift from the serial engine.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_OUT = os.path.join(_HERE, "multichip_scaling.json")


def main():
    os.environ.setdefault("HYPHY_TPU_PLATFORM", "cpu")
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(0, os.path.dirname(_HERE))
    import __graft_entry__ as ge

    n_taxa = 100
    n_patterns_total = 256
    widths = [w for w in (1, 2, 4, 8) if w <= len(jax.devices())]
    virtual = jax.devices()[0].platform == "cpu"
    out = {
        "taxa": n_taxa,
        "patterns": n_patterns_total,
        "note": (
            "8 VIRTUAL devices share this host's physical cores, so "
            "'speedup' here measures PARTITIONING OVERHEAD (1.0 = the "
            "sharded SPMD program retains full throughput while split "
            "8-ways), not multi-chip scaling — real scaling needs real "
            "chips; correctness is asserted (identical lnL at every "
            "width)."
        ) if virtual else "real devices: speedup = multi-chip scaling",
        "widths": {},
    }

    ref_lnl = None
    base_rate = None
    for w in widths:
        mesh = Mesh(np.array(jax.devices()[:w]), ("sites",))
        lf, params = ge._build_lf(n_taxa, n_patterns_total, mesh=mesh)
        f = jax.jit(jax.value_and_grad(lf.loglik))
        v, g = f(params)
        v.block_until_ready()
        if ref_lnl is None:
            ref_lnl = float(v)
        else:
            assert abs(float(v) - ref_lnl) < 1e-6 * abs(ref_lnl), (
                f"width {w}: lnL {float(v)} != width-1 {ref_lnl}"
            )
        n_evals = 6
        t0 = time.time()
        for k in range(n_evals):
            p2 = dict(params)
            p2["omega"] = params["omega"] * (1.0 + 1e-4 * (k + 1))
            v, g = f(p2)
        v.block_until_ready()
        dt = time.time() - t0
        rate = n_evals / dt
        if base_rate is None:
            base_rate = rate
        out["widths"][str(w)] = {
            "evals_per_sec": round(rate, 4),
            "speedup": round(rate / base_rate, 3),
            "efficiency": round(rate / base_rate / w, 3),
            "lnl": float(v),
        }
        print(f"[scaling] width {w}: {rate:.3f} evals/s "
              f"(speedup {rate / base_rate:.2f}, "
              f"eff {rate / base_rate / w:.2f})", file=sys.stderr)

    # per-site fan-out scaling (the FEL/MEME site-queue analogue)
    from hyphy_tpu.optimize.nelder_mead import vmapped_nelder_mead
    from hyphy_tpu.models.parameters import ParamSpec
    from hyphy_tpu.parallel.mesh import sharded_site_solve

    rng = np.random.default_rng(0)
    targets = jnp.asarray(rng.uniform(0.2, 3.0, size=512))

    def obj(i, p):
        return -(p["x"] - targets[i]) ** 2 - 0.1 * (p["y"] - 1.0) ** 2

    specs = {"x": ParamSpec(init=1.0, lower=0.0, upper=10.0),
             "y": ParamSpec(init=1.0, lower=0.0, upper=10.0)}
    out["site_solver"] = {}
    base = None
    for w in widths:
        mesh = Mesh(np.array(jax.devices()[:w]), ("sites",))

        def solve(idx, init):
            starts = {"x": jnp.ones(idx.shape[0]), "y": jnp.ones(idx.shape[0])}
            return vmapped_nelder_mead(obj, specs, starts, idx)[1]

        t0 = time.time()
        vals = sharded_site_solve(solve, {}, 512, mesh=mesh)
        dt = time.time() - t0
        rate = 512 / dt
        if base is None:
            base = rate
        out["site_solver"][str(w)] = {
            "sites_per_sec": round(rate, 2),
            "speedup": round(rate / base, 3),
            "efficiency": round(rate / base / w, 3),
        }
        print(f"[scaling] site-solver width {w}: {rate:.1f} sites/s",
              file=sys.stderr)

    with open(_OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
