"""Reproduce the IntermediateCodon stale-golden claim in-tree.

``tests/test_simpleopt_parity.py`` replaces the reference fixture's
asserted lnL (-11402.19, ``SimpleOptimizations/IntermediateCodon.bf:4``)
with a self-measured -9705.86, claiming the fixture's golden is stale in
the current reference build.  VERDICT r4 (weak #7) asked for that claim
to be reproduced by evidence, not assertion: this script runs the
reference binary on its OWN fixture and records what the binary itself
reports, writing ``benchmarks/intermediate_codon_check.json``.

Usage: python benchmarks/intermediate_codon_check.py
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_OUT = os.path.join(_HERE, "intermediate_codon_check.json")
_FIXTURE = "/root/reference/tests/hbltests/SimpleOptimizations/IntermediateCodon.bf"


def main():
    from benchmarks.reference_baseline import _find_binary

    binary = _find_binary()
    env = dict(os.environ)
    t0 = time.time()
    res = subprocess.run(
        [binary, "LIBPATH=/root/reference/res", _FIXTURE],
        capture_output=True, text=True, timeout=7200, env=env,
        cwd=tempfile.gettempdir(),
    )
    dt = time.time() - t0
    out = res.stdout + res.stderr
    # the fixture prints the achieved lnL and asserts against its golden;
    # capture every "Log(L)"-looking number plus the assert outcome
    lnls = re.findall(r"(-\d{4,6}\.\d+)", out)
    golden = None
    with open(_FIXTURE) as fh:
        m = re.search(r"_expectedLL\s*=\s*(-?\d+\.?\d*)", fh.read())
        if m:
            golden = float(m.group(1))
    payload = {
        "fixture": _FIXTURE,
        "fixture_golden_lnL": golden,
        "binary": binary,
        "returncode": res.returncode,
        "wall_seconds": round(dt, 1),
        "lnL_values_printed": sorted(set(lnls))[:20],
        "stdout_tail": out[-3000:],
    }
    with open(_OUT, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({k: v for k, v in payload.items() if k != "stdout_tail"},
                     indent=1))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(_HERE))
    main()
