"""Test configuration: force the CPU backend (fp64 parity path) with 8
virtual devices so multi-chip sharding is exercised without TPU hardware."""

import os

os.environ.setdefault("HYPHY_TPU_PLATFORM", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import pathlib

import pytest

import hyphy_tpu  # noqa: F401  (locks in platform + x64 before any test)

REFERENCE_DATA = pathlib.Path("/root/reference/tests/hbltests")
LOCAL_DATA = pathlib.Path(__file__).parent / "data"


def data_path(name: str) -> str:
    """Resolve a fixture: prefer the local copy, fall back to the reference
    checkout (read-only)."""
    local = LOCAL_DATA / name
    if local.exists():
        return str(local)
    for sub in ("libv3/data", "data", "SimpleOptimizations"):
        cand = REFERENCE_DATA / sub / name
        if cand.exists():
            return str(cand)
    raise FileNotFoundError(name)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running parity fixtures (set HYPHY_TPU_RUN_SLOW=1)"
    )


# Modules whose tests are CD2/golden parity fixtures taking minutes each.
# The default tier covers every method on small synthetic fixtures
# (test_fast_methods.py) plus all engine/data/aux units — ~5 minutes on a
# typical multi-core host, up to ~12 on a 2-vCPU VM (the method pipelines
# are XLA-compile-bound there); the full golden tier runs with
# HYPHY_TPU_RUN_SLOW=1 (reference test strategy: golden-value integration
# tests, SURVEY.md section 4).
SLOW_MODULES = {
    "test_fel", "test_meme", "test_busted", "test_relax", "test_absrel",
    "test_fubar", "test_slac", "test_prime", "test_bgm",
    "test_leisr_fade_cfel", "test_simpleopt_parity", "test_partitioned",
    "test_codon_models",
}


def pytest_collection_modifyitems(config, items):
    if os.environ.get("HYPHY_TPU_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow golden fixture; set HYPHY_TPU_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords or item.module.__name__ in SLOW_MODULES:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def cd2_path() -> str:
    return data_path("CD2.nex")


@pytest.fixture(scope="module", autouse=True)
def _release_compiled_executables():
    """Free jit caches between test modules.

    Every compiled XLA CPU executable keeps JIT code pages mmap'd; a full
    suite run accumulates enough mappings to exhaust the kernel's default
    vm.max_map_count (~65k), at which point the next compilation segfaults
    inside XLA.  Dropping the caches per module keeps the map count
    bounded (module-scope fixtures recompile what they need)."""
    yield
    import jax

    jax.clear_caches()
