"""Test harness: force an 8-device virtual CPU mesh.

This is JAX's standard fake-multi-device trick (SURVEY.md §4): all sharding /
collective logic is exercised on CPU without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
# Private per-session compile cache: train() enables the persistent XLA
# cache (utils/cache.py), and sharing ~/.jax_cache with a concurrently
# running training/bench process has produced a corrupted entry whose
# zstd read segfaults the whole pytest process. Tests get their own dir.
if "KLAB_COMPILE_CACHE" not in os.environ:
    import tempfile

    os.environ["KLAB_COMPILE_CACHE"] = tempfile.mkdtemp(
        prefix="klab_test_jax_cache_")

# Unit tests must run on the virtual CPU mesh — fp32 golden comparisons are
# meaningless on a chip's bf16 matmul passes. The outer environment both pins
# JAX_PLATFORMS to the real TPU *and* registers its backend from a
# sitecustomize at interpreter startup, so env vars are too late; override
# through jax.config instead. TPU-targeted tests opt back in via
# KLAB_TEST_PLATFORM=tpu.
_platform = os.environ.get("KLAB_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
if _platform == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (full pass; the default subset takes "
             "~30-40 min on a 1-core host — see COVERAGE.md for timings)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: use --runslow for the full pass")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Free compiled executables at every module boundary.

    A single pytest process compiles thousands of XLA programs across the
    273-test suite; the live executables' code mappings accumulate until a
    late big compile segfaults inside ``backend_compile_and_load`` (r3 hit
    it at 92% in test_train, r4 at 84% in test_swinv2_golden — always deep
    into the run, always fine in isolation, on a host with the default
    ``vm.max_map_count``). Dropping the jit caches once per module keeps
    the live set bounded; modules recompile what they still need (the
    per-session persistent compile cache makes that cheap).
    """
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
