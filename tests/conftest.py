"""Test configuration: force CPU JAX with 8 virtual devices.

The reference has no CI-friendly backend at all (tests are a single gtest on
Windows); here every test runs on CPU JAX so no TPU is needed, and the
8-virtual-device mesh stands in for multi-chip sharding tests (SURVEY.md §4).

The container's sitecustomize registers a TPU PJRT backend ("axon") in every
python process; its init serializes on the single TPU tunnel and can block for
minutes.  Tests are CPU-only, so if the axon env is present we re-exec pytest
once with a clean env — from `pytest_configure`, with global capture suspended
so the child inherits the real stdout.
"""
import os
import pathlib
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

RESOURCE_DIR = pathlib.Path("/root/reference/resource")

_NEEDS_REEXEC = bool(os.environ.get("PALLAS_AXON_POOL_IPS")) or \
    os.environ.get("JAX_PLATFORMS", "cpu") != "cpu"

def _cache_env(env):
    """Point JAX's persistent compilation cache at a repo-local dir so
    REPEAT suite runs skip recompiles (the slow tier is dominated by
    multi-minute MLT combine compiles; a second `--runslow` run loads
    them from disk).  NR_TEST_NO_CACHE=1 disables it — e.g. when timing
    cold compiles on purpose."""
    if env.get("NR_TEST_NO_CACHE") == "1":
        return
    cache = str(REPO_ROOT / ".jax_test_cache")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2.0")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


if not _NEEDS_REEXEC:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    _cache_env(os.environ)


def pytest_configure(config):
    if not _NEEDS_REEXEC or os.environ.get("NR_TPU_TESTS") == "1":
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.suspend_global_capture(in_=True)
        except Exception:
            pass
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    _cache_env(env)
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (MLT statistics/golden "
                          "renders; adds ~30-60 min of compiles)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="slow: pass --runslow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def resource_dir() -> pathlib.Path:
    return RESOURCE_DIR


@pytest.fixture(scope="session")
def cornel_scene():
    from nrenderer_tpu import load_scn
    return load_scn(str(RESOURCE_DIR / "path_tracing_cornel.scn"))
