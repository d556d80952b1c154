"""Test harness configuration.

Platform policy:
* Math/pipeline tests run on the default platform — the real TPU when the
  axon tunnel is up (tests then validate the actual target), otherwise CPU.
* Sharding tests always use 8 virtual CPU devices (mesh over
  jax.devices("cpu")), which works alongside a TPU default — the same setup
  the driver's dryrun_multichip uses.
* TPU_MSM_TEST_PLATFORM=cpu forces everything onto the CPU backend.

The host may have a single CPU core; XLA:CPU compiles of our ~5k-op EC graphs
take minutes at -O2, so we drop the backend optimization level (the math is
integer-exact — optimization affects speed only) and keep a persistent
compilation cache under .cache/jax.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
if "xla_backend_optimization_level" not in _flags:
    _flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = _flags.strip()

import jax  # noqa: E402

if os.environ.get("TPU_MSM_TEST_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TPU_MSM_TEST_PLATFORM"])

_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(20260816)


def pytest_collection_modifyitems(config, items):
    """Heavy pipeline-variant tests are opt-in (TPU_MSM_RUN_SLOW=1): on this
    class of host a cold XLA compile of one msm variant takes minutes, and
    the default suite must stay bounded. CI and the perf harness run the
    slow tier explicitly."""
    if os.environ.get("TPU_MSM_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: set TPU_MSM_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
