"""Multi-host (multi-process) distributed MSM tests.

Strategy (the reference never had to solve this — single process; SURVEY.md
§4 "multi-host tests can run on a single host"): spawn N real OS processes,
each owning K virtual CPU devices, rendezvous via jax.distributed on
localhost, and require the replicated result to be BYTE-identical both
across the processes and to a single-process run over the same N*K-device
workload — the determinism contract of the fixed reduction tree.

Slow tier: each process pays a cold XLA:CPU compile of the sharded graph.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(devices: int) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU tunnel in subprocesses
    env["JAX_PLATFORMS"] = "cpu"
    # Default backend optimization: -O0 halves compile time but makes
    # EXECUTION of these EC graphs pathologically slow (the measured fact in
    # tests/conftest.py) — the subprocesses share the host-keyed persistent
    # cache instead.
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count={devices}"
                        " --xla_cpu_max_isa=AVX512")
    # NO persistent compile cache here: serializing multi-device shard_map
    # executables SIGSEGVs in XLA:CPU's cache serializer (see
    # tests/test_sharded.py::_no_persistent_cache).
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
    return env


def _digest(out: str) -> str:
    m = re.search(r"result_sha256=([0-9a-f]{64})", out)
    assert m, f"no digest in output:\n{out}"
    return m.group(1)


def _run_procs(nproc: int, devices_per_proc: int, collective: str, timeout: int):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tpu_msm.parallel.distributed",
             f"--coordinator=127.0.0.1:{port}",
             f"--num-processes={nproc}", f"--process-id={i}",
             "--log-size=8", "--collective", collective, "--backend", "jnp"],
            cwd=REPO, env=_env(devices_per_proc),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"process failed:\n{o}"
    return [_digest(o) for o in outs]


@pytest.mark.slow
@pytest.mark.parametrize("collective", ["gather_tree", "ppermute_tree"])
def test_two_process_bit_identical(collective):
    """N=2 processes x 2 devices == 1 process x 4 devices, byte-identical."""
    d2 = _run_procs(2, 2, collective, timeout=900)
    assert d2[0] == d2[1], "replicas differ across processes"
    [d1] = _run_procs(1, 4, collective, timeout=900)
    assert d1 == d2[0], "multi-process result differs from single-process"
