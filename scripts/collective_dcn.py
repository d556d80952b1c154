"""Measure the cross-process EC collective's wall time over loopback DCN.

VERDICT r4 missing #3: the multi-host efficiency model used literature hop
constants only. This script measures the one thing this single-chip
environment CAN measure end-to-end: the wall time of the REAL collective
regions (gather_tree's psum slot-union + fold, ppermute_tree's binomial EC
all-reduce) over the actual `jax.distributed` gRPC/DCN software stack that
`tests/test_distributed.py` exercises — 2 processes on 127.0.0.1, 1 CPU
device each, so EVERY collective hop crosses the process boundary.

What this is: a measured latency of the full jax.distributed DCN transport
stack (gRPC + serialization + host copies) for the pipeline's exact 3 KB
per-chip payload and its exact reduce computations.
What this is NOT: ICI. Real inter-chip links are orders of magnitude
faster; this number UPPER-bounds the software-stack cost per collective in
the efficiency model.

Usage (self-spawning):  python scripts/collective_dcn.py [--reps 30]
Worker (internal):      ... --worker --coordinator=... --process-id=N
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker(args) -> int:
    from tpu_msm.parallel import distributed as dist

    dist.initialize(args.coordinator, 2, args.process_id)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_msm.parallel import sharded

    mesh = dist.global_mesh()
    d = jax.device_count()
    w = 16  # windows at c=16: the production payload (W, 16, 1) per chip
    pid = jax.process_index()

    spec = NamedSharding(mesh, P(None, None, "data"))
    rng = np.random.RandomState(7)
    local = rng.randint(0, 1 << 30, size=(w, 16, 1)).astype(np.uint32)
    payload_bytes = local.nbytes

    def sharded_input():
        return jax.make_array_from_process_local_data(spec, local)

    from tpu_msm.ops.curve import ProjPoint

    def _wrap3(body):
        # ProjPoint I/O as three arrays so shard_map specs stay simple.
        def f(x, y, z):
            r = body(ProjPoint(x, y, z))
            return tuple(r)
        return f

    progs = {
        # dispatch floor: same I/O shape, zero communication
        "identity": jax.shard_map(
            lambda x: x * jnp.uint32(1), mesh=mesh,
            in_specs=(P(None, None, "data"),),
            out_specs=P(None, None, "data"), check_vma=False),
        # the gather_tree communication primitive alone: 3 KB psum
        "psum_payload": jax.shard_map(
            lambda x: jax.lax.psum(x, "data"), mesh=mesh,
            in_specs=(P(None, None, "data"),), out_specs=P(),
            check_vma=False),
        # one ppermute ring hop of the same payload
        "ppermute_hop": jax.shard_map(
            lambda x: jax.lax.ppermute(
                x, "data", [(i, (i + 1) % d) for i in range(d)]),
            mesh=mesh, in_specs=(P(None, None, "data"),),
            out_specs=P(None, None, "data"), check_vma=False),
        # the FULL checked gather_tree reduce region (psum + fold + Horner)
        "reduce_gather": jax.shard_map(
            _wrap3(lambda ws: sharded._reduce_gather(ws, "data", d, 16)),
            mesh=mesh, in_specs=(P(None, None, "data"),) * 3,
            out_specs=P(), check_vma=True),
        # the FULL ppermute binomial EC all-reduce region
        "reduce_ppermute": jax.shard_map(
            _wrap3(lambda ws: sharded._reduce_ppermute(ws, "data", d, 16)),
            mesh=mesh, in_specs=(P(None, None, "data"),) * 3,
            out_specs=P(), check_vma=False),
    }

    results = {}
    for name, fn in progs.items():
        jfn = jax.jit(fn)
        nargs = 3 if name.startswith("reduce_") else 1
        xs = tuple(sharded_input() for _ in range(nargs))
        jax.block_until_ready(jfn(*xs))  # compile + warm
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(jfn(*xs))
            times.append(time.perf_counter() - t0)
        times.sort()
        results[name] = times[len(times) // 2]

    if pid == 0:
        floor = results["identity"]
        print(f"collective_dcn: 2 processes x 1 CPU device, loopback DCN "
              f"(gRPC), payload {payload_bytes} B/chip, reps={args.reps}")
        for name, t in results.items():
            extra = "" if name == "identity" else (
                f"  (marginal over dispatch floor: {max(0.0, t-floor)*1e3:.3f} ms)")
            print(f"  {name:16s} median {t*1e3:.3f} ms{extra}", flush=True)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args(argv)
    if args.worker:
        return _worker(args)

    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=1"
                        " --xla_cpu_max_isa=AVX512")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             f"--coordinator=127.0.0.1:{port}", f"--process-id={i}",
             f"--reps={args.reps}"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    rc = max(p.returncode for p in procs)
    sys.stdout.write(outs[0])
    if rc:
        sys.stdout.write("\n--- proc 1 ---\n" + outs[1])
    return rc


if __name__ == "__main__":
    sys.exit(main())
