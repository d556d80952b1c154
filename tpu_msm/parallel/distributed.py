"""Multi-host distributed MSM (jax.distributed + global mesh over DCN/ICI).

The reference is a single-process, single-GPU library; this layer is the
multi-host axis SURVEY.md §5.8 / BASELINE config 5 ("log 24 sharded across
N >= 2 hosts") mandates. Design:

* every host (process) calls `initialize()` -> `jax.distributed.initialize`
  (coordinator rendezvous; on TPU pods the arguments are auto-detected);
* the global mesh spans every device of every process; points/scalars are
  sharded along N, each process supplying only its local shard via
  `jax.make_array_from_process_local_data`;
* the per-chip body is exactly `sharded._local_step` — partial window sums,
  then the cross-chip EC collective (all_gather riding ICI within a host /
  DCN across hosts, or the ppermute binomial tree), then a replicated
  Horner fold. Chip/process count only changes how the SAME fixed reduction
  tree is split, so results are bit-identical to the single-process path —
  asserted by tests/test_distributed.py which runs N=2 CPU processes and
  compares bytes.

Run-anywhere shape (mirrors the reference profiler's CLI habits):

    # host 0                                  # host 1
    python -m tpu_msm.parallel.distributed \
        --coordinator=10.0.0.1:1234 --num-processes=2 --process-id=0 ...
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional

import numpy as np

from tpu_msm.utils.config import MsmConfig, select_config


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """Join the multi-process runtime. On TPU pod slices all arguments are
    auto-detected; on CPU/GPU fleets pass them explicitly. Safe to call once
    per process, before any other jax use."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "data"):
    """1-D mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def msm_distributed(local_px, local_py, local_scalars,
                    cfg: MsmConfig | None = None, axis: str = "data",
                    collective: str = "gather_tree", mesh=None):
    """Global MSM over all hosts. Each process passes ITS shard: (16, n_local)
    limb arrays, n_local equal on every process (pad with zero scalars on the
    infinity point if needed — absorbed for free by the window reduction).
    Returns the replicated ProjPoint (16, 1) as host numpy arrays.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_msm.parallel import sharded

    if mesh is None:
        mesh = global_mesh(axis)
    n_local = local_px.shape[1]
    if cfg is None:
        n_per_chip = n_local // max(1, len(jax.local_devices()))
        cfg = select_config(max(1, n_per_chip))
    spec = NamedSharding(mesh, P(None, axis))
    arrs = [
        jax.make_array_from_process_local_data(spec, np.ascontiguousarray(a))
        for a in (local_px, local_py, local_scalars)
    ]
    fn = sharded.make_sharded_msm(mesh, cfg, axis, collective=collective)
    res = fn(*arrs)
    jax.block_until_ready(res)
    # Replicated output: every process can read it fully.
    return tuple(np.asarray(a) for a in res)


def _main(argv=None) -> int:
    """Process entry for multi-host runs and the N-process CPU simulation
    test. Generates the same deterministic workload on every process, takes
    this process's contiguous shard, and prints the result bytes' digest."""
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--log-size", type=int, default=8)
    ap.add_argument("--window-bits", type=int, default=8)
    ap.add_argument("--scan-lanes", type=int, default=8)
    ap.add_argument("--collective", default="gather_tree",
                    choices=["gather_tree", "ppermute_tree"])
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args(argv)

    initialize(args.coordinator, args.num_processes, args.process_id)
    import hashlib

    import jax

    n = 1 << args.log_size
    nproc = jax.process_count()
    pid = jax.process_index()
    from tpu_msm.utils import preprocess

    [inst] = preprocess.generate_msm_instances(args.log_size, 1, seed=7)
    lo, hi = pid * n // nproc, (pid + 1) * n // nproc
    cfg = MsmConfig(window_bits=args.window_bits, scan_lanes=args.scan_lanes,
                    backend=args.backend)
    x, y, z = msm_distributed(inst.px[:, lo:hi], inst.py[:, lo:hi],
                              inst.scalars[:, lo:hi], cfg=cfg,
                              collective=args.collective)
    digest = hashlib.sha256(
        x.tobytes() + y.tobytes() + z.tobytes()).hexdigest()
    print(f"proc {pid}/{nproc} devices={jax.device_count()} "
          f"result_sha256={digest}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(_main())
