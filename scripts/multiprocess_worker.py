"""Worker for the 2-process distributed GN test (VERDICT round-1 item 6).

Each process contributes 2 virtual CPU devices to a 4-device global mesh
(2 processes x 2 devices); the point-sharded Gauss-Newton then runs its
per-iteration psum across the process boundary through the gloo CPU
collectives backend.  Process 0 also solves the identical problem on a
single local device and asserts the distributed pose matches.

Launched by tests/test_multiprocess.py as:
    python scripts/multiprocess_worker.py <coordinator> <num_procs> <pid>

No reference analogue — halismai/bpvo is single-process (SURVEY.md §2.4);
this exercises the BASELINE.md multi-host scaling path on CPU, the same
code path a TPU pod slice would take via jax.distributed auto-detection.
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main(coordinator: str, num_procs: int, pid: int) -> None:
    from bpvo_tpu.parallel import multihost

    multihost.initialize(coordinator_address=coordinator,
                         num_processes=num_procs, process_id=pid)
    info = multihost.process_info()
    assert info["process_count"] == num_procs, info
    assert info["process_index"] == pid, info  # coordinator assignment check
    assert info["global_devices"] == 2 * num_procs, info

    import numpy as np
    import jax.numpy as jnp
    from __graft_entry__ import _synthetic_problem
    from bpvo_tpu.parallel import sharded
    from bpvo_tpu.solver import gauss_newton as gn

    # identical seed => identical host data on every process
    tdata, channels, cam, _ = _synthetic_problem(96, 128, 512, seed=3)
    opts = gn.GNOptions(max_iterations=20, function_tolerance=1e-5,
                        parameter_tolerance=1e-7)

    # 2-D (kf=1, points=4) global mesh spanning both processes
    mesh = multihost.global_mesh(kf_axis_size=1)
    tdata_sh = sharded.shard_template(tdata, mesh)
    st = sharded.make_sharded_gn(mesh, opts)(
        tdata_sh, channels, cam, jnp.eye(4, dtype=jnp.float32))
    # replicated outputs: every process holds the full value locally
    T_dist = np.asarray(st.T.addressable_shards[0].data)
    iters = int(np.asarray(st.num_iters.addressable_shards[0].data))
    assert np.all(np.isfinite(T_dist)), T_dist
    assert iters >= 1

    # single-device reference on this process's first local device
    st_local = gn.run(tdata, channels, cam, jnp.eye(4, dtype=jnp.float32),
                      opts)
    T_local = np.asarray(st_local.T)
    err = np.abs(T_dist - T_local).max()
    assert err < 1e-4, (err, T_dist, T_local)

    print(f"MULTIPROC_OK pid={pid} procs={info['process_count']} "
          f"devices={info['global_devices']} iters={iters} "
          f"T_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
