"""Two-process multi-host dry run on the CPU backend.

Validates the DCN bring-up path the reference never had (SURVEY.md §2.4:
its NCCL init_process_group was left commented out): each process calls
``sba_gan_tpu.parallel.init_distributed`` against a shared coordinator, the
global mesh spans both processes' devices, and one jitted DAMSM-style
global reduction runs with XLA-inserted cross-process collectives.

Run (single entry spawns both workers):
    python scripts/multihost_dryrun.py
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
PORT = 12355
N_PROC = 2
DEV_PER_PROC = 2


def worker(rank: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from sba_gan_tpu.parallel import batch_sharding, init_distributed, make_mesh

    init_distributed(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROC,
        process_id=rank,
    )
    assert jax.process_count() == N_PROC, jax.process_count()
    assert jax.device_count() == N_PROC * DEV_PER_PROC

    import jax.numpy as jnp
    import numpy as np

    mesh = make_mesh(data=jax.device_count(), model=1)
    bsh = batch_sharding(mesh)

    # host-local shard -> global array (the data-parallel input path)
    local = np.full((DEV_PER_PROC, 4), float(rank + 1), np.float32)
    global_shape = (N_PROC * DEV_PER_PROC, 4)
    arrs = [
        jax.device_put(local[i : i + 1], d)
        for i, d in enumerate(jax.local_devices())
    ]
    x = jax.make_array_from_single_device_arrays(global_shape, bsh, arrs)

    # global reduction over the sharded batch dim -> cross-process psum
    y = jax.jit(lambda a: jnp.sum(a), out_shardings=None)(x)
    total = float(y)
    expect = 4.0 * DEV_PER_PROC * sum(r + 1 for r in range(N_PROC))
    assert total == expect, (total, expect)
    print(f"rank {rank}: global sum {total} OK", flush=True)


def main() -> None:
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
        return
    procs = [
        subprocess.Popen([sys.executable, __file__, str(r)],
                         env={**os.environ})
        for r in range(N_PROC)
    ]
    codes = [p.wait(timeout=300) for p in procs]
    assert all(c == 0 for c in codes), codes
    print("multihost dryrun OK")


if __name__ == "__main__":
    main()
