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
PORT = int(os.environ.get("SBA_MULTIHOST_PORT", "12355"))
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
    # Raise the configurable collective-call rendezvous timeouts (the
    # in-process communicator's 40 s rendezvous is hardcoded, but these
    # workers already run isolated and their caller retries on timeout).
    from sba_gan_tpu.utils.platform import patch_cpu_collective_timeouts

    patch_cpu_collective_timeouts()
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

    # training-shaped step: value_and_grad over the globally-sharded batch
    # + sgd update on replicated params — the gradient mean is a
    # cross-process reduction XLA inserts over DCN, and every rank must
    # hold identical updated params (the data-parallel invariant).
    from sba_gan_tpu.parallel import replicated

    w = jax.device_put(jnp.arange(4, dtype=jnp.float32), replicated(mesh))

    @jax.jit
    def sgd(w, batch):
        def loss(w):
            pred = batch @ w
            return jnp.mean(pred ** 2)

        l, g = jax.value_and_grad(loss)(w)
        return w - 0.1 * g, l

    w2, l = sgd(w, x)
    w2_host = np.asarray(jax.device_get(w2))
    # closed form: batch rows are constant per rank; loss/grad are global
    rows = np.concatenate(
        [np.full((DEV_PER_PROC, 4), r + 1.0) for r in range(N_PROC)]
    ).astype(np.float32)
    w0 = np.arange(4, dtype=np.float32)
    pred = rows @ w0
    g_ref = (2.0 / rows.shape[0]) * rows.T @ pred
    np.testing.assert_allclose(w2_host, w0 - 0.1 * g_ref, rtol=1e-5,
                               atol=1e-6)
    print(f"rank {rank}: global sgd step OK (loss {float(l):.3f})", flush=True)

    # per-host input sharding (VERDICT r4 next-#8): each process's
    # DataLoader yields only its slice of every global batch, and
    # make_array_from_process_local_data assembles the global batch.
    # Coverage is asserted GLOBALLY: summing the per-sample index marks
    # over the sharded batch dim is a cross-process reduction — it equals
    # the full-batch sum iff the two hosts' slices are disjoint AND cover.
    from sba_gan_tpu.data.pipeline import DataLoader

    class _Toy:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            img = np.full((2, 2, 3), i, np.float32)
            return ([img], np.full((4,), i, np.int32), 2, i % 3, f"k{i}")

    loader = DataLoader(_Toy(), 8, seed=11, num_workers=0, sharding=bsh,
                        host_shard=(rank, N_PROC))
    full = DataLoader(_Toy(), 8, seed=11, num_workers=0)
    batches = list(loader)
    full_batches = list(full)
    assert len(batches) == len(full_batches) == 2, len(batches)
    for b, fb in zip(batches, full_batches):
        assert b.captions.shape[0] == 8  # GLOBAL batch as a jax.Array
        assert len(b.keys) == 4  # local slice only on this host
        # the global sum counts every sample of the global batch exactly
        # once iff the hosts' slices are disjoint AND cover it
        got = float(jax.jit(lambda c: jnp.sum(c[:, 0]))(b.captions))
        expect = float(sum(int(k[1:]) for k in fb.keys))
        assert got == expect, (got, expect)
    print(f"rank {rank}: sharded input pipeline OK", flush=True)


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
