"""Tensor-parallel ('model'-axis) sharding tests.

The reference has no tensor parallelism (single GPU, trainer.py:36); this is
the TPU-native scaling extension: activation sharding constraints on the
DAMSM encoder over a ('data','model') mesh, with GSPMD propagating the
channel sharding into the conv tower.

The FULL train step under TP is exercised on real TPU meshes only —
XLA-CPU's in-process communicator can hit its 40s rendezvous termination
when mid-graph collectives skew across virtual devices sharing one host
core (see __graft_entry__.dryrun_multichip).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sba_gan_tpu.models.inception import CNNEncoder
from sba_gan_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated,
    tensor_constraint,
)


def test_tensor_constraint_none_without_model_axis(cpu_devices):
    mesh = make_mesh(devices=cpu_devices)  # model=1
    assert tensor_constraint(mesh) is None
    assert tensor_constraint(None) is None


def test_damsm_encoder_dp_tp(cpu_devices):
    mesh = make_mesh(devices=cpu_devices[:4], model=2)  # (data=2, model=2)
    constrain = tensor_constraint(mesh)
    assert constrain is not None

    enc = CNNEncoder(nef=16, input_size=75)
    variables = enc.init(jax.random.PRNGKey(0),
                         jnp.zeros((2, 64, 64, 3), jnp.float32))
    variables = jax.device_put(variables, replicated(mesh))

    def forward(img):
        region, code = enc.apply(variables, img, False)
        region = constrain(region, ("data", None, "model"))
        code = constrain(code, ("data", "model"))
        return region, code

    rng = np.random.default_rng(0)
    img = jax.device_put(
        rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32),
        batch_sharding(mesh),
    )
    region, code = jax.jit(forward)(img)
    assert region.shape[0] == 4 and region.shape[2] == 16
    assert code.shape == (4, 16)
    assert np.isfinite(np.asarray(region)).all()
    assert np.isfinite(np.asarray(code)).all()
    # the constraint actually took: the output is not fully replicated
    assert not code.sharding.is_fully_replicated

    # sharded result matches the unsharded single-device computation
    region1, code1 = enc.apply(variables, jnp.asarray(img), False)
    np.testing.assert_allclose(np.asarray(code), np.asarray(code1),
                               rtol=2e-4, atol=2e-4)
