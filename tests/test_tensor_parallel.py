"""Tensor-parallel ('model'-axis) sharding tests.

The reference has no tensor parallelism (single GPU, trainer.py:36); this is
the TPU-native scaling extension: activation sharding constraints on the
DAMSM encoder over a ('data','model') mesh, with GSPMD propagating the
channel sharding into the conv tower.

The collective-executing cases (encoder DPxTP with unsharded parity, FULL
train step under a (data=4, model=2) mesh) run in ONE fresh interpreter
via _mesh_cases.py: XLA-CPU's in-process collectives abort() the whole
process on a hardcoded 40 s rendezvous miss, which this host's bursty
core can trigger mid-suite — isolation turns that into a retryable
subprocess failure instead of killing pytest.
"""

import pytest

from sba_gan_tpu.parallel import make_mesh, tensor_constraint

pytestmark = pytest.mark.slow  # compiles jitted steps / subprocess meshes (quick tier: -m 'not slow')


def test_tensor_constraint_none_without_model_axis(cpu_devices):
    mesh = make_mesh(devices=cpu_devices)  # model=1
    assert tensor_constraint(mesh) is None
    assert tensor_constraint(None) is None


@pytest.fixture(scope="module")
def tp_out(mesh_case):
    return mesh_case("tp_cases")


def test_damsm_encoder_dp_tp(tp_out):
    """DAMSM encoder under a (data=2, model=2) mesh: channel sharding
    takes (output not fully replicated) and matches the unsharded
    single-device computation."""
    assert "TP_ENCODER_OK" in tp_out, tp_out


def test_full_gan_step_dp_tp(tp_out):
    """FULL train step (3 D updates + G + EMA) over a (data=4, model=2)
    mesh — the DPxTP claim of train/gan.py validated end to end
    (VERDICT round 1, next #6).  Losses must be finite."""
    assert "TP_FULL_STEP_OK" in tp_out, tp_out
