"""End-to-end GAN train-step tests on the 8-virtual-device CPU mesh.

Mirrors the reference's only 'test' for the train loop — running a step and
eyeballing the losses (SURVEY.md §4) — but automated: one jitted step over a
sharded batch must produce finite losses, update every parameter group, and
move the EMA shadow by (1 - 0.999) of the param delta.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_gan_tpu.config import cfg_from_dict
from sba_gan_tpu.parallel import batch_sharding, make_mesh, replicated
from sba_gan_tpu.train import (

    build_models,
    init_gan_state,
    make_gan_train_step,
    make_sample_fn,
)

pytestmark = pytest.mark.slow  # compiles jitted steps / subprocess meshes (quick tier: -m 'not slow')

N_WORDS = 30


def tiny_cfg(**overrides):
    d = {
        "TREE": {"BRANCH_NUM": 2, "BASE_SIZE": 64},
        "TRAIN": {"BATCH_SIZE": 8},
        "GAN": {"GF_DIM": 8, "DF_DIM": 8, "Z_DIM": 8, "W_DIM": 16,
                "CONDITION_DIM": 8, "R_NUM": 1},
        "TEXT": {"EMBEDDING_DIM": 32, "WORDS_NUM": 6},
        "MODEL": {"INCEPTION_INPUT": 75},
    }
    cfg = cfg_from_dict(d)
    for k, v in overrides.items():
        node = cfg
        *path, last = k.split(".")
        for p in path:
            node = node[p]
        node[last] = v
    return cfg


def make_batch(cfg, rng, b):
    imgs = tuple(
        rng.uniform(-1, 1, (b, cfg.TREE.BASE_SIZE * 2 ** i,
                            cfg.TREE.BASE_SIZE * 2 ** i, 3)).astype(np.float32)
        for i in range(cfg.TREE.BRANCH_NUM)
    )
    t = cfg.TEXT.WORDS_NUM
    cap_lens = rng.integers(2, t + 1, (b,)).astype(np.int32)
    captions = np.zeros((b, t), np.int32)
    for i, l in enumerate(cap_lens):
        captions[i, :l] = rng.integers(1, N_WORDS, (l,))
    class_ids = rng.integers(0, 5, (b,)).astype(np.int32)
    return imgs, captions, cap_lens, class_ids


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    models = build_models(cfg, N_WORDS)
    state = init_gan_state(cfg, models, jax.random.PRNGKey(0))
    return cfg, models, state


@pytest.fixture(scope="module")
def step_jit(setup):
    """ONE compiled train step shared module-wide (suite wall-clock: the
    step compile dominates; a single jit object also lets the sharded tests
    hit the executable cache when shardings repeat)."""
    cfg, models, _ = setup
    return jax.jit(make_gan_train_step(cfg, models))


@pytest.fixture(scope="module")
def one_step(setup, step_jit):
    """(new_state, logs) of one step — shared by the finiteness/EMA tests."""
    cfg, models, state = setup
    rng = np.random.default_rng(1234)
    imgs, captions, cap_lens, class_ids = make_batch(cfg, rng, 8)
    return step_jit(state, imgs, captions, cap_lens, class_ids,
                    jax.random.PRNGKey(1))


def test_single_step_finite_losses(setup, one_step):
    cfg, models, state = setup
    new_state, logs = one_step
    for k, v in logs.items():
        assert np.isfinite(float(v)), f"{k} not finite: {v}"
    assert int(new_state.step) == 1
    # every trainable group moved
    def moved(a, b):
        return any(
            not np.allclose(x, y)
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )
    assert moved(state.g.params, new_state.g.params)
    for old, new in zip(state.ds, new_state.ds):
        assert moved(old.params, new.params)
    # frozen encoders untouched
    assert all(
        np.allclose(x, y)
        for x, y in zip(jax.tree.leaves(state.text), jax.tree.leaves(new_state.text))
    )


def test_ema_tracks_params(setup, one_step):
    cfg, models, state = setup
    new_state, _ = one_step
    # ema = 0.999*old_param + 0.001*new_param, with ema initialized to old.
    leaves_old = jax.tree.leaves(state.g.params)
    leaves_new = jax.tree.leaves(new_state.g.params)
    leaves_ema = jax.tree.leaves(new_state.g_ema)
    for o, n, e in zip(leaves_old, leaves_new, leaves_ema):
        np.testing.assert_allclose(e, 0.999 * o + 0.001 * n, rtol=1e-4, atol=1e-6)


@pytest.fixture(scope="module")
def gan_sharded_out(mesh_case):
    """One subprocess compiles the step once and runs BOTH the sharded
    finiteness case and the sharded-vs-unsharded equivalence case
    (_mesh_cases.py gan_sharded) — isolated because XLA-CPU's in-process
    collectives abort() the whole process on a hardcoded 40 s rendezvous
    miss, which this host's bursty core can trigger mid-suite."""
    return mesh_case("gan_sharded")


def test_step_sharded_over_mesh(gan_sharded_out):
    """The same step jitted with batch sharded over the 8-device data axis
    (params replicated) — validates the SPMD path the reference never had."""
    assert "GAN_SHARDED_FINITE_OK" in gan_sharded_out, gan_sharded_out


def test_sharded_step_matches_unsharded(gan_sharded_out):
    """Numerical SPMD invariant (VERDICT round 1, next #5): one train step
    on a single device equals the same step with the batch sharded over the
    8-device data axis — same losses, same updated params.  This pins the
    global (sync) BatchNorm claim: sharded-batch mean/var reductions inside
    jit are global, so statistics match the unsharded full batch."""
    assert "GAN_SHARDED_EQUIV_OK" in gan_sharded_out, gan_sharded_out


def test_sample_fn(setup, rng):
    cfg, models, state = setup
    sample = jax.jit(make_sample_fn(cfg, models))
    _, captions, cap_lens, _ = make_batch(cfg, rng, 4)
    fakes, att = sample(state, captions, cap_lens, jax.random.PRNGKey(4))
    assert len(fakes) == cfg.TREE.BRANCH_NUM
    assert fakes[0].shape == (4, 64, 64, 3)
    assert fakes[1].shape == (4, 128, 128, 3)
    assert np.isfinite(np.asarray(fakes[-1])).all()
    assert len(att) == cfg.TREE.BRANCH_NUM - 1


def test_chunked_damsm_matches_unchunked(rng):
    """DAMSM_CHUNKS + REMAT_IMAGE_ENCODER are pure memory levers: losses
    must match the fused pass."""
    cfg_a = tiny_cfg(**{"TREE.BRANCH_NUM": 1})
    cfg_b = tiny_cfg(**{"TREE.BRANCH_NUM": 1, "JAX.DAMSM_CHUNKS": 2,
                        "JAX.REMAT_IMAGE_ENCODER": True})
    models = build_models(cfg_a, N_WORDS)
    state = init_gan_state(cfg_a, models, jax.random.PRNGKey(0))
    imgs, captions, cap_lens, class_ids = make_batch(cfg_a, rng, 8)
    args = (state, imgs, captions, cap_lens, class_ids, jax.random.PRNGKey(9))
    _, logs_a = jax.jit(make_gan_train_step(cfg_a, models))(*args)
    _, logs_b = jax.jit(make_gan_train_step(cfg_b, models))(*args)
    for k in logs_a:
        np.testing.assert_allclose(float(logs_b[k]), float(logs_a[k]),
                                   rtol=1e-3, atol=1e-3, err_msg=k)


def test_grad_accumulation(rng):
    """GRAD_ACCUM=2: optimizers apply every 2 micro-steps (optax.MultiSteps)
    — params frozen after step 1, moved after step 2."""
    cfg = tiny_cfg(**{"TRAIN.GRAD_ACCUM": 2, "TREE.BRANCH_NUM": 1})
    models = build_models(cfg, N_WORDS)
    state = init_gan_state(cfg, models, jax.random.PRNGKey(0))
    step = jax.jit(make_gan_train_step(cfg, models))
    imgs, captions, cap_lens, class_ids = make_batch(cfg, rng, 8)
    s1, _ = step(state, imgs, captions, cap_lens, class_ids, jax.random.PRNGKey(7))
    unchanged = all(
        np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(state.g.params), jax.tree.leaves(s1.g.params))
    )
    assert unchanged, "params must not move on the first micro-step"
    s2, _ = step(s1, imgs, captions, cap_lens, class_ids, jax.random.PRNGKey(7))
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(s1.g.params), jax.tree.leaves(s2.g.params))
    )
    assert moved, "params must move once the accumulation window closes"
    # EMA commits once per window: frozen micro-step must not decay it
    assert all(
        np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(state.g_ema), jax.tree.leaves(s1.g_ema))
    ), "EMA must not fold frozen params mid-window"
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(s1.g_ema), jax.tree.leaves(s2.g_ema))
    ), "EMA must fold the committed update"


def test_grad_accumulation_dfresh(rng):
    """GRAD_ACCUM_MODE='dfresh': D updates on EVERY micro-batch (the
    reference's per-batch alternation) while G accumulates over the
    window."""
    cfg = tiny_cfg(**{"TRAIN.GRAD_ACCUM": 2,
                      "TRAIN.GRAD_ACCUM_MODE": "dfresh",
                      "TREE.BRANCH_NUM": 1})
    models = build_models(cfg, N_WORDS)
    state = init_gan_state(cfg, models, jax.random.PRNGKey(0))
    step = jax.jit(make_gan_train_step(cfg, models))
    imgs, captions, cap_lens, class_ids = make_batch(cfg, rng, 8)
    s1, _ = step(state, imgs, captions, cap_lens, class_ids, jax.random.PRNGKey(7))
    g_frozen = all(
        np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(state.g.params), jax.tree.leaves(s1.g.params))
    )
    assert g_frozen, "G must not move on the first micro-step"
    d_moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(state.ds[0].params),
                        jax.tree.leaves(s1.ds[0].params))
    )
    assert d_moved, "D must update on every micro-batch in dfresh mode"
    s2, _ = step(s1, imgs, captions, cap_lens, class_ids, jax.random.PRNGKey(7))
    g_moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(s1.g.params), jax.tree.leaves(s2.g.params))
    )
    assert g_moved, "G must commit when the window closes"


def test_dcgan_step(rng):
    """B_DCGAN variant: one G trunk, one final-scale D with no
    unconditional head (reference trainer.py:77-86)."""
    cfg = tiny_cfg(**{"GAN.B_DCGAN": True, "TREE.BRANCH_NUM": 2})
    models = build_models(cfg, N_WORDS)
    assert len(models.discriminators) == 1
    state = init_gan_state(cfg, models, jax.random.PRNGKey(0))
    step = jax.jit(make_gan_train_step(cfg, models))
    imgs, captions, cap_lens, class_ids = make_batch(cfg, rng, 8)
    new_state, logs = step(state, imgs, captions, cap_lens, class_ids,
                           jax.random.PRNGKey(6))
    assert np.isfinite(float(logs["errG"]))
    assert np.isfinite(float(logs["errD0"]))
    assert "errD1" not in logs


def test_style_mixing_step(rng):
    """G_NET_MIX path: z is (2, B, Z), stage-2/3 get different w codes
    (reference trainer_bert.py:226-232, model_bert.py:485-541)."""
    cfg = tiny_cfg(**{"TRAIN.MIXING": True, "GAN.INIT_Z_CONCAT": False,
                      "TREE.BRANCH_NUM": 3, "GAN.M_NUM": 8})
    models = build_models(cfg, N_WORDS)
    state = init_gan_state(cfg, models, jax.random.PRNGKey(0))
    step = jax.jit(make_gan_train_step(cfg, models))
    imgs, captions, cap_lens, class_ids = make_batch(cfg, rng, 8)
    new_state, logs = step(state, imgs, captions, cap_lens, class_ids,
                           jax.random.PRNGKey(5))
    assert np.isfinite(float(logs["errG"]))
    assert np.isfinite(float(logs["errD2"]))


def test_multistep_matches_sequential_steps():
    """make_gan_train_multistep(K) must reproduce K sequential step() calls
    exactly (same rng folding on state.step)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sba_gan_tpu.config import cfg_from_dict
    from sba_gan_tpu.train import (
        build_models,
        init_gan_state,
        make_gan_train_multistep,
        make_gan_train_step,
    )

    cfg = cfg_from_dict({
        "TREE": {"BRANCH_NUM": 1, "BASE_SIZE": 64},
        "GAN": {"GF_DIM": 8, "DF_DIM": 8, "Z_DIM": 8, "W_DIM": 16,
                "CONDITION_DIM": 8, "R_NUM": 1},
        "TEXT": {"EMBEDDING_DIM": 32, "WORDS_NUM": 6},
        "TRAIN": {"BATCH_SIZE": 2},
        "MODEL": {"INCEPTION_INPUT": 75},
    })
    models = build_models(cfg, 50)
    state_a = init_gan_state(cfg, models, jax.random.PRNGKey(0))
    state_b = jax.tree.map(jnp.asarray, state_a)

    k, b, t = 3, 2, 6
    rng = np.random.default_rng(0)
    imgs = (jnp.asarray(
        rng.uniform(-1, 1, (k, b, 64, 64, 3)).astype(np.float32)),)
    caps = np.zeros((k, b, t), np.int32)
    lens = rng.integers(2, t + 1, (k, b)).astype(np.int32)
    for i in range(k):
        for j in range(b):
            caps[i, j, :lens[i, j]] = rng.integers(1, 50, (lens[i, j],))
    caps = jnp.asarray(caps)
    lens = jnp.asarray(lens)
    cids = jnp.asarray(rng.integers(0, 5, (k, b)).astype(np.int32))
    key = jax.random.PRNGKey(1)

    step = jax.jit(make_gan_train_step(cfg, models))
    for i in range(k):
        state_a, logs_a = step(state_a, (imgs[0][i],), caps[i], lens[i],
                               cids[i], key)

    multi = jax.jit(make_gan_train_multistep(cfg, models, k))
    state_b, logs_b = multi(state_b, imgs, caps, lens, cids, key)

    np.testing.assert_allclose(float(logs_a["errG"]), float(logs_b["errG"]),
                               rtol=1e-5)
    # scan vs unrolled compilations reassociate float reductions; parity
    # is semantic (identical rng/data/update order), not bitwise
    for a, c in zip(jax.tree_util.tree_leaves(state_a.g.params),
                    jax.tree_util.tree_leaves(state_b.g.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=0, atol=1e-3)


def test_staged_generator_remat_matches_plain(rng):
    """REMAT_GENERATOR with mode='stages' (save only the checkpoint_name
    'g_stage' boundaries) is a pure memory lever: one step's losses must
    match the no-remat step, and so must mode='full'."""
    cfg_a = tiny_cfg(**{"TREE.BRANCH_NUM": 2})
    models = build_models(cfg_a, N_WORDS)
    state = init_gan_state(cfg_a, models, jax.random.PRNGKey(0))
    imgs, captions, cap_lens, class_ids = make_batch(cfg_a, rng, 8)
    args = (state, imgs, captions, cap_lens, class_ids, jax.random.PRNGKey(9))
    _, logs_a = jax.jit(make_gan_train_step(cfg_a, models))(*args)
    for mode in ("stages", "full"):
        cfg_b = tiny_cfg(**{"TREE.BRANCH_NUM": 2,
                            "JAX.REMAT_GENERATOR": True,
                            "JAX.REMAT_GENERATOR_MODE": mode})
        _, logs_b = jax.jit(make_gan_train_step(cfg_b, models))(*args)
        for k in logs_a:
            np.testing.assert_allclose(float(logs_b[k]), float(logs_a[k]),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"{mode}:{k}")


def test_blocks_encoder_remat_matches_full(rng):
    """REMAT_IMAGE_ENCODER_MODE='blocks' (save only the checkpoint_name
    'enc_block' Mixed outputs, recompute the stem), its dual 'stem' (save
    everything EXCEPT the tagged stem activations, recompute only the
    stem), and 'full' are pure memory/flops trades: one step's losses
    must match the no-remat step for every mode."""
    cfg_a = tiny_cfg(**{"TREE.BRANCH_NUM": 1})
    models = build_models(cfg_a, N_WORDS)
    state = init_gan_state(cfg_a, models, jax.random.PRNGKey(0))
    imgs, captions, cap_lens, class_ids = make_batch(cfg_a, rng, 8)
    args = (state, imgs, captions, cap_lens, class_ids, jax.random.PRNGKey(9))
    _, logs_a = jax.jit(make_gan_train_step(cfg_a, models))(*args)
    for mode in ("full", "blocks", "stem"):
        cfg_b = tiny_cfg(**{"TREE.BRANCH_NUM": 1,
                            "JAX.REMAT_IMAGE_ENCODER": True,
                            "JAX.REMAT_IMAGE_ENCODER_MODE": mode})
        _, logs_b = jax.jit(make_gan_train_step(cfg_b, models))(*args)
        for k in logs_a:
            np.testing.assert_allclose(float(logs_b[k]), float(logs_a[k]),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"{mode}:{k}")
