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


def test_single_step_finite_losses(setup, rng):
    cfg, models, state = setup
    step = jax.jit(make_gan_train_step(cfg, models))
    imgs, captions, cap_lens, class_ids = make_batch(cfg, rng, 8)
    new_state, logs = step(state, imgs, captions, cap_lens, class_ids,
                           jax.random.PRNGKey(1))
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


def test_ema_tracks_params(setup, rng):
    cfg, models, state = setup
    step = jax.jit(make_gan_train_step(cfg, models))
    imgs, captions, cap_lens, class_ids = make_batch(cfg, rng, 8)
    new_state, _ = step(state, imgs, captions, cap_lens, class_ids,
                        jax.random.PRNGKey(2))
    # ema = 0.999*old_param + 0.001*new_param, with ema initialized to old.
    leaves_old = jax.tree.leaves(state.g.params)
    leaves_new = jax.tree.leaves(new_state.g.params)
    leaves_ema = jax.tree.leaves(new_state.g_ema)
    for o, n, e in zip(leaves_old, leaves_new, leaves_ema):
        np.testing.assert_allclose(e, 0.999 * o + 0.001 * n, rtol=1e-4, atol=1e-6)


def test_step_sharded_over_mesh(setup, rng, cpu_devices):
    """The same step jitted with batch sharded over the 8-device data axis
    (params replicated) — validates the SPMD path the reference never had."""
    cfg, models, state = setup
    mesh = make_mesh(cfg)
    bsh = batch_sharding(mesh)
    rsh = replicated(mesh)

    step = make_gan_train_step(cfg, models)
    imgs, captions, cap_lens, class_ids = make_batch(cfg, rng, 8)
    state_sh = jax.device_put(state, rsh)
    imgs = tuple(jax.device_put(x, bsh) for x in imgs)
    captions = jax.device_put(captions, bsh)
    cap_lens = jax.device_put(cap_lens, bsh)
    class_ids = jax.device_put(class_ids, bsh)

    new_state, logs = jax.jit(step)(
        state_sh, imgs, captions, cap_lens, class_ids, jax.random.PRNGKey(3)
    )
    for k, v in logs.items():
        assert np.isfinite(float(v)), f"{k} not finite under mesh: {v}"


def test_sharded_step_matches_unsharded(setup, rng, cpu_devices):
    """Numerical SPMD invariant (VERDICT round 1, next #5): one train step
    on a single device equals the same step with the batch sharded over the
    8-device data axis — same losses, same updated params.  This pins the
    global (sync) BatchNorm claim: sharded-batch mean/var reductions inside
    jit are global, so statistics match the unsharded full batch."""
    cfg, models, state = setup
    step = make_gan_train_step(cfg, models)
    imgs, captions, cap_lens, class_ids = make_batch(cfg, rng, 8)
    key = jax.random.PRNGKey(7)

    ref_state, ref_logs = jax.jit(step)(
        state, imgs, captions, cap_lens, class_ids, key
    )

    mesh = make_mesh(cfg)
    bsh, rsh = batch_sharding(mesh), replicated(mesh)
    sh_state, sh_logs = jax.jit(step)(
        jax.device_put(state, rsh),
        tuple(jax.device_put(x, bsh) for x in imgs),
        jax.device_put(captions, bsh),
        jax.device_put(cap_lens, bsh),
        jax.device_put(class_ids, bsh),
        key,
    )

    for k in ref_logs:
        np.testing.assert_allclose(
            float(sh_logs[k]), float(ref_logs[k]), rtol=1e-3, atol=1e-4,
            err_msg=f"log {k} diverges under sharding",
        )
    for name, ref_tree, sh_tree in [
        ("g.params", ref_state.g.params, sh_state.g.params),
        ("g.batch_stats", ref_state.g.batch_stats, sh_state.g.batch_stats),
    ] + [
        (f"ds[{i}].params", r.params, s.params)
        for i, (r, s) in enumerate(zip(ref_state.ds, sh_state.ds))
    ]:
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref_tree)[0][0:],
            jax.tree_util.tree_flatten_with_path(sh_tree)[0][0:],
        ):
            # atol 5e-4: Adam normalizes grads, so a reduction-order float
            # wiggle on a near-zero grad can flip an element's full
            # +-lr*update (lr 2e-4); real desync diverges far beyond this.
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4,
                err_msg=f"{name}{jax.tree_util.keystr(path)} diverges",
            )


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
