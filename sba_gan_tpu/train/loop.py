"""GAN training orchestration (host-side loop around the jitted step).

Capability parity with the reference ``condGANTrainer``
(AttnGAN2/code/trainer.py:28-518 / trainer_bert.py):

* ``train()`` — epoch x batch loop, loss-string prints every 100 steps,
  EMA-weight attention-grid dumps every 1000 steps (trainer.py:277,301-310),
  epoch wall-clock timing (:316-322), snapshots every SNAPSHOT_INTERVAL
  epochs + final (:324-327).
* ``sampling(split)`` — bulk test-set sampler writing final-stage PNGs
  ``{out}/valid/single/{key}_s-1.png`` (trainer.py:348-430).
* ``gen_example(data_dic)`` — free-text captions -> per-stage images + word
  attention overlays (trainer.py:432-518); with MIXING, the _AB/_BA swapped
  noise-order variants (trainer_bert.py:459-566).

The step itself is the single-jit SPMD function from
:mod:`sba_gan_tpu.train.gan`; this module only feeds it sharded batches and
handles IO (checkpoints via Orbax, images via PIL).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sba_gan_tpu.data.pipeline import DataLoader
from sba_gan_tpu.parallel import batch_sharding, make_mesh, replicated
from sba_gan_tpu.train.gan import (
    build_models,
    init_gan_state,
    make_gan_train_step,
    make_sample_fn,
)
from sba_gan_tpu.utils.checkpoint import Checkpointer
from sba_gan_tpu.utils.image import mkdir_p, save_image
from sba_gan_tpu.utils.profiling import StepTimer
from sba_gan_tpu.utils.viz import build_super_images, build_super_images2


class GANTrainer:
    """Reference condGANTrainer, TPU-native."""

    def __init__(
        self,
        cfg,
        output_dir: str,
        dataset,
        n_words: int,
        ixtoword: Dict[int, str],
        text_variables=None,
        image_variables=None,
        log_every: int = 100,
        image_every: int = 1000,
    ):
        self.cfg = cfg
        self.output_dir = output_dir
        self.model_dir = os.path.join(output_dir, "Model")
        self.image_dir = os.path.join(output_dir, "Image")
        if cfg.TRAIN.FLAG:
            mkdir_p(self.model_dir)
            mkdir_p(self.image_dir)
        self.dataset = dataset
        self.n_words = n_words
        self.ixtoword = ixtoword
        self.log_every = log_every
        self.image_every = image_every

        self.mesh = make_mesh(cfg)
        self.batch_sharding = batch_sharding(self.mesh)
        self.replicated = replicated(self.mesh)

        self.models = build_models(cfg, n_words)
        rng = jax.random.PRNGKey(cfg.JAX.SEED)
        self.state = init_gan_state(
            cfg,
            self.models,
            rng,
            text_variables=text_variables,
            image_variables=image_variables,
        )
        self.state = jax.device_put(self.state, self.replicated)
        # No buffer donation: the XLA CPU in-process communicator deadlocks
        # on donated buffers feeding collectives, and the axon TPU tunnel
        # fails donated programs with an async InvalidArgument (verified by
        # per-variant isolation).  Peak-HBM headroom is ample at these model
        # sizes; revisit donation on direct (non-tunneled) TPU runtimes.
        self.step_fn = jax.jit(
            make_gan_train_step(cfg, self.models, mesh=self.mesh))
        self.unroll = max(1, cfg.JAX.TRAIN_UNROLL)
        if self.unroll > 1:
            from sba_gan_tpu.train.gan import make_gan_train_multistep

            self.multistep_fn = jax.jit(make_gan_train_multistep(
                cfg, self.models, self.unroll, mesh=self.mesh))
            # (unroll, batch, ...) inputs: batch dim sharded on 'data'
            self.stacked_sharding = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec(None, "data"))
        _sample = make_sample_fn(cfg, self.models)
        self.sample_fn = jax.jit(_sample)
        self.sample_noise_fn = jax.jit(_sample.with_noise)
        self.ckpt = Checkpointer(self.model_dir) if cfg.TRAIN.FLAG else None
        self.start_epoch = 0

    # ---- checkpointing ----------------------------------------------------
    def save_model(self, epoch: int, wait: bool = False):
        self.ckpt.save(epoch, self.state, wait=wait)
        print(f"Save G/Ds models @ epoch {epoch} -> {self.model_dir}")

    def resume(self) -> bool:
        """Resume from the latest snapshot in the output dir, if any
        (reference parses the epoch from cfg.TRAIN.NET_G, trainer.py:105-122)."""
        if self.ckpt is None or self.ckpt.latest_step() is None:
            return False
        epoch = self.ckpt.latest_step()
        self.state = self.ckpt.restore(self.state, epoch)
        self.start_epoch = epoch + 1
        print(f"Resumed from epoch {epoch}")
        return True

    def load_torch_weights(
        self,
        net_g: Optional[str] = None,
        net_e_text: Optional[str] = None,
        net_e_image: Optional[str] = None,
    ):
        """Import reference PyTorch checkpoints (reference loads
        cfg.TRAIN.NET_G / NET_E into the torch modules, trainer.py:48-122).
        netG .pth files carry EMA weights (saved swapped-in,
        trainer.py:159-170), so both g.params and g_ema receive them."""
        from sba_gan_tpu.utils.torch_port import (
            load_torch_state_dict,
            port_cnn_encoder,
            port_g_net,
            port_rnn_encoder,
        )

        state = self.state
        if net_g:
            params, stats = port_g_net(load_torch_state_dict(net_g))
            g = state.g.replace(params=params, batch_stats=stats)
            state = state.replace(g=g, g_ema=jax.tree.map(np.asarray, params))
        if net_e_text:
            params = port_rnn_encoder(load_torch_state_dict(net_e_text))
            state = state.replace(text={"params": params})
        if net_e_image:
            params, stats = port_cnn_encoder(load_torch_state_dict(net_e_image))
            state = state.replace(
                image={"params": params, "batch_stats": stats}
            )
        self.state = jax.device_put(state, self.replicated)

    # ---- train loop -------------------------------------------------------
    def train(self, max_epoch: Optional[int] = None):
        cfg = self.cfg
        max_epoch = max_epoch if max_epoch is not None else cfg.TRAIN.MAX_EPOCH
        loader = DataLoader(
            self.dataset,
            cfg.TRAIN.BATCH_SIZE,
            shuffle=True,
            drop_last=True,
            seed=cfg.JAX.SEED,
            num_workers=cfg.WORKERS,
            sharding=self.batch_sharding,
        )
        rng = jax.random.PRNGKey(cfg.JAX.SEED + 1)
        gstep = int(self.state.step)
        timer = StepTimer()

        def run_batches(batches):
            """Dispatch a list of batches: one fused multistep when it
            fills the unroll window, single steps otherwise."""
            if len(batches) == self.unroll and self.unroll > 1:
                put = lambda x: jax.device_put(np.stack(x),
                                               self.stacked_sharding)
                imgs = tuple(
                    put([np.asarray(b.imgs[i]) for b in batches])
                    for i in range(len(batches[0].imgs)))
                self.state, logs = self.multistep_fn(
                    self.state, imgs,
                    put([np.asarray(b.captions) for b in batches]),
                    put([np.asarray(b.cap_lens) for b in batches]),
                    put([np.asarray(b.class_ids) for b in batches]),
                    rng,
                )
                return len(batches), logs
            logs = None
            for b in batches:
                self.state, logs = self.step_fn(
                    self.state, b.imgs, b.captions, b.cap_lens,
                    b.class_ids, rng,
                )
            return len(batches), logs

        for epoch in range(self.start_epoch, max_epoch):
            t0 = time.time()
            pending = []
            for batch in loader:
                pending.append(batch)
                if len(pending) < self.unroll:
                    continue
                n_done, logs = run_batches(pending)
                pending = []
                gstep += n_done
                timer.tick(cfg.TRAIN.BATCH_SIZE * n_done, n_batches=n_done)
                if gstep % self.log_every < n_done:
                    logs = {k: float(v) for k, v in logs.items()}
                    d_str = " ".join(
                        f"errD{i}: {logs.get(f'errD{i}', 0.0):.2f}"
                        for i in range(len(self.state.ds))
                    )
                    print(
                        f"[{epoch}][{gstep}] {d_str} errG: {logs['errG']:.2f} "
                        f"kl: {logs['kl_loss']:.4f} | "
                        f"{timer.ms_per_batch:.0f} ms/batch "
                        f"{timer.images_per_sec():.1f} img/s"
                    )
                if gstep % self.image_every < n_done:
                    self.save_img_results(batch, gstep)
            if pending:
                n_done, logs = run_batches(pending)
                gstep += n_done
                timer.tick(cfg.TRAIN.BATCH_SIZE * n_done, n_batches=n_done)
            print(
                f"[{epoch}/{max_epoch}] time: {time.time() - t0:.1f}s"
            )
            if (epoch + 1) % cfg.TRAIN.SNAPSHOT_INTERVAL == 0:
                self.save_model(epoch)
        self.save_model(max_epoch - 1, wait=True)

    # ---- observables ------------------------------------------------------
    def save_img_results(self, batch, gstep: int):
        """EMA-weight sample + attention grid (reference save_img_results,
        trainer.py:177-216)."""
        fakes, atts = self.sample_fn(
            self.state, batch.captions, batch.cap_lens, jax.random.PRNGKey(gstep)
        )
        save_image(
            np.asarray(fakes[-1][0]),
            os.path.join(self.image_dir, f"G_avg_{gstep}_0.png"),
        )
        if atts:
            grid = build_super_images(
                np.asarray(fakes[-2] if len(fakes) > 1 else fakes[-1]),
                np.asarray(batch.captions),
                self.ixtoword,
                np.asarray(atts[-1]),
            )
            from PIL import Image

            Image.fromarray(grid).save(
                os.path.join(self.image_dir, f"attn_{gstep}.png")
            )

    # ---- samplers ----------------------------------------------------------
    def sampling(self, split_dir: str = "valid", rounds: int = 1):
        """Bulk sampler: final-stage PNG per test item (trainer.py:348-430).
        Returns the output directory."""
        cfg = self.cfg
        out = os.path.join(self.output_dir, split_dir, "single")
        mkdir_p(out)
        loader = DataLoader(
            self.dataset,
            cfg.TRAIN.BATCH_SIZE,
            shuffle=False,
            drop_last=False,
            num_workers=cfg.WORKERS,
        )
        cnt = 0
        for r in range(rounds):
            for batch in loader:
                fakes, _ = self.sample_fn(
                    self.state,
                    batch.captions,
                    batch.cap_lens,
                    jax.random.PRNGKey(cnt + r * 100003),
                )
                final = np.asarray(fakes[-1])
                for i, key in enumerate(batch.keys):
                    name = key.replace("/", "_")
                    save_image(final[i], os.path.join(out, f"{name}_s-1.png"))
                    cnt += 1
        print(f"sampling: wrote {cnt} images -> {out}")
        return out

    def r_precision_eval(self, num_candidates: int = 100, trials: int = 3,
                         rounds: int = 1):
        """R-precision over the eval split (framework extension — the
        reference scores IS only; see evaluation/r_precision.py for the
        protocol).  Generates one image per test caption, encodes fakes
        and sentences with the DAMSM encoders held in the train state, and
        ranks each true caption against mismatched candidates.  Returns
        (mean, std) over candidate draws."""
        from sba_gan_tpu.evaluation.r_precision import r_precision_from_codes

        cfg = self.cfg
        te, ie = self.models.text_encoder, self.models.image_encoder

        @jax.jit
        def codes(state, captions, cap_lens, fake):
            _, sent = te.apply(state.text, captions, cap_lens, train=False)
            _, code = ie.apply(state.image, fake, False)
            return sent, code

        loader = DataLoader(
            self.dataset, cfg.TRAIN.BATCH_SIZE,
            shuffle=False, drop_last=False, num_workers=cfg.WORKERS,
        )
        img_codes, sent_codes, cls_ids = [], [], []
        cnt = 0
        for r in range(rounds):
            for batch in loader:
                fakes, _ = self.sample_fn(
                    self.state, batch.captions, batch.cap_lens,
                    jax.random.PRNGKey(7700 + cnt + r * 100003))
                sent, code = codes(self.state, batch.captions,
                                   batch.cap_lens, fakes[-1])
                sent_codes.append(np.asarray(sent))
                img_codes.append(np.asarray(code))
                cls_ids.append(np.asarray(batch.class_ids))
                cnt += batch.captions.shape[0]
        return r_precision_from_codes(
            np.concatenate(img_codes), np.concatenate(sent_codes),
            np.random.default_rng(0),
            num_candidates=num_candidates, trials=trials,
            class_ids=np.concatenate(cls_ids),
        )

    def gen_example(self, data_dic):
        """Free-text captions -> per-stage images + attention overlays
        (reference gen_example, trainer.py:432-518).  data_dic maps
        key -> (captions (N,T), cap_lens (N,), sorted_indices)."""
        save_root = os.path.join(self.output_dir, "gen_example")
        for key, (captions, cap_lens, _) in data_dic.items():
            save_dir = os.path.join(save_root, key)
            mkdir_p(save_dir)
            captions = np.asarray(captions, np.int32)
            cap_lens = np.asarray(cap_lens, np.int32)
            fakes, atts = self.sample_fn(
                self.state, captions, cap_lens, jax.random.PRNGKey(0)
            )
            for k, stage in enumerate(fakes):
                stage = np.asarray(stage)
                for j in range(stage.shape[0]):
                    save_image(
                        stage[j], os.path.join(save_dir, f"{j}_s_g{k}.png")
                    )
            if atts:
                grid = build_super_images2(
                    np.asarray(fakes[-1]),
                    captions,
                    cap_lens,
                    self.ixtoword,
                    np.asarray(atts[-1]),
                )
                from PIL import Image

                Image.fromarray(grid).save(
                    os.path.join(save_dir, "attention_maps.png")
                )
            if self.cfg.TRAIN.MIXING:
                self._gen_mixing_variants(save_dir, captions, cap_lens)
        return save_root

    def _gen_mixing_variants(self, save_dir, captions, cap_lens):
        """Style-mixing outputs: the two w codes injected in both orders plus
        each alone — the reference's _AB/_BA/_A/_B image sets
        (trainer_bert.py:485-548)."""
        b = captions.shape[0]
        z_dim = self.cfg.GAN.Z_DIM
        rng = jax.random.PRNGKey(self.cfg.JAX.SEED)
        r0, r1, rca = jax.random.split(rng, 3)
        z0 = jax.random.normal(r0, (b, z_dim), jnp.float32)
        z1 = jax.random.normal(r1, (b, z_dim), jnp.float32)
        variants = {
            "AB": jnp.stack([z0, z1]),
            "BA": jnp.stack([z1, z0]),
            "A": jnp.stack([z0, z0]),
            "B": jnp.stack([z1, z1]),
        }
        for tag, z in variants.items():
            fakes, _ = self.sample_noise_fn(self.state, captions, cap_lens, z, rca)
            final = np.asarray(fakes[-1])
            for j in range(final.shape[0]):
                save_image(
                    final[j], os.path.join(save_dir, f"{j}_mix_{tag}.png")
                )
