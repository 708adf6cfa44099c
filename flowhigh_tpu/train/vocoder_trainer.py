"""BigVGAN vocoder GAN trainer.

The reference vendors the BigVGAN discriminators and GAN losses but not the
vocoder training loop (reference: src/flowhigh/models/bigvgan/models.py:207-381
— training-only, unused by the SR pipeline, which loads a frozen published
generator). This trainer completes that capability TPU-natively: one jitted
step alternating discriminator and generator updates over a data-parallel
mesh, with the standard BigVGAN objective — LS-GAN adversarial + feature
matching + 45x L1 mel-reconstruction loss.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import MelConfig, VocoderConfig
from ..models import BigVGAN
from ..models.discriminators import (MultiPeriodDiscriminator,
                                     MultiResolutionDiscriminator,
                                     discriminator_loss, feature_loss,
                                     generator_loss)
from ..models.melvoco import encode as mel_encode
from ..parallel import batch_sharding, make_mesh, replicated_sharding, shard_batch


class VocoderTrainState(struct.PyTreeNode):
    step: jax.Array
    gen_params: Any
    mpd_params: Any
    mrd_params: Any
    gen_opt: Any
    disc_opt: Any


class VocoderTrainer:
    def __init__(
        self,
        voc_cfg: VocoderConfig = VocoderConfig(),
        mel_cfg: MelConfig = MelConfig(),
        mesh=None,
        lr: float = 2e-4,
        adam_b1: float = 0.8,
        adam_b2: float = 0.99,
        mel_loss_weight: float = 45.0,
        segment_frames: int = 32,  # mel frames per training segment
        results_folder: str = "./vocoder_results",
        periods=None,
        resolutions=None,
    ):
        self.voc_cfg = voc_cfg
        self.mel_cfg = mel_cfg
        self.mesh = mesh if mesh is not None else make_mesh(n_data=1, n_model=1)
        self.gen = BigVGAN(voc_cfg)
        self.mpd = (MultiPeriodDiscriminator(periods=tuple(periods))
                    if periods else MultiPeriodDiscriminator())
        self.mrd = (MultiResolutionDiscriminator(resolutions=tuple(resolutions))
                    if resolutions else MultiResolutionDiscriminator())
        self.gen_tx = optax.adam(lr, b1=adam_b1, b2=adam_b2)
        self.disc_tx = optax.adam(lr, b1=adam_b1, b2=adam_b2)
        self.mel_loss_weight = mel_loss_weight
        self.segment_frames = segment_frames
        self.results_folder = Path(results_folder)
        self._step_fn = None

    @property
    def segment_samples(self) -> int:
        return self.segment_frames * self.mel_cfg.hop_length

    def init_state(self, rng: jax.Array) -> VocoderTrainState:
        r1, r2, r3 = jax.random.split(rng, 3)
        mel = jnp.zeros((1, self.segment_frames, self.voc_cfg.num_mels))
        wav = jnp.zeros((1, self.segment_samples))
        gen_params = self.gen.init(r1, mel)
        mpd_params = self.mpd.init(r2, wav, wav)
        mrd_params = self.mrd.init(r3, wav, wav)
        state = VocoderTrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params, mpd_params=mpd_params, mrd_params=mrd_params,
            gen_opt=self.gen_tx.init(gen_params),
            disc_opt=self.disc_tx.init({"mpd": mpd_params, "mrd": mrd_params}),
        )
        rep = replicated_sharding(self.mesh)
        return jax.device_put(state, jax.tree.map(lambda _: rep, state))

    def _make_step(self):
        mel_cfg = self.mel_cfg

        def disc_loss_fn(disc_params, gen_params, wav, mel):
            fake = self.gen.apply(gen_params, mel)
            fake = jax.lax.stop_gradient(fake[:, : wav.shape[1]])
            o_r, o_g, _, _ = self.mpd.apply(disc_params["mpd"], wav, fake)
            l_mpd, _, _ = discriminator_loss(o_r, o_g)
            o_r, o_g, _, _ = self.mrd.apply(disc_params["mrd"], wav, fake)
            l_mrd, _, _ = discriminator_loss(o_r, o_g)
            return l_mpd + l_mrd

        def gen_loss_fn(gen_params, disc_params, wav, mel):
            fake = self.gen.apply(gen_params, mel)[:, : wav.shape[1]]
            o_r, o_g, f_r, f_g = self.mpd.apply(disc_params["mpd"], wav, fake)
            l_gen_mpd, _ = generator_loss(o_g)
            l_fm_mpd = feature_loss(f_r, f_g)
            o_r2, o_g2, f_r2, f_g2 = self.mrd.apply(disc_params["mrd"], wav, fake)
            l_gen_mrd, _ = generator_loss(o_g2)
            l_fm_mrd = feature_loss(f_r2, f_g2)
            mel_fake = mel_encode(fake, mel_cfg)
            mel_real = mel_encode(wav, mel_cfg)
            l_mel = jnp.mean(jnp.abs(mel_fake - mel_real)) * self.mel_loss_weight
            total = l_gen_mpd + l_gen_mrd + l_fm_mpd + l_fm_mrd + l_mel
            return total, {"gen_loss": total, "mel_l1": l_mel}

        def step(state: VocoderTrainState, wav, mel):
            disc_params = {"mpd": state.mpd_params, "mrd": state.mrd_params}
            d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(
                disc_params, state.gen_params, wav, mel)
            d_updates, disc_opt = self.disc_tx.update(d_grads, state.disc_opt,
                                                      disc_params)
            disc_params = optax.apply_updates(disc_params, d_updates)

            (g_loss, aux), g_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
                state.gen_params, disc_params, wav, mel)
            g_updates, gen_opt = self.gen_tx.update(g_grads, state.gen_opt,
                                                    state.gen_params)
            gen_params = optax.apply_updates(state.gen_params, g_updates)

            new = state.replace(
                step=state.step + 1, gen_params=gen_params,
                mpd_params=disc_params["mpd"], mrd_params=disc_params["mrd"],
                gen_opt=gen_opt, disc_opt=disc_opt)
            return new, {"disc_loss": d_loss, **aux}

        data_sh = batch_sharding(self.mesh)
        rep = replicated_sharding(self.mesh)
        return jax.jit(step, in_shardings=(None, data_sh, data_sh),
                       out_shardings=(None, rep), donate_argnums=(0,))

    def train_step(self, state: VocoderTrainState, batch: dict):
        """batch: {'wave': [B, segment_samples]} 48 kHz segments."""
        if self._step_fn is None:
            self._step_fn = self._make_step()
        wav = np.asarray(batch["wave"])[:, : self.segment_samples]
        mel = mel_encode(jnp.asarray(wav), self.mel_cfg)[:, : self.segment_frames]
        b = shard_batch(self.mesh, {"wave": wav, "mel": np.asarray(mel)})
        return self._step_fn(state, b["wave"], b["mel"])

    # -- checkpointing ----------------------------------------------------------

    def latest_checkpoint(self) -> Optional[Path]:
        """Newest orbax checkpoint dir in the results folder (by step)."""
        cands = sorted(self.results_folder.glob("orbax_*"),
                       key=lambda p: int(p.name.split("_")[-1]))
        return cands[-1] if cands else None

    def save(self, state: VocoderTrainState, folder: Optional[Path] = None):
        """orbax full GAN state (G + D params, both optimizer states, step)
        for bit-identical resume, plus the reference's ``g_{step:08d}``
        torch package ``{'generator': ...}`` in weight-normed layout
        (reference: bigvgan/utils.py:57-64 save_checkpoint,
        init_vocoder.py:14-17 load)."""
        folder = Path(folder or self.results_folder)
        folder.mkdir(parents=True, exist_ok=True)
        step = int(state.step)

        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save((folder / f"orbax_{step}").absolute(), jax.device_get({
                "gen_params": state.gen_params,
                "mpd_params": state.mpd_params,
                "mrd_params": state.mrd_params,
                "gen_opt": state.gen_opt, "disc_opt": state.disc_opt,
                "step": step}))

        import torch

        from ..compat.torch_ckpt import vocoder_params_to_torch_state
        torch.save({"generator": vocoder_params_to_torch_state(
            jax.device_get(state.gen_params), self.voc_cfg)},
            folder / f"g_{step:08d}")

    def restore_state(self, path, template: VocoderTrainState) -> VocoderTrainState:
        """Restore the FULL GAN training state from an orbax dir.
        ``template`` (a fresh init_state) supplies the pytree structure."""
        import orbax.checkpoint as ocp
        tpl = jax.device_get({
            "gen_params": template.gen_params,
            "mpd_params": template.mpd_params,
            "mrd_params": template.mrd_params,
            "gen_opt": template.gen_opt, "disc_opt": template.disc_opt,
            "step": int(template.step)})
        with ocp.StandardCheckpointer() as ckptr:
            r = ckptr.restore(Path(path).absolute(), tpl)
        state = template.replace(
            step=jnp.asarray(r["step"], jnp.int32),
            gen_params=r["gen_params"], mpd_params=r["mpd_params"],
            mrd_params=r["mrd_params"], gen_opt=r["gen_opt"],
            disc_opt=r["disc_opt"])
        rep = replicated_sharding(self.mesh)
        return jax.device_put(state, jax.tree.map(lambda _: rep, state))

    # -- loop -------------------------------------------------------------------

    def fit(self, data_iter: Iterator[dict], state: Optional[VocoderTrainState] = None,
            num_steps: int = 1000, log_every: int = 10, log_fn=print,
            save_every: int = 0, auto_resume: bool = False):
        """``save_every > 0`` checkpoints into ``results_folder`` (orbax full
        state + reference ``g_{step}`` package); ``auto_resume`` restarts
        from the newest checkpoint there — preemption-safe GAN training,
        mirroring the CFM Trainer."""
        if state is None:
            state = self.init_state(jax.random.PRNGKey(0))
            if auto_resume:
                ckpt = self.latest_checkpoint()
                if ckpt is not None:
                    log_fn(f"[vocoder] auto-resuming from {ckpt}")
                    state = self.restore_state(ckpt, state)
        t0 = time.time()
        start = int(state.step)
        for i in range(start, num_steps):
            state, m = self.train_step(state, next(data_iter))
            if (i + 1) % log_every == 0:
                log_fn(f"[vocoder] step {i+1} "
                       f"disc={float(m['disc_loss']):.3f} "
                       f"gen={float(m['gen_loss']):.3f} "
                       f"mel_l1={float(m['mel_l1']):.3f} "
                       f"({(i+1-start)/(time.time()-t0):.2f} it/s)")
            if save_every and (i + 1) % save_every == 0:
                self.save(state)
        return state
