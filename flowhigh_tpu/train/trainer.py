"""Data-parallel CFM trainer.

TPU-native re-design of the reference trainer
(reference: src/flowhigh/train/trainer.py:73-359):

- HF-Accelerate DDP becomes GSPMD: one jitted train step over a device
  ``Mesh`` with the batch sharded on the ``data`` axis and params
  replicated (or tensor-sharded over ``model``); XLA inserts the gradient
  psum that DDP did with NCCL (trainer.py:97-102).
- the autocast + clip + Adam + cosine recipe maps to optax
  (clip 0.5: trainer.py:81,298; warmup/cosine: trainer.py:139,247-267).
- checkpoints save BOTH orbax (sharded, resumable) and the reference's torch
  layout ``{'model','optim','scheduler'}`` / ``FLowHigh.{step}.pt`` naming
  (trainer.py:209-215,334-337) so torch-side tooling keeps working.
- mel encoding of target + cond happens inside the step (on device, fused
  with the loss), not in workers: only raw waveforms cross the host->device
  boundary.
"""

from __future__ import annotations

import json
import math
import time
import dataclasses
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..cfm import cfm_training_loss
from ..config import FlowHighConfig
from ..models import VectorFieldNet, mel_encode
from ..parallel import (batch_sharding, make_mesh, param_shardings,
                        replicated_sharding, shard_batch)
from .optimizer import lr_schedule, make_optimizer


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array


class Trainer:
    def __init__(
        self,
        config: FlowHighConfig = FlowHighConfig(),
        mesh=None,
        cfm_method: Optional[str] = None,
        results_folder: Optional[str] = None,
    ):
        self.config = config
        self.cfm_method = cfm_method or config.cfm.cfm_method
        # autocast analog (reference trainer.py:285): the training net runs
        # at train.amp_dtype (default bfloat16, measured 1.2-1.4x per step);
        # params/grads/loss stay f32 — see TrainConfig.amp_dtype.
        model_cfg = config.model
        if config.train.amp_dtype != model_cfg.compute_dtype:
            model_cfg = dataclasses.replace(
                model_cfg, compute_dtype=config.train.amp_dtype)
        self.net = VectorFieldNet(model_cfg)
        self.tx = make_optimizer(config.train)
        self.schedule = lr_schedule(config.train)
        self.mesh = mesh if mesh is not None else make_mesh(n_data=1, n_model=1)
        self.results_folder = Path(results_folder or config.train.save_dir)
        self._step_fn = None
        self._eval_fn = None

    # -- state ------------------------------------------------------------------

    def init_state(self, rng: jax.Array) -> TrainState:
        m = self.config.mel
        dummy = jnp.zeros((1, 8, m.n_mels))
        params = self.net.init(rng, dummy, times=jnp.zeros(()), cond=dummy)
        opt_state = self.tx.init(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=opt_state, rng=rng)
        return jax.device_put(state, self._state_shardings(state))

    def _state_shardings(self, state: TrainState):
        rep = replicated_sharding(self.mesh)
        p_sh = param_shardings(self.mesh, state.params)
        o_sh = jax.tree.map(lambda _: rep, state.opt_state)
        return TrainState(step=rep, params=p_sh, opt_state=o_sh, rng=rep)

    # -- the train step ---------------------------------------------------------

    def _loss_fn(self, params, rng, wave, cond_wav, lengths, train=True):
        cfg = self.config
        mel = cfg.mel

        # per-sample peak-norm of cond (reference: trainer.py:282-283)
        peak = jnp.max(jnp.abs(cond_wav), axis=-1, keepdims=True)
        cond_wav = cond_wav / jnp.maximum(peak, 1e-8)

        x1 = mel_encode(wave, mel)          # [B, F, M] (no grad: pure fn)
        cond = mel_encode(cond_wav, mel)

        # reference mel-length formula (trainer.py:280)
        mel_len = jnp.ceil((lengths - mel.win_length) / mel.hop_length + 1)
        mel_len = jnp.clip(mel_len.astype(jnp.int32), 1, x1.shape[1])

        return cfm_training_loss(
            self.net.apply, params, rng, x1, cond, mel_len,
            method=self.cfm_method, sigma=cfg.cfm.sigma,
            out_size=2 * mel.sampling_rate // mel.hop_length,  # 200 fr = 2 s
            cond_drop_prob=cfg.cfm.cond_drop_prob,
            weighted=cfg.train.weighted_loss,
            cond_freq_masking=cfg.train.cond_freq_masking,
            train=train)

    def _make_step(self):
        def step(state: TrainState, wave, cond_wav, lengths):
            rng, sub = jax.random.split(state.rng)
            loss, grads = jax.value_and_grad(self._loss_fn)(
                state.params, sub, wave, cond_wav, lengths)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            gnorm = optax.global_norm(grads)
            new_state = state.replace(step=state.step + 1, params=params,
                                      opt_state=opt_state, rng=rng)
            return new_state, {"loss": loss, "grad_norm": gnorm}

        data_sh = batch_sharding(self.mesh)
        rep = replicated_sharding(self.mesh)
        return jax.jit(
            step,
            in_shardings=(None, data_sh, data_sh, data_sh),
            out_shardings=(None, rep),
            donate_argnums=(0,),
        )

    def train_step(self, state: TrainState, batch: dict):
        if self._step_fn is None:
            self._step_fn = self._make_step()
        b = shard_batch(self.mesh, {k: batch[k] for k in ("wave", "cond", "lengths")})
        return self._step_fn(state, b["wave"], b["cond"], b["lengths"])

    # -- validation ---------------------------------------------------------------

    def evaluate(self, state: TrainState, batches) -> dict:
        """Validation CFM loss over held-out batches (the hook the reference
        stubbed empty, trainer.py:322-331)."""
        if self._eval_fn is None:
            data_sh = batch_sharding(self.mesh)
            rep = replicated_sharding(self.mesh)

            def eval_step(params, rng, wave, cond_wav, lengths):
                # deterministic: no dropout, no cond-drop sampling noise bias
                return self._loss_fn(params, rng, wave, cond_wav, lengths,
                                     train=False)

            self._eval_fn = jax.jit(eval_step,
                                    in_shardings=(None, None, data_sh, data_sh, data_sh),
                                    out_shardings=rep)
        losses: list = []   # host values
        pending: list = []  # device scalars awaiting one batched fetch
        rng = jax.random.PRNGKey(0)  # fixed: comparable across evals
        for i, batch in enumerate(batches):
            b = shard_batch(self.mesh,
                            {k: batch[k] for k in ("wave", "cond", "lengths")})
            # keep the per-batch losses on device — JAX dispatch is async, so
            # the loop queues batches without waiting; a windowed fetch
            # amortizes the tunnel RTT over up to 16 batches while bounding
            # dispatched-but-unfetched batches (each queued batch pins its
            # uploaded inputs in HBM until fetched — an unbounded queue OOMs
            # on long validation sets)
            pending.append(self._eval_fn(
                state.params, jax.random.fold_in(rng, i),
                b["wave"], b["cond"], b["lengths"]))
            if len(pending) >= 16:
                losses.extend(np.asarray(jax.device_get(pending), np.float64))
                pending.clear()
        if pending:
            losses.extend(np.asarray(jax.device_get(pending), np.float64))
        vals = np.asarray(losses, np.float64)
        return {"valid_loss": float(vals.mean()), "n_batches": len(losses)}

    # -- loop -------------------------------------------------------------------

    def latest_checkpoint(self) -> Optional[Path]:
        """Most recent orbax checkpoint in the results folder (by step)."""
        cands = sorted(self.results_folder.glob("orbax_*"),
                       key=lambda p: int(p.name.split("_")[-1]))
        return cands[-1] if cands else None

    def fit(
        self,
        data_iter: Iterator[dict],
        state: Optional[TrainState] = None,
        num_steps: Optional[int] = None,
        log_every: Optional[int] = None,
        save_every: Optional[int] = None,
        log_fn=print,
        auto_resume: bool = False,
        tensorboard: bool = False,
        valid_batches=None,
        eval_every: Optional[int] = None,
    ) -> TrainState:
        """``auto_resume``: restart from the newest checkpoint in the results
        folder if one exists — preemption-safe training (the reference's
        recovery is a manual path argument, trainer.py:342-351).

        ``valid_batches``: list of held-out batches (or a callable returning
        one) evaluated every ``eval_every`` steps — the reference's
        ``save_results_every`` validation cadence with the hook the reference
        left stubbed (trainer.py:322-331) actually implemented.

        Step accounting matches the reference (trainer.py:253-296): every
        count — ``num_steps``, the log/save/eval cadences, the logged lr, the
        cosine horizon — is in OPTIMIZER UPDATES. With ``grad_accum_every=k``
        each update consumes k micro-batches from ``data_iter`` (optax
        MultiSteps applies the pooled gradient on the k-th), so the loop runs
        ``num_steps*k`` micro-steps and logging/saving happens only on update
        boundaries. ``state.step`` counts micro-steps (one per train_step
        call); updates = step // k."""
        cfg = self.config.train
        k = max(cfg.grad_accum_every, 1)
        num_steps = num_steps or cfg.num_train_steps
        log_every = log_every or cfg.log_every
        save_every = save_every or cfg.save_model_every
        eval_every = eval_every or cfg.save_results_every
        if state is None:
            state = self.init_state(jax.random.PRNGKey(cfg.random_seed))
            if auto_resume:
                ckpt = self.latest_checkpoint()
                if ckpt is not None:
                    log_fn(f"[train] auto-resuming from {ckpt}")
                    state = self.restore_state(ckpt, state)
                    log_fn(f"[train] restored full state at step {int(state.step)}")

        tb_writer = None
        if tensorboard:
            try:
                import tensorflow as tf
                tb_writer = tf.summary.create_file_writer(
                    str(self.results_folder / "tb"))
            except ImportError:
                log_fn("[train] tensorboard requested but tensorflow missing")

        self.results_folder.mkdir(parents=True, exist_ok=True)
        metrics_path = self.results_folder / "metrics.jsonl"
        t0 = time.time()
        start = int(state.step)  # micro-steps (auto-resume restores these)
        for i in range(start, num_steps * k):
            batch = next(data_iter)
            state, metrics = self.train_step(state, batch)
            if (i + 1) % k:
                continue  # mid-accumulation: no optimizer update was applied
            upd = (i + 1) // k  # optimizer updates applied so far
            if upd % log_every == 0:
                loss = float(metrics["loss"])
                # the lr the update just applied: optax's schedule is driven
                # by the inner Adam count, which MultiSteps advances once per
                # update — update j (0-based) used schedule(j)
                lr = float(self.schedule(upd - 1))
                line = {"step": upd, "loss": loss, "lr": lr,
                        "grad_norm": float(metrics["grad_norm"]),
                        "steps_per_sec": (upd - start // k) / (time.time() - t0)}
                log_fn(f"[train] {line}")
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(line) + "\n")
                if tb_writer is not None:
                    import tensorflow as tf
                    with tb_writer.as_default():
                        # reference scalar names (trainer.py:305-308)
                        tf.summary.scalar("training/cfm_loss", loss, step=upd)
                        tf.summary.scalar("training/lr", lr, step=upd)
            if (valid_batches is not None and eval_every
                    and upd % eval_every == 0):
                batches = valid_batches() if callable(valid_batches) else valid_batches
                vm = self.evaluate(state, batches)
                line = {"step": upd, "valid_loss": vm["valid_loss"]}
                log_fn(f"[valid] {line}")
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(line) + "\n")
                if tb_writer is not None:
                    import tensorflow as tf
                    with tb_writer.as_default():
                        tf.summary.scalar("validation/cfm_loss",
                                          vm["valid_loss"], step=upd)
            if save_every and upd % save_every == 0:
                self.save(state)
        return state

    # -- checkpointing ----------------------------------------------------------

    def _updates(self, state: TrainState) -> int:
        """Optimizer updates applied so far: micro-steps // grad_accum_every
        (the unit the reference's step counter and schedule run in)."""
        return int(state.step) // max(self.config.train.grad_accum_every, 1)

    def save(self, state: TrainState, folder: Optional[Path] = None):
        """orbax (resumable, sharded) + torch-layout export
        (reference naming FLowHigh.{step}.pt: trainer.py:209-215). The orbax
        dir is keyed by micro-step (what resume restores); the torch export
        is keyed by optimizer updates (the reference's step unit)."""
        folder = Path(folder or self.results_folder)
        folder.mkdir(parents=True, exist_ok=True)
        step = int(state.step)

        import orbax.checkpoint as ocp
        path = (folder / f"orbax_{step}").absolute()
        tree = {"params": state.params, "opt_state": state.opt_state,
                "rng": state.rng, "step": step}
        multihost = jax.process_count() > 1
        if not multihost:
            tree = jax.device_get(tree)  # single process: plain numpy save
        with ocp.StandardCheckpointer() as ckptr:
            # multihost: every process calls save with the sharded jax.Arrays
            # and orbax coordinates the write (process 0 owns the metadata)
            ckptr.save(path, tree)

        if jax.process_index() == 0:
            self.export_torch(state,
                              folder / f"FLowHigh.{self._updates(state)}.pt")

    def restore_state(self, path, template: TrainState) -> TrainState:
        """Restore the FULL training state (params + optimizer moments + rng
        + step) from an orbax checkpoint dir, so a preempted run resumes
        bit-identically. ``template`` (a freshly initialized state) supplies
        the pytree structure orbax needs to rebuild optax namedtuples.
        Falls back to params-only for round-1-era checkpoints."""
        import orbax.checkpoint as ocp
        path = Path(path)
        if jax.process_count() > 1:
            # multihost: hand orbax the sharded template arrays so every
            # process restores exactly its addressable shards
            tpl = {"params": template.params,
                   "opt_state": template.opt_state,
                   "rng": template.rng, "step": int(template.step)}
        else:
            tpl = jax.device_get({"params": template.params,
                                  "opt_state": template.opt_state,
                                  "rng": template.rng,
                                  "step": int(template.step)})
        with ocp.StandardCheckpointer() as ckptr:
            try:
                r = ckptr.restore(path.absolute(), tpl)
                state = template.replace(
                    params=r["params"], opt_state=r["opt_state"],
                    rng=jnp.asarray(r["rng"]),
                    step=jnp.asarray(r["step"], jnp.int32))
            except (KeyError, ValueError):  # legacy {params, step} package
                r = ckptr.restore(path.absolute())
                step = int(path.name.split("_")[-1])
                state = template.replace(
                    params=jax.tree.map(jnp.asarray, r["params"]),
                    step=jnp.asarray(r.get("step", step), jnp.int32))
        return jax.device_put(state, self._state_shardings(state))

    def export_torch(self, state: TrainState, path: Path):
        """Reference checkpoint package {'model','optim','scheduler'} with
        REAL optimizer/scheduler content (reference: trainer.py:209-215), so
        the package round-trips through torch-side tooling."""
        import torch

        from ..compat.torch_ckpt import (optim_state_to_torch,
                                         params_to_torch_state,
                                         scheduler_state_to_torch)
        params = jax.device_get(state.params)
        # torch Adam's per-param 'step' and CosineAnnealingLR's last_epoch
        # both count optimizer updates, not micro-steps
        step = self._updates(state)
        sd = {k: torch.from_numpy(np.array(v)) for k, v in
              params_to_torch_state(params, self.config.model).items()}
        optim = optim_state_to_torch(params, jax.device_get(state.opt_state),
                                     self.config.model, self.config.train, step)
        sched = scheduler_state_to_torch(self.config.train, step,
                                         last_lr=float(self.schedule(step)))
        torch.save({"model": sd, "optim": optim, "scheduler": sched}, path)

    def load_params(self, path) -> Any:
        """Resume model params from an orbax dir or a torch .pt package."""
        path = Path(path)
        if path.suffix == ".pt":
            import torch

            from ..compat.torch_ckpt import map_model_state_dict
            pkg = torch.load(path, map_location="cpu", weights_only=True)
            return map_model_state_dict(pkg["model"], self.config.model)
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(path.absolute())
        return restored["params"]
