"""PyTorch checkpoint compatibility: published FLowHigh/BigVGAN weights load
into the JAX pytrees, and our pytrees export back to the torch layout.

Checkpoint schemas handled (reference):
- model package ``{'model': state_dict, 'optim': ..., 'scheduler': ...}``
  (reference: src/flowhigh/train/trainer.py:209-215, flowhighsr.py:131-136)
  whose state dict prefixes everything with ``flowhigh.`` and embeds the
  frozen vocoder under ``flowhigh.audio_enc_dec.vocoder.`` with weight norm
  already folded (remove_weight_norm runs at vocoder init,
  bigvgan/init_vocoder.py:14-17);
- vocoder package ``{'generator': state_dict}`` with weight-norm
  parametrization (``weight_g``/``weight_v``) intact
  (reference: src/flowhigh/models/bigvgan/models.py:124-204).

Layout conventions converted here (torch -> jax):
- Linear ``[out, in]``            -> Dense kernel ``[in, out]`` (transpose)
- Conv1d ``[out, in/g, K]``       -> HIO kernel ``[K, in/g, out]`` (perm 2,1,0)
- ConvTranspose1d ``[in, out, K]``-> ``[K, out, in]`` (perm 2,1,0; our
  conv_transpose1d stores the transpose orientation)
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _linear(t):
    return _to_np(t).T


def _conv(t):
    return _to_np(t).transpose(2, 1, 0)


def fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """w = g * v / ||v||, norm over all dims except 0 (torch weight_norm dim=0)."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
    return (g / norm) * v


class _StateDict:
    """Uniform accessor folding weight norm on demand."""

    def __init__(self, sd: dict, prefix: str = ""):
        self.sd = sd
        self.prefix = prefix

    def has(self, key: str) -> bool:
        return self.prefix + key in self.sd

    def raw(self, key: str) -> np.ndarray:
        return _to_np(self.sd[self.prefix + key])

    def weight(self, module: str) -> np.ndarray:
        """Plain or weight-normed conv/linear weight of ``module``."""
        if self.has(module + ".weight"):
            return self.raw(module + ".weight")
        g = self.raw(module + ".weight_g")
        v = self.raw(module + ".weight_v")
        return fold_weight_norm(g, v)


# --- vector-field network -----------------------------------------------------

def map_model_state_dict(sd: dict, model_cfg) -> dict:
    """torch FLowHigh state dict (keys under ``flowhigh.``) -> flax params."""
    keys = list(sd.keys())
    if any(k.startswith("module.") for k in keys):
        sd = {k.removeprefix("module."): v for k, v in sd.items()}
    prefix = "flowhigh." if any(k.startswith("flowhigh.") for k in sd) else ""
    if any(".1.to_qkva" in k or "gate_loop" in k for k in sd):
        raise NotImplementedError(
            "checkpoint contains gateloop_transformer weights (layers.N.1.*); "
            "this build's GateLoop is an independent jax implementation with "
            "a different parameterization — no published FLowHigh checkpoint "
            "uses gateloop layers, so there is no layout to match")
    s = _StateDict(sd, prefix)

    p: dict = {
        "null_cond": s.raw("null_cond"),
        "to_embed": {"kernel": _linear(sd[prefix + "to_embed.weight"]),
                     "bias": s.raw("to_embed.bias")},
        "conv_embed": {
            "kernel": _conv(sd[prefix + "conv_embed.dw_conv1d.0.weight"]),
            "bias": s.raw("conv_embed.dw_conv1d.0.bias"),
        },
        "sinu_pos_emb": {"weights": s.raw("sinu_pos_emb.0.weights")},
        "time_mlp": {"kernel": _linear(sd[prefix + "sinu_pos_emb.1.weight"]),
                     "bias": s.raw("sinu_pos_emb.1.bias")},
        "to_pred": {"kernel": _linear(sd[prefix + "to_pred.weight"])},
    }

    if model_cfg.architecture == "transformer":
        tr: dict = {}
        if getattr(model_cfg, "num_register_tokens", 0) > 0:
            tr["register_tokens"] = s.raw("transformer.register_tokens")
        for i in range(model_cfg.depth):
            L = f"transformer.layers.{i}."
            if s.has(L + "0.weight"):  # u-net skip combiner (transformer.py:150)
                tr[f"layers_{i}_skip_combiner"] = {
                    "kernel": _linear(sd[prefix + L + "0.weight"]),
                    "bias": s.raw(L + "0.bias"),
                }
            tr[f"layers_{i}_attn_norm"] = {
                "to_gamma": {"kernel": _linear(sd[prefix + L + "2.to_gamma.weight"]),
                             "bias": s.raw(L + "2.to_gamma.bias")},
                "to_beta": {"kernel": _linear(sd[prefix + L + "2.to_beta.weight"]),
                            "bias": s.raw(L + "2.to_beta.bias")},
            }
            attn = {
                "to_qkv": {"kernel": _linear(sd[prefix + L + "3.to_qkv.weight"])},
                "to_out": {"kernel": _linear(sd[prefix + L + "3.to_out.weight"])},
            }
            if s.has(L + "3.q_norm.gamma"):
                attn["q_norm"] = {"gamma": s.raw(L + "3.q_norm.gamma")}
                attn["k_norm"] = {"gamma": s.raw(L + "3.k_norm.gamma")}
            tr[f"layers_{i}_attn"] = attn
            tr[f"layers_{i}_ff_norm"] = {
                "to_gamma": {"kernel": _linear(sd[prefix + L + "4.to_gamma.weight"]),
                             "bias": s.raw(L + "4.to_gamma.bias")},
                "to_beta": {"kernel": _linear(sd[prefix + L + "4.to_beta.weight"]),
                            "bias": s.raw(L + "4.to_beta.bias")},
            }
            tr[f"layers_{i}_ff"] = {
                "proj_in": {"kernel": _linear(sd[prefix + L + "5.0.weight"]),
                            "bias": s.raw(L + "5.0.bias")},
                "proj_out": {"kernel": _linear(sd[prefix + L + "5.3.weight"]),
                             "bias": s.raw(L + "5.3.bias")},
            }
        tr["final_norm"] = {"gamma": s.raw("transformer.final_norm.gamma")}
        p["transformer"] = tr
    else:  # convnext
        cn: dict = {}
        for i in range(model_cfg.convnext_layers):
            L = f"convnext.{i}."
            cn[f"blocks_{i}"] = {
                "dwconv_kernel": _conv(sd[prefix + L + "dwconv.weight"]),
                "dwconv_bias": s.raw(L + "dwconv.bias"),
                "norm": {
                    "scale": {"kernel": _linear(sd[prefix + L + "norm.scale.weight"]),
                              "bias": s.raw(L + "norm.scale.bias")},
                    "shift": {"kernel": _linear(sd[prefix + L + "norm.shift.weight"]),
                              "bias": s.raw(L + "norm.shift.bias")},
                },
                "pwconv1": {"kernel": _linear(sd[prefix + L + "pwconv1.weight"]),
                            "bias": s.raw(L + "pwconv1.bias")},
                "pwconv2": {"kernel": _linear(sd[prefix + L + "pwconv2.weight"]),
                            "bias": s.raw(L + "pwconv2.bias")},
                "gamma": s.raw(L + "gamma"),
            }
        cn["final_norm_scale"] = s.raw("final_layer_norm.weight")
        cn["final_norm_bias"] = s.raw("final_layer_norm.bias")
        p["convnext"] = cn

    return {"params": _tree_to_jnp(p)}


def _tree_to_jnp(tree):
    import jax.numpy as jnp
    if isinstance(tree, dict):
        return {k: _tree_to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)


# --- vocoder -------------------------------------------------------------------

def map_vocoder_state_dict(sd: dict, voc_cfg) -> dict:
    """torch BigVGAN generator state dict -> flax params. Accepts both the
    weight-normed standalone checkpoint and the folded embedded copy."""
    s = _StateDict(sd)
    num_kernels = len(voc_cfg.resblock_kernel_sizes)

    p: dict = {
        "conv_pre_kernel": s.weight("conv_pre").transpose(2, 1, 0),
        "conv_pre_bias": s.raw("conv_pre.bias"),
        "conv_post_kernel": s.weight("conv_post").transpose(2, 1, 0),
        "conv_post_bias": s.raw("conv_post.bias"),
        "activation_post": _act_params(s, "activation_post", voc_cfg),
    }
    for i in range(len(voc_cfg.upsample_rates)):
        p[f"ups_{i}_kernel"] = s.weight(f"ups.{i}.0").transpose(2, 1, 0)
        p[f"ups_{i}_bias"] = s.raw(f"ups.{i}.0.bias")

    n_blocks = len(voc_cfg.upsample_rates) * num_kernels
    for n in range(n_blocks):
        B = f"resblocks.{n}"
        blk: dict = {}
        if voc_cfg.resblock == "1":
            for j in range(len(voc_cfg.resblock_dilation_sizes[n % num_kernels])):
                blk[f"convs1_{j}_kernel"] = s.weight(f"{B}.convs1.{j}").transpose(2, 1, 0)
                blk[f"convs1_{j}_bias"] = s.raw(f"{B}.convs1.{j}.bias")
                blk[f"convs2_{j}_kernel"] = s.weight(f"{B}.convs2.{j}").transpose(2, 1, 0)
                blk[f"convs2_{j}_bias"] = s.raw(f"{B}.convs2.{j}.bias")
                blk[f"act1_{j}"] = _act_params(s, f"{B}.activations.{2 * j}", voc_cfg)
                blk[f"act2_{j}"] = _act_params(s, f"{B}.activations.{2 * j + 1}", voc_cfg)
        else:
            for j in range(len(voc_cfg.resblock_dilation_sizes[n % num_kernels])):
                blk[f"convs_{j}_kernel"] = s.weight(f"{B}.convs.{j}").transpose(2, 1, 0)
                blk[f"convs_{j}_bias"] = s.raw(f"{B}.convs.{j}.bias")
                blk[f"act_{j}"] = _act_params(s, f"{B}.activations.{j}", voc_cfg)
        p[f"resblocks_{n}"] = blk

    return {"params": _tree_to_jnp(p)}


def _act_params(s: _StateDict, base: str, voc_cfg) -> dict:
    out = {"alpha": s.raw(base + ".act.alpha")}
    if voc_cfg.activation == "snakebeta":
        out["beta"] = s.raw(base + ".act.beta")
    return out


def vocoder_params_to_torch_state(params: dict, voc_cfg) -> dict:
    """Inverse of map_vocoder_state_dict: flax BigVGAN generator params ->
    the reference's weight-normed ``ckpt['generator']`` layout
    (reference: bigvgan/init_vocoder.py:14-17 loads it, utils.py:57-64 saves
    it). The folded weight w re-emits as the valid decomposition
    ``weight_v = w, weight_g = |w|`` (fold_weight_norm inverts it exactly),
    so the package loads into the reference's weight_norm-wrapped modules;
    the kaiser filter buffers are rebuilt by module __init__ and omitted."""
    import torch
    p = params["params"] if "params" in params else params
    num_kernels = len(voc_cfg.resblock_kernel_sizes)
    out: dict = {}

    def put_conv(base: str, kernel, bias):
        w = np.asarray(kernel).transpose(2, 1, 0)  # invert map's transpose
        axes = tuple(range(1, w.ndim))
        g = np.sqrt(np.sum(w * w, axis=axes, keepdims=True))
        out[f"{base}.weight_g"] = torch.from_numpy(g.astype(np.float32))
        out[f"{base}.weight_v"] = torch.from_numpy(w.copy())
        out[f"{base}.bias"] = torch.from_numpy(np.asarray(bias).copy())

    def put_act(base: str, act: dict):
        out[f"{base}.act.alpha"] = torch.from_numpy(np.asarray(act["alpha"]).copy())
        if voc_cfg.activation == "snakebeta":
            out[f"{base}.act.beta"] = torch.from_numpy(np.asarray(act["beta"]).copy())

    put_conv("conv_pre", p["conv_pre_kernel"], p["conv_pre_bias"])
    put_conv("conv_post", p["conv_post_kernel"], p["conv_post_bias"])
    put_act("activation_post", p["activation_post"])
    for i in range(len(voc_cfg.upsample_rates)):
        put_conv(f"ups.{i}.0", p[f"ups_{i}_kernel"], p[f"ups_{i}_bias"])
    n_blocks = len(voc_cfg.upsample_rates) * num_kernels
    for n in range(n_blocks):
        blk = p[f"resblocks_{n}"]
        B = f"resblocks.{n}"
        n_dil = len(voc_cfg.resblock_dilation_sizes[n % num_kernels])
        if voc_cfg.resblock == "1":
            for j in range(n_dil):
                put_conv(f"{B}.convs1.{j}", blk[f"convs1_{j}_kernel"],
                         blk[f"convs1_{j}_bias"])
                put_conv(f"{B}.convs2.{j}", blk[f"convs2_{j}_kernel"],
                         blk[f"convs2_{j}_bias"])
                put_act(f"{B}.activations.{2 * j}", blk[f"act1_{j}"])
                put_act(f"{B}.activations.{2 * j + 1}", blk[f"act2_{j}"])
        else:
            for j in range(n_dil):
                put_conv(f"{B}.convs.{j}", blk[f"convs_{j}_kernel"],
                         blk[f"convs_{j}_bias"])
                put_act(f"{B}.activations.{j}", blk[f"act_{j}"])
    return out


# --- discriminators (weight-norm PARAMETRIZED, not folded) ---------------------
#
# Unlike the frozen generator, MPD/MRD train, so the (g, v) parametrization is
# preserved: torch ``weight_v`` (O, I, kH, kW) <-> flax ``*_v`` (kH, kW, I, O),
# torch ``weight_g`` (O, 1, 1, 1) <-> flax ``*_g`` (O,).
# (reference layout: bigvgan/models.py:212-220 MPD, :288-296 MRD.)

_DISC_N_CONVS = 5  # both DiscriminatorP and DiscriminatorR: 5 convs + post


def _disc_to_flax(s: _StateDict, base: str) -> dict:
    out = {}
    for mod, name in ([(f"convs.{j}", f"convs_{j}")
                       for j in range(_DISC_N_CONVS)]
                      + [("conv_post", "conv_post")]):
        out[f"{name}_v"] = s.raw(f"{base}.{mod}.weight_v").transpose(2, 3, 1, 0)
        out[f"{name}_g"] = s.raw(f"{base}.{mod}.weight_g").reshape(-1)
        out[f"{name}_bias"] = s.raw(f"{base}.{mod}.bias")
    return out


def _disc_to_torch(p: dict, base: str, out: dict):
    import torch
    for mod, name in ([(f"convs.{j}", f"convs_{j}")
                       for j in range(_DISC_N_CONVS)]
                      + [("conv_post", "conv_post")]):
        v = np.asarray(p[f"{name}_v"]).transpose(3, 2, 0, 1)  # HWIO -> OIHW
        g = np.asarray(p[f"{name}_g"]).reshape(-1, 1, 1, 1)
        out[f"{base}.{mod}.weight_v"] = torch.from_numpy(v.copy())
        out[f"{base}.{mod}.weight_g"] = torch.from_numpy(g.copy())
        out[f"{base}.{mod}.bias"] = torch.from_numpy(
            np.asarray(p[f"{name}_bias"]).copy())


def map_mpd_state_dict(sd: dict, periods=(2, 3, 5, 7, 11)) -> dict:
    """torch MultiPeriodDiscriminator state dict -> flax params
    (reference: bigvgan/models.py:244-251 — one DiscriminatorP per period,
    held as ``discriminators.{i}``)."""
    s = _StateDict(sd)
    return {"params": _tree_to_jnp({
        f"p{p}": _disc_to_flax(s, f"discriminators.{i}")
        for i, p in enumerate(periods)})}


def map_mrd_state_dict(sd: dict,
                       resolutions=((1024, 120, 600), (2048, 240, 1200),
                                    (512, 50, 240))) -> dict:
    """torch MultiResolutionDiscriminator state dict -> flax params
    (reference: bigvgan/models.py:321-330)."""
    s = _StateDict(sd)
    return {"params": _tree_to_jnp({
        f"r{res[0]}": _disc_to_flax(s, f"discriminators.{i}")
        for i, res in enumerate(resolutions)})}


def mpd_params_to_torch_state(params: dict, periods=(2, 3, 5, 7, 11)) -> dict:
    p = params["params"] if "params" in params else params
    out: dict = {}
    for i, per in enumerate(periods):
        _disc_to_torch(p[f"p{per}"], f"discriminators.{i}", out)
    return out


def mrd_params_to_torch_state(params: dict,
                              resolutions=((1024, 120, 600), (2048, 240, 1200),
                                           (512, 50, 240))) -> dict:
    p = params["params"] if "params" in params else params
    out: dict = {}
    for i, res in enumerate(resolutions):
        _disc_to_torch(p[f"r{res[0]}"], f"discriminators.{i}", out)
    return out


# --- export (jax -> torch layout) ----------------------------------------------

def params_to_torch_state(params: dict, model_cfg) -> dict:
    """Inverse of map_model_state_dict (vector-field net only, no weight norm)
    so training checkpoints stay loadable by torch-side tooling."""
    p = params["params"] if "params" in params else params

    def n(x):
        return np.asarray(x)

    sd: dict = {
        "flowhigh.null_cond": n(p["null_cond"]),
        "flowhigh.to_embed.weight": n(p["to_embed"]["kernel"]).T,
        "flowhigh.to_embed.bias": n(p["to_embed"]["bias"]),
        "flowhigh.conv_embed.dw_conv1d.0.weight": n(p["conv_embed"]["kernel"]).transpose(2, 1, 0),
        "flowhigh.conv_embed.dw_conv1d.0.bias": n(p["conv_embed"]["bias"]),
        "flowhigh.sinu_pos_emb.0.weights": n(p["sinu_pos_emb"]["weights"]),
        "flowhigh.sinu_pos_emb.1.weight": n(p["time_mlp"]["kernel"]).T,
        "flowhigh.sinu_pos_emb.1.bias": n(p["time_mlp"]["bias"]),
        "flowhigh.to_pred.weight": n(p["to_pred"]["kernel"]).T,
    }
    if model_cfg.architecture == "transformer":
        tr = p["transformer"]
        if any("gateloop" in k for k in tr):
            raise NotImplementedError(
                "jax GateLoop layers have no torch-reference layout to export "
                "to (the reference's gateloop weights live in the external "
                "gateloop_transformer package); save via orbax instead")
        if "register_tokens" in tr:
            sd["flowhigh.transformer.register_tokens"] = n(tr["register_tokens"])
        for i in range(model_cfg.depth):
            L = f"flowhigh.transformer.layers.{i}."
            if f"layers_{i}_skip_combiner" in tr:
                sk = tr[f"layers_{i}_skip_combiner"]
                sd[L + "0.weight"] = n(sk["kernel"]).T
                sd[L + "0.bias"] = n(sk["bias"])
            an, at, fn_, ff = (tr[f"layers_{i}_attn_norm"], tr[f"layers_{i}_attn"],
                               tr[f"layers_{i}_ff_norm"], tr[f"layers_{i}_ff"])
            sd[L + "2.to_gamma.weight"] = n(an["to_gamma"]["kernel"]).T
            sd[L + "2.to_gamma.bias"] = n(an["to_gamma"]["bias"])
            sd[L + "2.to_beta.weight"] = n(an["to_beta"]["kernel"]).T
            sd[L + "2.to_beta.bias"] = n(an["to_beta"]["bias"])
            sd[L + "3.to_qkv.weight"] = n(at["to_qkv"]["kernel"]).T
            sd[L + "3.to_out.weight"] = n(at["to_out"]["kernel"]).T
            if "q_norm" in at:
                sd[L + "3.q_norm.gamma"] = n(at["q_norm"]["gamma"])
                sd[L + "3.k_norm.gamma"] = n(at["k_norm"]["gamma"])
            sd[L + "4.to_gamma.weight"] = n(fn_["to_gamma"]["kernel"]).T
            sd[L + "4.to_gamma.bias"] = n(fn_["to_gamma"]["bias"])
            sd[L + "4.to_beta.weight"] = n(fn_["to_beta"]["kernel"]).T
            sd[L + "4.to_beta.bias"] = n(fn_["to_beta"]["bias"])
            sd[L + "5.0.weight"] = n(ff["proj_in"]["kernel"]).T
            sd[L + "5.0.bias"] = n(ff["proj_in"]["bias"])
            sd[L + "5.3.weight"] = n(ff["proj_out"]["kernel"]).T
            sd[L + "5.3.bias"] = n(ff["proj_out"]["bias"])
        sd["flowhigh.transformer.final_norm.gamma"] = n(tr["final_norm"]["gamma"])
    else:  # convnext (key layout of reference convnext.py:9-95)
        cn = p["convnext"]
        for i in range(model_cfg.convnext_layers):
            B = cn[f"blocks_{i}"]
            L = f"flowhigh.convnext.{i}."
            sd[L + "dwconv.weight"] = n(B["dwconv_kernel"]).transpose(2, 1, 0)
            sd[L + "dwconv.bias"] = n(B["dwconv_bias"])
            sd[L + "norm.scale.weight"] = n(B["norm"]["scale"]["kernel"]).T
            sd[L + "norm.scale.bias"] = n(B["norm"]["scale"]["bias"])
            sd[L + "norm.shift.weight"] = n(B["norm"]["shift"]["kernel"]).T
            sd[L + "norm.shift.bias"] = n(B["norm"]["shift"]["bias"])
            sd[L + "pwconv1.weight"] = n(B["pwconv1"]["kernel"]).T
            sd[L + "pwconv1.bias"] = n(B["pwconv1"]["bias"])
            sd[L + "pwconv2.weight"] = n(B["pwconv2"]["kernel"]).T
            sd[L + "pwconv2.bias"] = n(B["pwconv2"]["bias"])
            sd[L + "gamma"] = n(B["gamma"])
        sd["flowhigh.final_layer_norm.weight"] = n(cn["final_norm_scale"])
        sd["flowhigh.final_layer_norm.bias"] = n(cn["final_norm_bias"])
    return sd


def reference_param_order(model_cfg) -> list:
    """Vector-field parameter names in the reference's ``named_parameters()``
    registration order (reference: src/flowhigh/models/flow.py:92-142 for the
    top level, transformer.py:131-161 per layer, attend.py:157-171 for the
    q/k-norm-before-qkv ordering inside Attention). This is the positional
    indexing a torch ``Adam(flowhigh.parameters())`` uses for its state dict.
    torch yields a module's DIRECT parameters before its submodules', so
    ``null_cond`` (the net's only direct Parameter, flow.py:100) comes
    first."""
    order = [
        "null_cond",
        "sinu_pos_emb.0.weights", "sinu_pos_emb.1.weight", "sinu_pos_emb.1.bias",
        "to_embed.weight", "to_embed.bias",
        "conv_embed.dw_conv1d.0.weight", "conv_embed.dw_conv1d.0.bias",
    ]
    if model_cfg.architecture == "transformer":
        if getattr(model_cfg, "num_register_tokens", 0) > 0:
            # direct Parameter of Transformer: yielded before its layers
            order += ["transformer.register_tokens"]
        for i in range(model_cfg.depth):
            L = f"transformer.layers.{i}."
            if (getattr(model_cfg, "use_unet_skip_connection", False)
                    and (i + 1) > model_cfg.depth // 2):
                order += [L + "0.weight", L + "0.bias"]
            order += [L + "2.to_gamma.weight", L + "2.to_gamma.bias",
                      L + "2.to_beta.weight", L + "2.to_beta.bias"]
            if model_cfg.attn_qk_norm:
                order += [L + "3.q_norm.gamma", L + "3.k_norm.gamma"]
            order += [L + "3.to_qkv.weight", L + "3.to_out.weight",
                      L + "4.to_gamma.weight", L + "4.to_gamma.bias",
                      L + "4.to_beta.weight", L + "4.to_beta.bias",
                      L + "5.0.weight", L + "5.0.bias",
                      L + "5.3.weight", L + "5.3.bias"]
        order += ["transformer.final_norm.gamma"]
    else:  # convnext: per block, torch yields the DIRECT Parameter gamma
        # before submodule params (convnext.py:40-42 registers gamma after
        # pwconv2, but named_parameters walks self._parameters first)
        for i in range(model_cfg.convnext_layers):
            L = f"convnext.{i}."
            order += [L + "gamma",
                      L + "dwconv.weight", L + "dwconv.bias",
                      L + "norm.scale.weight", L + "norm.scale.bias",
                      L + "norm.shift.weight", L + "norm.shift.bias",
                      L + "pwconv1.weight", L + "pwconv1.bias",
                      L + "pwconv2.weight", L + "pwconv2.bias"]
        order += ["final_layer_norm.weight", "final_layer_norm.bias"]
    order += ["to_pred.weight"]
    return order


def _find_adam_state(opt_state):
    """Locate the ScaleByAdamState (fields mu/nu/count) anywhere inside an
    optax state tree (handles chain / MultiSteps wrapping)."""
    if hasattr(opt_state, "mu") and hasattr(opt_state, "nu"):
        return opt_state
    if hasattr(opt_state, "inner_opt_state"):  # optax.MultiSteps
        return _find_adam_state(opt_state.inner_opt_state)
    if isinstance(opt_state, (tuple, list)):
        for item in opt_state:
            found = _find_adam_state(item)
            if found is not None:
                return found
    return None


def optim_state_to_torch(params, opt_state, model_cfg, train_cfg, step: int) -> dict:
    """optax Adam state -> the torch ``optimizer.state_dict()`` layout the
    reference checkpoints carry (reference: trainer.py:209-215 saves
    ``self.optim.state_dict()``; optimizer built at trainer.py:107 over
    ``cfm_wrapper.parameters()`` with wd=0 -> plain Adam, one param group).

    Indices follow ``reference_param_order`` (the vector-field net's
    parameters only — the frozen vocoder never accumulates Adam state, so the
    exported package loads into ``Adam(flowhigh_net.parameters())``).
    ``null_cond`` has ``requires_grad=False`` (flow.py:100): it stays in the
    param group but gets no state entry, exactly as torch leaves it."""
    import torch

    adam = _find_adam_state(opt_state)
    order = reference_param_order(model_cfg)
    groups = [{
        "lr": float(train_cfg.lr),
        "betas": (float(train_cfg.adam_b1), float(train_cfg.adam_b2)),
        "eps": float(train_cfg.adam_eps),
        "weight_decay": float(train_cfg.weight_decay),
        "amsgrad": False, "maximize": False, "foreach": None,
        "capturable": False, "differentiable": False, "fused": None,
        "params": list(range(len(order))),
    }]
    if adam is None:
        return {"state": {}, "param_groups": groups}
    import jax
    if (jax.tree_util.tree_structure(adam.mu)
            != jax.tree_util.tree_structure(params)):
        raise ValueError(
            "optax Adam moment tree does not match the param tree — the "
            "opt_state belongs to a different model than `params`")

    mu_t = params_to_torch_state(adam.mu, model_cfg)
    nu_t = params_to_torch_state(adam.nu, model_cfg)
    state = {}
    for idx, name in enumerate(order):
        if name == "null_cond":
            continue  # frozen: torch Adam never creates state for it
        key = "flowhigh." + name
        state[idx] = {
            "step": torch.tensor(float(step)),
            "exp_avg": torch.from_numpy(np.array(mu_t[key])),
            "exp_avg_sq": torch.from_numpy(np.array(nu_t[key])),
        }
    return {"state": state, "param_groups": groups}


def scheduler_state_to_torch(train_cfg, step: int, last_lr: float) -> dict:
    """CosineAnnealingLR state dict (reference: trainer.py:139 builds
    ``CosineAnnealingLR(optim, T_max=num_train_steps)``; saved at :209-215)."""
    return {
        "T_max": int(train_cfg.num_train_steps),
        "eta_min": 0,
        "base_lrs": [float(train_cfg.lr)],
        "last_epoch": int(step),
        "verbose": False,
        "_step_count": int(step) + 1,
        "_get_lr_called_within_step": False,
        "_last_lr": [float(last_lr)],
    }


# --- top-level loader ----------------------------------------------------------

def load_flowhigh_checkpoint(ckpt_dir: Path, model_file: str,
                             cfm_method: Optional[str] = None):
    """Directory layout of the published checkpoints
    (reference: flowhighsr.py:109-137, 141-147)."""
    import torch

    from ..config import FlowHighConfig, VocoderConfig
    from ..sr import FlowHighSR

    ckpt_dir = Path(ckpt_dir)
    voc_cfg = VocoderConfig.from_json(ckpt_dir / "bigvgan_48khz_256band.json")
    config = FlowHighConfig().replace(vocoder=voc_cfg)

    voc_pkg = torch.load(ckpt_dir / "bigvgan_48khz_256band.pt",
                         map_location="cpu", weights_only=True)
    voc_params = map_vocoder_state_dict(voc_pkg["generator"], voc_cfg)

    pkg = torch.load(ckpt_dir / model_file, map_location="cpu", weights_only=True)
    params = map_model_state_dict(pkg["model"], config.model)

    sr = FlowHighSR(config, params=params, vocoder_params=voc_params,
                    cfm_method=cfm_method or "basic_cfm")
    return sr
