"""MFU / roofline table for the e2e generate program (VERDICT r3 #4).

Joins MEASURED per-op device times (a trace_ops json emitted by
``scripts/trace_e2e.py``) with ANALYTIC FLOP/byte counts derived from the
flagship config (reference geometry: configs/config.json +
bigvgan 48khz_256band schema — see flowhigh_tpu/config.py), and prints a
markdown table: per stage, logical FLOPs, actual FLOPs (including the
packed-kernel redundancy), bytes moved, achieved FLOP/s and GB/s vs the
v5e peaks, plus the end-to-end device MFU.

Usage:
    python scripts/trace_e2e.py true          # on TPU -> /tmp/trace_ops_true.json
    python scripts/mfu_table.py [/tmp/trace_ops_true.json]

Trace-attribution assumptions (validated on the round-4 trace):
- ``resblocks_{i}.*`` Pallas kernels belong to stage i // 3 (3 resblocks
  per stage, 5 stages).
- bare ``act1_*`` / ``act2_*`` kernels are the standalone (unfused-pair)
  acts of stages whose pair fusion is ineligible; at the shipping plan that
  is exactly stage 0 (18 = 3 resblocks x 6 acts).
- ``BigVGAN.N`` kernels are the packed transposed-conv upsamplers.
- XLA ``convolution*`` fusions are stage-0's unfused convs + conv_pre/post.
- everything else (reshape/copy/fusion/...) is glue + the non-vocoder
  program (mel encode, vector field, post-processing) — their analytic
  FLOPs are reported on the "non-vocoder" row against that remainder time.

Peaks used (TPU v5e, per chip): 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
MFU is reported against the bf16 peak even where kernels accumulate f32 —
the conservative, standard convention.
"""
import json
import math
import sys

sys.path.insert(0, "/root/repo")

from flowhigh_tpu.config import MelConfig, ModelConfig, VocoderConfig
from flowhigh_tpu.ops.packed import _nonzero_taps, act_conv_plan, amp_unit_plan

PEAK_FLOPS = 197e12
PEAK_BW = 819e9
F32 = 4

SECONDS = 10.0
T_MEL = 1000  # bucketed mel frames for the 10 s bench clip


def pack_factor(ch: int, t: int) -> int:
    p = 1
    while ch * p < 256:
        p *= 2
    return p if (p > 1 and t % p == 0) else 1


def stage_geometry(voc: VocoderConfig):
    """Per stage: (T_in, C_in, T_out, C_out, p_in, p_out, rate, k_up)."""
    stages = []
    t, c, p = T_MEL, voc.upsample_initial_channel, 1
    for i, (u, k) in enumerate(zip(voc.upsample_rates, voc.upsample_kernel_sizes)):
        c_out = voc.upsample_initial_channel // (2 ** (i + 1))
        t_out = t * u
        p_out = pack_factor(c_out, t_out)
        stages.append(dict(i=i, t_in=t, c_in=c, t_out=t_out, c_out=c_out,
                           p_in=p, p_out=p_out, rate=u, k_up=k))
        t, c, p = t_out, c_out, p_out
    return stages


def act_flops_bytes(t: int, c: int, up_taps: int = 12, down_taps: int = 12,
                    snake_ops: int = 13):
    """One fused Activation1d (up2 -> snake -> down2): logical FLOPs and
    HBM bytes. Intermediates stay in VMEM; only in/out feature maps move."""
    fl = t * c * (2 * 2 * up_taps + 2 * snake_ops + 2 * down_taps)
    by = 2 * t * c * F32
    return fl, by


def conv_logical(t: int, c: int, k: int):
    return 2 * t * k * c * c


def conv_actual(t: int, c: int, k: int, pad: int, dil: int, p: int):
    """Packed Pallas conv: dense [pC, pC] dot per nonzero packed tap."""
    if p <= 1:
        return conv_logical(t, c, k), k * c * c * F32
    n = len(_nonzero_taps(k, pad, dil, p)[0])
    macs = (t // p) * n * (p * c) ** 2
    return 2 * macs, n * (p * c) ** 2 * F32


def upsampler_counts(st):
    t_in, c_in, c_out, k, u = st["t_in"], st["c_in"], st["c_out"], st["k_up"], st["rate"]
    logical = 2 * t_in * k * c_in * c_out
    # packed transposed conv: per output super-row, g_i input super-rows of
    # p_in*C_in lanes hit a dense [g_i*p_in*c_in, p_out*c_out] matrix whose
    # nonzero density is ~k/(u*p_in) per column pair — approximate actual
    # FLOPs by the dense super-row dot (upper bound the kernel really pays)
    p_in, p_out = st["p_in"], st["p_out"]
    g_i = p_out // math.gcd(u * p_in, p_out) if p_out > 1 else 1
    ceil_k = math.ceil(k / u) + 1
    actual = 2 * (st["t_out"] // max(p_out, 1)) * (g_i * ceil_k * p_in * c_in) * (p_out * c_out) \
        if p_out > 1 else logical
    by = (st["t_in"] * c_in + st["t_out"] * c_out + k * c_in * c_out) * F32
    return logical, actual, by


def vector_field_flops(model: ModelConfig, t: int = T_MEL, nfe: int = 1):
    d = model.dim
    inner = int(d * 4 * 2 / 3)
    per_layer = (2 * t * d * 3 * d          # qkv
                 + 2 * 2 * t * t * d        # scores + values
                 + 2 * t * d * d            # out proj
                 + 2 * t * d * 2 * inner    # GEGLU in
                 + 2 * t * inner * d)       # FF out
    total = (2 * t * (2 * model.dim_in) * d    # to_embed (concat x, cond)
             + 2 * t * 31 * d                  # conv pos embed (depthwise)
             + model.depth * per_layer
             + 2 * t * d * model.dim_in)       # to_pred
    return nfe * total


def frontend_flops(mel: MelConfig, t: int = T_MEL):
    n_bins = mel.n_fft // 2 + 1
    stft = 2 * t * mel.n_fft * n_bins * 2   # windowed-DFT as MXU conv, re+im
    melm = 2 * t * n_bins * mel.n_mels
    return 2 * (stft + melm)  # encode runs on cond AND postproc STFTs ~same order


def classify(ops: dict):
    """trace op name -> bucket. Returns {bucket: ms}."""
    buckets = {}

    def add(b, v):
        buckets[b] = buckets.get(b, 0.0) + v

    for n, v in ops.items():
        if n.startswith("jit__generate_jit"):
            buckets["_envelope"] = max(buckets.get("_envelope", 0.0), v)
            continue
        if n.startswith("resblocks_"):
            i = int(n.split("_")[1].split(".")[0])
            add(f"stage{i // 3}_resblocks", v)
        elif n.startswith(("act1_", "act2_")):
            add("stage0_resblocks", v)  # standalone acts: stage 0 at this plan
        elif n.startswith("BigVGAN."):
            add("upsamplers", v)
        elif n.startswith("activation_post"):
            add("activation_post", v)
        elif "convolution" in n:
            add("xla_convs", v)
        else:
            add("other", v)
    return buckets


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_ops_true.json"
    ops = json.load(open(path))
    times = classify(ops)
    voc, model, mel = VocoderConfig(), ModelConfig(), MelConfig()
    stages = stage_geometry(voc)

    rows = []
    tot_logical = tot_actual = tot_bytes = 0.0

    # per-stage resblocks (convs + acts)
    for st in stages:
        s, t, c, p = st["i"], st["t_out"], st["c_out"], st["p_out"]
        logical = actual = by = 0.0
        for rk in voc.resblock_kernel_sizes:
            for d in voc.resblock_dilation_sizes[0]:
                for kk, dd in ((rk, d), (rk, 1)):  # convs1 dilated + convs2
                    pad = (kk * dd - dd) // 2
                    lf = conv_logical(t, c, kk)
                    af, wby = conv_actual(t, c, kk, pad, dd, p)
                    logical += lf
                    actual += af
                    by += 2 * t * c * F32 + wby
                # 2 acts per conv pair
                for _ in range(2):
                    lf, aby = act_flops_bytes(t, c)
                    logical += lf
                    actual += lf * (1 if p == 1 else 1)  # acts: VPU, no MXU redundancy
                    by += aby
        ms = times.get(f"stage{s}_resblocks", 0.0)
        rows.append((f"stage{s} resblocks (C={c}, T={t//1000}k, p={p})",
                     ms, logical, actual, by))
        tot_logical += logical; tot_actual += actual; tot_bytes += by

    # upsamplers + conv_pre/post
    ul = ua = ub = 0.0
    for st in stages:
        lf, af, by = upsampler_counts(st)
        ul += lf; ua += af; ub += by
    rows.append(("upsamplers (5x ConvT)", times.get("upsamplers", 0.0), ul, ua, ub))
    tot_logical += ul; tot_actual += ua; tot_bytes += ub

    pre_l = conv_logical(T_MEL, int(math.sqrt(voc.num_mels * voc.upsample_initial_channel)), 7)
    pre_l = 2 * T_MEL * 7 * voc.num_mels * voc.upsample_initial_channel
    t_out = T_MEL * voc.total_upsample
    post_l = 2 * t_out * 7 * (voc.upsample_initial_channel // 2 ** 5) * 1
    rows.append(("conv_pre/post + stage0 XLA convs", times.get("xla_convs", 0.0),
                 pre_l + post_l, pre_l + post_l,
                 (T_MEL * voc.num_mels + t_out * 48 + t_out) * F32))
    tot_logical += pre_l + post_l; tot_actual += pre_l + post_l

    apl, apb = act_flops_bytes(t_out, voc.upsample_initial_channel // 2 ** 5)
    rows.append(("activation_post", times.get("activation_post", 0.0), apl, apl, apb))
    tot_logical += apl; tot_actual += apl; tot_bytes += apb

    vf = vector_field_flops(model)
    fe = frontend_flops(mel)
    rows.append(("non-vocoder (mel + vector field + postproc) [in 'other']",
                 times.get("other", 0.0), vf + fe, vf + fe,
                 6 * T_MEL * model.dim * F32))
    tot_logical += vf + fe; tot_actual += vf + fe

    envelope = times.get("_envelope", sum(v for k, v in times.items() if k != "_envelope"))
    print(f"trace: {path}")
    print(f"device envelope: {envelope:.2f} ms/clip ({SECONDS:.0f} s audio)\n")
    hdr = ("| section | ms | logical GFLOP | actual GFLOP | GB moved "
           "| achieved TFLOP/s (% bf16 peak) | achieved GB/s (% HBM peak) |")
    print(hdr)
    print("|" + "---|" * 7)
    for name, ms, lf, af, by in rows:
        if ms <= 0:
            tf = bw = 0.0
        else:
            tf = af / (ms * 1e-3) / 1e12
            bw = by / (ms * 1e-3) / 1e9
        print(f"| {name} | {ms:.2f} | {lf/1e9:.1f} | {af/1e9:.1f} | {by/1e9:.2f} "
              f"| {tf:.1f} ({100*tf*1e12/PEAK_FLOPS:.0f}%) "
              f"| {bw:.0f} ({100*bw*1e9/PEAK_BW:.0f}%) |")
    mfu = tot_logical / (envelope * 1e-3) / PEAK_FLOPS
    amfu = tot_actual / (envelope * 1e-3) / PEAK_FLOPS
    bwu = tot_bytes / (envelope * 1e-3) / PEAK_BW
    print(f"\nend-to-end: logical {tot_logical/1e12:.2f} TFLOP, actual "
          f"{tot_actual/1e12:.2f} TFLOP, {tot_bytes/1e9:.1f} GB")
    print(f"device MFU (logical/bf16 peak): {100*mfu:.1f}%   "
          f"(actual incl. packed redundancy: {100*amfu:.1f}%)   "
          f"HBM utilisation: {100*bwu:.1f}%")
    print(f"roofline floor: max(compute {tot_logical/PEAK_FLOPS*1e3:.1f} ms, "
          f"memory {tot_bytes/PEAK_BW*1e3:.1f} ms) per clip")


if __name__ == "__main__":
    main()
