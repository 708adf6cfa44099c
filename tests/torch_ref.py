"""Minimal torch implementation of the reference model math, used ONLY to
generate golden outputs + reference-layout state dicts for parity tests.

Written from the documented formulas in SURVEY.md (flow.py / transformer.py /
attend.py / pos_emb.py / bigvgan call stacks) — independent code, matching
state-dict key layout so the compat mapper is exercised end to end.
"""

import math

import torch
import torch.nn.functional as F
from torch import nn


def l2norm(x):
    return F.normalize(x, dim=-1)


class LearnedSinusoidalPosEmb(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.weights = nn.Parameter(torch.randn(dim // 2))

    def forward(self, t):
        freqs = t[:, None] * self.weights[None, :] * 2 * math.pi
        return torch.cat([freqs.sin(), freqs.cos()], dim=-1)


class ConvPositionEmbed(nn.Module):
    def __init__(self, dim, kernel_size=31):
        super().__init__()
        self.dw_conv1d = nn.Sequential(
            nn.Conv1d(dim, dim, kernel_size, groups=dim, padding=kernel_size // 2),
            nn.GELU(),
        )

    def forward(self, x):
        return self.dw_conv1d(x.transpose(1, 2)).transpose(1, 2)


class RMSNorm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.scale = dim ** 0.5
        self.gamma = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return l2norm(x) * self.scale * self.gamma


class AdaptiveRMSNorm(nn.Module):
    def __init__(self, dim, cond_dim):
        super().__init__()
        self.scale = dim ** 0.5
        self.to_gamma = nn.Linear(cond_dim, dim)
        self.to_beta = nn.Linear(cond_dim, dim)
        nn.init.zeros_(self.to_gamma.weight)
        nn.init.ones_(self.to_gamma.bias)
        nn.init.zeros_(self.to_beta.weight)
        nn.init.zeros_(self.to_beta.bias)

    def forward(self, x, cond):
        g, b = self.to_gamma(cond)[:, None, :], self.to_beta(cond)[:, None, :]
        return l2norm(x) * self.scale * g + b


class MultiheadRMSNorm(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.scale = dim ** 0.5
        self.gamma = nn.Parameter(torch.ones(heads, 1, dim))

    def forward(self, x):
        return l2norm(x) * self.gamma * self.scale


def rotary_freqs(n, dim_head, theta=50000.0):
    inv = 1.0 / (theta ** (torch.arange(0, dim_head, 2).float() / dim_head))
    f = torch.einsum("i,j->ij", torch.arange(n).float(), inv)
    return torch.cat([f, f], dim=-1)


def rotate_half(x):
    x1, x2 = x.chunk(2, dim=-1)
    return torch.cat([-x2, x1], dim=-1)


def apply_rotary(pos, t):
    return t * pos.cos() + rotate_half(t) * pos.sin()


class Attention(nn.Module):
    def __init__(self, dim, dim_head, heads, qk_norm=True, qk_norm_scale=10.0):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        inner = dim_head * heads
        self.scale = qk_norm_scale if qk_norm else dim_head ** -0.5
        self.qk_norm = qk_norm
        if qk_norm:
            self.q_norm = MultiheadRMSNorm(dim_head, heads)
            self.k_norm = MultiheadRMSNorm(dim_head, heads)
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_out = nn.Linear(inner, dim, bias=False)

    def forward(self, x, rotary):
        b, n, _ = x.shape
        q, k, v = self.to_qkv(x).chunk(3, dim=-1)
        q, k, v = (t.view(b, n, self.heads, self.dim_head).transpose(1, 2)
                   for t in (q, k, v))
        if self.qk_norm:
            q, k = self.q_norm(q), self.k_norm(k)
        q, k = apply_rotary(rotary, q), apply_rotary(rotary, k)
        sim = torch.einsum("bhid,bhjd->bhij", q, k) * self.scale
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(1, 2).reshape(b, n, -1)
        return self.to_out(out)


class GEGLU(nn.Module):
    def forward(self, x):
        x, gate = x.chunk(2, dim=-1)
        return F.gelu(gate) * x


def feed_forward(dim, mult=4):
    inner = int(dim * mult * 2 / 3)
    return nn.Sequential(
        nn.Linear(dim, inner * 2), GEGLU(), nn.Dropout(0.0), nn.Linear(inner, dim))


class Transformer(nn.Module):
    """Optionally with register tokens (rotary position -10000, packed left,
    reference transformer.py:135-139,177-198) and U-Net skip combiners on
    the second-half layers at ModuleList slot 0, scale 2^-0.5
    (reference transformer.py:146-154,213-217)."""

    def __init__(self, dim, depth, dim_head, heads, ff_mult=4,
                 num_register_tokens=0, use_unet_skip_connection=False):
        super().__init__()
        self.dim_head = dim_head
        self.num_register_tokens = num_register_tokens
        self.use_unet = use_unet_skip_connection
        self.layers = nn.ModuleList()
        if num_register_tokens > 0:
            self.register_tokens = nn.Parameter(
                torch.randn(num_register_tokens, dim))
        for ind in range(depth):
            has_skip = use_unet_skip_connection and (ind + 1) > depth // 2
            self.layers.append(nn.ModuleList([
                nn.Linear(dim * 2, dim) if has_skip else nn.Identity(),
                nn.Identity(),
                AdaptiveRMSNorm(dim, dim),
                Attention(dim, dim_head, heads),
                AdaptiveRMSNorm(dim, dim),
                feed_forward(dim, ff_mult),
            ]))
        self.final_norm = RMSNorm(dim)

    def forward(self, x, t_emb):
        b, n = x.shape[0], x.shape[1]
        r = self.num_register_tokens
        if r > 0:
            x = torch.cat([self.register_tokens.expand(b, -1, -1), x], dim=1)
            pos = torch.cat([torch.full((r,), -10000.0),
                             torch.arange(n).float()])
            inv = 1.0 / (50000.0 ** (torch.arange(0, self.dim_head, 2).float()
                                     / self.dim_head))
            f = torch.einsum("i,j->ij", pos, inv)
            rot = torch.cat([f, f], dim=-1)
        else:
            rot = rotary_freqs(n, self.dim_head)
        skips = []
        for skip_combiner, _, attn_norm, attn, ff_norm, ff in self.layers:
            if self.use_unet:
                if isinstance(skip_combiner, nn.Identity):
                    skips.append(x)
                else:
                    x = skip_combiner(
                        torch.cat([x, skips.pop() * 2 ** -0.5], dim=-1))
            x = attn(attn_norm(x, t_emb), rot) + x
            x = ff(ff_norm(x, t_emb)) + x
        if r > 0:
            x = x[:, r:]
        return self.final_norm(x)


class AdaLayerNormCN(nn.Module):
    """ConvNeXt AdaLayerNorm: plain LN then time-conditioned scale/shift
    (reference convnext.py:65-95 layout: norm.scale / norm.shift Linears)."""

    def __init__(self, dim, hidden_dim, eps=1e-6):
        super().__init__()
        self.eps, self.dim = eps, dim
        self.scale = nn.Linear(hidden_dim, dim)
        self.shift = nn.Linear(hidden_dim, dim)

    def forward(self, x, cond):
        y = F.layer_norm(x, (self.dim,), eps=self.eps)
        return y * self.scale(cond).unsqueeze(1) + self.shift(cond).unsqueeze(1)


class ConvNeXtBlockCN(nn.Module):
    """Depthwise k=7 -> AdaLN -> pointwise MLP -> layer scale -> residual,
    [B, C, T] in/out (reference convnext.py:9-61 key layout)."""

    def __init__(self, dim, intermediate_dim, hidden_dim):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = AdaLayerNormCN(dim, hidden_dim)
        self.pwconv1 = nn.Linear(dim, intermediate_dim)
        self.pwconv2 = nn.Linear(intermediate_dim, dim)
        self.gamma = nn.Parameter(torch.ones(dim))

    def forward(self, x, cond):
        r = x
        x = self.dwconv(x).transpose(1, 2)
        x = self.norm(x, cond)
        x = self.pwconv2(F.gelu(self.pwconv1(x)))
        return r + (self.gamma * x).transpose(1, 2)


class TorchFLowHigh(nn.Module):
    """Reference-layout vector-field net (state dict keys match flow.py)."""

    def __init__(self, dim_in=8, dim=16, depth=2, dim_head=4, heads=2,
                 num_register_tokens=0, use_unet_skip_connection=False,
                 architecture="transformer", convnext_layers=8):
        super().__init__()
        self.architecture = architecture
        self.sinu_pos_emb = nn.Sequential(
            LearnedSinusoidalPosEmb(dim), nn.Linear(dim, dim), nn.SiLU())
        self.to_embed = nn.Linear(dim_in * 2, dim)
        self.null_cond = nn.Parameter(torch.zeros(dim_in), requires_grad=False)
        self.conv_embed = ConvPositionEmbed(dim)
        if architecture == "transformer":
            self.transformer = Transformer(
                dim, depth, dim_head, heads,
                num_register_tokens=num_register_tokens,
                use_unet_skip_connection=use_unet_skip_connection)
        else:  # convnext (reference flow.py:124-139: inter=3*dim, 8 layers)
            self.convnext = nn.ModuleList(
                [ConvNeXtBlockCN(dim, dim * 3, dim)
                 for _ in range(convnext_layers)])
            self.final_layer_norm = nn.LayerNorm(dim, eps=1e-6)
        self.to_pred = nn.Linear(dim, dim_in, bias=False)

    def forward(self, x, times, cond, drop_cond=False):
        if drop_cond:
            cond = self.null_cond.expand_as(cond)
        h = self.to_embed(torch.cat([x, cond], dim=-1))
        h = self.conv_embed(h) + h
        t_emb = self.sinu_pos_emb(times)
        if self.architecture == "transformer":
            h = self.transformer(h, t_emb)
        else:  # reference flow.py:247-253
            h = h.transpose(1, 2)
            for blk in self.convnext:
                h = blk(h, t_emb)
            h = self.final_layer_norm(h.transpose(1, 2))
        return self.to_pred(h)


class TorchCFMWrapper(nn.Module):
    """Adds the ``flowhigh.`` state-dict prefix of the checkpoint layout."""

    def __init__(self, **kw):
        super().__init__()
        self.flowhigh = TorchFLowHigh(**kw)


# --- BigVGAN replica -----------------------------------------------------------

def kaiser_sinc_filter1d(cutoff, half_width, kernel_size):
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = torch.kaiser_window(kernel_size, beta=beta, periodic=False)
    if even:
        time = torch.arange(-half_size, half_size) + 0.5
    else:
        time = torch.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * torch.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.view(1, 1, kernel_size)


class UpSample1d(nn.Module):
    def __init__(self, ratio=2, kernel_size=12):
        super().__init__()
        self.ratio = ratio
        self.kernel_size = kernel_size
        self.stride = ratio
        self.pad = kernel_size // ratio - 1
        self.pad_left = self.pad * self.stride + (kernel_size - self.stride) // 2
        self.pad_right = self.pad * self.stride + (kernel_size - self.stride + 1) // 2
        self.register_buffer("filter", kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size))

    def forward(self, x):
        c = x.shape[1]
        x = F.pad(x, (self.pad, self.pad), mode="replicate")
        x = self.ratio * F.conv_transpose1d(
            x, self.filter.expand(c, -1, -1), stride=self.stride, groups=c)
        return x[..., self.pad_left:-self.pad_right]


class DownSample1d(nn.Module):
    def __init__(self, ratio=2, kernel_size=12):
        super().__init__()
        even = kernel_size % 2 == 0
        self.pad_left = kernel_size // 2 - int(even)
        self.pad_right = kernel_size // 2
        self.ratio = ratio
        self.register_buffer("filter", kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size))

    def forward(self, x):
        c = x.shape[1]
        x = F.pad(x, (self.pad_left, self.pad_right), mode="replicate")
        return F.conv1d(x, self.filter.expand(c, -1, -1), stride=self.ratio, groups=c)


class SnakeBeta(nn.Module):
    def __init__(self, channels, logscale=True):
        super().__init__()
        init = torch.zeros if logscale else torch.ones
        self.alpha = nn.Parameter(init(channels))
        self.beta = nn.Parameter(init(channels))
        self.logscale = logscale

    def forward(self, x):
        a = self.alpha[None, :, None]
        b = self.beta[None, :, None]
        if self.logscale:
            a, b = a.exp(), b.exp()
        return x + (1.0 / (b + 1e-9)) * torch.sin(x * a) ** 2


class Activation1d(nn.Module):
    def __init__(self, channels, logscale=True):
        super().__init__()
        self.upsample = UpSample1d(2, 12)
        self.act = SnakeBeta(channels, logscale)
        self.downsample = DownSample1d(2, 12)

    def forward(self, x):
        return self.downsample(self.act(self.upsample(x)))


def wn(m):
    return nn.utils.parametrizations.weight_norm(m) if hasattr(
        nn.utils.parametrizations, "weight_norm_") else nn.utils.weight_norm(m)


class AMPBlock1(nn.Module):
    def __init__(self, channels, kernel_size, dilations):
        super().__init__()
        self.convs1 = nn.ModuleList([
            wn(nn.Conv1d(channels, channels, kernel_size, 1, dilation=d,
                         padding=(kernel_size * d - d) // 2)) for d in dilations])
        self.convs2 = nn.ModuleList([
            wn(nn.Conv1d(channels, channels, kernel_size, 1,
                         padding=(kernel_size - 1) // 2)) for _ in dilations])
        self.activations = nn.ModuleList(
            [Activation1d(channels) for _ in range(2 * len(dilations))])

    def forward(self, x):
        a1s, a2s = self.activations[::2], self.activations[1::2]
        for c1, c2, a1, a2 in zip(self.convs1, self.convs2, a1s, a2s):
            xt = a1(x)
            xt = c1(xt)
            xt = a2(xt)
            xt = c2(xt)
            x = xt + x
        return x


class TorchBigVGAN(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.num_kernels = len(cfg.resblock_kernel_sizes)
        ch = cfg.upsample_initial_channel
        self.conv_pre = wn(nn.Conv1d(cfg.num_mels, ch, 7, 1, padding=3))
        self.ups = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            cin = cfg.upsample_initial_channel // (2 ** i)
            cout = cfg.upsample_initial_channel // (2 ** (i + 1))
            self.ups.append(nn.ModuleList([
                wn(nn.ConvTranspose1d(cin, cout, k, u, padding=(k - u) // 2))]))
            for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                self.resblocks.append(AMPBlock1(cout, rk, rd))
        self.activation_post = Activation1d(cout)
        self.conv_post = wn(nn.Conv1d(cout, 1, 7, 1, padding=3))

    def forward(self, x):  # x: [B, n_mels, T]
        x = self.conv_pre(x)
        for i in range(len(self.ups)):
            x = self.ups[i][0](x)
            xs = None
            for j in range(self.num_kernels):
                y = self.resblocks[i * self.num_kernels + j](x)
                xs = y if xs is None else xs + y
            x = xs / self.num_kernels
        x = self.activation_post(x)
        x = self.conv_post(x)
        return torch.tanh(x)


def torch_state_dict_weight_normed(model):
    """state dict with weight_g/weight_v keys (old-style naming), matching the
    published vocoder checkpoint layout."""
    sd = {}
    for k, v in model.state_dict().items():
        k = (k.replace("parametrizations.weight.original0", "weight_g")
              .replace("parametrizations.weight.original1", "weight_v"))
        sd[k] = v
    return sd


# --- discriminators (MPD/MRD, weight-normed, reference state-dict layout) -----

class TorchDiscP(nn.Module):
    def __init__(self, period, d_mult=1, k=5, stride=3):
        super().__init__()
        self.period = period
        cs = [int(32 * d_mult), int(128 * d_mult), int(512 * d_mult),
              int(1024 * d_mult)]
        seq, cin = [], 1
        for c in cs:
            seq.append(wn(nn.Conv2d(cin, c, (k, 1), (stride, 1),
                                    padding=((k - 1) // 2, 0))))
            cin = c
        seq.append(wn(nn.Conv2d(cin, cin, (k, 1), 1, padding=(2, 0))))
        self.convs = nn.ModuleList(seq)
        self.conv_post = wn(nn.Conv2d(cin, 1, (3, 1), 1, padding=(1, 0)))

    def forward(self, x):  # [B, 1, T]
        b, c, t = x.shape
        if t % self.period:
            x = F.pad(x, (0, self.period - t % self.period), "reflect")
            t = x.shape[-1]
        h = x.view(b, c, t // self.period, self.period)
        fmap = []
        for l in self.convs:
            h = F.leaky_relu(l(h), 0.1)
            fmap.append(h)
        h = self.conv_post(h)
        fmap.append(h)
        return torch.flatten(h, 1, -1), fmap


class TorchMPD(nn.Module):
    def __init__(self, periods=(2, 3, 5, 7, 11), d_mult=1):
        super().__init__()
        self.discriminators = nn.ModuleList(
            [TorchDiscP(p, d_mult) for p in periods])

    def forward(self, y, y_hat):
        rs, gs, fr, fg = [], [], [], []
        for d in self.discriminators:
            o, f = d(y); rs.append(o); fr.append(f)
            o, f = d(y_hat); gs.append(o); fg.append(f)
        return rs, gs, fr, fg


class TorchDiscR(nn.Module):
    def __init__(self, resolution, d_mult=1):
        super().__init__()
        self.resolution = resolution
        c = int(32 * d_mult)
        self.convs = nn.ModuleList([
            wn(nn.Conv2d(1, c, (3, 9), padding=(1, 4))),
            wn(nn.Conv2d(c, c, (3, 9), (1, 2), padding=(1, 4))),
            wn(nn.Conv2d(c, c, (3, 9), (1, 2), padding=(1, 4))),
            wn(nn.Conv2d(c, c, (3, 9), (1, 2), padding=(1, 4))),
            wn(nn.Conv2d(c, c, (3, 3), padding=(1, 1))),
        ])
        self.conv_post = wn(nn.Conv2d(c, 1, (3, 3), padding=(1, 1)))

    def forward(self, x):  # [B, T]
        n_fft, hop, win = self.resolution
        s = F.pad(x, ((n_fft - hop) // 2, (n_fft - hop) // 2), "reflect")
        # rectangular window: torch.stft default when window is None
        spec = torch.stft(s, n_fft=n_fft, hop_length=hop, win_length=win,
                          center=False, return_complex=True)
        h = torch.abs(spec).unsqueeze(1)  # [B, 1, bins, frames]
        fmap = []
        for l in self.convs:
            h = F.leaky_relu(l(h), 0.1)
            fmap.append(h)
        h = self.conv_post(h)
        fmap.append(h)
        return torch.flatten(h, 1, -1), fmap


class TorchMRD(nn.Module):
    def __init__(self, resolutions=((1024, 120, 600), (2048, 240, 1200),
                                    (512, 50, 240)), d_mult=1):
        super().__init__()
        self.discriminators = nn.ModuleList(
            [TorchDiscR(r, d_mult) for r in resolutions])

    def forward(self, y, y_hat):
        rs, gs, fr, fg = [], [], [], []
        for d in self.discriminators:
            o, f = d(y); rs.append(o); fr.append(f)
            o, f = d(y_hat); gs.append(o); fg.append(f)
        return rs, gs, fr, fg
