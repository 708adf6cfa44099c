"""Packed (space-to-depth) vocoder ops vs the unpacked composition
(interpret mode on CPU; the same kernels compile on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from flowhigh_tpu.models.bigvgan import conv1d
from flowhigh_tpu.ops.packed import (pack_time, packed_act_reference,
                                     packed_conv1d,
                                     packed_snake_activation1d, unpack_time)


def test_pack_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 24, 5)).astype(np.float32))
    xp = pack_time(x, 4)
    assert xp.shape == (2, 6, 20)
    # phase-major: lane block m holds time phase m
    np.testing.assert_array_equal(np.asarray(xp[0, 1, 5:10]),
                                  np.asarray(x[0, 5, :]))
    np.testing.assert_array_equal(np.asarray(unpack_time(xp, 4)),
                                  np.asarray(x))


@pytest.mark.parametrize("k,d,p,cin,cout", [
    (3, 1, 8, 48, 48), (7, 3, 8, 48, 48), (11, 5, 8, 48, 48),
    (11, 5, 4, 96, 96), (11, 3, 2, 192, 192), (7, 1, 8, 48, 1),
    (4, 2, 3, 5, 7),
])
def test_packed_conv_matches(rng, k, d, p, cin, cout):
    t = 24 * p
    pad = (k * d - d) // 2
    x = jnp.asarray(rng.standard_normal((2, t, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    ref = conv1d(x, w, b, padding=pad, dilation=d)
    got = unpack_time(packed_conv1d(pack_time(x, p), w, b, pad=pad,
                                    dilation=d, p=p), p)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("t,c,p", [
    (480, 48, 8), (960, 96, 4), (512, 192, 2), (4096, 48, 8), (100 * 8, 48, 8),
    (480, 384, 1),
])
def test_packed_act_matches(rng, t, c, p):
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)
    xp = pack_time(x, p)
    ref = packed_act_reference(xp, alpha, beta, True, p)
    got = packed_snake_activation1d(xp, alpha, beta, True, p, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_packed_act_edges_and_awkward_rows(rng):
    # row count with no multiple-of-8 divisor -> pad path; edges patched exactly
    x = jnp.asarray(rng.standard_normal((1, 8 * 13, 48)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(48).astype(np.float32) * 0.2)
    beta = jnp.asarray(rng.standard_normal(48).astype(np.float32) * 0.2)
    xp = pack_time(x, 8)
    ref = np.asarray(packed_act_reference(xp, alpha, beta, True, 8))
    got = np.asarray(packed_snake_activation1d(xp, alpha, beta, True, 8,
                                               interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_packed_act_padded_rows_tail(rng):
    # regression: an ODD row count (no multiple-of-8 divisor at all) takes
    # the pad-rows path, whose recursion used to patch edges at the PADDED
    # tail only — the true tail (~last 3 samples) kept kernel output with
    # the wrong edge semantics (base-rate replicate fill vs the reference's
    # 2x-rate snake-output replicate).
    for p, s in ((1, 537), (4, 569), (8, 75)):
        c = 48
        xp = jnp.asarray(rng.standard_normal((1, s, p * c)).astype(np.float32) * 0.4)
        alpha = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.2)
        beta = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.2)
        ref = np.asarray(packed_act_reference(xp, alpha, beta, True, p))
        got = np.asarray(packed_snake_activation1d(xp, alpha, beta, True, p,
                                                   interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
        # the tail specifically
        np.testing.assert_allclose(got[:, -4:], ref[:, -4:], atol=2e-5,
                                   rtol=1e-4)


def test_packed_act_no_beta(rng):
    x = jnp.asarray(rng.standard_normal((1, 512, 96)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(96).astype(np.float32) * 0.2)
    xp = pack_time(x, 4)
    ref = packed_act_reference(xp, alpha, None, False, 4)
    got = packed_snake_activation1d(xp, alpha, None, False, 4, interpret=True)
    # raw (non-logscale) alpha near zero makes 1/alpha large: the kernel's
    # cos-form identity loses a few ulps to cancellation there
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_packed_bigvgan_matches_unpacked(rng):
    """Full generator: packed MRF path == plain path on a small config."""
    import jax
    from flowhigh_tpu.config import VocoderConfig
    from flowhigh_tpu.models.bigvgan import BigVGAN

    cfg = VocoderConfig(
        num_mels=8, upsample_initial_channel=64,
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    mel = jnp.asarray(rng.standard_normal((1, 40, 8)).astype(np.float32) * 0.3)
    plain = BigVGAN(cfg)
    params = plain.init(jax.random.PRNGKey(0), mel)
    ref = plain.apply(params, mel)
    got = BigVGAN(cfg, packed=True).apply(params, mel)
    assert got.shape == ref.shape == (1, 40 * 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("k,d,p,c,res", [
    (11, 5, 8, 48, False), (11, 5, 1, 96, True), (7, 3, 2, 192, False),
    (3, 1, 4, 96, True), (11, 5, 2, 192, False),
])
def test_pallas_packed_conv_matches(rng, k, d, p, c, res):
    from flowhigh_tpu.ops.packed import pallas_packed_conv1d

    s = 48  # packed rows
    pad = (k * d - d) // 2
    xp = jnp.asarray(rng.standard_normal((2, s, p * c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    r = (jnp.asarray(rng.standard_normal((2, s, p * c)).astype(np.float32))
         if res else None)
    ref = packed_conv1d(xp, w, b, pad=pad, dilation=d, p=p)
    if res:
        ref = ref + r
    got = pallas_packed_conv1d(xp, w, b, pad=pad, dilation=d, p=p, residual=r,
                               dot_dtype=jnp.float32, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_pallas_packed_conv_awkward_rows(rng):
    from flowhigh_tpu.ops.packed import pallas_packed_conv1d

    xp = jnp.asarray(rng.standard_normal((1, 13, 384)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((7, 48, 48)).astype(np.float32) * 0.1)
    ref = packed_conv1d(xp, w, None, pad=3, dilation=1, p=8)
    got = pallas_packed_conv1d(xp, w, None, pad=3, dilation=1, p=8,
                               dot_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_pallas_conv_multi_residual_scale(rng):
    """Multiple fused residuals + out_scale == XLA composition (the MRF
    branch-average fold)."""
    from flowhigh_tpu.ops.packed import pallas_packed_conv1d

    s, p, c = 48, 8, 48
    xp = jnp.asarray(rng.standard_normal((2, s, p * c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((7, c, c)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    r1 = jnp.asarray(rng.standard_normal((2, s, p * c)).astype(np.float32))
    r2 = jnp.asarray(rng.standard_normal((2, s, p * c)).astype(np.float32))
    r3 = jnp.asarray(rng.standard_normal((2, s, p * c)).astype(np.float32))
    ref = (packed_conv1d(xp, w, b, pad=9, dilation=3, p=p) + r1 + r2 + r3) / 3.0
    got = pallas_packed_conv1d(xp, w, b, pad=9, dilation=3, p=p,
                               residual=[r1, r2, r3], out_scale=1.0 / 3.0,
                               dot_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("u,k,p_in,p_out,cin,cout", [
    (2, 4, 4, 8, 96, 48),    # s3 -> s4 stage boundary (same-rows)
    (3, 7, 2, 4, 192, 96),   # s2 -> s3 (3:2 super-rows)
    (4, 8, 1, 2, 384, 192),  # s1 -> s2 (unpacked in, 1:2 rows)
    (4, 8, 1, 8, 64, 32),    # small-config shape (g_o=1, g_i=2)
    (5, 11, 1, 1, 96, 48),   # mel -> s1: unpacked in AND out (g_i=1, g_o=u)
    (4, 8, 1, 1, 96, 48),    # s1 -> s2 unpacked out
])
def test_pallas_packed_conv_transpose_matches(rng, u, k, p_in, p_out, cin, cout):
    """Packed transposed conv == pack(conv_transpose1d(unpack(x)))."""
    from flowhigh_tpu.models.bigvgan import conv_transpose1d
    from flowhigh_tpu.ops.packed import pallas_packed_conv_transpose1d

    s_in = 48
    xp = jnp.asarray(
        rng.standard_normal((2, s_in, p_in * cin)).astype(np.float32))
    wt = jnp.asarray(
        rng.standard_normal((k, cout, cin)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    pad = (k - u) // 2
    ref = pack_time(conv_transpose1d(unpack_time(xp, p_in), wt, b,
                                     stride=u, padding=pad), p_out)
    got = pallas_packed_conv_transpose1d(xp, wt, b, stride=u, padding=pad,
                                         p_in=p_in, p_out=p_out,
                                         interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_pallas_packed_conv_transpose_residual_scale(rng):
    """Fused residuals + out_scale on the transposed conv."""
    from flowhigh_tpu.models.bigvgan import conv_transpose1d
    from flowhigh_tpu.ops.packed import pallas_packed_conv_transpose1d

    u, k, p_in, p_out, cin, cout = 2, 4, 4, 8, 96, 48
    s_in = 48
    xp = jnp.asarray(
        rng.standard_normal((1, s_in, p_in * cin)).astype(np.float32))
    wt = jnp.asarray(
        rng.standard_normal((k, cout, cin)).astype(np.float32) * 0.1)
    r = jnp.asarray(
        rng.standard_normal((1, s_in, p_out * cout)).astype(np.float32))
    ref = (pack_time(conv_transpose1d(unpack_time(xp, p_in), wt, None,
                                      stride=u, padding=1), p_out) + r) * 0.5
    got = pallas_packed_conv_transpose1d(xp, wt, None, stride=u, padding=1,
                                         p_in=p_in, p_out=p_out, residual=r,
                                         out_scale=0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_pallas_bigvgan_matches_unpacked(rng):
    """Full generator with packed MRF + Pallas convs == plain path."""
    import jax
    from flowhigh_tpu.config import VocoderConfig
    from flowhigh_tpu.models.bigvgan import BigVGAN

    cfg = VocoderConfig(
        num_mels=8, upsample_initial_channel=64,
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    mel = jnp.asarray(rng.standard_normal((1, 40, 8)).astype(np.float32) * 0.3)
    plain = BigVGAN(cfg)
    params = plain.init(jax.random.PRNGKey(0), mel)
    ref = plain.apply(params, mel)
    got = BigVGAN(cfg, packed=True, pallas_convs=True).apply(params, mel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_pallas_bigvgan_bf16_storage_close_to_f32(rng):
    """bf16 HBM storage of the packed stages (storage_dtype=bfloat16) stays
    numerically close to the exact f32 path: both Pallas kernels accumulate
    in f32, so only the inter-op feature maps round to bf16."""
    import jax
    from flowhigh_tpu.config import VocoderConfig
    from flowhigh_tpu.models.bigvgan import BigVGAN

    cfg = VocoderConfig(
        num_mels=8, upsample_initial_channel=64,
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    mel = jnp.asarray(rng.standard_normal((1, 40, 8)).astype(np.float32) * 0.3)
    plain = BigVGAN(cfg)
    params = plain.init(jax.random.PRNGKey(0), mel)
    ref = np.asarray(plain.apply(params, mel))
    got = np.asarray(BigVGAN(cfg, packed=True, pallas_convs=True,
                             storage_dtype=jnp.bfloat16).apply(params, mel))
    assert got.dtype == np.float32  # output stays f32 (tanh in f32)
    # bf16 rounding through ~10 ops: relative error bounded well below
    # perceptual relevance (waveform is tanh-bounded)
    err = np.abs(got - ref).max()
    assert err < 5e-2, err
    # and correlation stays essentially 1
    denom = (ref * ref).sum() ** 0.5 * (got * got).sum() ** 0.5
    corr = float((ref * got).sum() / (denom + 1e-12))
    assert corr > 0.999, corr


class TestFusedActConv:
    """pallas_packed_act_conv1d == packed act followed by packed conv."""

    @pytest.mark.parametrize("p,c,k,d", [
        (8, 48, 3, 1), (8, 48, 11, 5), (4, 96, 7, 3), (2, 192, 3, 1),
        (1, 384, 7, 3), (1, 384, 3, 1),
        # heavy pairs newly eligible at the reduced 128-row tile cap
        (2, 192, 11, 3), (2, 192, 11, 5), (1, 384, 11, 1),
    ])
    def test_matches_unfused(self, rng, p, c, k, d):
        from flowhigh_tpu.ops.packed import (pallas_packed_act_conv1d,
                                             packed_snake_activation1d)
        s = 96
        xp = jnp.asarray(rng.standard_normal((2, s, p * c)).astype(np.float32) * 0.4)
        alpha = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.2)
        beta = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.2)
        w = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
        pad = (k * d - d) // 2
        res = jnp.asarray(rng.standard_normal((2, s, p * c)).astype(np.float32) * 0.2)

        a = packed_snake_activation1d(xp, alpha, beta, True, p, interpret=True)
        ref = packed_conv1d(a, w, b, pad=pad, dilation=d, p=p) + res
        got = pallas_packed_act_conv1d(xp, alpha, beta, True, w, b, pad=pad,
                                       dilation=d, p=p, residual=res,
                                       interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)

    def test_awkward_rows_and_no_residual(self, rng):
        from flowhigh_tpu.ops.packed import (pallas_packed_act_conv1d,
                                             packed_snake_activation1d)
        p, c = 8, 48
        xp = jnp.asarray(rng.standard_normal((1, 37, p * c)).astype(np.float32) * 0.4)
        alpha = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.2)
        beta = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.2)
        w = jnp.asarray(rng.standard_normal((7, c, c)).astype(np.float32) * 0.05)
        a = packed_snake_activation1d(xp, alpha, beta, True, p, interpret=True)
        ref = packed_conv1d(a, w, None, pad=3, dilation=1, p=p)
        got = pallas_packed_act_conv1d(xp, alpha, beta, True, w, None, pad=3,
                                       dilation=1, p=p, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)

    def test_fusable_predicate(self):
        from flowhigh_tpu.ops.packed import act_conv_fusable, act_conv_plan
        assert act_conv_plan(11, 25, 5, 8, 48) == 256    # stage 5: always
        assert act_conv_plan(3, 1, 1, 2, 192) == 256     # small kernels fit
        assert act_conv_plan(7, 9, 3, 1, 384) == 256     # p=1, C=384: 3.9 MiB
        # heavy-but-fitting pairs fuse at the reduced tile cap
        assert act_conv_plan(11, 5, 1, 1, 384) == 128    # s2 k=11: 6.2 MiB
        assert act_conv_plan(11, 15, 3, 2, 192) == 128   # s3 k=11 d=3: 9.6 MiB
        assert act_conv_plan(11, 25, 5, 2, 192) == 128   # s3 k=11 d=5: 9.6 MiB
        # ...except at 768-lane widths, where fusing measured slower
        # (round-3 sweep: s1 k=3 fused -0.52 ms/pair)
        assert act_conv_plan(3, 1, 1, 1, 768) == 0
        assert not act_conv_fusable(7, 9, 3, 1, 768)     # s1 k=7: 15.8 MiB

    @pytest.mark.parametrize("p,c,k,d,s", [
        (8, 48, 11, 5, 256), (8, 48, 3, 1, 256), (4, 96, 7, 3, 256),
        (2, 192, 7, 3, 256), (1, 384, 3, 1, 512),
        (8, 48, 7, 3, 96),   # short input -> unfused fallback path
        (8, 48, 3, 1, 250),  # indivisible row count -> padded-rows path
    ])
    def test_amp_unit_matches_pairs(self, rng, p, c, k, d, s):
        from flowhigh_tpu.ops.packed import (pallas_packed_act_conv1d,
                                             pallas_packed_amp_unit)
        xp = jnp.asarray(rng.standard_normal((1, s, p * c)).astype(np.float32) * 0.4)
        a1 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.2)
        be1 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.2)
        a2 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.2)
        be2 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.2)
        w1 = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32) * 0.05)
        b1 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32) * 0.05)
        b2 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
        res = jnp.asarray(rng.standard_normal((1, s, p * c)).astype(np.float32) * 0.2)
        pad1, pad2 = (k * d - d) // 2, (k - 1) // 2

        t = pallas_packed_act_conv1d(xp, a1, be1, True, w1, b1, pad=pad1,
                                     dilation=d, p=p, interpret=True)
        ref = pallas_packed_act_conv1d(t, a2, be2, True, w2, b2, pad=pad2,
                                       dilation=1, p=p, residual=(xp, res),
                                       out_scale=1.0 / 3, interpret=True)
        got = pallas_packed_amp_unit(xp, a1, be1, a2, be2, True, w1, b1,
                                     w2, b2, pad1=pad1, dil1=d, pad2=pad2,
                                     p=p, extra_residuals=res,
                                     out_scale=1.0 / 3, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-4, rtol=2e-4)

    @pytest.mark.parametrize("pipe", [2, 4])
    def test_subtile_pipeline_matches_monolithic(self, rng, pipe):
        """pipeline>1 (interleaved VPU/MXU subtile emission) must be
        numerically identical math to the monolithic kernel, for both the
        unit and pair kernels, including edge tiles and sublane-misaligned
        fallbacks."""
        from flowhigh_tpu.ops.packed import (pallas_packed_act_conv1d,
                                             pallas_packed_amp_unit)
        for (p, c, k, d, s) in [(8, 48, 7, 3, 128), (4, 96, 11, 1, 192),
                                (2, 192, 3, 1, 64), (8, 48, 3, 1, 250)]:
            xp = jnp.asarray(
                rng.standard_normal((1, s, p * c)).astype(np.float32) * 0.4)
            a1 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.2)
            be1 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.2)
            a2 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.2)
            be2 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.2)
            w1 = jnp.asarray(
                rng.standard_normal((k, c, c)).astype(np.float32) * 0.05)
            b1 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
            w2 = jnp.asarray(
                rng.standard_normal((k, c, c)).astype(np.float32) * 0.05)
            b2 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
            pad1, pad2 = (k * d - d) // 2, (k - 1) // 2
            kw = dict(pad1=pad1, dil1=d, pad2=pad2, p=p, interpret=True,
                      s_t_cap=64)
            ref = pallas_packed_amp_unit(xp, a1, be1, a2, be2, True, w1, b1,
                                         w2, b2, pipeline=1, **kw)
            got = pallas_packed_amp_unit(xp, a1, be1, a2, be2, True, w1, b1,
                                         w2, b2, pipeline=pipe, **kw)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-5, rtol=1e-5)
            pref = pallas_packed_act_conv1d(xp, a1, be1, True, w1, b1,
                                            pad=pad1, dilation=d, p=p,
                                            interpret=True, s_t_cap=64,
                                            pipeline=1)
            pgot = pallas_packed_act_conv1d(xp, a1, be1, True, w1, b1,
                                            pad=pad1, dilation=d, p=p,
                                            interpret=True, s_t_cap=64,
                                            pipeline=pipe)
            np.testing.assert_allclose(np.asarray(pgot), np.asarray(pref),
                                       atol=1e-5, rtol=1e-5)

    def test_full_generator_with_fusion(self, rng):
        import jax
        from flowhigh_tpu.config import VocoderConfig
        from flowhigh_tpu.models.bigvgan import BigVGAN
        cfg = VocoderConfig(
            num_mels=8, upsample_initial_channel=64,
            upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
            resblock_kernel_sizes=(3, 7),
            resblock_dilation_sizes=((1, 3), (1, 3)))
        mel = jnp.asarray(rng.standard_normal((1, 40, 8)).astype(np.float32) * 0.3)
        plain = BigVGAN(cfg)
        params = plain.init(jax.random.PRNGKey(0), mel)
        ref = plain.apply(params, mel)
        got = BigVGAN(cfg, packed=True, pallas_convs=True,
                      fuse_act_conv=True).apply(params, mel)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)
        # "auto" (fuse only k<=3 pairs — the serving default) also matches
        got_auto = BigVGAN(cfg, packed=True, pallas_convs=True,
                           fuse_act_conv="auto").apply(params, mel)
        np.testing.assert_allclose(np.asarray(got_auto), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


class TestInt8Dots:
    """int8 packed-conv dots (opt-in dot_dtype=jnp.int8): per-output-lane
    weight scales + one dynamic scalar activation scale per kernel window
    (ops/packed.py round-5). Quantization-grade closeness here at random
    weights; the realistic-statistics quality bound is the LSD battery
    (tests/test_lsd_battery.py)."""

    @staticmethod
    def _rel(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))

    @pytest.mark.parametrize("p,c,k,d", [(8, 48, 7, 3), (4, 96, 11, 5),
                                         (2, 192, 7, 1), (1, 384, 3, 1)])
    def test_int8_conv_close(self, rng, p, c, k, d):
        from flowhigh_tpu.ops.packed import pallas_packed_conv1d
        s = 48
        xp = jnp.asarray(rng.standard_normal((1, s, p * c)).astype(np.float32))
        w = jnp.asarray((rng.standard_normal((k, c, c)) * 0.1).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.01)
        pad = (k * d - d) // 2
        ref = packed_conv1d(xp, w, b, pad=pad, dilation=d, p=p)
        got = pallas_packed_conv1d(xp, w, b, pad=pad, dilation=d, p=p,
                                   dot_dtype=jnp.int8, interpret=True)
        assert self._rel(got, ref) < 0.03

    def test_int8_act_conv_pair_close(self, rng):
        from flowhigh_tpu.ops.packed import pallas_packed_act_conv1d
        p, c, k, d, s = 4, 96, 7, 3, 48
        xp = jnp.asarray(rng.standard_normal((1, s, p * c)).astype(np.float32))
        w = jnp.asarray((rng.standard_normal((k, c, c)) * 0.1).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.01)
        alpha = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
        beta = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
        pad = (k * d - d) // 2
        a = packed_snake_activation1d(xp, alpha, beta, True, p, interpret=True)
        ref = packed_conv1d(a, w, b, pad=pad, dilation=d, p=p)
        got = pallas_packed_act_conv1d(xp, alpha, beta, True, w, b, pad=pad,
                                       dilation=d, p=p, dot_dtype=jnp.int8,
                                       interpret=True)
        assert self._rel(got, ref) < 0.03

    def test_int8_amp_unit_close(self, rng):
        from flowhigh_tpu.ops.packed import pallas_packed_amp_unit
        p, c, k, d, s = 8, 48, 7, 3, 48
        xp = jnp.asarray(rng.standard_normal((1, s, p * c)).astype(np.float32))
        mk = lambda *sh: jnp.asarray(
            (rng.standard_normal(sh) * 0.1).astype(np.float32))
        w1, w2 = mk(k, c, c), mk(k, c, c)
        b1, b2 = mk(c) * 0.1, mk(c) * 0.1
        a1, be1, a2, be2 = mk(c), mk(c), mk(c), mk(c)
        pad1, pad2 = (k * d - d) // 2, (k - 1) // 2
        t = packed_conv1d(
            packed_snake_activation1d(xp, a1, be1, True, p, interpret=True),
            w1, b1, pad=pad1, dilation=d, p=p)
        ref = packed_conv1d(
            packed_snake_activation1d(t, a2, be2, True, p, interpret=True),
            w2, b2, pad=pad2, dilation=1, p=p) + xp
        got = pallas_packed_amp_unit(xp, a1, be1, a2, be2, True, w1, b1,
                                     w2, b2, pad1=pad1, dil1=d, pad2=pad2,
                                     p=p, dot_dtype=jnp.int8, interpret=True)
        assert self._rel(got, ref) < 0.05

    def test_int8_full_generator_close(self, rng):
        """BigVGAN(conv_dtype=int8): resblock dots quantized, stage-boundary
        upsamplers and conv_post stay exact f32 (_boundary_dtype)."""
        import jax
        from flowhigh_tpu.config import VocoderConfig
        from flowhigh_tpu.models.bigvgan import BigVGAN
        cfg = VocoderConfig(
            num_mels=8, upsample_initial_channel=64,
            upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
            resblock_kernel_sizes=(3, 7),
            resblock_dilation_sizes=((1, 3), (1, 3)))
        mel = jnp.asarray(rng.standard_normal((1, 40, 8)).astype(np.float32) * 0.3)
        plain = BigVGAN(cfg)
        params = plain.init(jax.random.PRNGKey(0), mel)
        ref = np.asarray(plain.apply(params, mel))
        got = np.asarray(BigVGAN(cfg, packed=True, pallas_convs=True,
                                 fuse_act_conv=True,
                                 conv_dtype=jnp.int8).apply(params, mel))
        assert np.isfinite(got).all()
        assert self._rel(got, ref) < 0.1  # quantization-grade, random weights

    def test_int8_rejected_off_pallas_path(self, rng):
        xp = jnp.zeros((1, 8, 96), jnp.float32)
        w = jnp.zeros((3, 48, 48), jnp.float32)
        with pytest.raises(ValueError, match="int8"):
            packed_conv1d(xp, w, None, pad=1, dilation=1, p=2,
                          conv_dtype=jnp.int8)
