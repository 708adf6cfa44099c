"""Seeded randomized-shape parity fuzz for the packed Pallas kernel family.

The fixed-grid tests in test_packed.py pin known shapes; this sweeps random
(p, c, k, d, s) tuples — including odd row counts that force every kernel's
pad-rows path — against the unfused XLA composition. The act-tail regression
(packed_snake_activation1d patching the PADDED tail instead of the true one)
was found exactly this way; keep the trial budget small so the suite stays
fast, and bump the seed set rather than the budget if it ever needs widening.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import flowhigh_tpu.ops.packed as PK


def _rand_params(rng, c, k):
    a1 = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.2)
    be1 = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.2)
    w = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32) * 0.08)
    b = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.02)
    return a1, be1, w, b


def _rel(got, ref):
    sc = max(1.0, float(jnp.abs(ref).max()))
    return float(jnp.abs(got - ref).max()) / sc


@pytest.mark.parametrize("seed", [7, 23])
def test_fuzz_act_pair_unit(seed):
    rng = np.random.default_rng(seed)
    for _ in range(6):
        p = int(rng.choice([1, 2, 4, 8]))
        c = int(rng.choice([16, 32, 48, 64]))
        k = int(rng.choice([3, 7]))
        d = int(rng.choice([1, 3]))
        # half the draws odd -> pad-rows path in every kernel
        s = int(rng.integers(24, 400)) | (1 if rng.integers(0, 2) else 0)
        pc = p * c
        logscale = bool(rng.integers(0, 2))
        x = jnp.asarray(
            rng.standard_normal((1, s, pc)).astype(np.float32) * 0.4)
        a1, be1, w1, b1 = _rand_params(rng, c, k)
        a2, be2, w2, b2 = _rand_params(rng, c, k)
        pad1, pad2 = (k * d - d) // 2, (k - 1) // 2

        ref_a = PK.packed_act_reference(x, a1, be1, logscale, p)
        ref_t = PK.packed_conv1d(ref_a, w1, b1, pad=pad1, dilation=d, p=p)
        ref_a2 = PK.packed_act_reference(ref_t, a2, be2, logscale, p)
        ref_y = PK.packed_conv1d(ref_a2, w2, b2, pad=pad2, dilation=1,
                                 p=p) + x
        tag = f"p={p} c={c} k={k} d={d} s={s} log={logscale}"

        got_a = PK.packed_snake_activation1d(x, a1, be1, logscale, p,
                                             interpret=True)
        # raw beta can land near zero (1/beta amplification): judge the act
        # relative to its own output scale
        assert _rel(got_a, ref_a) < 3e-5, f"act {tag}"

        got_t = PK.pallas_packed_act_conv1d(
            x, a1, be1, logscale, w1, b1, pad=pad1, dilation=d, p=p,
            interpret=True)
        assert _rel(got_t, ref_t) < 3e-5, f"pair {tag}"

        cap = PK.amp_unit_plan(k, d, p, c)
        if cap:
            got_y = PK.pallas_packed_amp_unit(
                x, a1, be1, a2, be2, logscale, w1, b1, w2, b2, pad1=pad1,
                dil1=d, pad2=pad2, p=p, s_t_cap=cap, interpret=True)
            assert _rel(got_y, ref_y) < 3e-5, f"unit {tag}"


def test_fuzz_conv_residual_scale():
    rng = np.random.default_rng(31)
    for _ in range(8):
        p = int(rng.choice([1, 2, 4, 8]))
        c = int(rng.choice([16, 32, 48, 64]))
        k = int(rng.choice([1, 3, 7, 11]))
        d = int(rng.choice([1, 3, 5]))
        s = int(rng.integers(20, 400))
        pc = p * c
        n_res = int(rng.integers(0, 3))
        scale = float(rng.choice([1.0, 1 / 3]))
        x = jnp.asarray(
            rng.standard_normal((1, s, pc)).astype(np.float32) * 0.4)
        _, _, w, b = _rand_params(rng, c, k)
        res = tuple(
            jnp.asarray(rng.standard_normal((1, s, pc)).astype(np.float32))
            for _ in range(n_res))
        pad = (k * d - d) // 2
        ref = PK.packed_conv1d(x, w, b, pad=pad, dilation=d, p=p)
        for r in res:
            ref = ref + r
        ref = ref * scale
        got = PK.pallas_packed_conv1d(x, w, b, pad=pad, dilation=d, p=p,
                                      residual=res or None, out_scale=scale,
                                      interpret=True)
        assert _rel(got, ref) < 3e-5, (p, c, k, d, s, n_res, scale)
