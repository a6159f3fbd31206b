"""Batched on-device SpecAugment (PRNG-keyed, jit-safe).

The production counterpart of the host per-sample transform
(liteasr_tpu/data/transform/spec_augment.py; reference
liteasr/utils/transform/spec_augment.py:14-125). Runs inside the jitted
train step on the whole padded batch:

* time warp: random center/warp drawn per sample within the valid region,
  realized as a two-segment PIL-parity BICUBIC resample (Keys a=-0.5
  kernel, pixel-center alignment, clipped-support weight renormalization —
  exactly PIL Resample.c's precompute_coeffs, so the production on-device
  path now matches the reference's augmentation statistics;
  tests/test_spec_augment.py pins device-vs-PIL parity). A piecewise-linear
  mode is kept as ``time_warp_mode="linear"``. The one bounded deviation:
  the scaled downscale kernel is truncated to ``K_TAPS`` taps (weights
  still renormalized), which only engages when a segment shrinks by more
  than (K_TAPS-1)/4 = 2.75x — a <<1% tail of the (center, warped) draw
  space,
* freq/time masks: the reference's exact sampling scheme (position bound
  drawn from [0, param), width drawn independently from [0, param)), filled
  with the per-sample mean over the valid region.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _valid_mean(x, xlen):
    """Mean over the first xlen frames of (T, D)."""
    T = x.shape[0]
    m = (jnp.arange(T) < xlen)[:, None]
    return (x * m).sum() / jnp.maximum(xlen * x.shape[1], 1)


K_TAPS = 12  # static taps per output row; exact PIL parity up to
#             filterscale (K_TAPS-1)/4 = 2.75x segment downscale


def _keys_cubic(t):
    """PIL's BICUBIC kernel: Keys cubic, a = -0.5 (Resample.c
    bicubic_filter)."""
    at = jnp.abs(t)
    near = (1.5 * at - 2.5) * at * at + 1.0
    far = ((-0.5 * at + 2.5) * at - 4.0) * at + 2.0
    return jnp.where(at < 1.0, near, jnp.where(at < 2.0, far, 0.0))


def _warp_bicubic(x, xlen, center, warped):
    """PIL ``Image.resize(..., BICUBIC)`` parity warp of the valid region:
    rows [0, center) resampled onto [0, warped), rows [center, xlen) onto
    [warped, xlen); padding rows >= xlen untouched.

    Follows PIL Resample.c precompute_coeffs exactly: sample positions at
    p + 0.5, source center c = src0 + (i_local + 0.5) * scale, kernel
    argument (p + 0.5 - c) / filterscale with filterscale = max(scale, 1),
    tap window [floor(c - support + 0.5), floor(c + support + 0.5)) clipped
    to the segment, weights renormalized over the clipped window.
    """
    T = x.shape[0]
    i = jnp.arange(T)
    in_left = i < warped
    f32 = jnp.float32
    dst0 = jnp.where(in_left, 0, warped)
    dst_len = jnp.where(in_left, warped, xlen - warped)
    src0 = jnp.where(in_left, 0, center)
    src_len = jnp.where(in_left, center, xlen - center)
    scale = src_len.astype(f32) / jnp.maximum(dst_len, 1).astype(f32)
    fscale = jnp.clip(scale, 1.0, (K_TAPS - 1) / 4.0)  # truncation cap
    c = src0.astype(f32) + (i - dst0 + 0.5) * scale
    support = 2.0 * fscale
    pmin = jnp.maximum(jnp.floor(c - support + 0.5).astype(jnp.int32), src0)
    pmax = jnp.minimum(jnp.floor(c + support + 0.5).astype(jnp.int32),
                       src0 + src_len)
    p = pmin[:, None] + jnp.arange(K_TAPS)[None, :]  # (T, K)
    w = _keys_cubic((p.astype(f32) + 0.5 - c[:, None]) / fscale[:, None])
    w = jnp.where(p < pmax[:, None], w, 0.0)
    w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-12)
    rows = x[jnp.clip(p, 0, T - 1)]  # (T, K, D)
    out = jnp.einsum("tk,tkd->td", w, rows)
    return jnp.where((i < xlen)[:, None], out, x)


def _warp_linear(x, xlen, center, warped):
    """Piecewise-linear coordinate remap + 2-tap interpolation (the round-3
    production path, kept as an option)."""
    T = x.shape[0]
    dst = jnp.arange(T).astype(jnp.float32)
    left_src = dst * (center.astype(jnp.float32)
                      / jnp.maximum(warped.astype(jnp.float32), 1.0))
    right_ratio = ((xlen - center).astype(jnp.float32)
                   / jnp.maximum((xlen - warped).astype(jnp.float32), 1.0))
    right_src = center + (dst - warped) * right_ratio
    src = jnp.where(dst < warped, left_src, right_src)
    src = jnp.where(dst >= xlen, dst, src)  # padding untouched
    src = jnp.clip(src, 0.0, T - 1.0)

    lo_i = jnp.floor(src).astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, T - 1)
    frac = (src - lo_i)[:, None]
    return (1.0 - frac) * x[lo_i] + frac * x[hi_i]


def _time_warp_one(rng, x, xlen, window: int, mode: str = "bicubic"):
    r1, r2 = jax.random.split(rng)
    lo, hi = window, jnp.maximum(xlen - window, window + 1)
    center = jax.random.randint(r1, (), lo, hi)
    warped = jax.random.randint(r2, (), center - window, center + window) + 1
    warped = jnp.clip(warped, 1, xlen - 1)

    if mode == "bicubic":
        out = _warp_bicubic(x, xlen, center, warped)
    elif mode == "linear":
        out = _warp_linear(x, xlen, center, warped)
    else:
        raise ValueError(f"unknown time_warp_mode {mode!r}")
    # too-short utterances are not warped (reference spec_augment.py:33-35)
    return jnp.where(xlen - window <= window, x, out)


def _axis_mask_one(rng, x, xlen, param: int, times: int, axis: int,
                   replace_with_zero: bool):
    """Reference sampling: (bound, width) ~ U[0, param)^2; start ~ U[0, size-bound)."""
    T, D = x.shape
    size = D if axis == 1 else None  # freq masks span the full feature dim
    fill = 0.0 if replace_with_zero else _valid_mean(x, xlen)

    def body(x, key):
        k1, k2, k3 = jax.random.split(key, 3)
        bound = jax.random.randint(k1, (), 0, max(param, 1))
        width = jax.random.randint(k2, (), 0, max(param, 1))
        # start ~ U[0, limit): floor(uniform * limit) is unbiased under a
        # traced bound (randint-then-modulo skews toward small starts)
        if axis == 1:
            limit = jnp.maximum(size - bound, 1)
            start = jnp.floor(
                jax.random.uniform(k3) * limit).astype(jnp.int32)
            idx = jnp.arange(D)[None, :]
            hit = (idx >= start) & (idx < start + width)
        else:
            limit = jnp.maximum(xlen - bound, 1)
            start = jnp.floor(
                jax.random.uniform(k3) * limit).astype(jnp.int32)
            idx = jnp.arange(T)[:, None]
            hit = (idx >= start) & (idx < start + width) & (idx < xlen)
        return jnp.where(hit, fill, x), None

    keys = jax.random.split(rng, times)
    x, _ = jax.lax.scan(body, x, keys)
    return x


@partial(jax.jit, static_argnames=(
    "time_warp", "freq_mask", "freq_mask_times", "time_mask",
    "time_mask_times", "replace_with_zero", "time_warp_mode"))
def spec_augment(
    rng,
    xs: jnp.ndarray,
    xlens: jnp.ndarray,
    time_warp: int = 5,
    freq_mask: int = 30,
    freq_mask_times: int = 2,
    time_mask: int = 40,
    time_mask_times: int = 2,
    replace_with_zero: bool = False,
    time_warp_mode: str = "bicubic",
) -> jnp.ndarray:
    """Apply SpecAugment to a padded batch (B, T, D) with valid lens (B,)."""
    B = xs.shape[0]
    # key width depends on the PRNG impl (threefry: 2 words, rbg: 4)
    keys = jax.random.split(rng, B * 3)
    keys = keys.reshape((B, 3) + keys.shape[1:])

    def one(key3, x, xlen):
        if time_warp > 0:
            x = _time_warp_one(key3[0], x, xlen, time_warp,
                               mode=time_warp_mode)
        if freq_mask > 0 and freq_mask_times > 0:
            x = _axis_mask_one(key3[1], x, xlen, freq_mask, freq_mask_times,
                               axis=1, replace_with_zero=replace_with_zero)
        if time_mask > 0 and time_mask_times > 0:
            x = _axis_mask_one(key3[2], x, xlen, time_mask, time_mask_times,
                               axis=0, replace_with_zero=replace_with_zero)
        return x

    return jax.vmap(one)(keys, xs, xlens)
