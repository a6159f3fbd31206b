"""Batched on-device SpecAugment (PRNG-keyed, jit-safe).

The production counterpart of the host per-sample transform
(liteasr_tpu/data/transform/spec_augment.py; reference
liteasr/utils/transform/spec_augment.py:14-125). Runs inside the jitted
train step on the whole padded batch:

* time warp: random center/warp drawn per sample within the valid region,
  realized as a piecewise-linear coordinate remap + linear interpolation
  gather (the reference uses PIL bicubic; linear interp is the documented
  deviation — augmentation-grade, not bit-exact),
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


def _time_warp_one(rng, x, xlen, window: int):
    T = x.shape[0]
    r1, r2 = jax.random.split(rng)
    lo, hi = window, jnp.maximum(xlen - window, window + 1)
    center = jax.random.randint(r1, (), lo, hi)
    warped = jax.random.randint(r2, (), center - window, center + window) + 1
    warped = jnp.clip(warped, 1, xlen - 1)

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
    out = (1.0 - frac) * x[lo_i] + frac * x[hi_i]
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
    "time_mask_times", "replace_with_zero"))
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
) -> jnp.ndarray:
    """Apply SpecAugment to a padded batch (B, T, D) with valid lens (B,)."""
    B = xs.shape[0]
    # key width depends on the PRNG impl (threefry: 2 words, rbg: 4)
    keys = jax.random.split(rng, B * 3)
    keys = keys.reshape((B, 3) + keys.shape[1:])

    def one(key3, x, xlen):
        if time_warp > 0:
            x = _time_warp_one(key3[0], x, xlen, time_warp)
        if freq_mask > 0 and freq_mask_times > 0:
            x = _axis_mask_one(key3[1], x, xlen, freq_mask, freq_mask_times,
                               axis=1, replace_with_zero=replace_with_zero)
        if time_mask > 0 and time_mask_times > 0:
            x = _axis_mask_one(key3[2], x, xlen, time_mask, time_mask_times,
                               axis=0, replace_with_zero=replace_with_zero)
        return x

    return jax.vmap(one)(keys, xs, xlens)
