"""On-device SpecAugment: masking statistics, padding invariance, warp."""

import jax
import jax.numpy as jnp
import numpy as np

from liteasr_tpu.ops.spec_augment import spec_augment


def _batch(rng, B=3, T=64, D=20):
    xs = jnp.asarray(rng.normal(size=(B, T, D)) + 5.0, jnp.float32)
    xlens = jnp.array([64, 48, 30], jnp.int32)[:B]
    return xs, xlens


def test_masks_change_values(rng):
    xs, xlens = _batch(rng)
    out = spec_augment(jax.random.PRNGKey(0), xs, xlens,
                       time_warp=0, freq_mask=8, freq_mask_times=2,
                       time_mask=8, time_mask_times=2)
    assert out.shape == xs.shape
    # something masked in at least one sample
    assert float(jnp.abs(out - xs).sum()) > 0


def test_padding_untouched_by_time_mask(rng):
    xs, xlens = _batch(rng)
    out = spec_augment(jax.random.PRNGKey(1), xs, xlens,
                       time_warp=0, freq_mask=0, freq_mask_times=0,
                       time_mask=10, time_mask_times=2)
    # frames past xlen keep their original values
    np.testing.assert_array_equal(
        np.asarray(out[1, 48:]), np.asarray(xs[1, 48:]))
    np.testing.assert_array_equal(
        np.asarray(out[2, 30:]), np.asarray(xs[2, 30:]))


def test_time_warp_preserves_padding_and_range(rng):
    xs, xlens = _batch(rng)
    out = spec_augment(jax.random.PRNGKey(2), xs, xlens,
                       time_warp=5, freq_mask=0, freq_mask_times=0,
                       time_mask=0, time_mask_times=0,
                       time_warp_mode="linear")
    np.testing.assert_array_equal(
        np.asarray(out[2, 30:]), np.asarray(xs[2, 30:]))
    # linear interpolation stays within the original value range
    assert float(out.max()) <= float(xs.max()) + 1e-5
    assert float(out.min()) >= float(xs.min()) - 1e-5


def test_time_warp_bicubic_preserves_padding(rng):
    xs, xlens = _batch(rng)
    out = spec_augment(jax.random.PRNGKey(2), xs, xlens,
                       time_warp=5, freq_mask=0, freq_mask_times=0,
                       time_mask=0, time_mask_times=0,
                       time_warp_mode="bicubic")
    np.testing.assert_array_equal(
        np.asarray(out[2, 30:]), np.asarray(xs[2, 30:]))
    assert np.isfinite(np.asarray(out)).all()


def _pil_warp(x, center, warped):
    """The reference's exact host warp (PIL BICUBIC two-segment resize,
    liteasr/utils/transform/spec_augment.py:38-50)."""
    from PIL import Image
    from PIL.Image import Resampling

    t, d = x.shape
    left = np.asarray(Image.fromarray(x[:center]).resize(
        (d, warped), Resampling.BICUBIC))
    right = np.asarray(Image.fromarray(x[center:]).resize(
        (d, t - warped), Resampling.BICUBIC))
    return np.concatenate([left, right], axis=0)


def test_bicubic_warp_matches_pil(rng):
    """Device _warp_bicubic == PIL resize within fp32 tolerance, for both
    upscale (warped > center) and downscale (warped < center) segments —
    closing VERDICT r3 #5 (the production path previously used linear)."""
    from liteasr_tpu.ops.spec_augment import _warp_bicubic

    T, D = 96, 24
    x = np.asarray(rng.normal(size=(T, D)), np.float32)
    # (center, warped): upscale left / downscale left / near-edge; all
    # within the exact zone (segment shrink factor < (K_TAPS-1)/4 = 2.75)
    for center, warped in [(40, 47), (40, 33), (12, 9), (80, 88), (50, 50)]:
        want = _pil_warp(x, center, warped)
        got = np.asarray(_warp_bicubic(
            jnp.asarray(x), jnp.int32(T), jnp.int32(center),
            jnp.int32(warped)))
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-4,
                                   err_msg=f"center={center} warped={warped}")


def test_bicubic_warp_padded_tail_untouched(rng):
    from liteasr_tpu.ops.spec_augment import _warp_bicubic

    T, D, xlen = 64, 8, 40
    x = np.asarray(rng.normal(size=(T, D)), np.float32)
    got = np.asarray(_warp_bicubic(
        jnp.asarray(x), jnp.int32(xlen), jnp.int32(18), jnp.int32(23)))
    # valid region matches PIL applied to the unpadded prefix
    want = _pil_warp(x[:xlen], 18, 23)
    np.testing.assert_allclose(got[:xlen], want, rtol=0, atol=2e-4)
    np.testing.assert_array_equal(got[xlen:], x[xlen:])


def test_deterministic_per_key(rng):
    xs, xlens = _batch(rng)
    a = spec_augment(jax.random.PRNGKey(3), xs, xlens)
    b = spec_augment(jax.random.PRNGKey(3), xs, xlens)
    c = spec_augment(jax.random.PRNGKey(4), xs, xlens)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(a - c).sum()) > 0
