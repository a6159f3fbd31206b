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
                       time_mask=0, time_mask_times=0)
    np.testing.assert_array_equal(
        np.asarray(out[2, 30:]), np.asarray(xs[2, 30:]))
    # linear interpolation stays within the original value range
    assert float(out.max()) <= float(xs.max()) + 1e-5
    assert float(out.min()) >= float(xs.min()) - 1e-5


def test_deterministic_per_key(rng):
    xs, xlens = _batch(rng)
    a = spec_augment(jax.random.PRNGKey(3), xs, xlens)
    b = spec_augment(jax.random.PRNGKey(3), xs, xlens)
    c = spec_augment(jax.random.PRNGKey(4), xs, xlens)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(a - c).sum()) > 0
