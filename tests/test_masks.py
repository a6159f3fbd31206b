"""Mask semantics vs the reference doctest truth tables
(liteasr/utils/mask.py:15-21,45-83,130-141)."""

import jax.numpy as jnp
import numpy as np

from liteasr_tpu.ops.masks import padding_mask, span_mask, triangle_mask


def test_padding_mask():
    out = np.asarray(padding_mask(jnp.array([5, 3, 1]), 5))
    expected = np.array([
        [0, 0, 0, 0, 0],
        [0, 0, 0, 1, 1],
        [0, 1, 1, 1, 1],
    ], dtype=bool)
    np.testing.assert_array_equal(out, expected)


def test_triangle_mask_square():
    out = np.asarray(triangle_mask(5))
    expected = np.triu(np.ones((5, 5), dtype=bool), k=1)
    np.testing.assert_array_equal(out, expected)


def test_triangle_mask_rect_diagonal():
    out = np.asarray(triangle_mask(3, col=5, diagonal=2))
    expected = np.array([
        [0, 0, 1, 1, 1],
        [0, 0, 0, 1, 1],
        [0, 0, 0, 0, 1],
    ], dtype=bool)
    np.testing.assert_array_equal(out, expected)


def test_triangle_mask_stage():
    # chunked causal mask (streaming primitive), doctest mask.py:64-73
    out = np.asarray(triangle_mask(8, stage=2))
    expected = np.array([
        [0, 0, 1, 1, 1, 1, 1, 1],
        [0, 0, 1, 1, 1, 1, 1, 1],
        [0, 0, 0, 0, 1, 1, 1, 1],
        [0, 0, 0, 0, 1, 1, 1, 1],
        [0, 0, 0, 0, 0, 0, 1, 1],
        [0, 0, 0, 0, 0, 0, 1, 1],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ], dtype=bool)
    np.testing.assert_array_equal(out, expected)


def test_triangle_mask_stage_diagonal():
    out = np.asarray(triangle_mask(8, stage=2, diagonal=2))
    expected = np.array([
        [0, 0, 0, 0, 1, 1, 1, 1],
        [0, 0, 0, 0, 1, 1, 1, 1],
        [0, 0, 0, 0, 0, 0, 1, 1],
        [0, 0, 0, 0, 0, 0, 1, 1],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ], dtype=bool)
    np.testing.assert_array_equal(out, expected)


def test_span_mask_properties(rng):
    mask = span_mask(batch=4, frame=50, prob=0.5, length=4, rng=rng)
    assert mask.shape == (4, 50)
    counts = mask.sum(axis=1)
    # counts equalized across batch
    assert len(set(counts.tolist())) == 1
    assert counts[0] > 0


def test_span_mask_no_overlap(rng):
    mask = span_mask(batch=2, frame=100, prob=0.5, length=5,
                     no_overlap=True, min_interval=1, rng=rng)
    assert mask.shape == (2, 100)
    assert mask.sum() > 0
