"""Elementwise blocks: LayerNorm(eps=1e-12), Swish, FFN, positional encodings.

Reference: liteasr/nets/{layer_norm.py,swish.py,feed_forward.py,
positional_encoding.py}. Positional encodings are computed functionally per
call (static T under jit) instead of the reference's mutable buffer that
auto-extends (positional_encoding.py:40-47).
"""

import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

LN_EPS = 1e-12  # reference liteasr/nets/layer_norm.py:10


class _FusedLN(nn.Module):
    """Same parameter names/shapes as ``nn.LayerNorm`` (scale, bias) with
    the closed-form-VJP kernel from ops/layer_norm.py."""

    @nn.compact
    def __call__(self, x):
        from liteasr_tpu.ops.layer_norm import fused_layer_norm

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return fused_layer_norm(x, scale, bias, LN_EPS)


class LayerNorm(nn.Module):
    dtype: jnp.dtype = jnp.float32
    fused: bool = True  # closed-form VJP (ops/layer_norm.py)

    @nn.compact
    def __call__(self, x):
        # normalize in fp32 for stability (Fp32LayerNorm semantics,
        # liteasr/nets/layer_norm.py:32-44), cast back to compute dtype
        if self.fused:
            return _FusedLN(name="ln")(x).astype(self.dtype)
        y = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32, name="ln")(
            x.astype(jnp.float32))
        return y.astype(self.dtype)


def swish(x):
    return x * nn.sigmoid(x)


_ACTIVATIONS = {
    "relu": nn.relu,
    "swish": swish,
    "gelu": nn.gelu,
}


def get_activation(name: str):
    return _ACTIVATIONS[name]


class PositionwiseFeedForward(nn.Module):
    """fc1 -> act -> dropout -> fc2 (liteasr/nets/feed_forward.py:4-19)."""

    h_units: int
    dropout_rate: float
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = x.shape[-1]
        x = nn.Dense(self.h_units, dtype=self.dtype, name="fc1")(x)
        x = get_activation(self.activation)(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(d, dtype=self.dtype, name="fc2")(x)


def sinusoidal_pe(length: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, length, dim) sinusoidal table.

    Reference: liteasr/nets/positional_encoding.py:29-38.
    """
    position = jnp.arange(length, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * -(math.log(10000.0) / dim))
    rad = position * div_term  # (length, dim//2)
    pe = jnp.stack([jnp.sin(rad), jnp.cos(rad)], axis=-1).reshape(length, dim)
    return pe[None].astype(dtype)


def sinusoidal_pe_at(pos, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 1, dim) sinusoidal embedding at one (possibly traced) position —
    the single-step counterpart of ``sinusoidal_pe`` for cached decoding."""
    div_term = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * -(math.log(10000.0) / dim))
    rad = jnp.asarray(pos, jnp.float32) * div_term
    pe = jnp.stack([jnp.sin(rad), jnp.cos(rad)], axis=-1).reshape(dim)
    return pe[None, None].astype(dtype)


class PositionalEncoding(nn.Module):
    """x * sqrt(d) + PE, then dropout (liteasr/nets/positional_encoding.py:49-56)."""

    dropout_rate: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = x.shape[-1]
        x = x * math.sqrt(d) + sinusoidal_pe(x.shape[1], d, self.dtype)
        return nn.Dropout(self.dropout_rate, deterministic=not train)(x)


class RelativePositionalEncoding(nn.Module):
    """Returns (x * sqrt(d), pos_emb) pair (positional_encoding.py:59-75)."""

    dropout_rate: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = x.shape[-1]
        x = x * math.sqrt(d)
        pos_emb = sinusoidal_pe(x.shape[1], d, self.dtype)
        drop = nn.Dropout(self.dropout_rate, deterministic=not train)
        return drop(x), drop(pos_emb)
