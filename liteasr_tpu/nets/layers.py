"""Transformer / Conformer residual sublayer compositions.

Reference: liteasr/nets/transformer_layer.py:10-221 (encoder/decoder layers
with a pre/post-LN ``normalize_before`` toggle) and
liteasr/nets/conformer_layer.py:10-147 (macaron-FF x0.5 -> MHA -> conv ->
FF x0.5 -> final LN, same toggle).

``normalize_before=True`` (default, matching the reference):
``x + drop(sublayer(LN(x)))``; False: ``LN(x + drop(sublayer(x)))``.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from liteasr_tpu.nets.attention import MultiHeadAttention, RelativeMultiHeadAttention
from liteasr_tpu.nets.common import LayerNorm, PositionwiseFeedForward, get_activation


class FusedBatchNorm(nn.Module):
    """Drop-in for ``nn.BatchNorm`` with the single-pass custom-VJP train
    kernel (ops/batch_norm.py). Identical parameter/collection names
    (params: scale/bias, batch_stats: mean/var), so checkpoints are
    interchangeable with the flax module.
    """

    momentum: float = 0.99
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        from liteasr_tpu.ops.batch_norm import train_batch_norm

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if use_running_average:
            x32 = x.astype(jnp.float32)
            y = (x32 - ra_mean.value) * jax.lax.rsqrt(
                ra_var.value + self.epsilon) * scale + bias
            return y.astype(x.dtype)
        y, mean, var = train_batch_norm(x, scale, bias, self.epsilon)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean
            ra_var.value = m * ra_var.value + (1 - m) * var
        return y


class ConformerConvolution(nn.Module):
    """pointwise -> GLU -> depthwise(k, SAME) -> BatchNorm -> act -> pointwise.

    Reference: liteasr/nets/conformer_convolution.py:4-57. Implemented
    channel-last: the pointwise convs are Dense layers (MXU matmuls) and the
    depthwise conv is a feature-grouped 1D conv the XLA TPU backend fuses
    well.
    """

    kernel_size: int = 15
    activation: str = "swish"
    dtype: jnp.dtype = jnp.float32
    fused_bn: bool = True  # single-pass custom-VJP BN (ops/batch_norm.py)

    def _depthwise(self, x):
        """Depthwise conv as K shifted multiply-adds (pure VPU ops).

        Grouped convolutions lower poorly on the TPU and their weight
        gradient is mis-scaled by GSPMD under time-axis (sequence-parallel)
        sharding; the shifted-add form avoids both. Parameter shape matches
        flax nn.Conv's (K, 1, C) so checkpoints stay interchangeable.
        """
        K = self.kernel_size
        C = x.shape[-1]
        kernel = self.param(
            "depthwise_conv_kernel",
            nn.initializers.lecun_normal(), (K, 1, C)).astype(self.dtype)
        bias = self.param(
            "depthwise_conv_bias", nn.initializers.zeros, (C,)
        ).astype(self.dtype)
        half = (K - 1) // 2
        padded = jnp.pad(x, ((0, 0), (half, half), (0, 0)))
        T = x.shape[1]
        out = bias
        for k in range(K):
            out = out + padded[:, k:k + T, :] * kernel[k, 0][None, None, :]
        return out

    @nn.compact
    def __call__(self, x, train: bool = False):
        channels = x.shape[-1]
        assert (self.kernel_size - 1) % 2 == 0
        x = nn.Dense(2 * channels, dtype=self.dtype, name="pointwise_conv1")(x)
        x = nn.glu(x, axis=-1)
        x = self._depthwise(x)
        if self.fused_bn:
            x = FusedBatchNorm(name="norm")(x, use_running_average=not train)
        else:
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=jnp.float32, name="norm")(x)
        x = get_activation(self.activation)(x.astype(self.dtype))
        return nn.Dense(channels, dtype=self.dtype, name="pointwise_conv2")(x)


def _residual(x, norm, fn, drop, pre_ln: bool, scale: float = 1.0):
    """One residual sublayer under either LN placement."""
    y = fn(norm(x) if pre_ln else x)
    x = x + scale * drop(y)
    return x if pre_ln else norm(x)


class EncoderLayer(nn.Module):
    """Transformer encoder layer (transformer_layer.py:10-76)."""

    n_head: int
    ff_dim: int
    dropout_rate: float
    attn_dropout_rate: float
    ff_dropout_rate: float
    activation: str = "relu"
    use_rel: bool = False
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb=None, mask: Optional[jnp.ndarray] = None,
                 train: bool = False, mode: str = "full", cache=None,
                 index=None):
        drop = nn.Dropout(self.dropout_rate, deterministic=not train)

        if mode == "chunk":
            # streaming: self-attention over the KV cache; identical param
            # names, so one init serves offline and streaming
            assert self.normalize_before, "streaming decode assumes pre-LN"
            z = LayerNorm(dtype=self.dtype, name="self_attn_norm")(x)
            if self.use_rel:
                attn_out, new_cache = RelativeMultiHeadAttention(
                    self.n_head, self.attn_dropout_rate, dtype=self.dtype,
                    name="self_attn")(z, z, z, pos_emb, mask, False,
                                      mode="chunk", cache=cache, index=index)
            else:
                attn_out, new_cache = MultiHeadAttention(
                    self.n_head, self.attn_dropout_rate, dtype=self.dtype,
                    name="self_attn")(z, z, z, mask, False,
                                      mode="chunk", cache=cache, index=index)
            x = x + attn_out
            z = LayerNorm(dtype=self.dtype, name="feed_forward_norm")(x)
            x = x + PositionwiseFeedForward(
                self.ff_dim, self.ff_dropout_rate, self.activation,
                dtype=self.dtype, name="feed_forward")(z, False)
            return x, new_cache

        def attn(y):
            if self.use_rel:
                return RelativeMultiHeadAttention(
                    self.n_head, self.attn_dropout_rate, dtype=self.dtype,
                    name="self_attn")(y, y, y, pos_emb, mask, train)
            return MultiHeadAttention(
                self.n_head, self.attn_dropout_rate, dtype=self.dtype,
                name="self_attn")(y, y, y, mask, train)

        x = _residual(
            x, LayerNorm(dtype=self.dtype, name="self_attn_norm"),
            attn, drop, self.normalize_before)
        return _residual(
            x, LayerNorm(dtype=self.dtype, name="feed_forward_norm"),
            lambda y: PositionwiseFeedForward(
                self.ff_dim, self.ff_dropout_rate, self.activation,
                dtype=self.dtype, name="feed_forward")(y, train),
            drop, self.normalize_before)


class ConformerLayer(nn.Module):
    """Conformer block (conformer_layer.py:10-147)."""

    n_head: int
    ff_dim: int
    dropout_rate: float
    attn_dropout_rate: float
    ff_dropout_rate: float
    conv_kernel: int = 15
    activation: str = "swish"
    use_rel: bool = True
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb=None, mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        drop = nn.Dropout(self.dropout_rate, deterministic=not train)
        pre = self.normalize_before
        ff_scale = 0.5

        def attn(y):
            if self.use_rel:
                return RelativeMultiHeadAttention(
                    self.n_head, self.attn_dropout_rate, dtype=self.dtype,
                    name="self_attn")(y, y, y, pos_emb, mask, train)
            return MultiHeadAttention(
                self.n_head, self.attn_dropout_rate, dtype=self.dtype,
                name="self_attn")(y, y, y, mask, train)

        x = _residual(
            x, LayerNorm(dtype=self.dtype, name="feed_forward_macaron_norm"),
            lambda y: PositionwiseFeedForward(
                self.ff_dim, self.ff_dropout_rate, self.activation,
                dtype=self.dtype, name="feed_forward_macaron")(y, train),
            drop, pre, scale=ff_scale)
        x = _residual(
            x, LayerNorm(dtype=self.dtype, name="self_attn_norm"),
            attn, drop, pre)
        x = _residual(
            x, LayerNorm(dtype=self.dtype, name="conv_norm"),
            lambda y: ConformerConvolution(
                self.conv_kernel, self.activation, dtype=self.dtype,
                name="conv")(y, train),
            drop, pre)
        x = _residual(
            x, LayerNorm(dtype=self.dtype, name="feed_forward_norm"),
            lambda y: PositionwiseFeedForward(
                self.ff_dim, self.ff_dropout_rate, self.activation,
                dtype=self.dtype, name="feed_forward")(y, train),
            drop, pre, scale=ff_scale)

        return LayerNorm(dtype=self.dtype, name="final_norm")(x)


class DecoderLayer(nn.Module):
    """Self-attn + src-attn + FF (transformer_layer.py:139-221)."""

    n_head: int
    ff_dim: int
    dropout_rate: float
    self_attn_dropout_rate: float
    src_attn_dropout_rate: float
    ff_dropout_rate: float
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, memory, mask=None, memory_mask=None,
                 train: bool = False, mode: str = "full", cache=None,
                 index=None):
        """``mode="prime"`` projects the memory K/V once for cached decode;
        ``mode="step"`` runs one token with a scan-carried self-attn cache
        (re-design of the reference's per-step list cache,
        liteasr/nets/transformer_layer.py:40-47). Both assume pre-LN."""
        if mode == "prime":
            return MultiHeadAttention(
                self.n_head, self.src_attn_dropout_rate, dtype=self.dtype,
                name="src_attn")(None, memory, memory, mode="prime_kv")

        if mode == "step":
            assert self.normalize_before, "cached decode assumes pre-LN"
            z = LayerNorm(dtype=self.dtype, name="self_attn_norm")(y)
            z, new_cache = MultiHeadAttention(
                self.n_head, self.self_attn_dropout_rate, dtype=self.dtype,
                name="self_attn")(z, z, z, mode="step_self",
                                  cache=cache["self"], index=index)
            y = y + z
            z = LayerNorm(dtype=self.dtype, name="src_attn_norm")(y)
            z = MultiHeadAttention(
                self.n_head, self.src_attn_dropout_rate, dtype=self.dtype,
                name="src_attn")(z, None, None, mask=memory_mask,
                                 mode="step_src", cache=cache["src"])
            y = y + z
            z = LayerNorm(dtype=self.dtype, name="feed_forward_norm")(y)
            z = PositionwiseFeedForward(
                self.ff_dim, self.ff_dropout_rate, dtype=self.dtype,
                name="feed_forward")(z, False)
            return y + z, new_cache

        drop = nn.Dropout(self.dropout_rate, deterministic=not train)
        pre = self.normalize_before

        y = _residual(
            y, LayerNorm(dtype=self.dtype, name="self_attn_norm"),
            lambda z: MultiHeadAttention(
                self.n_head, self.self_attn_dropout_rate, dtype=self.dtype,
                name="self_attn")(z, z, z, mask, train),
            drop, pre)
        y = _residual(
            y, LayerNorm(dtype=self.dtype, name="src_attn_norm"),
            lambda z: MultiHeadAttention(
                self.n_head, self.src_attn_dropout_rate, dtype=self.dtype,
                name="src_attn")(z, memory, memory, memory_mask, train),
            drop, pre)
        return _residual(
            y, LayerNorm(dtype=self.dtype, name="feed_forward_norm"),
            lambda z: PositionwiseFeedForward(
                self.ff_dim, self.ff_dropout_rate, dtype=self.dtype,
                name="feed_forward")(z, train),
            drop, pre)
