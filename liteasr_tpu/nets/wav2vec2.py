"""wav2vec 2.0 building blocks: conv feature extractor, Gumbel VQ,
conv-positional transformer encoder.

Reference: liteasr/nets/{wav2vec2_convolution.py:9-84,
gumbel_vector_quantizer.py:11-111, transformer_encoder.py:130-193}.

NOTE: the reference feeds its batch-first MultiHeadAttention with (T, B, C)
tensors (transformer_encoder.py:188-191), which attends across the batch —
a latent bug inherited from fairseq's layout. This implementation keeps
batch-first (B, T, C) throughout.
"""

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from liteasr_tpu.nets.common import LayerNorm
from liteasr_tpu.nets.layers import EncoderLayer


class ConvFeatureExtractor(nn.Module):
    """Stacked strided 1-D convs with fp32 LayerNorm + GELU.

    conv_layers: [(dim, kernel, stride), ...]; default stack downsamples
    raw 16 kHz waveform by 320x.
    """

    conv_layers: Tuple[Tuple[int, int, int], ...]
    conv_bias: bool = False
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T) waveform -> (B, frames, C)."""
        x = x[:, :, None]  # (B, T, 1) channel-last
        for i, (dim, kernel, stride) in enumerate(self.conv_layers):
            x = nn.Conv(dim, (kernel,), strides=(stride,), padding="VALID",
                        use_bias=self.conv_bias, dtype=self.dtype,
                        name=f"conv_{i}")(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            x = LayerNorm(dtype=self.dtype, name=f"ln_{i}")(x)
            x = nn.gelu(x)
        return x


def conv_output_length(length: int,
                       conv_layers: Tuple[Tuple[int, int, int], ...]) -> int:
    for _, kernel, stride in conv_layers:
        length = (length - kernel) // stride + 1
    return length


class GumbelVectorQuantizer(nn.Module):
    """Grouped codebook with gumbel-softmax straight-through in training.

    Reference: gumbel_vector_quantizer.py:11-111. The temperature follows
    the (start, end, decay) anneal via an explicit ``temp`` argument.
    """

    num_vars: int
    groups: int
    vq_dim: int
    combine_groups: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temp: float = 2.0, train: bool = False,
                 frame_weight=None):
        """``frame_weight`` (B, T) optionally weights the code-usage
        statistics (``avg_probs``) so padding/unmasked frames don't dilute
        the perplexity the diversity loss sees."""
        B, T, D = x.shape
        assert self.vq_dim % self.groups == 0
        var_dim = self.vq_dim // self.groups
        num_groups = self.groups if not self.combine_groups else 1

        codebook = self.param(
            "vars", nn.initializers.uniform(scale=1.0),
            (1, num_groups * self.num_vars, var_dim))
        logits = nn.Dense(
            self.groups * self.num_vars, dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=1.0),
            bias_init=nn.initializers.zeros, name="weight_proj")(x)
        logits = logits.reshape(
            B * T * self.groups, self.num_vars).astype(jnp.float32)

        hard_idx = jnp.argmax(logits, axis=-1)
        hard_x = jax.nn.one_hot(hard_idx, self.num_vars, dtype=jnp.float32)

        probs = jax.nn.softmax(
            logits.reshape(B * T, self.groups, -1), axis=-1)
        if frame_weight is None:
            avg_probs = probs.mean(axis=0)
        else:
            w = frame_weight.astype(jnp.float32).reshape(B * T, 1, 1)
            avg_probs = (probs * w).sum(axis=0) / jnp.maximum(w.sum(), 1.0)

        if train:
            g_rng = self.make_rng("gumbel")
            gumbels = jax.random.gumbel(g_rng, logits.shape)
            y_soft = jax.nn.softmax((logits + gumbels) / temp, axis=-1)
            hard_from_soft = jax.nn.one_hot(
                jnp.argmax(y_soft, axis=-1), self.num_vars, dtype=jnp.float32)
            # straight-through estimator
            x_sel = hard_from_soft + y_soft - jax.lax.stop_gradient(y_soft)
        else:
            x_sel = hard_x

        x_sel = x_sel.reshape(B * T, self.groups * self.num_vars)
        vars_ = codebook
        if self.combine_groups:
            vars_ = jnp.tile(vars_, (1, self.groups, 1))
        out = x_sel[:, :, None] * vars_.astype(jnp.float32)
        out = out.reshape(B * T, self.groups, self.num_vars, var_dim)
        out = out.sum(axis=2).reshape(B, T, self.vq_dim)
        return out.astype(self.dtype), avg_probs


class Wav2Vec2TransformerEncoder(nn.Module):
    """Conv positional embedding (k=128, groups=16) + transformer layers."""

    h_dim: int
    ff_dim: int
    n_head: int
    n_layer: int
    dropout_rate: float
    attn_dropout_rate: float
    ff_dropout_rate: float
    conv_pos: int = 128
    conv_pos_groups: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        pos = nn.Conv(
            self.h_dim, (self.conv_pos,),
            padding=[(self.conv_pos // 2, self.conv_pos // 2)],
            feature_group_count=self.conv_pos_groups,
            dtype=self.dtype, name="pos_conv")(x)
        pos = pos[:, : x.shape[1], :]  # even kernel: drop the extra frame
        x = residual + nn.gelu(pos)
        x = LayerNorm(dtype=self.dtype, name="embed_norm")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        for i in range(self.n_layer):
            x = EncoderLayer(
                n_head=self.n_head,
                ff_dim=self.ff_dim,
                dropout_rate=self.dropout_rate,
                attn_dropout_rate=self.attn_dropout_rate,
                ff_dropout_rate=self.ff_dropout_rate,
                activation="relu",
                use_rel=False,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, train=train)
        return x
