"""Multi-head attention: absolute and relative-position (Transformer-XL).

Reference: liteasr/nets/attention.py:8-154. TPU notes: QK^T / softmax /
PV are batched einsums that XLA tiles onto the MXU; scores and softmax run in
fp32 regardless of the compute dtype; mask convention True = masked, filled
with a large negative before softmax (attention.py:54).
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

MASK_FILL = -1e38


class MultiHeadAttention(nn.Module):
    n_head: int
    dropout_rate: float
    dtype: jnp.dtype = jnp.float32

    def project_qkv(self, query, key, value):
        d_model = query.shape[-1]
        assert d_model % self.n_head == 0
        d_k = d_model // self.n_head

        def split(x, name):
            x = nn.Dense(d_model, dtype=self.dtype, name=name)(x)
            return x.reshape(x.shape[0], x.shape[1], self.n_head, d_k)

        # (B, T, H, Dk)
        return split(query, "linear_q"), split(key, "linear_k"), split(value, "linear_v")

    def apply_attention(self, scores, v, mask: Optional[jnp.ndarray],
                        train: bool):
        # scores: (B, H, Tq, Tk) fp32; v: (B, Tk, H, Dk)
        if mask is not None:
            scores = jnp.where(mask, MASK_FILL, scores)
        attn = nn.softmax(scores, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout_rate, deterministic=not train)(attn)
        x = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        x = x.reshape(x.shape[0], x.shape[1], -1)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="linear_o")(x)

    def _use_flash(self, train: bool) -> bool:
        """Inference-only for now: the kernel has no attention-prob dropout
        and no custom VJP yet, so the differentiated train path stays on the
        XLA fusion."""
        from liteasr_tpu.ops.flash_attention import flash_available

        return flash_available() and not train

    def _flash(self, q, k, v, scale, bias=None, mask=None):
        """q/k/v: (B, T, H, Dk) -> fused attention -> (B, Tq, H*Dk) + out proj."""
        from liteasr_tpu.ops.flash_attention import flash_attention

        B, Tq, H, Dk = q.shape
        Tk = k.shape[1]

        def fold(x):
            return x.transpose(0, 2, 1, 3).reshape(B * H, -1, Dk)

        if mask is not None:  # (B, 1|H, 1|Tq, Tk) -> (B*H, Tq, Tk)
            mask = jnp.broadcast_to(mask, (B, H, Tq, Tk)).reshape(
                B * H, Tq, Tk)
        if bias is not None:
            bias = bias.reshape(B * H, Tq, Tk)
        out = flash_attention(fold(q), fold(k), fold(v), bias=bias,
                              mask=mask, scale=scale)
        out = out.reshape(B, H, Tq, Dk).transpose(0, 2, 1, 3)
        out = out.reshape(B, Tq, H * Dk)
        return nn.Dense(out.shape[-1], dtype=self.dtype, name="linear_o")(out)

    @nn.compact
    def __call__(self, query, key, value, mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        q, k, v = self.project_qkv(query, key, value)
        d_k = q.shape[-1]
        if self._use_flash(train):
            return self._flash(q, k, v, d_k ** -0.5, mask=mask)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (d_k ** -0.5)
        return self.apply_attention(scores, v, mask, train)


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL relative shift (liteasr/nets/attention.py:99-118).

    x: (B, H, T1, T2). Pads a zero column, reshapes to (B, H, T2+1, T1),
    drops the first row, and reshapes back — aligning score[t, j] with
    relative position (j - t).
    """
    b, h, t1, t2 = x.shape
    zero_pad = jnp.zeros((b, h, t1, 1), dtype=x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)
    x_padded = x_padded.reshape(b, h, t2 + 1, t1)
    return x_padded[:, :, 1:].reshape(b, h, t1, t2)


class RelativeMultiHeadAttention(MultiHeadAttention):
    """Rel-pos MHA with learnable content/position biases u, v.

    Reference: liteasr/nets/attention.py:74-154 (pos_bias_u/pos_bias_v,
    matrix_ac + rel_shift(matrix_bd)).
    """

    @nn.compact
    def __call__(self, query, key, value, pos_emb, mask=None, train: bool = False):
        q, k, v = self.project_qkv(query, key, value)
        d_model = query.shape[-1]
        d_k = d_model // self.n_head

        p = nn.Dense(d_model, use_bias=False, dtype=self.dtype,
                     name="linear_pos")(pos_emb)
        p = p.reshape(p.shape[0], p.shape[1], self.n_head, d_k)

        init = nn.initializers.xavier_uniform()
        pos_bias_u = self.param("pos_bias_u", init, (self.n_head, d_k))
        pos_bias_v = self.param("pos_bias_v", init, (self.n_head, d_k))

        q_u = q + pos_bias_u[None, None].astype(q.dtype)
        q_v = q + pos_bias_v[None, None].astype(q.dtype)

        # pos_emb is (1, T, D): shared across the batch
        matrix_bd = jnp.einsum(
            "bqhd,khd->bhqk", q_v, p[0], preferred_element_type=jnp.float32)
        matrix_bd = rel_shift(matrix_bd)

        if self._use_flash(train):
            # content scores fuse into the kernel; the rel-pos term rides in
            # as an additive bias (already scaled)
            return self._flash(q_u, k, v, d_k ** -0.5,
                               bias=matrix_bd * (d_k ** -0.5), mask=mask)

        matrix_ac = jnp.einsum(
            "bqhd,bkhd->bhqk", q_u, k, preferred_element_type=jnp.float32)
        scores = (matrix_ac + matrix_bd) * (d_k ** -0.5)
        return self.apply_attention(scores, v, mask, train)
