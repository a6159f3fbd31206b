"""Multi-head attention: absolute and relative-position (Transformer-XL).

Reference: liteasr/nets/attention.py:8-154. TPU notes: QK^T / softmax /
PV are batched einsums that XLA tiles onto the MXU; scores and softmax run in
fp32 regardless of the compute dtype; mask convention True = masked, filled
with a large negative before softmax (attention.py:54).
"""

from typing import Optional

import flax.linen as nn
import jax
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

    def _use_flash(self, train: bool, kv_len: int = 0) -> bool:
        """Inference-only for this absolute-PE class. (The relative-PE class
        additionally has a differentiable train kernel with in-kernel dropout
        — ``flash_rel_attention_train`` — gated separately by
        ``set_flash_train_enabled``; see RelativeMultiHeadAttention.)
        Default policy is length-based (see flash_attention.py): the kernel
        wins once the score matrix dominates HBM traffic."""
        from liteasr_tpu.ops.flash_attention import flash_available

        return flash_available(kv_len) and not train

    def _flash(self, q, k, v, scale, bias=None, mask=None, rel_qv=None,
               rel_p=None):
        """q/k/v: (B, T, H, Dk) -> fused attention -> (B, Tq, H*Dk) + out proj.

        A pure padding mask (shape (B, 1, 1, Tk), suffix-contiguous by
        construction — collate_batch pads at the end) is converted to
        per-row kv_lens so the kernel masks from an in-register iota instead
        of a materialized (B*H, Tq, Tk) bool (VERDICT r1 #7). Structured
        masks (chunked/causal) still take the materialized path.
        """
        from liteasr_tpu.ops.flash_attention import flash_attention

        B, Tq, H, Dk = q.shape
        Tk = k.shape[1]

        def fold(x):
            return x.transpose(0, 2, 1, 3).reshape(B * H, -1, Dk)

        kv_lens = None
        if mask is not None and mask.shape[-2] == 1:
            # (B, 1, 1, Tk) suffix padding -> (B*H,) lengths
            kv_lens = (~mask[:, 0, 0, :]).sum(axis=-1).astype(jnp.int32)
            kv_lens = jnp.repeat(kv_lens, H)
            mask = None
        elif mask is not None:  # (B, 1|H, 1|Tq, Tk) -> (B*H, Tq, Tk)
            mask = jnp.broadcast_to(mask, (B, H, Tq, Tk)).reshape(
                B * H, Tq, Tk)
        if bias is not None:
            bias = bias.reshape(B * H, Tq, Tk)
        if rel_qv is not None:
            rel_qv = fold(rel_qv)
            rel_p = fold(rel_p)
        out = flash_attention(fold(q), fold(k), fold(v), bias=bias,
                              mask=mask, kv_lens=kv_lens, rel_qv=rel_qv,
                              rel_p=rel_p, scale=scale)
        out = out.reshape(B, H, Tq, Dk).transpose(0, 2, 1, 3)
        out = out.reshape(B, Tq, H * Dk)
        return nn.Dense(out.shape[-1], dtype=self.dtype, name="linear_o")(out)

    @nn.compact
    def __call__(self, query, key, value, mask: Optional[jnp.ndarray] = None,
                 train: bool = False, mode: str = "full", cache=None,
                 index=None):
        """``mode`` selects the decode-time cached paths (all param names
        stay identical to the full path, so one init serves every mode):

        * "full"      — ordinary attention (training / rescoring).
        * "prime_kv"  — project key/value once; returns (k, v) in
                        (B, Tk, H, Dk) for reuse across decode steps.
        * "step_src"  — query is the (B, 1, D) current token; cache is the
                        primed (k, v) of the memory.
        * "step_self" — incremental self-attention: cache is {"k","v"} of
                        shape (B, L, H, Dk); ``index`` is the write
                        position. Returns (out, new_cache).
        """
        if mode == "prime_kv":
            d_model = key.shape[-1]
            d_k = d_model // self.n_head
            k = nn.Dense(d_model, dtype=self.dtype, name="linear_k")(key)
            v = nn.Dense(d_model, dtype=self.dtype, name="linear_v")(value)
            shape = (key.shape[0], key.shape[1], self.n_head, d_k)
            return k.reshape(shape), v.reshape(shape)

        if mode == "step_src":
            d_model = query.shape[-1]
            d_k = d_model // self.n_head
            q = nn.Dense(d_model, dtype=self.dtype, name="linear_q")(query)
            q = q.reshape(query.shape[0], 1, self.n_head, d_k)
            k, v = cache
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            return self.apply_attention(
                scores * (d_k ** -0.5), v, mask, train=False)

        if mode == "step_self":
            q, k_t, v_t = self.project_qkv(query, query, query)
            d_k = q.shape[-1]
            k = jax.lax.dynamic_update_slice(
                cache["k"], k_t.astype(cache["k"].dtype), (0, index, 0, 0))
            v = jax.lax.dynamic_update_slice(
                cache["v"], v_t.astype(cache["v"].dtype), (0, index, 0, 0))
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            # mask everything past the write position (cache tail is junk)
            future = (jnp.arange(k.shape[1]) > index)[None, None, None, :]
            out = self.apply_attention(
                scores * (d_k ** -0.5), v, future, train=False)
            return out, {"k": k, "v": v}

        if mode == "chunk":
            # streaming encoder self-attention: ``query`` is the current
            # chunk (B, c, D) at stream position ``index``; cache holds the
            # K/V of everything seen so far (fixed capacity — the caller's
            # mask hides the unwritten tail and enforces the chunk policy).
            q, k_t, v_t = self.project_qkv(query, query, query)
            d_k = q.shape[-1]
            k = jax.lax.dynamic_update_slice(
                cache["k"], k_t.astype(cache["k"].dtype), (0, index, 0, 0))
            v = jax.lax.dynamic_update_slice(
                cache["v"], v_t.astype(cache["v"].dtype), (0, index, 0, 0))
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            out = self.apply_attention(
                scores * (d_k ** -0.5), v, mask, train=False)
            return out, {"k": k, "v": v}

        q, k, v = self.project_qkv(query, key, value)
        d_k = q.shape[-1]
        if self._use_flash(train, key.shape[1]):
            return self._flash(q, k, v, d_k ** -0.5, mask=mask)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (d_k ** -0.5)
        return self.apply_attention(scores, v, mask, train)


def _flash_debug_enabled() -> bool:
    """LITEASR_FLASH_DEBUG=1 turns on the traced mask-contract check below
    (costs one (B, Tk) comparison + a host callback per step; off in
    production)."""
    import os

    return os.environ.get("LITEASR_FLASH_DEBUG") == "1"


def _raise_unless_suffix_contiguous(ok) -> None:
    if not bool(ok):
        raise AssertionError(
            "flash-train mask violates the suffix-contiguity contract "
            "((B,1,1,Tk) padding with all True positions at the end): it "
            "cannot be compressed to kv_lens and would silently produce "
            "wrong attention. Route structured masks to the XLA path.")


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


def rel_shift_fast(x: jnp.ndarray) -> jnp.ndarray:
    """``rel_shift`` as ONE layout-preserving gather along the minor axis.

    The pad-reshape pair above is a flat-slice reinterpretation: with the
    zero column prepended, out.flat[i] = x_padded.flat[i + T1]. On TPU the
    (T2+1, T1) relayout-reshape lowers to a tiled transpose; indexing the
    permutation directly keeps the (8, 128) layout. Bit-exact vs
    ``rel_shift`` — values and gradients (tests/test_rel_shift_fast.py):
    out[t, j <= t] = x[t, T2-1+j-t]; out[t, t+1] = 0 (the pad column);
    out[t, j > t+1] = x[t+1, j-t-2] (the legacy crossover row).
    """
    b, h, t1, t2 = x.shape
    t = jnp.arange(t1)[:, None]
    j = jnp.arange(t2)[None, :]
    row = jnp.where(j <= t, t, jnp.minimum(t + 1, t1 - 1))
    col = jnp.where(j <= t, t2 - 1 + j - t, j - t - 2)
    col = jnp.clip(col, 0, t2 - 1)
    flat = (row * t2 + col).reshape(-1)
    out = jnp.take(x.reshape(b, h, t1 * t2), flat, axis=-1)
    out = out.reshape(b, h, t1, t2)
    return jnp.where((j == t + 1)[None, None], jnp.zeros((), x.dtype), out)


class RelativeMultiHeadAttention(MultiHeadAttention):
    """Rel-pos MHA with learnable content/position biases u, v.

    Reference: liteasr/nets/attention.py:74-154 (pos_bias_u/pos_bias_v,
    matrix_ac + rel_shift(matrix_bd)).
    """

    def _use_flash_train(self, mask) -> bool:
        """Fused differentiable kernel for the TRAINING forward+backward.

        Only the suffix-padding mask shape is representable as in-kernel
        kv_lens; structured (chunked/causal) masks stay on the XLA path.
        """
        from liteasr_tpu.ops.flash_attention import flash_train_available

        if not flash_train_available():
            return False
        return mask is None or (mask.ndim == 4 and mask.shape[1] == 1
                                and mask.shape[2] == 1)

    def _flash_train(self, q_u, q_v, k, v, p, mask, scale):
        """(B, T, H, Dk) heads -> fused train-mode attention -> out proj.

        CONTRACT: ``mask`` must be a pure suffix-contiguous padding mask
        (shape (B, 1, 1, Tk), True = masked, all True positions at the end)
        — it is compressed to per-row ``kv_lens`` by counting unmasked
        positions, so a structured/non-contiguous mask would silently
        produce wrong attention. collate_batch guarantees this invariant;
        tests/test_flash_attention.py checks the iota>=kv_lens
        reconstruction round-trip.
        """
        from liteasr_tpu.ops.flash_attention import flash_rel_attention_train

        B, Tq, H, Dk = q_u.shape

        def fold(x):
            return x.transpose(0, 2, 1, 3).reshape(B * H, -1, Dk)

        kv_lens = None
        if mask is not None:  # (B, 1, 1, Tk) suffix padding -> lengths
            row = mask[:, 0, 0, :]
            kv_lens_b = (~row).sum(axis=-1).astype(jnp.int32)
            if _flash_debug_enabled():
                # reconstruction check of the CONTRACT above: the mask must
                # round-trip through its length compression
                # (mask == iota >= kv_lens), i.e. all True positions are a
                # suffix. Raises through a host callback when violated
                # (tests/test_flash_attention.py::test_flash_debug_*).
                recon = (jnp.arange(row.shape[-1])[None, :]
                         >= kv_lens_b[:, None])
                jax.debug.callback(
                    _raise_unless_suffix_contiguous,
                    jnp.all(recon == row))
            kv_lens = jnp.repeat(kv_lens_b, H)
        p_b = jnp.broadcast_to(p, (B,) + p.shape[1:])
        if self.dropout_rate > 0.0:
            bits = jax.random.bits(self.make_rng("dropout"), (1,), jnp.uint32)
            seed = bits[0].astype(jnp.int32)
        else:
            seed = jnp.zeros((), jnp.int32)
        out = flash_rel_attention_train(
            fold(q_u), fold(q_v), fold(k), fold(v), fold(p_b), kv_lens,
            seed, scale, float(self.dropout_rate), False)
        out = out.reshape(B, H, Tq, Dk).transpose(0, 2, 1, 3)
        out = out.astype(self.dtype).reshape(B, Tq, H * Dk)
        return nn.Dense(out.shape[-1], dtype=self.dtype, name="linear_o")(out)

    def _chunk(self, q_u, q_v, k_t, v_t, p, cache, index, mask, scale):
        """Streaming chunked self-attention, exact to the offline path.

        Reproduces ``rel_shift``'s semantics — including the reference's
        legacy wrap for j > t (liteasr/nets/attention.py:99-118 aliases
        future relative positions back into the table): with a pos table of
        length Lp and global stream positions t (query) and j (key),

            bd[t, j] = q_v[t]   . p[Lp - 1 + j - t]   for j <= t
                     = 0                              for j == t + 1
                     = q_v[t+1] . p[j - t - 2]        for j >  t + 1

        (the j > t+1 rows reference the NEXT query's q_v — always inside
        the chunk wherever the chunk policy mask admits such keys). The
        full (c, Lp) bd table is ONE MXU matmul + a flat gather.
        """
        B, c, H, Dk = q_u.shape
        Lp = p.shape[1]
        k = jax.lax.dynamic_update_slice(
            cache["k"], k_t.astype(cache["k"].dtype), (0, index, 0, 0))
        v = jax.lax.dynamic_update_slice(
            cache["v"], v_t.astype(cache["v"].dtype), (0, index, 0, 0))
        Lk = k.shape[1]

        ac = jnp.einsum("bqhd,bkhd->bhqk", q_u, k,
                        preferred_element_type=jnp.float32)
        bd_all = jnp.einsum("bqhd,khd->bhqk", q_v, p[0],
                            preferred_element_type=jnp.float32)  # (B,H,c,Lp)

        t_loc = jnp.arange(c)[:, None]
        t_g = index + t_loc                       # (c, 1) global query pos
        j = jnp.arange(Lk)[None, :]               # (1, Lk) global key pos
        past = j <= t_g
        row = jnp.where(past, t_loc, jnp.minimum(t_loc + 1, c - 1))
        col = jnp.where(past, Lp - 1 + j - t_g, j - t_g - 2)
        col = jnp.clip(col, 0, Lp - 1)
        flat = (row * Lp + col).reshape(-1)
        bd = jnp.take(bd_all.reshape(B, H, c * Lp), flat, axis=-1)
        bd = bd.reshape(B, H, c, Lk)
        bd = jnp.where((j == t_g + 1)[None, None], 0.0, bd)

        out = self.apply_attention((ac + bd) * scale, v, mask, train=False)
        return out, {"k": k, "v": v}

    @nn.compact
    def __call__(self, query, key, value, pos_emb, mask=None,
                 train: bool = False, mode: str = "full", cache=None,
                 index=None):
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

        if mode == "chunk":
            return self._chunk(q_u, q_v, k, v, p, cache, index, mask,
                               d_k ** -0.5)

        if self._use_flash(train, key.shape[1]):
            # the rel-pos bias is computed in-kernel from the compact (T, D)
            # table (VERDICT r1 #7): pass q_v rows and the per-head p table
            B = q.shape[0]
            p_b = jnp.broadcast_to(p, (B,) + p.shape[1:])  # (B, T, H, Dk)
            return self._flash(q_u, k, v, d_k ** -0.5, mask=mask,
                               rel_qv=q_v, rel_p=p_b)

        if train and self._use_flash_train(mask):
            return self._flash_train(q_u, q_v, k, v, p, mask, d_k ** -0.5)

        # pos_emb is (1, T, D): shared across the batch
        matrix_bd = jnp.einsum(
            "bqhd,khd->bhqk", q_v, p[0], preferred_element_type=jnp.float32)
        matrix_bd = rel_shift(matrix_bd)

        matrix_ac = jnp.einsum(
            "bqhd,bkhd->bhqk", q_u, k, preferred_element_type=jnp.float32)
        scores = (matrix_ac + matrix_bd) * (d_k ** -0.5)
        return self.apply_attention(scores, v, mask, train)
