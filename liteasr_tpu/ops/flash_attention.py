"""Fused multi-head attention (flash-attention style) as a Pallas TPU kernel.

Replaces the reference's unfused QK^T -> masked softmax -> PV chain
(liteasr/nets/attention.py:46-72) on the hot path. One kernel instance
processes a (query-tile x head) and streams key/value tiles through VMEM with
an online-softmax accumulator, so the (Tq, Tk) score matrix never hits HBM.

Round-2 redesign (VERDICT r1 next-round #7): the round-1 kernel took the
padding mask and the relative-position bias as materialized (B*H, Tq, Tk)
HBM inputs, recreating the memory traffic the kernel exists to avoid. Now:

* the padding mask is a per-row ``kv_lens`` scalar in SMEM — the kernel
  masks ``position >= kv_len`` with an in-register iota;
* the conformer's rel-pos term is computed in-kernel from the COMPACT
  (T, D) position table: R = q_v p^T rides the MXU once per tile, then a
  lane gather applies the reference's rel_shift alignment
  (liteasr/nets/attention.py:99-118) exactly — including its legacy
  row-crossover for keys right of the query, so the kernel is numerically
  interchangeable with the XLA path.

Layout: q/k/v are (BH, T, D) with D padded to a lane multiple by the wrapper.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

DEFAULT_TQ = 128
DEFAULT_TK = 128

# Policy (BENCHMARKS.md A/B, v5e, masked rel-pos conformer encoder):
# XLA's attention fusion wins at short sequence length (T'=400: 0.157 vs
# 0.210 s rescore batch) while the kernel wins once the score matrix
# dominates HBM traffic (T'=1503: 0.0825 vs 0.1117 s encoder batch).
# Default is therefore AUTO: flash for key lengths >= FLASH_AUTO_MIN_LEN.
# LITEASR_FLASH=1 forces on everywhere, =0 forces off; set_flash_enabled
# overrides both.
_FORCED: "bool | None" = None
FLASH_AUTO_MIN_LEN = 1024


def set_flash_enabled(enabled: "bool | None") -> None:
    global _FORCED
    _FORCED = enabled


def flash_wanted(kv_len: int) -> bool:
    if _FORCED is not None:
        return _FORCED
    env = os.environ.get("LITEASR_FLASH")
    if env == "1":
        return True
    if env == "0":
        return False
    return kv_len >= FLASH_AUTO_MIN_LEN


def flash_available(kv_len: int = 10 ** 9) -> bool:
    """Pallas TPU kernels need a real TPU backend (CPU would need interpret)."""
    if not flash_wanted(kv_len):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _row_roll_left(x, shifts, *, interpret: bool):
    """Roll each row r of (R, W) left by shifts[r] (mod W).

    Mosaic's lane gather cannot span multiple vregs (W > 128), so the
    row-dependent shift is realized as a barrel shifter: log2(W) fixed
    power-of-two rolls, each applied only to the rows whose shift has that
    bit set (a per-row select).
    """
    W = x.shape[1]
    if interpret:  # interpret mode: plain gather is available and exact
        idx = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
               + shifts[:, None]) % W
        return jnp.take_along_axis(x, idx, axis=1)
    n, b = 1, 0
    while n < W:
        bit = ((shifts >> b) & 1) == 1  # (R,)
        rolled = pltpu.roll(x, W - n, 1)  # right by W-n == left by n
        x = jnp.where(bit[:, None], rolled, x)
        n <<= 1
        b += 1
    return x


def _attn_kernel(refs, o_ref, *, scale: float, num_k_tiles: int, tk: int,
                 tq: int, t_real: int, has_bias: bool, has_mask: bool,
                 has_kvlen: bool, has_rel: bool, interpret: bool):
    q_ref, k_ref, v_ref = refs[:3]
    rest = list(refs[3:])
    bias_ref = rest.pop(0) if has_bias else None
    mask_ref = rest.pop(0) if has_mask else None
    kvlen_ref = rest.pop(0) if has_kvlen else None
    qv_ref = rest.pop(0) if has_rel else None
    p_ref = rest.pop(0) if has_rel else None

    q = q_ref[0].astype(jnp.float32)  # (TQ, D)
    d = q.shape[1]

    qs = pl.program_id(1) * tq  # global start of this query tile
    # read the scalar outside the fori_loop: pl.program_id does not lower
    # inside lax control flow in interpret mode
    kv_len = kvlen_ref[pl.program_id(0), 0] if has_kvlen else None

    if has_rel:
        # R[r, c] = (q_v row qs+r) . p[c]; one extra row covers the legacy
        # rel_shift crossover into query row t+1 at the tile edge
        qv = qv_ref[0, pl.ds(qs, tq + 1), :].astype(jnp.float32)
        p = p_ref[0].astype(jnp.float32)  # (Tp, D)
        R = jax.lax.dot_general(
            qv, p, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (TQ+1, Tp)
        # full-width bias once per q-tile; the k-loop rolls its tile out.
        # Reference rel_shift alignment (attention.py:99-118): for j <= t
        # the bias is R[t, T-1-t+j]; for j > t the pad-reshape trick reads
        # R[t+1, j-t-2] (zero exactly at j == t+1). Both are row-dependent
        # shifts of R, realized as barrel-shifter rolls.
        W = R.shape[1]
        t_rows = qs + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)[:, 0]
        b_le = _row_roll_left(
            R[:-1, :], (t_real - 1 - t_rows) % W, interpret=interpret)
        b_gt = _row_roll_left(
            R[1:, :], (W - ((t_rows + 2) % W)) % W, interpret=interpret)
        t_g = t_rows[:, None]
        j_g = jax.lax.broadcasted_iota(jnp.int32, (tq, W), 1)
        bd_full = jnp.where(j_g <= t_g, b_le,
                            jnp.where(j_g == t_g + 1, 0.0, b_gt))

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * tk, tk), :].astype(jnp.float32)  # (TK, D)
        v = v_ref[0, pl.ds(i * tk, tk), :].astype(jnp.float32)  # (TK, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (TQ, TK)

        j_glob = i * tk + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)

        if has_rel:
            # rotate the tile's columns to the front (Mosaic has no dynamic
            # VMEM-value slice, but supports dynamic rolls), then slice
            W = bd_full.shape[1]
            bd = pltpu.roll(bd_full, jnp.mod(W - i * tk, W), 1)[:, :tk]
            s = s + bd
        s = s * scale

        if has_bias:
            s = s + bias_ref[0, :, pl.ds(i * tk, tk)].astype(jnp.float32)
        if has_mask:
            s = jnp.where(mask_ref[0, :, pl.ds(i * tk, tk)], NEG_INF, s)
        if has_kvlen:
            s = jnp.where(j_glob >= kv_len, NEG_INF, s)

        m_cur = jnp.max(s, axis=1, keepdims=True)  # (TQ, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p_ = jnp.exp(s - m_new)  # (TQ, TK)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + p_.sum(axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p_, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((tq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    acc0 = jnp.zeros((tq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_k_tiles, body, (m0, l0, acc0))

    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0] = out.astype(o_ref.dtype)


def _pad_to(x, size, axis, value=0.0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("scale", "tq", "tk", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias=None,
    mask=None,
    kv_lens=None,
    rel_qv=None,
    rel_p=None,
    scale: float = 1.0,
    tq: int = DEFAULT_TQ,
    tk: int = DEFAULT_TK,
    interpret: bool = False,
) -> jnp.ndarray:
    """:param q: (BH, Tq, D); k/v: (BH, Tk, D)
    :param bias: optional (BH, Tq, Tk) additive term applied AFTER scaling
        (legacy materialized path)
    :param mask: optional (BH, Tq, Tk) bool, True = masked (legacy path)
    :param kv_lens: optional (BH,) int32 — keys at position >= kv_len are
        masked in-kernel (replaces the materialized padding mask)
    :param rel_qv: optional (BH, Tq, D) position-query rows (q + pos_bias_v);
        with ``rel_p`` (BH, Tp, D), the rel-pos bias is computed in-kernel
        from the compact table and added BEFORE scaling, matching the XLA
        path's (matrix_ac + rel_shift(matrix_bd)) * scale exactly
    :return: (BH, Tq, D) with q's dtype
    """
    bh, t_q, d = q.shape
    t_k = k.shape[1]

    tq_eff = min(tq, max(8, t_q))
    tk_eff = min(tk, max(8, t_k))

    tq_pad = -(-t_q // tq_eff) * tq_eff
    tk_pad = -(-t_k // tk_eff) * tk_eff
    d_pad = -(-d // 128) * 128

    qp = _pad_to(_pad_to(q, tq_pad, 1), d_pad, 2)
    kp = _pad_to(_pad_to(k, tk_pad, 1), d_pad, 2)
    vp = _pad_to(_pad_to(v, tk_pad, 1), d_pad, 2)

    # padded K positions must never win the softmax
    if tk_pad != t_k and mask is None and kv_lens is None:
        kv_lens = jnp.full((bh,), t_k, jnp.int32)
    if mask is not None:
        mask = _pad_to(_pad_to(mask, tq_pad, 1), tk_pad, 2, value=True)
    if bias is not None:
        bias = _pad_to(_pad_to(bias, tq_pad, 1), tk_pad, 2)
    if kv_lens is not None:
        # rank-2 (BH, 1) so the (1, 1) SMEM block satisfies Mosaic's rank-1
        # block constraints
        kv_lens = kv_lens.astype(jnp.int32).reshape(bh, 1)

    has_rel = rel_qv is not None
    if has_rel:
        # one extra query row for the rel_shift crossover at tile edges
        rel_qv = _pad_to(_pad_to(rel_qv, tq_pad + 1, 1), d_pad, 2)
        rel_p = _pad_to(_pad_to(rel_p, tk_pad, 1), d_pad, 2)

    num_q_tiles = tq_pad // tq_eff
    num_k_tiles = tk_pad // tk_eff

    in_specs = [
        pl.BlockSpec((1, tq_eff, d_pad), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tk_pad, d_pad), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tk_pad, d_pad), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qp, kp, vp]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, tq_eff, tk_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM))
        args.append(bias)
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, tq_eff, tk_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM))
        args.append(mask)
    if kv_lens is not None:
        # whole array in SMEM, indexed by program_id in-kernel (Mosaic
        # rejects sub-(8,128) SMEM blocks)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(kv_lens)
    if has_rel:
        in_specs.append(  # full q_v rows (tile + 1 read via pl.ds)
            pl.BlockSpec((1, tq_pad + 1, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(rel_qv)
        in_specs.append(
            pl.BlockSpec((1, tk_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(rel_p)

    kernel = functools.partial(
        _attn_kernel, scale=scale, num_k_tiles=num_k_tiles, tk=tk_eff,
        tq=tq_eff, t_real=t_k, has_bias=bias is not None,
        has_mask=mask is not None, has_kvlen=kv_lens is not None,
        has_rel=has_rel, interpret=interpret)

    def wrapped(*refs):
        kernel(refs[:-1], refs[-1])

    out = pl.pallas_call(
        wrapped,
        grid=(bh, num_q_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tq_eff, d_pad), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d_pad), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * tq_pad * tk_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=bh * tq_pad * tk_pad,
        ),
    )(*args)
    return out[:, :t_q, :d]
