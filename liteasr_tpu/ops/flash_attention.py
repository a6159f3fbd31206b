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


def _bd_full(qv, p, qs, tq, t_real, *, interpret):
    """Full-width rel-pos bias rows for one query tile.

    qv: (tq+1, D) fp32 — q_v rows qs..qs+tq (one extra row covers the legacy
    rel_shift crossover into query row t+1); p: (W, D) fp32 compact table.
    R[r, c] = qv[r] . p[c]; the reference rel_shift alignment
    (attention.py:99-118) reads, for key j <= t, R[t, t_real-1-t+j]; for
    j > t, the pad-reshape trick reads R[t+1, j-t-2] (zero exactly at
    j == t+1). Both are row-dependent shifts of R, realized as
    barrel-shifter rolls. Returns bd_full (tq, W).
    """
    R = jax.lax.dot_general(
        qv, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (tq+1, W)
    W = R.shape[1]
    t_rows = qs + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)[:, 0]
    b_le = _row_roll_left(
        R[:-1, :], (t_real - 1 - t_rows) % W, interpret=interpret)
    b_gt = _row_roll_left(
        R[1:, :], (W - ((t_rows + 2) % W)) % W, interpret=interpret)
    t_g = t_rows[:, None]
    j_g = jax.lax.broadcasted_iota(jnp.int32, (tq, W), 1)
    return jnp.where(j_g <= t_g, b_le,
                     jnp.where(j_g == t_g + 1, 0.0, b_gt))


def _dbd_to_dR(dB, qs, t_real, *, interpret):
    """Adjoint of the rel_shift alignment in ``_bd_full``.

    dB: (tq, W) cotangent of bd_full rows for query tile at ``qs``.
    Returns dR (tq+1, W): dR[t, (t_real-1-t+j) % W] += dB[t, j] for j <= t;
    dR[t+1, (j-t-2) % W] += dB[t, j] for j > t+1 (j == t+1 reads the
    rel_shift zero, so its cotangent is dropped). Inverse of a left-roll by
    s is a left-roll by (W - s) % W.
    """
    tq, W = dB.shape
    t_rows = qs + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)[:, 0]
    t_g = t_rows[:, None]
    j_g = jax.lax.broadcasted_iota(jnp.int32, (tq, W), 1)

    s_le = (t_real - 1 - t_rows) % W
    dB_le = jnp.where(j_g <= t_g, dB, 0.0)
    dR_top = _row_roll_left(dB_le, (W - s_le) % W, interpret=interpret)

    dB_gt = jnp.where(j_g > t_g + 1, dB, 0.0)
    dR_bot = _row_roll_left(dB_gt, (t_rows + 2) % W, interpret=interpret)

    zero = jnp.zeros((1, W), jnp.float32)
    return (jnp.concatenate([dR_top, zero], axis=0)
            + jnp.concatenate([zero, dR_bot], axis=0))


def _dropout_keep(tq, tk, b, qi, kj, seed, rate):
    """Deterministic per-(batch, q-tile, k-tile) keep mask, (tq, tk) bool.

    A counter-based uint32 hash (murmur3 finalizer over row/col/tile ids)
    rather than pltpu PRNG state: the backward kernels regenerate the exact
    mask from the same coordinates, and the same code path works in
    interpret mode. Keeps a fraction (1 - rate).
    """
    u32 = jnp.uint32
    rows = jax.lax.broadcasted_iota(jnp.uint32, (tq, tk), 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, (tq, tk), 1)
    tile = ((u32(b) * u32(65537) + u32(qi)) * u32(8191)
            + u32(kj)) * u32(131071) + seed.astype(jnp.uint32)
    u = (rows * u32(0x9E3779B1) + cols * u32(0x85EBCA77)
         + tile * u32(0xC2B2AE3D))
    u = u ^ (u >> u32(16))
    u = u * u32(0x7FEB352D)
    u = u ^ (u >> u32(15))
    u = u * u32(0x846CA68B)
    u = u ^ (u >> u32(16))
    # Clamp (not wrap) at 2**32 - 1: for infinitesimal rates the rounded
    # threshold equals 2**32, and masking it to 32 bits would drop EVERY
    # element instead of almost none.
    thr = u32(min(int(round((1.0 - rate) * 4294967296.0)), 0xFFFFFFFF)) \
        if rate > 0.0 else u32(0xFFFFFFFF)
    return u < thr


def _attn_kernel(refs, o_ref, lse_ref=None, *, scale: float,
                 num_k_tiles: int, tk: int,
                 tq: int, t_real: int, has_bias: bool, has_mask: bool,
                 has_kvlen: bool, has_rel: bool, dropout_rate: float = 0.0,
                 interpret: bool):
    q_ref, k_ref, v_ref = refs[:3]
    rest = list(refs[3:])
    bias_ref = rest.pop(0) if has_bias else None
    mask_ref = rest.pop(0) if has_mask else None
    kvlen_ref = rest.pop(0) if has_kvlen else None
    qv_ref = rest.pop(0) if has_rel else None
    p_ref = rest.pop(0) if has_rel else None
    seed_ref = rest.pop(0) if dropout_rate > 0.0 else None

    # matmul operands stay in the input dtype (bf16 at the operating point):
    # fp32 MXU passes run at a fraction of bf16 rate and were the reason the
    # kernel lost to XLA (whose einsums also take bf16 operands with fp32
    # accumulation). All score/softmax math remains fp32.
    q = q_ref[0]  # (TQ, D)
    d = q.shape[1]

    qs = pl.program_id(1) * tq  # global start of this query tile
    # read scalars outside the fori_loop: pl.program_id does not lower
    # inside lax control flow in interpret mode
    kv_len = kvlen_ref[pl.program_id(0), 0] if has_kvlen else None
    b_id, q_id = pl.program_id(0), pl.program_id(1)
    seed_val = seed_ref[0, 0] if dropout_rate > 0.0 else None

    if has_rel:
        qv = qv_ref[0, pl.ds(qs, tq + 1), :]
        p = p_ref[0]  # (Tp, D)
        bd_full = _bd_full(qv, p, qs, tq, t_real, interpret=interpret)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * tk, tk), :]  # (TK, D)
        v = v_ref[0, pl.ds(i * tk, tk), :]  # (TK, D)
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
        # softmax normalizer accumulates the UNdropped mass (dropout acts
        # on the normalized probs, reference attention.py:55)
        l_new = l_prev * alpha + p_.sum(axis=1, keepdims=True)
        p_v = p_
        if dropout_rate > 0.0:
            keep = _dropout_keep(tq, tk, b_id, q_id, i, seed_val,
                                 dropout_rate)
            p_v = jnp.where(keep, p_, 0.0)
        acc = acc * alpha + jax.lax.dot_general(
            p_v.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((tq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    acc0 = jnp.zeros((tq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_k_tiles, body, (m0, l0, acc0))

    out = acc / jnp.maximum(l, 1e-30)
    if dropout_rate > 0.0:
        out = out / (1.0 - dropout_rate)
    o_ref[0] = out.astype(o_ref.dtype)
    if lse_ref is not None:
        # per-row logsumexp of the masked scores; all-masked rows (l == 0)
        # get NEG_INF so the backward can zero them instead of NaN-ing.
        # Written lane-broadcast (tq, 128): Mosaic requires the last block
        # dim to be 128-divisible, and the backward consumes it in exactly
        # this layout anyway.
        lse = jnp.where(l > 0.0, m + jnp.log(jnp.maximum(l, 1e-30)),
                        NEG_INF)
        lse_ref[0] = jnp.broadcast_to(lse, (tq, 128))


def _pad_to(x, size, axis, value=0.0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("scale", "tq", "tk", "interpret",
                              "return_lse", "dropout_rate"))
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
    return_lse: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed=None,
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

    # tiles aligned to the (8, 128) vreg: Mosaic's dynamic_rotate (the
    # rel-bias barrel shifter) rejects unaligned vector shapes
    tq_eff = min(tq, -(-t_q // 8) * 8)
    tk_eff = min(tk, -(-t_k // 128) * 128)

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
    if dropout_rate > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        seed = jnp.zeros((1, 1), jnp.int32) if dropout_seed is None \
            else jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)
        args.append(seed)

    kernel = functools.partial(
        _attn_kernel, scale=scale, num_k_tiles=num_k_tiles, tk=tk_eff,
        tq=tq_eff, t_real=t_k, has_bias=bias is not None,
        has_mask=mask is not None, has_kvlen=kv_lens is not None,
        has_rel=has_rel, dropout_rate=dropout_rate, interpret=interpret)

    out_specs = pl.BlockSpec((1, tq_eff, d_pad), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bh, tq_pad, d_pad), q.dtype)
    if return_lse:
        out_specs = (out_specs,
                     pl.BlockSpec((1, tq_eff, 128), lambda b, i: (b, i, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((bh, tq_pad, 128), jnp.float32))

        def wrapped(*refs):
            kernel(refs[:-2], refs[-2], refs[-1])
    else:
        def wrapped(*refs):
            kernel(refs[:-1], refs[-1])

    out = pl.pallas_call(
        wrapped,
        grid=(bh, num_q_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * tq_pad * tk_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=bh * tq_pad * tk_pad,
        ),
    )(*args)
    if return_lse:
        out, lse = out
        return out[:, :t_q, :d], lse[:, :t_q, 0]
    return out[:, :t_q, :d]


# --------------------------------------------------------------------------
# Differentiable (training) path
# --------------------------------------------------------------------------
#
# The forward runs the fused kernel above; the backward is staged: phase 1
# (this code) recomputes attention in XLA and differentiates it — bitwise
# the same math, no kernel risk — so the training path can be wired and
# parity-tested end to end before the Pallas backward kernel lands.


def _rel_shift_xla(x):
    """Transformer-XL rel shift (reference attention.py:99-118) on
    (BH, T1, T2). Local copy: nets.attention imports this module."""
    bh, t1, t2 = x.shape
    zero_pad = jnp.zeros((bh, t1, 1), dtype=x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)
    x_padded = x_padded.reshape(bh, t2 + 1, t1)
    return x_padded[:, 1:].reshape(bh, t1, t2)


def _ref_rel_attention(q_u, qv, k, v, p, kv_lens, scale):
    """XLA reference of the kernel's rel-pos attention: out only.

    q_u/qv: (BH, Tq, D); k/v: (BH, Tk, D); p: (BH, Tp, D) compact table
    (Tp == Tk); kv_lens: (BH,) or None. Matches RelativeMultiHeadAttention's
    (matrix_ac + rel_shift(matrix_bd)) * scale -> masked softmax -> PV.
    """
    s = jnp.einsum("bqd,bkd->bqk", q_u.astype(jnp.float32),
                   k.astype(jnp.float32))
    bd = jnp.einsum("bqd,bkd->bqk", qv.astype(jnp.float32),
                    p.astype(jnp.float32))
    s = (s + _rel_shift_xla(bd)) * scale
    if kv_lens is not None:
        j = jnp.arange(s.shape[-1])[None, None, :]
        s = jnp.where(j >= kv_lens[:, None, None], NEG_INF, s)
    attn = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", attn, v.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def flash_rel_attention_train(q_u, qv, k, v, p, kv_lens, dropout_seed,
                              scale, dropout_rate=0.0, interpret=False):
    """Differentiable fused rel-pos attention (conformer self-attention).

    Forward = the Pallas kernel (score matrix never in HBM); backward =
    the Pallas kernels in ``_flash_rel_bwd_pallas`` (or the XLA
    recompute-and-differentiate fallback, ``_TRAIN_BWD_IMPL``).
    ``kv_lens`` may be None (no padding). ``dropout_rate`` > 0 applies
    attention-prob dropout (reference attention.py:55) with a
    counter-based mask derived from ``dropout_seed`` — the backward
    regenerates the identical mask. Output is fp32 like the XLA path.
    """
    return flash_attention(
        q_u, k, v, kv_lens=kv_lens, rel_qv=qv, rel_p=p, scale=scale,
        interpret=interpret, dropout_rate=dropout_rate,
        dropout_seed=dropout_seed).astype(jnp.float32)


# "pallas" = fused backward kernels (production); "xla" = recompute-and-
# differentiate reference (debug fallback, same math)
_TRAIN_BWD_IMPL = "pallas"


def _train_fwd(q_u, qv, k, v, p, kv_lens, dropout_seed, scale,
               dropout_rate=0.0, interpret=False):
    out, lse = flash_attention(
        q_u, k, v, kv_lens=kv_lens, rel_qv=qv, rel_p=p, scale=scale,
        interpret=interpret, return_lse=True, dropout_rate=dropout_rate,
        dropout_seed=dropout_seed)
    out = out.astype(jnp.float32)
    return out, (q_u, qv, k, v, p, kv_lens, dropout_seed, out, lse)


def _train_bwd(scale, dropout_rate, interpret, res, dout):
    q_u, qv, k, v, p, kv_lens, dropout_seed, out, lse = res
    cast = lambda g, x: g.astype(x.dtype)
    if _TRAIN_BWD_IMPL == "xla":
        assert dropout_rate == 0.0, "XLA fallback has no prob-dropout"
        _, vjp = jax.vjp(
            lambda a, b, c, d, e: _ref_rel_attention(a, b, c, d, e, kv_lens,
                                                     scale),
            q_u, qv, k, v, p)
        dq_u, dqv, dk, dv, dp = vjp(dout.astype(jnp.float32))
    else:
        dq_u, dqv, dk, dv, dp = _flash_rel_bwd_pallas(
            q_u, qv, k, v, p, kv_lens, out, lse,
            dout.astype(jnp.float32), scale, dropout_rate=dropout_rate,
            dropout_seed=dropout_seed, interpret=interpret)
    return (cast(dq_u, q_u), cast(dqv, qv), cast(dk, k), cast(dv, v),
            cast(dp, p), None, None)


flash_rel_attention_train.defvjp(_train_fwd, _train_bwd)


# --------------------------------------------------------------------------
# Pallas backward kernel (phase 2)
# --------------------------------------------------------------------------
#
# ONE kernel instance per batch-head computes every gradient:
#
#   S = (Q_u K^T + shift(Qv P^T)) * scale ;  A = softmax_masked(S)
#   dV_j  = sum_i A_ij^T dO_i
#   dS_ij = A_ij * (dO_i V_j^T - Dvec_i) * scale,  Dvec = rowsum(dO * O)
#   dK_j  = sum_i dS_ij^T Q_u,i ;  dQ_u,i = sum_j dS_ij K_j
#   dB    = dS  ->  dR = shift^-1(dB)  ->  dQv_i = dR_i P ; dP = sum_i dR_i^T Qv_i
#
# A is reconstructed per tile as exp(S - lse) with the forward's lse, so
# the (Tq, Tk) score matrix never round-trips HBM. Training lengths fit in
# VMEM outright, so the tile loops are unrolled python loops over static
# offsets, every operand loads once, and there is no cross-kernel glue
# (the earlier two-kernel split recomputed S twice and shipped tile-level
# intermediates through HBM — measured slower than XLA at T'=200).
# lse rides lane-broadcast (BH, Tq, 128) straight from the forward.


def _safe_probs(s, lse_tile, tk):
    """exp(s - lse) with all-masked rows (lse == NEG_INF) forced to 0."""
    lse = lse_tile[:, :tk]
    dead = lse <= NEG_INF / 2
    return jnp.where(dead | (s <= NEG_INF / 2), 0.0,
                     jnp.exp(s - jnp.where(dead, 0.0, lse)))


def _pad_rows(seg, lo, hi):
    """concat zero rows around seg, skipping zero-sized parts (Mosaic
    rejects 0-row vectors)."""
    parts = []
    if lo:
        parts.append(jnp.zeros((lo, seg.shape[1]), jnp.float32))
    parts.append(seg)
    if hi:
        parts.append(jnp.zeros((hi, seg.shape[1]), jnp.float32))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else seg


def _bwd_kernel(q_ref, qv_ref, k_ref, v_ref, p_ref, do_ref, o_ref, lse_ref,
                kvlen_ref, seed_ref, dq_ref, dqv_ref, dqvx_ref, dk_ref,
                dv_ref, dp_ref, *, scale, num_k_tiles, tq, tk, t_real,
                dropout_rate, interpret):
    """One grid step = one (batch-head, q-tile) pair.

    dk/dv/dp map every q-tile of a batch-head onto the SAME output block
    (their index_map drops the q index) and accumulate across the
    sequential grid, so VMEM holds one K/V/P-sized accumulator set instead
    of the round-2 fully-unrolled num_q_tiles x num_k_tiles loop nest —
    VMEM and compile time are now linear in sequence length (closes the
    documented SCALING LIMIT / ADVICE r2 #3). dqv's one-row tile overlap
    (the rel_shift crossover row) goes to a separate (1, D) output the
    caller recombines with a scatter-add.
    """
    b_id = pl.program_id(0)
    qi = pl.program_id(1)
    kv_len = kvlen_ref[b_id, 0]
    seed_val = seed_ref[0, 0] if dropout_rate > 0.0 else None
    inv_keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0

    # bf16 matmul operands / fp32 accumulation — see _attn_kernel note
    k_all = k_ref[0]                          # (TKp, D)
    v_all = v_ref[0]
    p_tab = p_ref[0]                          # (W, D)
    in_dt = k_all.dtype
    d = k_all.shape[1]
    tkp = num_k_tiles * tk

    qs = qi * tq
    q = q_ref[0].astype(in_dt)                # (tq, D), blocked by qi
    do = do_ref[0]                            # fp32 from the loss
    do_b = do.astype(in_dt)
    o = o_ref[0].astype(jnp.float32)
    lse_t = lse_ref[0]                        # (tq, 128) lane-broadcast
    qv = qv_ref[0, pl.ds(qs, tq + 1), :]      # full-rows ref (+1 overlap)
    dvec = jnp.sum(do.astype(jnp.float32) * o, axis=1, keepdims=True)

    bd_full = _bd_full(qv, p_tab, qs, tq, t_real, interpret=interpret)

    dq_acc = jnp.zeros((tq, d), jnp.float32)
    dk_acc = jnp.zeros((tkp, d), jnp.float32)
    dv_acc = jnp.zeros((tkp, d), jnp.float32)
    dB_parts = []
    for j in range(num_k_tiles):
        ks = j * tk
        k = k_all[ks:ks + tk, :]
        v = v_all[ks:ks + tk, :]
        bd = bd_full[:, ks:ks + tk]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = (s + bd) * scale
        j_glob = ks + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        s = jnp.where(j_glob >= kv_len, NEG_INF, s)

        a = _safe_probs(s, lse_t, tk)  # undropped probs
        dp_ = jax.lax.dot_general(
            do_b, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (tq, tk)
        if dropout_rate > 0.0:
            keep = _dropout_keep(tq, tk, b_id, qi, j, seed_val,
                                 dropout_rate)
            a_v = jnp.where(keep, a, 0.0) * inv_keep
            dp_eff = jnp.where(keep, dp_, 0.0) * inv_keep
        else:
            a_v, dp_eff = a, dp_
        ds = a * (dp_eff - dvec) * scale

        ds_b = ds.astype(in_dt)
        dv_seg = jax.lax.dot_general(
            a_v.astype(in_dt), do_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_seg = jax.lax.dot_general(
            ds_b, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dv_acc = dv_acc + _pad_rows(dv_seg, ks, tkp - ks - tk)
        dk_acc = dk_acc + _pad_rows(dk_seg, ks, tkp - ks - tk)

        dq_acc = dq_acc + jax.lax.dot_general(
            ds_b, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dB_parts.append(ds)

    dB_full = jnp.concatenate(dB_parts, axis=1)  # (tq, W)
    dR = _dbd_to_dR(dB_full, qs, t_real, interpret=interpret)
    dR_b = dR.astype(in_dt)
    dqv_tile = jax.lax.dot_general(
        dR_b, p_tab, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (tq+1, D)
    dp_tile = jax.lax.dot_general(
        dR_b, qv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (W, D)

    dq_ref[0] = dq_acc.astype(dq_ref.dtype)
    dqv_ref[0] = dqv_tile[:-1].astype(dqv_ref.dtype)
    # 8-row sublane-aligned block (Mosaic min fp32 tile); row 0 is the
    # crossover row, rows 1-7 are padding the caller ignores
    dqvx_ref[0] = jnp.broadcast_to(
        dqv_tile[-1:], (8, dqv_tile.shape[1])).astype(dqvx_ref.dtype)

    # dk/dv/dp accumulate across the sequential q-tile grid dimension (the
    # out blocks revisit the same VMEM block for every qi of a batch-head)
    @pl.when(qi == 0)
    def _init():
        dk_ref[0] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0] = dv_acc.astype(dv_ref.dtype)
        dp_ref[0] = dp_tile.astype(dp_ref.dtype)

    @pl.when(qi > 0)
    def _accum():
        dk_ref[0] += dk_acc.astype(dk_ref.dtype)
        dv_ref[0] += dv_acc.astype(dv_ref.dtype)
        dp_ref[0] += dp_tile.astype(dp_ref.dtype)


def _flash_rel_bwd_pallas(q_u, qv, k, v, p, kv_lens, out, lse, dout,
                          scale, tq=DEFAULT_TQ, tk=DEFAULT_TK,
                          dropout_rate=0.0, dropout_seed=None,
                          interpret=False):
    """dq_u, dqv, dk, dv, dp for the fused rel-pos attention.

    ``lse`` may be (BH, Tq) or lane-broadcast (BH, Tq_pad, 128).

    The q-tile loop is a grid dimension (grid = (BH, num_q_tiles)): per
    step the kernel holds K/V/P plus ONE q-tile's working set, with
    dk/dv/dp accumulated into revisited output blocks — VMEM and compile
    time are linear in sequence length (the k loop stays an unrolled
    Python loop of num_k_tiles MXU calls). K/V/P still reside whole in
    VMEM per batch-head: ~9 MB at T = 3200, d = 128; beyond that the k
    loop needs HBM streaming.
    """
    bh, t_q, d = q_u.shape
    t_k = k.shape[1]
    tq_eff = min(tq, -(-t_q // 8) * 8)       # vreg-aligned (see fwd)
    tk_eff = min(tk, -(-t_k // 128) * 128)
    tq_pad = -(-t_q // tq_eff) * tq_eff
    tk_pad = -(-t_k // tk_eff) * tk_eff
    d_pad = -(-d // 128) * 128

    qp = _pad_to(_pad_to(q_u, tq_pad, 1), d_pad, 2)
    qvp = _pad_to(_pad_to(qv, tq_pad + 1, 1), d_pad, 2)
    kp = _pad_to(_pad_to(k, tk_pad, 1), d_pad, 2)
    vp = _pad_to(_pad_to(v, tk_pad, 1), d_pad, 2)
    pp = _pad_to(_pad_to(p, tk_pad, 1), d_pad, 2)
    dop = _pad_to(_pad_to(dout, tq_pad, 1), d_pad, 2)
    op = _pad_to(_pad_to(out, tq_pad, 1), d_pad, 2)

    if kv_lens is None:
        kv_lens = jnp.full((bh,), t_k, jnp.int32)
    kv_smem = kv_lens.astype(jnp.int32).reshape(bh, 1)
    seed = jnp.zeros((1, 1), jnp.int32) if dropout_seed is None \
        else jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)

    if lse.ndim == 2:  # lane-broadcast (the forward already emits 3-D)
        lse = jnp.broadcast_to(
            _pad_to(lse, tq_pad, 1, value=NEG_INF)[:, :, None],
            (bh, tq_pad, 128))

    num_q_tiles = tq_pad // tq_eff
    num_k_tiles = tk_pad // tk_eff
    f32 = jnp.float32

    def per_b(rows):  # one block per batch-head, shared across q-tiles
        return pl.BlockSpec((1, rows, d_pad), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def per_tile(rows):  # blocked along the q-tile grid dimension
        return pl.BlockSpec((1, rows, d_pad), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _bwd_kernel, scale=scale,
        num_k_tiles=num_k_tiles, tq=tq_eff, tk=tk_eff, t_real=t_k,
        dropout_rate=dropout_rate, interpret=interpret)
    dq, dqv_main, dqv_extra, dk, dv, dp_full = pl.pallas_call(
        kernel,
        grid=(bh, num_q_tiles),
        in_specs=[
            per_tile(tq_eff), per_b(tq_pad + 1), per_b(tk_pad),
            per_b(tk_pad), per_b(tk_pad), per_tile(tq_eff),
            per_tile(tq_eff),
            pl.BlockSpec((1, tq_eff, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(per_tile(tq_eff), per_tile(tq_eff),
                   pl.BlockSpec((1, 8, d_pad), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM),
                   per_b(tk_pad), per_b(tk_pad), per_b(tk_pad)),
        out_shape=(
            jax.ShapeDtypeStruct((bh, tq_pad, d_pad), f32),
            jax.ShapeDtypeStruct((bh, tq_pad, d_pad), f32),
            jax.ShapeDtypeStruct((bh, num_q_tiles * 8, d_pad), f32),
            jax.ShapeDtypeStruct((bh, tk_pad, d_pad), f32),
            jax.ShapeDtypeStruct((bh, tk_pad, d_pad), f32),
            jax.ShapeDtypeStruct((bh, tk_pad, d_pad), f32)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * tq_pad * tk_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size + dop.size
                            + op.size) * 4,
            transcendentals=bh * tq_pad * tk_pad,
        ),
    )(qp, qvp, kp, vp, pp, dop, op, lse, kv_smem, seed)

    # recombine dqv: tile i's main rows land at [i*tq, (i+1)*tq); its
    # crossover row (dqv_tile[-1], the rel_shift row t+1 spill) adds onto
    # the NEXT tile's first row — the last tile's spill targets the padded
    # row tq_pad and is dropped by the slice below.
    dqv_x = dqv_extra[:, ::8, :]  # row 0 of each 8-row aligned block
    dqv_full = dqv_main.at[:, tq_eff::tq_eff, :].add(
        dqv_x[:, :num_q_tiles - 1, :]) if num_q_tiles > 1 else dqv_main

    return (dq[:, :t_q, :d], dqv_full[:, :t_q, :d], dk[:, :t_k, :d],
            dv[:, :t_k, :d], dp_full[:, :t_k, :d])


# Training-path policy: separate from the inference policy above because
# the tradeoff differs (the backward's score-sized intermediates make the
# kernel attractive at shorter T than inference fwd). Off until the
# hard-synced A/B in BENCHMARKS.md says otherwise; LITEASR_FLASH_TRAIN=1/0
# forces, set_flash_train_enabled overrides both.
_FORCED_TRAIN: "bool | None" = None


def set_flash_train_enabled(enabled: "bool | None") -> None:
    global _FORCED_TRAIN
    _FORCED_TRAIN = enabled


def flash_train_available() -> bool:
    if _FORCED_TRAIN is not None:
        wanted = _FORCED_TRAIN
    else:
        env = os.environ.get("LITEASR_FLASH_TRAIN")
        wanted = env == "1"
    if not wanted:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
