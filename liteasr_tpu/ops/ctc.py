"""CTC loss as a batched log-space forward recursion under ``lax.scan``.

TPU-native replacement for the reference's ``torch.nn.CTCLoss`` (cuDNN native
kernel; liteasr/criterions/hybrid_ctc_attn.py:32,67-75). The whole lattice is
vectorized over (batch, 2U+1) states so each scan step is a handful of fused
VPU ops; gradients come from JAX autodiff through the scan.
"""

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    valid = m > NEG_INF
    # sanitize all inputs of the dead branch so its (unused) gradient is
    # finite — jax.grad evaluates both sides of a `where`
    m_safe = jnp.where(valid, m, 0.0)
    a = jnp.where(valid, a, 0.0)
    b = jnp.where(valid, b, 0.0)
    c = jnp.where(valid, c, 0.0)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    )
    return jnp.where(valid, out, NEG_INF)


def _extended_labels(targets: jnp.ndarray, blank: int):
    """(ext, can_skip): the blank-interleaved label row and the s-2 -> s
    diagonal-skip permission (standard CTC topology)."""
    B, U = targets.shape
    S = 2 * U + 1
    s_idx = jnp.arange(S)
    is_label = (s_idx % 2) == 1
    tgt_idx = jnp.clip((s_idx - 1) // 2, 0, U - 1)
    ext = jnp.where(is_label[None, :], jnp.take_along_axis(
        targets, jnp.broadcast_to(tgt_idx[None, :], (B, S)), axis=1), blank)
    ext_prev2 = jnp.concatenate(
        [jnp.full((B, 2), blank, dtype=ext.dtype), ext[:, :-2]], axis=1)
    can_skip = is_label[None, :] & (ext != ext_prev2)
    return ext, can_skip


def ctc_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """Per-utterance negative log-likelihood, shape (B,).

    :param log_probs: (B, T, V) log-softmax output
    :param targets: (B, U) label ids, padding arbitrary (masked by lengths)
    :param input_lengths: (B,) valid frames
    :param label_lengths: (B,) valid labels
    """
    ext, can_skip = _extended_labels(targets, blank)
    # gather ALL emission scores up front: one (B, T, S) gather instead of a
    # (B, V) table read per scan step — the scan then streams (B, S) slices
    # (V=5000 -> S~100 cuts the scan's HBM traffic ~50x)
    emits = jnp.take_along_axis(
        log_probs, ext[:, None, :].astype(jnp.int32), axis=2)  # (B, T, S)
    return _ctc_scan(emits, can_skip, input_lengths, label_lengths)


def ctc_loss_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """``ctc_loss`` taken directly on pre-softmax logits.

    log p[v] = h[v] - logsumexp(h), so the lattice only ever needs the S
    gathered logits and the (B, T) normalizer — the full (B, T, V) fp32
    log-softmax table (and its gradient buffer) is never materialized.
    Mathematically identical to ``ctc_loss(log_softmax(h), ...)``; the
    backward pass rebuilds softmax(h) in one fused elementwise kernel.
    """
    ext, can_skip = _extended_labels(targets, blank)
    lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)  # (B, T)
    gathered = jnp.take_along_axis(
        logits, ext[:, None, :].astype(jnp.int32), axis=2)  # (B, T, S)
    emits = gathered.astype(jnp.float32) - lse[:, :, None]
    return _ctc_scan(emits, can_skip, input_lengths, label_lengths)


def _ctc_scan(emits, can_skip, input_lengths, label_lengths):
    """Forward DP over the (B, S) lattice given gathered emissions."""
    B, T, S = emits.shape
    alpha0 = jnp.full((B, S), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emits[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(emits[:, 0, 1])

    def step(alpha, emit_and_t):
        emit_t, t = emit_and_t
        shift1 = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), alpha[:, :-1]], axis=1)
        shift2 = jnp.concatenate(
            [jnp.full((B, 2), NEG_INF), alpha[:, :-2]], axis=1)
        shift2 = jnp.where(can_skip, shift2, NEG_INF)
        new_alpha = _logaddexp3(alpha, shift1, shift2) + emit_t
        # freeze finished utterances (t >= input_length)
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    ts = jnp.arange(1, T)
    # unroll: each iteration is a handful of (B, S) VPU ops, so the scan's
    # per-step dispatch overhead is a real fraction of its cost at T~200;
    # unrolling 4 steps per loop iteration amortizes it (fwd and the
    # transposed bwd scan both inherit the unroll). Exact same math.
    alpha, _ = jax.lax.scan(step, alpha0, (emits[:, 1:].swapaxes(0, 1), ts),
                            unroll=4)

    # final states: S_b - 1 = 2*U_b (last blank) and S_b - 2 = 2*U_b - 1
    last = 2 * label_lengths  # (B,)
    a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha, jnp.maximum(last - 1, 0)[:, None], axis=1)[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, NEG_INF)
    return -jnp.logaddexp(a_last, a_prev)
