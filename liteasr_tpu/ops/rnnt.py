"""RNN-T (transducer) loss: log-space lattice DP, TPU-vectorized.

Replaces the reference's external CUDA/C++ warp-transducer libraries
(liteasr/criterions/rnnt.py:28-35). The forward variable obeys

    alpha[t, u] = logadd(alpha[t-1, u] + blank[t-1, u],
                         alpha[t,   u-1] + emit[t, u-1])

The in-row dependency (u-1 -> u at fixed t) is a log-semiring linear
recurrence, solved with a *cumulative logsumexp* (``lax.associative_scan``):
with c[u] = alpha[t-1, u] + blank[t-1, u] and Y[u] = cumsum(emit[t, :u]),

    alpha[t, u] = Y[u] + cumlogsumexp(c - Y)[u]

so each row updates in O(log U) parallel depth and the only sequential loop
is a ``lax.scan`` over T. Gradients come from JAX autodiff through the scan.

loss[b] = -(alpha[T_b-1, U_b] + blank[T_b-1, U_b])
"""

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _cumlogsumexp(x, axis: int):
    return jax.lax.associative_scan(jnp.logaddexp, x, axis=axis)


def rnnt_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """Per-utterance negative log-likelihood, shape (B,).

    :param logits: (B, T, U+1, V) joint network output (pre-softmax)
    :param targets: (B, U) label ids (no blanks)
    :param input_lengths: (B,) valid encoder frames
    :param label_lengths: (B,) valid labels
    """
    B, T, U1, V = logits.shape
    U = U1 - 1
    assert targets.shape[1] == U, (targets.shape, logits.shape)

    # log p[v] = h[v] - logsumexp(h): the lattice only needs the blank and
    # target-label scores, so gather those two slices and normalize — the
    # full (B, T, U+1, V) fp32 log-softmax (2x the bf16 joint table, plus a
    # same-size gradient buffer) is never materialized. The backward pass
    # rebuilds softmax(h) in one fused elementwise kernel.
    lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)  # (B,T,U+1)

    lp_blank = logits[..., blank].astype(jnp.float32) - lse  # (B, T, U+1)
    lp_emit = jnp.take_along_axis(
        logits[:, :, :U, :], targets[:, None, :, None].astype(jnp.int32),
        axis=3)[..., 0].astype(jnp.float32) - lse[:, :, :U]  # (B, T, U)

    u_idx = jnp.arange(U1)[None, :]  # (1, U+1)
    live = u_idx <= label_lengths[:, None]  # (B, U+1) reachable lattice cols
    emit_live = u_idx[:, :U] < label_lengths[:, None]  # (B, U)

    def row_close(alpha_in, emit_t):
        """Close the in-row recursion: alpha_out[u] =
        logsumexp_k<=u (alpha_in[k] + sum_{j=k}^{u-1} emit_t[j])."""
        safe_emit = jnp.where(emit_live, emit_t, 0.0)  # dead cols never used
        ycum = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.float32),
             jnp.cumsum(safe_emit, axis=1)], axis=1)  # (B, U+1)
        vals = jnp.where(live, alpha_in - ycum, NEG_INF)
        out = ycum + _cumlogsumexp(vals, axis=1)
        return jnp.where(live, jnp.maximum(out, NEG_INF), NEG_INF)

    # t = 0: only emissions from alpha[0,0] = 0
    alpha0 = jnp.full((B, U1), NEG_INF).at[:, 0].set(0.0)
    alpha = row_close(alpha0, lp_emit[:, 0, :])

    def step(alpha, t):
        c = alpha + lp_blank[:, t - 1, :]  # horizontal (blank) move
        new_alpha = row_close(c, lp_emit[:, t, :])
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    alpha, _ = jax.lax.scan(step, alpha, jnp.arange(1, T))

    final_alpha = jnp.take_along_axis(
        alpha, label_lengths[:, None].astype(jnp.int32), axis=1)[:, 0]
    t_last = jnp.clip(input_lengths - 1, 0, T - 1).astype(jnp.int32)
    final_blank = jnp.take_along_axis(
        jnp.take_along_axis(
            lp_blank, t_last[:, None, None], axis=1)[:, 0, :],
        label_lengths[:, None].astype(jnp.int32), axis=1)[:, 0]
    return -(final_alpha + final_blank)
