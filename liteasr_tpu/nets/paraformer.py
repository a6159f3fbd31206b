"""Paraformer building blocks: CIF predictor, non-causal parallel decoder,
glancing sampler.

Reference: liteasr/nets/paraformer/{predictor.py:12-118,
parallel_decoder.py:11-66, glancing_sampler.py:9-32}.

TPU-native redesign: the CIF integrate-and-fire python loop over T
(predictor.py:61-103) is a single ``lax.scan`` whose carry holds the
accumulator and a write cursor into the fixed-width (B, U, D) output buffer —
fired vectors are scattered in firing order, replacing the reference's
post-hoc per-batch rearrange (:107-115). The glancing sampler's host
``random.sample`` (:27-29) becomes a PRNG-keyed top-k over uniform noise.
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from liteasr_tpu.nets.common import LayerNorm
from liteasr_tpu.nets.encoder import subsample_mask
from liteasr_tpu.nets.layers import DecoderLayer
from liteasr_tpu.ops.masks import padding_mask


# Above this many weight-matrix cells (U * T) the closed-form path would
# materialize too large a (B, U, T) tensor; fall back to the scan.
_DENSE_CIF_MAX_CELLS = 512 * 1024


def cif_scan(alpha, xs32, beta, U):
    """Reference-shaped integrate-and-fire as a ``lax.scan`` over T.

    Kept as the long-sequence fallback and as the parity oracle for
    :func:`cif_dense` (tests/test_paraformer.py).
    """
    B, T, D = xs32.shape

    def step(carry, t):
        prev_alpha, prev_state, count, buf = carry
        cur_alpha = alpha[:, t]  # (B,)
        cur_state = xs32[:, t]  # (B, D)

        new_alpha = prev_alpha + cur_alpha
        is_fired = new_alpha >= beta  # (B,)
        left = (beta - prev_alpha)[:, None]
        right = (new_alpha - beta)[:, None]

        fired_state = prev_state + left * cur_state  # (B, D)
        next_alpha = jnp.where(is_fired, right[:, 0], new_alpha)
        next_state = jnp.where(
            is_fired[:, None], right * cur_state,
            prev_state + left * cur_state)

        write = is_fired & (count < U)
        pos = jnp.arange(U)[None, :, None]  # (1, U, 1)
        buf = jnp.where(
            (pos == count[:, None, None]) & write[:, None, None],
            fired_state[:, None, :], buf)
        count = count + write.astype(count.dtype)
        return (next_alpha, next_state, count, buf), None

    carry0 = (
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B, D), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, U, D), jnp.float32),
    )
    (_, _, _, buf), _ = jax.lax.scan(step, carry0, jnp.arange(T))
    return buf


def cif_dense(alpha, xs32, beta, U):
    """Closed-form integrate-and-fire: cumsum + cummin + ONE batched matmul.

    TPU-native replacement for the sequential scan. The key identities:

    * fires-so-far obeys ``k[t] = min(floor(csum[t]/beta), k[t-1] + 1)``
      (at most one fire per frame, each fire subtracts exactly beta), whose
      unrolled form ``k[t] = t + min(1, min_{s<=t}(floor(csum[s]/beta)-s))``
      is a log-depth ``cummin``;
    * every frame contributes ``(k[t-1]+1)*beta - csum[t-1]`` of its state
      to the token it lands in (this single expression covers BOTH the
      reference's quirky not-fired accumulation ``left_alpha * cur_state``
      AND the fired 'left' part, predictor.py:88-97), and a firing frame
      additionally carries ``csum[t] - k[t]*beta`` into the next token;
    * a token is materialized iff it fires, i.e. iff its index < k[T-1].

    The (B, U, T) weight matrix assembled from those terms turns the whole
    integration into ``einsum('but,btd->bud')`` on the MXU — no sequential
    dependence anywhere. Gradient-equivalent to the scan: fire decisions
    (integer k) carry no gradient in either form, and the weights are the
    same linear functions of csum/beta.
    """
    B, T, D = xs32.shape
    ar = jnp.arange(T, dtype=jnp.int32)

    csum = jnp.cumsum(alpha, axis=1)  # (B, T)
    csum_prev = jnp.concatenate(
        [jnp.zeros((B, 1), csum.dtype), csum[:, :-1]], axis=1)

    # beta <= 0 is a degenerate regime (the scan fires every frame); the
    # safe divisor reproduces fire-every-frame behaviour via the k clamp.
    beta_safe = jnp.maximum(beta, 1e-8)[:, None]
    f = jnp.floor(jax.lax.stop_gradient(csum) / beta_safe).astype(jnp.int32)
    g = jax.lax.cummin(f - ar[None, :], axis=1)
    k = ar[None, :] + jnp.minimum(g, 1)  # (B, T) fires-so-far
    k_prev = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), k[:, :-1]], axis=1)
    k_total = k[:, -1:]  # (B, 1)

    fired = k > k_prev
    w_cur = (k_prev + 1).astype(jnp.float32) * beta[:, None] - csum_prev
    w_next = csum - k.astype(jnp.float32) * beta[:, None]

    u_ar = jnp.arange(U, dtype=jnp.int32)[None, :, None]  # (1, U, 1)
    cur_w = jnp.where(
        (k_prev[:, None, :] == u_ar) & (k_prev < k_total)[:, None, :],
        w_cur[:, None, :], 0.0)
    next_w = jnp.where(
        (k[:, None, :] == u_ar) & (fired & (k < k_total))[:, None, :],
        w_next[:, None, :], 0.0)
    W = cur_w + next_w  # (B, U, T)
    return jax.lax.dot_general(
        W, xs32, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


class Predictor(nn.Module):
    """CIF: conv -> relu -> linear -> sigmoid alpha, then integrate-and-fire.

    NOTE on parity: the not-fired accumulation uses the reference's exact
    update ``prev_state + left_alpha * cur_state`` (predictor.py:88-97),
    where left_alpha = beta - prev_alpha (the CIF paper uses cur_alpha).

    The integration itself is the closed-form :func:`cif_dense` (cumsum +
    cummin + one batched matmul) whenever the (U, T) weight matrix is small
    enough, with the :func:`cif_scan` fallback for very long sequences.

    ``dense_cif``: None = the size heuristic above; True/False forces a
    path. MEASURED (round 3): the dense train graph XLA-compiles in ~136 s
    on CPU but ~52 min through the remote-compile TPU tunnel (vs ~20 min
    for the scan graph); once compiled it trains normally. With a warm
    compile cache prefer dense; for one-off runs on a cold cache
    ``model.dense_cif=false`` trades step speed for compile latency. The
    two paths are parity-tested, values AND gradients
    (tests/test_paraformer.py).
    """

    dtype: jnp.dtype = jnp.float32
    dense_cif: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        xs: jnp.ndarray,
        xlens: Optional[jnp.ndarray] = None,
        ylens: Optional[jnp.ndarray] = None,
        u_max: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """:param xs: (B, T', D) encoder output
        :param xlens: (B,) valid encoder frames (train)
        :param ylens: (B,) target lengths (train); None at inference
        :param u_max: static output width; defaults to T'
        :return: (h_cif (B, u_max, D), sum_alpha (B,))
        """
        B, T, D = xs.shape
        U = u_max or T

        a = nn.Conv(D, (3,), padding="SAME", dtype=self.dtype, name="conv")(xs)
        a = nn.relu(a)
        a = nn.Dense(1, dtype=self.dtype, name="lin")(a)
        alpha = nn.sigmoid(a)[..., 0].astype(jnp.float32)  # (B, T')

        if xlens is not None:
            alpha = jnp.where(padding_mask(xlens, T), 0.0, alpha)

        sum_alpha = alpha.sum(axis=1)  # (B,)
        if ylens is not None:
            ulens = jnp.maximum(ylens.astype(jnp.float32), 1.0)
        else:
            ulens = jnp.maximum(jnp.round(sum_alpha), 1.0)
        beta = sum_alpha / ulens - 1e-4  # prevent precision error

        xs32 = xs.astype(jnp.float32)
        dense = (U * T <= _DENSE_CIF_MAX_CELLS if self.dense_cif is None
                 else self.dense_cif)
        buf = (cif_dense if dense else cif_scan)(alpha, xs32, beta, U)
        return buf.astype(self.dtype), sum_alpha


class ParallelDecoder(nn.Module):
    """Non-causal decoder over CIF vectors, no positional encoding
    (parallel_decoder.py:11-66)."""

    vocab_size: int
    ff_dim: int
    n_head: int
    n_layer: int
    dropout_rate: float
    self_attn_dropout_rate: float
    src_attn_dropout_rate: float
    ff_dropout_rate: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, memory, memory_mask=None, train: bool = False):
        if memory_mask is not None:
            mm = subsample_mask(memory_mask)[:, None, None, :]
        else:
            mm = None
        for i in range(self.n_layer):
            y = DecoderLayer(
                n_head=self.n_head,
                ff_dim=self.ff_dim,
                dropout_rate=self.dropout_rate,
                self_attn_dropout_rate=self.self_attn_dropout_rate,
                src_attn_dropout_rate=self.src_attn_dropout_rate,
                ff_dropout_rate=self.ff_dropout_rate,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(y, memory, mask=None, memory_mask=mm, train=train)
        y = LayerNorm(dtype=self.dtype, name="after_norm")(y)
        return nn.Dense(self.vocab_size, dtype=self.dtype, name="linear_out")(y)


def glancing_sample(rng, hs, embed_ys, ys, ys_hat, ylens,
                    sample_ratio: float):
    """Mix ground-truth embeddings into CIF vectors at randomly chosen
    positions; count scales with the hamming distance of the first-pass
    prediction (glancing_sampler.py:9-32)."""
    B, U = ys.shape
    distance = (ys_hat != ys).sum(axis=1)  # (B,)
    sample_num = jnp.ceil(sample_ratio * distance).astype(jnp.int32)

    noise = jax.random.uniform(rng, (B, U))
    pos = jnp.arange(U)[None, :]
    noise = jnp.where(pos < ylens[:, None], noise, 2.0)  # pads never sampled
    rank = jnp.argsort(jnp.argsort(noise, axis=1), axis=1)  # rank per row
    replace = rank < sample_num[:, None]  # (B, U)

    return jnp.where(replace[:, :, None], embed_ys, hs)
