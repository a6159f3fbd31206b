"""RNN-T loss vs a naive O(T*U) dynamic-programming oracle (the transducer
forward algorithm the warp libraries implement; liteasr/criterions/rnnt.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from liteasr_tpu.ops.rnnt import rnnt_loss


def oracle_rnnt(logp: np.ndarray, target: np.ndarray, T: int, U: int) -> float:
    """logp: (Tmax, Umax+1, V) log-softmax; returns NLL."""
    alpha = np.full((T, U + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            if t == 0 and u == 0:
                continue
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + logp[t - 1, u, 0])
            if u > 0:
                cands.append(alpha[t, u - 1] + logp[t, u - 1, target[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(cands)
    return -(alpha[T - 1, U] + logp[T - 1, U, 0])


def test_rnnt_matches_oracle(rng):
    B, T, U, V = 3, 9, 5, 6
    logits = rng.normal(size=(B, T, U + 1, V)).astype(np.float32)
    targets = rng.integers(1, V, size=(B, U)).astype(np.int32)
    in_lens = np.array([T, T - 2, T - 4], dtype=np.int32)
    lab_lens = np.array([U, U - 1, U - 3], dtype=np.int32)

    ours = np.asarray(rnnt_loss(
        jnp.asarray(logits), jnp.asarray(targets),
        jnp.asarray(in_lens), jnp.asarray(lab_lens)))

    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    for b in range(B):
        ref = oracle_rnnt(logp[b], targets[b], int(in_lens[b]),
                          int(lab_lens[b]))
        np.testing.assert_allclose(ours[b], ref, rtol=1e-4, atol=1e-4)


def test_rnnt_gradients_finite_and_correct(rng):
    B, T, U, V = 2, 6, 3, 5
    logits = rng.normal(size=(B, T, U + 1, V)).astype(np.float32)
    targets = rng.integers(1, V, size=(B, U)).astype(np.int32)
    in_lens = np.array([T, T - 2], dtype=np.int32)
    lab_lens = np.array([U, U - 1], dtype=np.int32)

    def loss_sum(lg):
        return rnnt_loss(lg, jnp.asarray(targets), jnp.asarray(in_lens),
                         jnp.asarray(lab_lens)).sum()

    g = np.asarray(jax.grad(loss_sum)(jnp.asarray(logits)))
    assert np.isfinite(g).all()

    # numerical gradient check on a handful of coordinates
    eps = 1e-3
    for (b, t, u, v) in [(0, 0, 0, 0), (0, 2, 1, 3), (1, 3, 2, 1),
                         (1, 5, 3, 0)]:
        lp = logits.copy()
        lp[b, t, u, v] += eps
        up = float(loss_sum(jnp.asarray(lp)))
        lp[b, t, u, v] -= 2 * eps
        down = float(loss_sum(jnp.asarray(lp)))
        num = (up - down) / (2 * eps)
        np.testing.assert_allclose(g[b, t, u, v], num, rtol=2e-2, atol=2e-3)


def test_rnnt_beyond_length_logits_have_zero_grad(rng):
    B, T, U, V = 1, 6, 3, 5
    logits = rng.normal(size=(B, T, U + 1, V)).astype(np.float32)
    targets = rng.integers(1, V, size=(B, U)).astype(np.int32)
    in_lens = np.array([4], dtype=np.int32)
    lab_lens = np.array([2], dtype=np.int32)

    g = np.asarray(jax.grad(lambda lg: rnnt_loss(
        lg, jnp.asarray(targets), jnp.asarray(in_lens),
        jnp.asarray(lab_lens)).sum())(jnp.asarray(logits)))
    # frames past T_b and label rows past U_b contribute nothing
    assert np.abs(g[0, 4:]).max() == 0.0
    assert np.abs(g[0, :, 3:]).max() == 0.0
