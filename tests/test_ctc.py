"""CTC loss parity vs torch.nn.CTCLoss (the reference's loss backend,
liteasr/criterions/hybrid_ctc_attn.py:32) and vs optax."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from liteasr_tpu.ops.ctc import ctc_loss


def _random_case(rng, B=3, T=20, V=7, U=6):
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    targets = rng.integers(1, V, size=(B, U)).astype(np.int32)
    input_lengths = np.array([T, T - 3, T - 7], dtype=np.int32)[:B]
    label_lengths = np.array([U, U - 2, U - 4], dtype=np.int32)[:B]
    return logits, targets, input_lengths, label_lengths


def test_ctc_matches_torch(rng):
    logits, targets, in_lens, lab_lens = _random_case(rng)
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ours = np.asarray(ctc_loss(logp, jnp.asarray(targets),
                               jnp.asarray(in_lens), jnp.asarray(lab_lens)))

    t_logp = torch.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)
    ref = torch.nn.CTCLoss(blank=0, reduction="none")(
        t_logp, torch.tensor(targets.astype(np.int64)),
        torch.tensor(in_lens.astype(np.int64)),
        torch.tensor(lab_lens.astype(np.int64)))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-4)


def test_ctc_repeated_labels(rng):
    # repeated labels exercise the skip-transition gating
    B, T, V = 2, 15, 5
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    targets = np.array([[1, 1, 2, 2], [3, 3, 3, 1]], dtype=np.int32)
    in_lens = np.array([T, T - 2], dtype=np.int32)
    lab_lens = np.array([4, 4], dtype=np.int32)

    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ours = np.asarray(ctc_loss(logp, jnp.asarray(targets),
                               jnp.asarray(in_lens), jnp.asarray(lab_lens)))
    t_logp = torch.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)
    ref = torch.nn.CTCLoss(blank=0, reduction="none")(
        t_logp, torch.tensor(targets.astype(np.int64)),
        torch.tensor(in_lens.astype(np.int64)),
        torch.tensor(lab_lens.astype(np.int64)))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-4)


def test_ctc_gradients_match_torch(rng):
    logits, targets, in_lens, lab_lens = _random_case(rng, B=2, T=12, V=5, U=4)
    lab_lens = np.array([4, 2], dtype=np.int32)

    def loss_fn(lg):
        logp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss(logp, jnp.asarray(targets), jnp.asarray(in_lens),
                        jnp.asarray(lab_lens)).sum()

    ours_grad = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))

    t_logits = torch.tensor(logits, requires_grad=True)
    t_logp = torch.log_softmax(t_logits, dim=-1).transpose(0, 1)
    ref = torch.nn.CTCLoss(blank=0, reduction="sum")(
        t_logp, torch.tensor(targets.astype(np.int64)),
        torch.tensor(in_lens.astype(np.int64)),
        torch.tensor(lab_lens.astype(np.int64)))
    ref.backward()
    np.testing.assert_allclose(
        ours_grad, t_logits.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_ctc_zero_length_label(rng):
    B, T, V = 1, 8, 4
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    out = ctc_loss(logp, jnp.zeros((B, 2), jnp.int32),
                   jnp.array([T]), jnp.array([0]))
    # all-blank path NLL
    expected = -np.asarray(logp)[0, :, 0].sum()
    np.testing.assert_allclose(np.asarray(out)[0], expected, rtol=1e-5)
