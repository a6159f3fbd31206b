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


def test_infeasible_row_is_masked_in_hybrid_loss():
    """A row with ylen+repeats > pred_len has no CTC lattice path; its DP
    value is ~1e30 (finite!), so it must be zeroed out of the loss, not
    averaged in (torch zero_infinity=True semantics)."""
    import jax
    import jax.numpy as jnp

    from liteasr_tpu.config.core import DotDict
    from liteasr_tpu.criterions.hybrid_ctc_attn import HybridCTCLoss
    from liteasr_tpu.models.u2 import U2, U2Config
    from liteasr_tpu.config.core import _node_to_dict

    vocab = 16
    cfg = DotDict(_node_to_dict(U2Config))
    cfg.update(dict(input_dim=8, vocab_size=vocab, enc_layers=1,
                    dec_layers=1, enc_dim=16, enc_ff_dim=32, dec_dim=16,
                    dec_ff_dim=32, enc_attn_heads=2, dec_attn_heads=2,
                    dropout_rate=0.0))
    for k in list(cfg):
        if isinstance(cfg[k], str) and cfg[k].startswith("${"):
            cfg[k] = 0.0
    model = U2.build_model(cfg, None)
    crit = HybridCTCLoss(DotDict(
        name="hybrid_ctc", vocab_size=vocab, padding_idx=-1, smoothing=0.1,
        normalize_length=False, ctc_weight=0.5))

    B, T, U = 2, 20, 8
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32)
    # row 0 feasible (pred_len=4 >= ylen 2); row 1 infeasible (ylen 8 > 4)
    xlens = jnp.array([T, T], jnp.int32)
    ys = jnp.asarray(rng.integers(1, vocab - 1, size=(B, U)), jnp.int32)
    ylens = jnp.array([2, 8], jnp.int32)
    batch = {"xs": xs, "xlens": xlens, "ys": ys, "ylens": ylens,
             "valid": jnp.ones(B)}
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           xs, xlens, ys, ylens, train=False)
    loss, aux = crit(model, variables, batch, train=False)
    assert float(loss) < 1e4, f"infeasible row leaked into loss: {loss}"
    assert float(aux["ctc_infeasible"]) == 1.0


def test_ctc_logits_matches_log_softmax_path(rng):
    """ctc_loss_logits(h) == ctc_loss(log_softmax(h)) — values and grads
    (the logits path never materializes the (B, T, V) log-softmax)."""
    from liteasr_tpu.ops.ctc import ctc_loss_logits

    logits, targets, in_lens, lab_lens = _random_case(rng)
    args = (jnp.asarray(targets), jnp.asarray(in_lens), jnp.asarray(lab_lens))

    ref = np.asarray(ctc_loss(
        jax.nn.log_softmax(jnp.asarray(logits), axis=-1), *args))
    got = np.asarray(ctc_loss_logits(jnp.asarray(logits), *args))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    g_ref = jax.grad(lambda h: ctc_loss(
        jax.nn.log_softmax(h, axis=-1), *args).sum())(jnp.asarray(logits))
    g_got = jax.grad(lambda h: ctc_loss_logits(
        h, *args).sum())(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-5)
