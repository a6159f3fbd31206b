"""Hybrid CTC / label-smoothed attention loss.

Reference: liteasr/criterions/hybrid_ctc_attn.py:17-87. Loss values match the
reference numerically: the attention part is the full KL divergence
``true_dist * (log(true_dist) - log_softmax(h))`` (torch KLDivLoss semantics,
including the constant entropy term), summed over non-ignored positions and
divided by batch size; the CTC part is a summed NLL divided by batch size;
blended with ``ctc_weight``.
"""

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import jax.nn

from liteasr_tpu.config import MISSING, LiteasrDataclass
from liteasr_tpu.criterions import LiteasrLoss, register_criterion
from liteasr_tpu.ops.ctc import ctc_loss_logits


@dataclass
class HybridCTCLossConfig(LiteasrDataclass):
    name: Optional[str] = field(default="hybrid_ctc")
    vocab_size: int = MISSING
    padding_idx: int = -1
    smoothing: float = 0.0
    normalize_length: bool = False
    ctc_weight: float = 0.0


def label_smoothed_kl(h_attn, tgt_attn, vocab_size: int, smoothing: float,
                      padding_idx: int = -1):
    """Sum over non-ignored positions of KL(true_dist || softmax(h)).

    Works on raw logits: with logp_v = h_v - lse(h), the two reductions the
    KL needs are sum_v logp_v = sum_v h_v - V*lse and logp_tgt = h_tgt - lse,
    so the (N, V) fp32 log-softmax table is never materialized — only fused
    reductions over the (bf16) logits.
    """
    tgt_flat = tgt_attn.reshape(-1)
    ignore = tgt_flat == padding_idx
    tgt_safe = jnp.where(ignore, 0, tgt_flat)

    h = h_attn.reshape(-1, vocab_size)
    hf = h.astype(jnp.float32)
    lse = jax.nn.logsumexp(hf, axis=-1)  # (N,)
    sum_logp = hf.sum(axis=-1) - vocab_size * lse
    logp_tgt = jnp.take_along_axis(
        h, tgt_safe[:, None], axis=1)[:, 0].astype(jnp.float32) - lse

    off = smoothing / (vocab_size - 1)
    on = 1.0 - smoothing

    # sum_v q_v * (log q_v - logp_v), with the one-hot mass handled separately.
    # x*log(x) with x==0 must be exactly 0 (XLA flushes subnormal eps to zero,
    # so a naive log(max(x, tiny)) produces 0 * -inf = NaN when smoothing=0)
    def xlogx(p: float) -> float:
        import math

        return p * math.log(p) if p > 0 else 0.0

    ent = xlogx(off) * (vocab_size - 1) + xlogx(on)
    cross = off * sum_logp + (on - off) * logp_tgt
    kl = ent - cross
    return jnp.where(ignore, 0.0, kl).sum()


@register_criterion("hybrid_ctc", dataclass=HybridCTCLossConfig)
class HybridCTCLoss(LiteasrLoss):
    def __init__(self, cfg, task=None):
        super().__init__(cfg)
        self.vocab_size = int(cfg.vocab_size)
        self.smoothing = float(cfg.smoothing)
        self.ctc_weight = float(cfg.ctc_weight)
        self.padding_idx = int(cfg.padding_idx)

    @classmethod
    def build_criterion(cls, cfg, task=None):
        if task is not None:
            cfg.vocab_size = task.vocab_size
        return cls(cfg, task)

    def __call__(self, model, variables, batch, rngs=None, train: bool = True):
        xs, xlens, ys, ylens = (
            batch["xs"], batch["xlens"], batch["ys"], batch["ylens"])
        valid = batch.get("valid")  # (B,) 1.0 for real utts, 0.0 for pad rows
        if valid is None:
            valid = jnp.ones(xs.shape[0], dtype=jnp.float32)
        nutt = jnp.maximum(valid.sum(), 1.0)

        if train:
            (h_attn, h_ctc), new_model_state = model.apply(
                variables, xs, xlens, ys, ylens, train=True,
                rngs=rngs, mutable=["batch_stats"])
        else:
            h_attn, h_ctc = model.apply(
                variables, xs, xlens, ys, ylens, train=False)
            new_model_state = {}

        tgt_attn, tgt_ctc = model.get_target(ys, ylens)
        # padded rows: force every position ignored so they contribute 0
        tgt_attn = jnp.where(valid[:, None] > 0, tgt_attn, self.padding_idx)

        loss_attn = label_smoothed_kl(
            h_attn, tgt_attn, self.vocab_size, self.smoothing,
            self.padding_idx) / nutt

        tgt_ctc_ids = jnp.where(ys == self.padding_idx, 0, ys)
        pred_len = model.get_pred_len(xlens)
        # logits-domain CTC: never materializes the (B, T, V) log-softmax
        per_utt = ctc_loss_logits(h_ctc, tgt_ctc_ids, pred_len, ylens)
        # CTC needs pred_len >= ylen + repeated-label count; an infeasible
        # row has no lattice path and its "loss" is the DP's -NEG_INF filler
        # (~1e30, finite, so apply_if_finite would NOT skip it). Zero such
        # rows out, like torch.nn.CTCLoss(zero_infinity=True) — the
        # reference's default (inf -> NaN -> skip the whole step) throws away
        # the entire batch for one bad utterance.
        pos = jnp.arange(ys.shape[1])[None, :]
        repeats = ((tgt_ctc_ids[:, 1:] == tgt_ctc_ids[:, :-1])
                   & (pos[:, 1:] < ylens[:, None])).sum(axis=1)
        feasible = (pred_len >= ylens + repeats).astype(jnp.float32)
        ctc_w = valid * feasible
        loss_ctc = (per_utt * ctc_w).sum() / nutt

        loss = self.ctc_weight * loss_ctc + (1 - self.ctc_weight) * loss_attn
        aux = {
            "loss_attn": loss_attn,
            "loss_ctc": loss_ctc,
            "ctc_infeasible": (valid * (1.0 - feasible)).sum(),
            "model_state": new_model_state,
        }
        return loss, aux
