"""Fused clip + NaN-skip + Adam(+schedule) as one elementwise pass per leaf.

Semantically equivalent to the Trainer's
``apply_if_finite(chain(clip_by_global_norm, scale_by_adam,
scale_by_schedule(-lr)))`` (trainer.build_tx) but with the control flow
folded into the arithmetic instead of materialized:

* ``apply_if_finite`` tree-selects the ENTIRE updated state against the old
  one (two extra read+write passes over mu and nu);
* ``clip_by_global_norm`` writes a scaled copy of every gradient leaf;
* the chain stages and the final ``optax.apply_updates`` each round-trip
  HBM.

Here the skip/clip decisions are scalars folded into the decay factors —
``b1_eff = where(finite, b1, 1)`` leaves mu bit-identical on a skipped
step — so each leaf is ONE fused read(g, mu, nu, p) -> write(mu, nu, p)
kernel, plus a single shared reduction pass for the global norm and
finiteness. Reference behavior: liteasr/trainer.py:142-169 (clip +
skip-on-nonfinite).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FusedAdamState(NamedTuple):
    count: jnp.ndarray           # optimizer steps actually applied
    notfinite_count: jnp.ndarray
    mini_step: jnp.ndarray       # micro-step index within accum_grad
    acc: dict                    # gradient accumulator (param-shaped)
    mu: dict
    nu: dict


class FusedTx:
    """Drop-in optimizer path for the Trainer: ``apply(grads, state,
    params) -> (new_params, new_state)`` replaces the optax
    ``tx.update`` + ``optax.apply_updates`` pair so the parameter write
    happens in the same fused pass as the moment updates.

    Opt-in via ``optimization.fused_step=true`` (tp == 1 only): the state
    layout differs from the optax flat chain, so runs started without the
    flag must resume without it. Gradient accumulation follows
    trainer.accumulate_every_k: hold steps only add into the accumulator,
    the emitting step feeds the MEAN of the k micro-batch gradients.
    """

    def __init__(self, schedule, b1, b2, eps, clip=0.0, weight_decay=0.0,
                 accum=1):
        self.schedule = schedule
        self.b1, self.b2, self.eps = b1, b2, eps
        self.clip = float(clip or 0.0)
        self.weight_decay = float(weight_decay or 0.0)
        self.accum = max(int(accum), 1)

    def init(self, params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return FusedAdamState(
            count=jnp.zeros((), jnp.int32),
            notfinite_count=jnp.zeros((), jnp.int32),
            mini_step=jnp.zeros((), jnp.int32),
            acc=zeros(), mu=zeros(), nu=zeros())

    def apply(self, grads, state, params):
        def run(params, g, mu, nu, count, nf):
            p2, mu2, nu2, count2, finite = fused_adam_step(
                params, g, mu, nu, count, schedule=self.schedule,
                b1=self.b1, b2=self.b2, eps=self.eps, clip=self.clip,
                weight_decay=self.weight_decay)
            nf2 = nf + (1 - finite.astype(jnp.int32))
            return p2, mu2, nu2, count2, nf2

        if self.accum == 1:
            p2, mu2, nu2, count2, nf2 = run(
                params, grads, state.mu, state.nu, state.count,
                state.notfinite_count)
            return p2, FusedAdamState(
                count=count2, notfinite_count=nf2,
                mini_step=state.mini_step, acc=state.acc, mu=mu2, nu=nu2)

        acc = jax.tree.map(jnp.add, state.acc, grads)

        def do_apply(params, acc, mu, nu, count, nf):
            mean = jax.tree.map(lambda g: g / self.accum, acc)
            p2, mu2, nu2, count2, nf2 = run(params, mean, mu, nu, count, nf)
            return p2, jax.tree.map(jnp.zeros_like, acc), mu2, nu2, \
                count2, nf2

        def hold(params, acc, mu, nu, count, nf):
            return params, acc, mu, nu, count, nf

        p2, acc2, mu2, nu2, count2, nf2 = jax.lax.cond(
            state.mini_step == self.accum - 1, do_apply, hold,
            params, acc, state.mu, state.nu, state.count,
            state.notfinite_count)
        return p2, FusedAdamState(
            count=count2, notfinite_count=nf2,
            mini_step=(state.mini_step + 1) % self.accum,
            acc=acc2, mu=mu2, nu=nu2)


def fused_adam_step(params, grads, mu, nu, count, *, schedule, b1, b2, eps,
                    clip=0.0, weight_decay=0.0):
    """One optimizer step. Returns (new_params, new_mu, new_nu, new_count,
    finite).

    ``count`` is the number of PREVIOUS successful steps (optax convention:
    bias correction uses count+1). On a non-finite gradient the whole
    update is a no-op (params, mu, nu, count unchanged) — matching
    ``optax.apply_if_finite``.
    """
    gsq = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
              for g in jax.tree.leaves(grads))
    finite = jnp.isfinite(gsq)  # inf/nan in any leaf -> gsq non-finite
    gnorm = jnp.sqrt(gsq)
    if clip and clip > 0:
        scale = jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-12))
    else:
        scale = jnp.float32(1.0)

    s = jnp.where(finite, scale, 0.0)
    b1e = jnp.where(finite, b1, 1.0)
    b2e = jnp.where(finite, b2, 1.0)
    new_count = count + finite.astype(count.dtype)
    # clamp: a skipped step at count==0 would give bc=1-b^0=0 and u=0/0=NaN,
    # which 0*step_size cannot mask (IEEE 0*nan=nan)
    t = jnp.maximum(new_count, 1).astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t
    lr = schedule(count)  # optax.scale_by_schedule sees the pre-step count
    step_size = jnp.where(finite, lr, 0.0).astype(jnp.float32)

    def leaf(p, g, m, v):
        g32 = g.astype(jnp.float32) * s
        # IEEE: 0 * nan = nan, so a skipped step's (1-b1e)=0 factor alone
        # would still poison mu/nu — zero non-finite elements explicitly
        # (same fused kernel, no extra pass).
        g32 = jnp.where(jnp.isfinite(g32), g32, 0.0)
        if weight_decay:
            g32 = g32 + weight_decay * p.astype(jnp.float32)
        m2 = b1e * m + (1.0 - b1e) * g32
        v2 = b2e * v + (1.0 - b2e) * jnp.square(g32)
        u = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
        p2 = p - (step_size * u).astype(p.dtype)
        return p2, m2, v2

    out = jax.tree.map(leaf, params, grads, mu, nu)
    new_p = jax.tree.map(lambda o: o[0], out,
                         is_leaf=lambda o: isinstance(o, tuple))
    new_mu = jax.tree.map(lambda o: o[1], out,
                          is_leaf=lambda o: isinstance(o, tuple))
    new_nu = jax.tree.map(lambda o: o[2], out,
                          is_leaf=lambda o: isinstance(o, tuple))
    return new_p, new_mu, new_nu, new_count, finite
