"""Train-mode BatchNorm with a hand-written VJP (single-pass stats).

Matches flax ``nn.BatchNorm(use_running_average=False)`` semantics on
(B, T, C) inputs — statistics over every (B, T) position per channel
(including padded frames, the reference's own convention:
liteasr/nets/conformer_convolution.py applies torch BatchNorm1d to padded
sequences), biased variance, fp32 normalization math.

Why not autodiff through flax BN: each train step pays separate XLA
fusions for the stats reductions, the normalize pass, and three backward
reductions, and the saved residuals round-trip HBM between them. Here the
forward computes sum / sum-of-squares in one read and the backward is the
closed form

    dx = g * rstd * (dy - mean(dy) - xhat * mean(dy * xhat))

which needs exactly one reduction pass over (dy, xhat) and one elementwise
pass — the minimum traffic for batch-statistic normalization.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def train_batch_norm(x, gamma, beta, eps: float = 1e-5):
    """x (B, T, C) any float dtype; gamma/beta (C,) fp32.

    Returns (y, mean, var): y in x.dtype, mean/var fp32 per-channel batch
    statistics (biased var — what flax both normalizes with and folds into
    the running average).
    """
    y, mean, var, _ = _bn_fwd_impl(x, gamma, beta, eps)
    return y, mean, var


def _bn_fwd_impl(x, gamma, beta, eps):
    x32 = x.astype(jnp.float32)
    n = x.shape[0] * x.shape[1]
    s1 = jnp.sum(x32, axis=(0, 1))
    s2 = jnp.sum(x32 * x32, axis=(0, 1))
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * rstd
    y = (xhat * gamma + beta).astype(x.dtype)
    return y, mean, var, (x, mean, rstd, gamma)


def _bn_fwd(x, gamma, beta, eps):
    y, mean, var, res = _bn_fwd_impl(x, gamma, beta, eps)
    return (y, mean, var), res


def _bn_bwd(eps, res, cts):
    dy, _, _ = cts  # cotangents for (y, mean, var); stats are observational
    x, mean, rstd, gamma = res
    n = x.shape[0] * x.shape[1]
    dy32 = dy.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * rstd
    # one fused reduction pass over (dy, dy*xhat, dy) per channel
    sum_dy = jnp.sum(dy32, axis=(0, 1))
    sum_dy_xhat = jnp.sum(dy32 * xhat, axis=(0, 1))
    dgamma = sum_dy_xhat
    dbeta = sum_dy
    dx = (gamma * rstd) * (dy32 - sum_dy / n - xhat * (sum_dy_xhat / n))
    return dx.astype(x.dtype), dgamma, dbeta


train_batch_norm.defvjp(_bn_fwd, _bn_bwd)
