"""LayerNorm with a hand-written VJP (fp32 math, eps per caller).

Matches flax ``nn.LayerNorm(epsilon=eps, dtype=float32)`` on the last axis
(the reference's Fp32LayerNorm, liteasr/nets/layer_norm.py:32-44). The
conformer stack applies ~5 LayerNorms per block x 12 blocks per step;
autodiff through flax LN emits separate stats / normalize / three backward
reductions per application, each a fusion barrier. The closed form

    g_hat = dy * gamma
    dx = rstd * (g_hat - mean(g_hat) - xhat * mean(g_hat * xhat))

does the backward in one reduction pass + one elementwise pass.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, gamma, beta, eps: float = 1e-12):
    """x (..., C); gamma/beta (C,) fp32. Returns y in x.dtype."""
    y, _ = _ln_fwd_impl(x, gamma, beta, eps)
    return y


def _ln_fwd_impl(x, gamma, beta, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    y = (xhat * gamma + beta).astype(x.dtype)
    return y, (x, mean, rstd, gamma)


def _ln_fwd(x, gamma, beta, eps):
    y, res = _ln_fwd_impl(x, gamma, beta, eps)
    return y, res


def _ln_bwd(eps, res, dy):
    x, mean, rstd, gamma = res
    dy32 = dy.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * rstd
    ghat = dy32 * gamma
    m1 = jnp.mean(ghat, axis=-1, keepdims=True)
    m2 = jnp.mean(ghat * xhat, axis=-1, keepdims=True)
    dx = (rstd * (ghat - m1 - xhat * m2)).astype(x.dtype)
    red = tuple(range(dy32.ndim - 1))
    dgamma = jnp.sum(dy32 * xhat, axis=red)
    dbeta = jnp.sum(dy32, axis=red)
    return dx, dgamma, dbeta


fused_layer_norm.defvjp(_ln_fwd, _ln_bwd)
