"""Parity of the fused-math candidates against their reference formulations.

- ops/batch_norm.train_batch_norm vs flax nn.BatchNorm (train mode):
  forward values, batch statistics, and gradients.
- optims/fused_step.fused_adam_step vs trainer.build_tx's
  apply_if_finite(chain(clip, adam, schedule)) flat chain: parameter
  trajectories across normal, clipped, and non-finite steps.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from liteasr_tpu.ops.batch_norm import train_batch_norm


class TestBatchNorm:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_forward_matches_flax(self, dtype):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 9, 16)) * 2 + 1, dtype)
        bn = nn.BatchNorm(use_running_average=False, dtype=jnp.float32)
        vs = bn.init(jax.random.PRNGKey(0), x)
        gamma = jnp.asarray(rng.normal(size=(16,)) + 1.0, jnp.float32)
        beta = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
        vs = {"params": {"scale": gamma, "bias": beta},
              "batch_stats": vs["batch_stats"]}

        ref, updated = bn.apply(vs, x, mutable=["batch_stats"])
        y, mean, var = train_batch_norm(x, gamma, beta)

        tol = 1e-5 if dtype == jnp.float32 else 3e-2
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(ref, np.float32), atol=tol)
        # flax running stats: 0.99 * 0 + 0.01 * batch_stat
        np.testing.assert_allclose(
            np.asarray(mean) * 0.01,
            np.asarray(updated["batch_stats"]["mean"]), rtol=1e-4)
        np.testing.assert_allclose(
            0.99 + np.asarray(var) * 0.01,  # flax running var inits to 1
            np.asarray(updated["batch_stats"]["var"]), rtol=1e-4)

    def test_gradients_match_flax(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(3, 7, 8)), jnp.float32)
        gamma = jnp.asarray(rng.normal(size=(8,)) + 1.0, jnp.float32)
        beta = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 7, 8)), jnp.float32)
        bn = nn.BatchNorm(use_running_average=False, dtype=jnp.float32)
        stats = bn.init(jax.random.PRNGKey(0), x)["batch_stats"]

        def ref_loss(x, gamma, beta):
            y, _ = bn.apply(
                {"params": {"scale": gamma, "bias": beta},
                 "batch_stats": stats}, x, mutable=["batch_stats"])
            return jnp.sum(y * w)

        def cand_loss(x, gamma, beta):
            y, _, _ = train_batch_norm(x, gamma, beta)
            return jnp.sum(y * w)

        ref = jax.grad(ref_loss, argnums=(0, 1, 2))(x, gamma, beta)
        got = jax.grad(cand_loss, argnums=(0, 1, 2))(x, gamma, beta)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=2e-4)


class TestLayerNormParity:
    def test_values_and_grads_match_flax(self):
        from liteasr_tpu.nets.common import LN_EPS
        from liteasr_tpu.ops.layer_norm import fused_layer_norm

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(5, 13, 24)) * 3, jnp.float32)
        gamma = jnp.asarray(rng.normal(size=(24,)) + 1.0, jnp.float32)
        beta = jnp.asarray(rng.normal(size=(24,)), jnp.float32)
        w = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
        ln = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32)

        def ref_loss(x, gamma, beta):
            y = ln.apply({"params": {"scale": gamma, "bias": beta}}, x)
            return jnp.sum(y * w)

        def cand_loss(x, gamma, beta):
            return jnp.sum(fused_layer_norm(x, gamma, beta, LN_EPS) * w)

        np.testing.assert_allclose(
            np.asarray(fused_layer_norm(x, gamma, beta, LN_EPS)),
            np.asarray(ln.apply(
                {"params": {"scale": gamma, "bias": beta}}, x)), atol=1e-5)
        ref = jax.grad(ref_loss, argnums=(0, 1, 2))(x, gamma, beta)
        got = jax.grad(cand_loss, argnums=(0, 1, 2))(x, gamma, beta)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=3e-4)

    def test_wrapper_param_path_unchanged(self):
        from liteasr_tpu.nets.common import LayerNorm

        x = jnp.ones((2, 3, 8), jnp.float32)
        vs_f = LayerNorm(fused=True).init(jax.random.PRNGKey(0), x)
        vs_r = LayerNorm(fused=False).init(jax.random.PRNGKey(0), x)
        assert jax.tree.structure(vs_f) == jax.tree.structure(vs_r)
        y_f = LayerNorm(fused=True).apply(vs_f, x)
        y_r = LayerNorm(fused=False).apply(vs_f, x)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                                   atol=1e-6)


class TestConvModuleParity:
    def test_fused_bn_matches_flax_in_conv_module(self):
        from liteasr_tpu.nets.layers import ConformerConvolution

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(4, 11, 16)), jnp.float32)
        fused = ConformerConvolution(dtype=jnp.float32, fused_bn=True)
        flax_m = ConformerConvolution(dtype=jnp.float32, fused_bn=False)
        vs = fused.init(jax.random.PRNGKey(0), x, train=False)
        # identical param trees: flax module must accept the fused init
        y_f, st_f = fused.apply(vs, x, train=True, mutable=["batch_stats"])
        y_r, st_r = flax_m.apply(vs, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                                   atol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5),
            st_f["batch_stats"], st_r["batch_stats"])

        def loss(params, mod):
            y, _ = mod.apply(dict(vs, params=params), x, train=True,
                             mutable=["batch_stats"])
            return (y ** 2).mean()

        g_f = jax.grad(loss)(vs["params"], fused)
        g_r = jax.grad(loss)(vs["params"], flax_m)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5),
            g_f, g_r)


class TestFusedAdam:
    def _setup(self):
        from liteasr_tpu.optims.noam import noam_schedule

        rng = np.random.default_rng(2)
        params = {
            "a": jnp.asarray(rng.normal(size=(33, 17)), jnp.float32),
            "b": {"w": jnp.asarray(rng.normal(size=(5,)), jnp.float32)},
        }
        sched = noam_schedule(64, 2.0, 10)
        tx = optax.apply_if_finite(
            optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-9),
                optax.scale_by_schedule(lambda s: -sched(s)),
            ), max_consecutive_errors=10 ** 8)
        return params, sched, tx, rng

    def test_trajectory_parity(self):
        from liteasr_tpu.optims.fused_step import fused_adam_step

        params, sched, tx, rng = self._setup()
        state = tx.init(params)
        p_ref = params
        p_f = params
        mu = jax.tree.map(jnp.zeros_like, params)
        nu = jax.tree.map(jnp.zeros_like, params)
        cnt = jnp.zeros((), jnp.int32)

        for step in range(6):
            g = jax.tree.map(
                lambda p: jnp.asarray(
                    rng.normal(size=p.shape) * (10.0 if step == 2 else 0.1),
                    jnp.float32), p_ref)
            if step == 4:  # non-finite step: both sides must skip
                g = jax.tree.map(lambda x: x.at[(0,) * x.ndim].set(jnp.nan)
                                 if x.ndim else x, g)
                g["a"] = g["a"].at[0, 0].set(jnp.inf)
            u, state = tx.update(g, state, p_ref)
            p_ref = optax.apply_updates(p_ref, u)
            p_f, mu, nu, cnt, finite = fused_adam_step(
                p_f, g, mu, nu, cnt, schedule=sched, b1=0.9, b2=0.98,
                eps=1e-9, clip=1.0)
            assert bool(finite) == (step != 4)
            for kp, a in jax.tree.leaves_with_path(p_ref):
                b = {tuple(str(k) for k in kp2): l for kp2, l in
                     jax.tree.leaves_with_path(p_f)}[
                    tuple(str(k) for k in kp)]
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), atol=1e-6,
                    err_msg=f"step {step} leaf {kp}")
        assert int(cnt) == 5  # one skipped step

    def test_fused_tx_matches_build_tx_with_accum(self):
        """FusedTx (trainer opt-in path) == the optax flat chain over a
        mixed stream: normal, clipped, and NaN micro-batches at accum 2."""
        import optax

        from liteasr_tpu.config.core import DotDict
        from liteasr_tpu.optims.fused_step import FusedTx
        from liteasr_tpu.optims.noam import Noam, NoamConfig
        from liteasr_tpu.trainer import build_tx

        rng = np.random.default_rng(5)
        params = {"w": jnp.asarray(rng.normal(size=(9, 4)), jnp.float32),
                  "b": jnp.asarray(rng.normal(size=(4,)), jnp.float32)}
        ocfg = NoamConfig()
        ocfg.warmup = 5
        ocfg.factor = 3.0
        opt = Noam.build_optimizer(ocfg)
        ncfg = DotDict({"clip_grad_norm": 2.0, "accum_grad": 2,
                        "fused_step": False})
        ref_tx = build_tx(opt, ncfg, flat=True)
        fused = FusedTx(opt.schedule, b1=ocfg.beta1, b2=ocfg.beta2,
                        eps=ocfg.eps, clip=2.0, accum=2)

        p_ref, s_ref = dict(params), ref_tx.init(params)
        p_f, s_f = dict(params), fused.init(params)
        for i in range(8):
            scale = 30.0 if i in (2, 3) else 0.3
            g = jax.tree.map(
                lambda p: jnp.asarray(rng.normal(size=p.shape) * scale,
                                      jnp.float32), params)
            if i == 5:
                g["w"] = g["w"].at[0, 0].set(jnp.nan)
            u, s_ref = ref_tx.update(g, s_ref, p_ref)
            p_ref = optax.apply_updates(p_ref, u)
            p_f, s_f = fused.apply(g, s_f, p_f)
            for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_f)):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           atol=1e-6,
                                           err_msg=f"micro-step {i}")

    def test_nan_does_not_poison_state(self):
        from liteasr_tpu.optims.fused_step import fused_adam_step

        params, sched, _, _ = self._setup()
        mu = jax.tree.map(jnp.zeros_like, params)
        nu = jax.tree.map(jnp.zeros_like, params)
        cnt = jnp.zeros((), jnp.int32)
        g = jax.tree.map(lambda p: jnp.full_like(p, jnp.nan), params)
        p2, mu, nu, cnt, finite = fused_adam_step(
            params, g, mu, nu, cnt, schedule=sched, b1=0.9, b2=0.98,
            eps=1e-9, clip=1.0)
        assert not bool(finite)
        assert int(cnt) == 0
        for t in (p2, mu, nu):
            for leaf in jax.tree.leaves(t):
                assert np.isfinite(np.asarray(leaf)).all()
        for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
