"""Micro-op profile at the flagship operating point: who owns the 30 ms?

Times isolated pieces of the conformer train step (hard-synced, median of
ITERS) at the post-subsampling shapes B=32, T'=199, C=256, H=4 so the
encoder-step anatomy in BENCHMARKS.md can be attributed to specific ops,
and A/Bs candidate replacements before they touch model code:

  attention  - full rel-pos self-attention sublayer fwd / fwd+bwd
               (XLA path), plus ablations: no rel_shift, no matrix_bd,
               bf16 score materialization
  rel_shift  - the pad+reshape skew alone, fwd+bwd
  bn         - flax BatchNorm vs single-pass custom_vjp candidate
  conv       - conformer conv module, with/without BN
  opt        - build_tx flat chain vs per-leaf fused-math candidate
               on a flagship-sized parameter pytree

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_microops.py [section ...]
"""

import functools
import sys
import time

import numpy as np

import os

B = int(os.environ.get("PROF_B", 32))
T = int(os.environ.get("PROF_T", 199))
C, H = 256, 4
DK = C // H
WARMUP, ITERS = 5, 20


def bench(fn, *args):
    for _ in range(WARMUP):
        out = fn(*args)
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])  # hard sync (tunnel!)
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def main():
    import jax
    import jax.numpy as jnp

    from liteasr_tpu.train import enable_compile_cache

    enable_compile_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    sections = set(sys.argv[1:]) or {"attention", "flash", "rel_shift",
                                     "bn", "ln", "conv", "sub", "opt"}
    rng = np.random.default_rng(0)

    def f32(*shape):
        return jnp.asarray(rng.normal(size=shape), jnp.float32)

    def bf16(*shape):
        return jnp.asarray(rng.normal(size=shape), jnp.bfloat16)

    def report(tag, ms):
        print(f"  {tag:34s} {ms:8.3f} ms", flush=True)

    # ---------------------------------------------------------- attention
    if "attention" in sections:
        from liteasr_tpu.nets.attention import rel_shift

        print("[attention]  (B,T,H,Dk) = "
              f"({B},{T},{H},{DK}), scores (B,H,T,T) x12 layers", flush=True)
        q = bf16(B, T, H, DK)
        k = bf16(B, T, H, DK)
        v = bf16(B, T, H, DK)
        p = bf16(T, H, DK)
        mask = jnp.zeros((B, 1, 1, T), bool)

        def attn_core(q, k, v, p, shift=True, with_bd=True,
                      score_dtype=jnp.float32):
            ac = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=score_dtype)
            if with_bd:
                bd = jnp.einsum("bqhd,khd->bhqk", q, p,
                                preferred_element_type=score_dtype)
                if shift:
                    bd = rel_shift(bd)
                scores = ac + bd
            else:
                scores = ac
            scores = scores.astype(jnp.float32) * (DK ** -0.5)
            scores = jnp.where(mask, -jnp.inf, scores)
            probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

        def fb(fn):
            def loss(*args):
                return (fn(*args).astype(jnp.float32) ** 2).mean()

            return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

        variants = {
            "full (fp32 scores)": dict(),
            "no rel_shift": dict(shift=False),
            "no matrix_bd": dict(with_bd=False),
            "bf16 score accum": dict(score_dtype=jnp.bfloat16),
        }
        for tag, kw in variants.items():
            fwd = jax.jit(functools.partial(attn_core, **kw))
            bwd = fb(functools.partial(attn_core, **kw))
            report(f"{tag} fwd", bench(fwd, q, k, v, p))
            report(f"{tag} fwd+bwd", bench(bwd, q, k, v, p))

    # -------------------------------------------------------------- flash
    if "flash" in sections:
        from liteasr_tpu.nets.attention import rel_shift
        from liteasr_tpu.ops.flash_attention import flash_rel_attention_train

        print("[flash]  fused train kernel vs XLA rel path, "
              f"(BH,T,D)=({B*H},{T},{DK})", flush=True)
        qu = bf16(B * H, T, DK)
        qv = bf16(B * H, T, DK)
        k = bf16(B * H, T, DK)
        v = bf16(B * H, T, DK)
        p = bf16(B * H, T, DK)  # per-bh broadcast table, as the caller folds
        kv_lens = jnp.full((B * H,), T, jnp.int32)
        seed = jnp.zeros((), jnp.int32)

        def xla_rel(qu, qv, k, v, p):
            bd = jnp.einsum("bqd,bkd->bqk", qv, p,
                            preferred_element_type=jnp.float32)
            bd = rel_shift(bd[:, None])[:, 0]
            ac = jnp.einsum("bqd,bkd->bqk", qu, k,
                            preferred_element_type=jnp.float32)
            probs = jax.nn.softmax((ac + bd) * (DK ** -0.5), axis=-1)
            return jnp.einsum("bqk,bkd->bqd", probs.astype(v.dtype), v)

        def fb(fn):
            def loss(*a):
                return (fn(*a).astype(jnp.float32) ** 2).mean()

            return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))

        flash_fn = lambda qu, qv, k, v, p: flash_rel_attention_train(
            qu, qv, k, v, p, kv_lens, seed, DK ** -0.5, 0.0, False)
        report("xla rel fwd", bench(jax.jit(xla_rel), qu, qv, k, v, p))
        report("xla rel fwd+bwd", bench(fb(xla_rel), qu, qv, k, v, p))
        report("flash train fwd", bench(jax.jit(flash_fn), qu, qv, k, v, p))
        report("flash train fwd+bwd", bench(fb(flash_fn), qu, qv, k, v, p))

    # ---------------------------------------------------------- rel_shift
    if "rel_shift" in sections:
        from liteasr_tpu.nets.attention import rel_shift

        print("[rel_shift]  (B,H,T,T) fp32", flush=True)
        x = f32(B, H, T, T)

        fwd = jax.jit(rel_shift)
        bwd = jax.jit(jax.grad(lambda x: (rel_shift(x) ** 2).mean()))
        report("rel_shift fwd", bench(fwd, x))
        report("rel_shift fwd+bwd", bench(bwd, x))

        # variant: one flat gather (nets/attention.rel_shift_fast) instead
        # of the concat + relayout reshape pair
        from liteasr_tpu.nets.attention import rel_shift_fast as \
            rel_shift_gather

        gf = jax.jit(rel_shift_gather)
        gb = jax.jit(jax.grad(lambda x: (rel_shift_gather(x) ** 2).mean()))
        report("rel_shift gather fwd", bench(gf, x))
        report("rel_shift gather fwd+bwd", bench(gb, x))

    # ---------------------------------------------------------------- bn
    if "bn" in sections:
        import flax.linen as nn

        print(f"[bn]  (B,T,C) = ({B},{T},{C}) bf16 in, fp32 norm, x12",
              flush=True)
        x = bf16(B, T, C)

        bnm = nn.BatchNorm(use_running_average=False, dtype=jnp.float32)
        vs = bnm.init(jax.random.PRNGKey(0), x)

        @jax.jit
        def flax_fwd(vs, x):
            return bnm.apply(vs, x, mutable=["batch_stats"])

        @jax.jit
        def flax_fb(vs, x):
            def loss(p):
                y, _ = bnm.apply(dict(vs, params=p), x,
                                 mutable=["batch_stats"])
                return (y.astype(jnp.float32) ** 2).mean()

            return jax.grad(loss)(vs["params"])

        report("flax BN fwd", bench(flax_fwd, vs, x))
        report("flax BN fwd+bwd", bench(flax_fb, vs, x))

        # candidate: single-pass stats, hand-written vjp
        from liteasr_tpu.ops.batch_norm import train_batch_norm

        g = jnp.ones((C,), jnp.float32)
        b = jnp.zeros((C,), jnp.float32)

        @jax.jit
        def cand_fwd(x, g, b):
            return train_batch_norm(x, g, b)[0]

        @jax.jit
        def cand_fb(x, g, b):
            def loss(g, b):
                y, _, _ = train_batch_norm(x, g, b)
                return (y.astype(jnp.float32) ** 2).mean()

            return jax.grad(loss, argnums=(0, 1))(g, b)

        report("custom BN fwd", bench(cand_fwd, x, g, b))
        report("custom BN fwd+bwd", bench(cand_fb, x, g, b))

    # ---------------------------------------------------------------- ln
    if "ln" in sections:
        import flax.linen as nn

        from liteasr_tpu.nets.common import LN_EPS
        from liteasr_tpu.ops.layer_norm import fused_layer_norm

        print(f"[ln]  (B,T,C) = ({B},{T},{C}) bf16, ~60 applications/step",
              flush=True)
        x = bf16(B, T, C)
        g = jnp.ones((C,), jnp.float32)
        b2 = jnp.zeros((C,), jnp.float32)
        ln = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32)
        vs = {"params": {"scale": g, "bias": b2}}

        @jax.jit
        def flax_fb(x, g, b2):
            def loss(g, b2):
                y = ln.apply({"params": {"scale": g, "bias": b2}},
                             x.astype(jnp.float32))
                return (y ** 2).mean()

            return jax.grad(loss, argnums=(0, 1))(g, b2)

        @jax.jit
        def cand_fb(x, g, b2):
            def loss(g, b2):
                y = fused_layer_norm(x, g, b2, LN_EPS)
                return (y.astype(jnp.float32) ** 2).mean()

            return jax.grad(loss, argnums=(0, 1))(g, b2)

        report("flax LN fwd+bwd", bench(flax_fb, x, g, b2))
        report("fused LN fwd+bwd", bench(cand_fb, x, g, b2))

    # -------------------------------------------------------------- conv
    if "conv" in sections:
        from liteasr_tpu.nets.layers import ConformerConvolution

        print(f"[conv]  conv module (B,T,C) = ({B},{T},{C}), x12", flush=True)
        x = bf16(B, T, C)
        mod = ConformerConvolution(dtype=jnp.bfloat16)
        vs = mod.init(jax.random.PRNGKey(0), x, train=False)

        @jax.jit
        def conv_fb(vs, x):
            def loss(p):
                y, _ = mod.apply(dict(vs, params=p), x, train=True,
                                 mutable=["batch_stats"])
                return (y.astype(jnp.float32) ** 2).mean()

            return jax.grad(loss)(vs["params"])

        report("conv module fwd+bwd", bench(conv_fb, vs, x))

    # ---------------------------------------------------------------- sub
    if "sub" in sections:
        # The conv2d front-end is ~27% of encoder matmul FLOPs (bench.py
        # train_step_flops: the 9x39x256x256 second conv). A/B the native
        # XLA conv lowering against an im2col GEMM formulation that maps
        # the 3x3 window onto one (B*T'*F', 9C) x (9C, C) MXU matmul.
        from liteasr_tpu.nets.subsampling import Conv2DSubsampling

        TT, F = 800, 80
        print(f"[sub]  front-end (B,T,F) = ({B},{TT},{F}) -> C={C}",
              flush=True)
        x0 = bf16(B, TT, F)
        mod = Conv2DSubsampling(o_dim=C, dtype=jnp.bfloat16)
        vs = mod.init(jax.random.PRNGKey(0), x0)

        def fb(apply):
            def loss(p, x):
                return (apply(p, x).astype(jnp.float32) ** 2).mean()

            return jax.jit(jax.grad(loss))

        report("nn.Conv fwd", bench(
            jax.jit(lambda p, x: mod.apply(p, x)), vs, x0))
        report("nn.Conv fwd+bwd", bench(
            fb(lambda p, x: mod.apply(p, x)), vs, x0))

        def im2col(x, w, stride=2):
            # x: (B, T, F, Cin), w: (3, 3, Cin, Cout) VALID
            bt, t, f, cin = x.shape
            to = (t - 3) // stride + 1
            fo = (f - 3) // stride + 1
            cols = [x[:, di:di + stride * to:stride,
                      dj:dj + stride * fo:stride, :]
                    for di in range(3) for dj in range(3)]
            patches = jnp.concatenate(cols, axis=-1)  # (B, To, Fo, 9*Cin)
            return patches.reshape(bt, to, fo, 9 * cin) @ \
                w.reshape(9 * cin, -1)

        def sub_gemm(p, x):
            pr = p["params"]
            x = x[..., None]
            w1 = pr["conv1"]["kernel"].astype(jnp.bfloat16)
            b1 = pr["conv1"]["bias"].astype(jnp.bfloat16)
            w2 = pr["conv2"]["kernel"].astype(jnp.bfloat16)
            b2 = pr["conv2"]["bias"].astype(jnp.bfloat16)
            x = jax.nn.relu(im2col(x, w1) + b1)
            x = jax.nn.relu(im2col(x, w2) + b2)
            b, t, f, c = x.shape
            x = x.reshape(b, t, f * c)
            wd = pr["out"]["kernel"].astype(jnp.bfloat16)
            bd = pr["out"]["bias"].astype(jnp.bfloat16)
            return x @ wd + bd

        # parity first (same weights, same math up to fusion order)
        a = np.asarray(jax.jit(lambda p, x: mod.apply(p, x))(vs, x0),
                       np.float32)
        bb = np.asarray(jax.jit(sub_gemm)(vs, x0), np.float32)
        err = float(np.max(np.abs(a - bb)))
        print(f"  im2col parity max|d| = {err:.4f} (bf16 scale)", flush=True)
        report("im2col GEMM fwd", bench(jax.jit(sub_gemm), vs, x0))
        report("im2col GEMM fwd+bwd", bench(fb(sub_gemm), vs, x0))

    # --------------------------------------------------------------- opt
    if "opt" in sections:
        from liteasr_tpu.config.core import DotDict
        from liteasr_tpu.trainer import build_tx

        print("[opt]  flagship-sized pytree, clip 5.0, accum 1", flush=True)
        leaves = {}
        for i in range(12):
            for nm, shape in (("qkv", (C, 3 * C)), ("o", (C, C)),
                              ("ff1", (C, 2048)), ("ff2", (2048, C)),
                              ("ff3", (C, 2048)), ("ff4", (2048, C)),
                              ("conv1", (C, 2 * C)), ("conv2", (C, C)),
                              ("dw", (15, 1, C)), ("ln1", (C,)),
                              ("ln2", (C,)), ("ln3", (C,))):
                leaves[f"l{i}_{nm}"] = f32(*shape)
        for nm, shape in (("embed", (5000, C)), ("head", (C, 5000))):
            leaves[nm] = f32(*shape)
        n = sum(l.size for l in leaves.values())
        print(f"  ({n/1e6:.1f}M params)", flush=True)
        grads = jax.tree.map(lambda p: p * 0.01, leaves)

        class _Opt:
            pass

        from liteasr_tpu.optims.noam import Noam, NoamConfig

        ocfg = NoamConfig()
        opt = Noam.build_optimizer(ocfg)
        ncfg = DotDict({"clip_grad_norm": 5.0, "accum_grad": 1})

        for flat in (True, False):
            tx = build_tx(opt, ncfg, flat=flat)
            state = jax.jit(tx.init)(leaves)

            @jax.jit
            def step(g, s, p, tx=tx):
                import optax

                u, s2 = tx.update(g, s, p)
                return optax.apply_updates(p, u), s2

            report(f"optax chain flat={flat}", bench(step, grads, state,
                                                     leaves))

        from liteasr_tpu.optims.fused_step import fused_adam_step

        mu = jax.tree.map(jnp.zeros_like, leaves)
        nu = jax.tree.map(jnp.zeros_like, leaves)
        cnt = jnp.zeros((), jnp.int32)

        from liteasr_tpu.optims.noam import noam_schedule

        sched = noam_schedule(ocfg.model_dim, ocfg.factor, ocfg.warmup)

        @jax.jit
        def fstep(p, g, mu, nu, cnt):
            return fused_adam_step(p, g, mu, nu, cnt, schedule=sched,
                                   b1=ocfg.beta1, b2=ocfg.beta2,
                                   eps=ocfg.eps, clip=5.0)

        report("fused per-leaf candidate", bench(fstep, leaves, grads, mu,
                                                 nu, cnt))


if __name__ == "__main__":
    main()
