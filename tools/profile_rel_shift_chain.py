"""rel_shift pad-reshape vs flat-gather, amortized over a chained loop.

Per-op dispatch through the remote tunnel costs ~0.5 s per call, which
swamps a ~1 ms op; chaining N applications inside ONE jit (with a carried
data dependency so XLA cannot elide them) isolates the per-application
cost: ms/op = (t_chain(N) - t_chain(0)) / N.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_rel_shift_chain.py
"""

import time

import numpy as np

B, H, T = 32, 4, 199
N = 100
WARMUP, ITERS = 3, 7


def main():
    import jax
    import jax.numpy as jnp

    from liteasr_tpu.nets.attention import rel_shift, rel_shift_fast
    from liteasr_tpu.train import enable_compile_cache

    enable_compile_cache()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, H, T, T)),
                    jnp.float32)

    def chain(fn, n):
        def body(y):
            for _ in range(n):
                y = fn(y) * 0.999  # carried dependency defeats CSE
            return y

        return jax.jit(body)

    def chain_grad(fn, n):
        def loss(y):
            for _ in range(n):
                y = fn(y) * 0.999
            return (y ** 2).mean()

        return jax.jit(jax.grad(loss))

    def bench(fn):
        for _ in range(WARMUP):
            out = fn(x)
        float(np.asarray(out).ravel()[0])
        ts = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            out = fn(x)
            float(np.asarray(out).ravel()[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts) * 1e3)

    base = bench(chain(lambda y: y, N))  # dispatch + N scalings only
    print(f"baseline chain (no shift)      {base:8.2f} ms")
    for tag, fn in (("pad-reshape", rel_shift), ("gather", rel_shift_fast)):
        t_f = bench(chain(fn, N))
        print(f"{tag:22s} fwd      {t_f:8.2f} ms  -> {(t_f - base) / N:6.3f} ms/op")
    gbase = bench(chain_grad(lambda y: y, N))
    print(f"baseline chain grad            {gbase:8.2f} ms")
    for tag, fn in (("pad-reshape", rel_shift), ("gather", rel_shift_fast)):
        t_g = bench(chain_grad(fn, N))
        print(f"{tag:22s} fwd+bwd  {t_g:8.2f} ms  -> {(t_g - gbase) / N:6.3f} ms/op")


if __name__ == "__main__":
    main()
