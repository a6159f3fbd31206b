"""bench.py operating-point study knobs (BENCHMARKS.md "Utilization wall").

The driver's official capture uses the default geometry (B=32, T=800,
U=48); BENCH_B/BENCH_T/BENCH_U env overrides exist for measured
operating-point rows. Pin (a) that the defaults are what the driver
expects, (b) that the analytic FLOPs model scales correctly with geometry
so MFU comparisons across operating points are apples-to-apples.
"""

import importlib
import os
import sys


def _load_bench(env=None):
    old = {k: os.environ.get(k) for k in ("BENCH_B", "BENCH_T", "BENCH_U")}
    try:
        for k in old:
            os.environ.pop(k, None)
        if env:
            os.environ.update(env)
        sys.modules.pop("bench", None)
        import bench
        return importlib.reload(bench)
    finally:
        for k, v in old.items():
            os.environ.pop(k, None)
            if v is not None:
                os.environ[k] = v
        sys.modules.pop("bench", None)


def test_default_geometry_is_the_official_capture():
    bench = _load_bench()
    assert (bench.B, bench.T, bench.D, bench.U) == (32, 800, 80, 48)


def test_env_overrides_apply():
    bench = _load_bench({"BENCH_B": "64", "BENCH_T": "1600", "BENCH_U": "96"})
    assert (bench.B, bench.T, bench.U) == (64, 1600, 96)


def test_flops_model_scales_with_geometry():
    base = _load_bench()
    f32 = base.train_step_flops(5000)

    b64 = _load_bench({"BENCH_B": "64"})
    # FLOPs are exactly linear in batch size (per-utt work unchanged)
    assert abs(b64.train_step_flops(5000) / f32 - 2.0) < 1e-9

    t16 = _load_bench({"BENCH_T": "1600"})
    # doubling T doubles the linear terms and quadruples the attention
    # quadratic terms: strictly superlinear, strictly sub-quadratic
    ratio = t16.train_step_flops(5000) / f32
    assert 2.0 < ratio < 4.0
