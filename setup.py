"""Package setup (console entry points mirror the reference: setup.py:27-32)."""

import os

from setuptools import Extension, find_packages, setup

ext_modules = []
if (os.environ.get("LITEASR_TPU_BUILD_NATIVE", "1") == "1"
        and os.path.exists("liteasr_tpu/native/liteasr_native.cc")):
    ext_modules.append(
        Extension(
            "liteasr_tpu.native._liteasr_native",
            sources=["liteasr_tpu/native/liteasr_native.cc"],
            extra_compile_args=["-O3", "-std=c++17"],
            optional=True,
        )
    )

setup(
    name="liteasr_tpu",
    version="0.1.0",
    description="TPU-native (JAX/XLA/Pallas) end-to-end speech recognition framework",
    packages=find_packages(include=["liteasr_tpu", "liteasr_tpu.*"]),
    include_package_data=True,
    package_data={"liteasr_tpu.config": ["yaml/*.yaml", "yaml/*/*.yaml"]},
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "numpy", "pyyaml"],
    ext_modules=ext_modules,
    entry_points={
        "console_scripts": [
            "liteasr-train = liteasr_tpu.train:cli_main",
            "liteasr-infer = liteasr_tpu.infer:cli_main",
        ],
    },
)
