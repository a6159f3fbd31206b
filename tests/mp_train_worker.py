"""Subprocess worker for the multi-process lockstep test.

Launched once per simulated host by tests/test_multiprocess.py. Pins the CPU
backend with LITEASR_TEST_DEVCOUNT virtual devices *before* jax initializes,
then runs the production train CLI (which calls jax.distributed.initialize
through liteasr_tpu.parallel.distributed_init when the config carries a
coordinator address).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_count = os.environ.get("LITEASR_TEST_DEVCOUNT", "2")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={_count}").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import faulthandler  # noqa: E402

if os.environ.get("LITEASR_MP_DEBUG"):
    faulthandler.dump_traceback_later(
        int(os.environ["LITEASR_MP_DEBUG"]), exit=True)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from liteasr_tpu.train import main  # noqa: E402

if __name__ == "__main__":
    trainer = main(sys.argv[1:])
    # emit a machine-readable success marker for the parent test
    print(f"MP_WORKER_DONE process={jax.process_index()} "
          f"count={jax.process_count()} iter={trainer.iter} "
          f"epoch={trainer.epoch}", flush=True)
