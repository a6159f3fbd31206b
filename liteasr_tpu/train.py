"""Training CLI (reference: liteasr/train.py:21-101).

Usage parity with the reference README (README.md:84-108):

    liteasr-train task=asr model=my_U2 criterion=my_hybrid_ctc \\
        optimizer=my_noam task.vocab=... task.train=... task.valid=...

The composed+resolved config is written to ``<run_dir>/config.yaml`` so
``liteasr-infer --config-dir <run_dir>`` is self-contained (the reference's
``.hydra`` behavior).
"""

import logging
import os
import sys
from typing import List, Optional

import numpy as np

from liteasr_tpu import tasks
from liteasr_tpu.config import compose
from liteasr_tpu.config.core import to_yaml

logger = logging.getLogger("liteasr_tpu.train")

LOG_FORMAT = (
    "[%(asctime)s][%(levelname)s][%(name)s:%(lineno)s][%(funcName)s]"
    " - %(message)s")


def setup_logging(run_dir: str, level: str = "INFO",
                  filename: str = "train.log") -> None:
    os.makedirs(run_dir, exist_ok=True)
    root = logging.getLogger()
    # both handlers honor the configured level — an unlevelled file handler
    # under a NOTSET root collects jax's DEBUG stream (~100 MB/hour through
    # the remote-compile tunnel) into train.log
    root.setLevel(getattr(logging, level.upper()))
    for h in list(root.handlers):
        root.removeHandler(h)
    console = logging.StreamHandler()
    console.setFormatter(logging.Formatter("[%(levelname)s]: %(message)s"))
    root.addHandler(console)
    fileh = logging.FileHandler(os.path.join(run_dir, filename))
    fileh.setFormatter(logging.Formatter(LOG_FORMAT))
    root.addHandler(fileh)


def enable_compile_cache(path: Optional[str] = None) -> None:
    """Persist XLA executables across processes (compiles through the
    remote tunnel cost 1-4 min per shape bucket; a warm cache makes restarts
    and repeated benchmarks near-instant).

    TPU backend only: CPU executables are AOT-compiled for the *compiling*
    machine's microarchitecture, and through the remote-compile tunnel that
    machine is not this host — a shared cache then feeds foreign-ISA
    artifacts to local CPU runs (observed: XLA AOT loader feature-mismatch
    warnings followed by a hang). NOTE: calling this initializes the
    backend, so it must run AFTER jax.distributed.initialize.
    """
    import jax

    try:
        if jax.default_backend() != "tpu":
            return
        path = path or os.path.expanduser("~/.cache/liteasr_jax_cache")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:  # cache is an optimization, never fatal
        logger.debug("compilation cache unavailable: %s", e)


def train(cfg) -> "object":
    """Build everything and run the trainer; returns the Trainer."""
    from liteasr_tpu.parallel import distributed_init, is_master
    from liteasr_tpu.trainer import Trainer

    distributed_init(cfg.distributed)  # must precede any backend init
    enable_compile_cache(cfg.common.get("compile_cache_dir"))

    np.random.seed(cfg.common.seed)
    logger.info("set random seed as %d", cfg.common.seed)

    task = tasks.setup_task(cfg.task)
    logger.info("setting %s task...", task.__class__.__name__)

    logger.info("1. load data...")
    config = (cfg.dataset, cfg.postprocess)
    if cfg.common.memory_save:
        # staged loading (reference train.py:61-80): the master process
        # builds + dumps the batchified corpus; the rest wait on a global
        # barrier and then lazily read the dump shards
        import jax
        from jax.experimental import multihost_utils

        if jax.process_count() > 1:
            if is_master():
                task.load_dataset("train", task.cfg.train, *config,
                                  memory_save=True)
            multihost_utils.sync_global_devices("liteasr_memory_save_dump")
            if not is_master():
                task.load_dataset("train", task.cfg.train, *config,
                                  memory_save=True)
        else:
            task.load_dataset("train", task.cfg.train, *config,
                              memory_save=True)
    else:
        task.load_dataset("train", task.cfg.train, *config,
                          memory_save=False)
    task.load_dataset("valid", task.cfg.valid, *config, memory_save=False)

    model = task.build_model(cfg.model)
    logger.info("2. build model    : %s", model.__class__.__name__)

    optim = task.build_optimizer(cfg.optimizer)
    logger.info("3. build optimizer: %s", optim.__class__.__name__)

    criter = task.build_criterion(cfg.criterion)
    logger.info("4. build criterion: %s", criter.__class__.__name__)

    # persist the fully-resolved config for liteasr-infer
    if is_master():
        with open(os.path.join(cfg.common.run_dir, "config.yaml"), "w") as f:
            f.write(to_yaml(cfg))

    trainer = Trainer(cfg, task, model, criter, optim)
    trainer.run()

    # multi-process: no rank may exit while peers still depend on the
    # coordination service (process 0 hosts it; compile-sharing and
    # collectives on slower ranks deadlock if it dies early)
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("liteasr_train_end")
    return trainer


def main(argv: Optional[List[str]] = None):
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose(overrides)
    setup_logging(cfg.common.run_dir, cfg.common.log_level)
    return train(cfg)


def cli_main() -> None:
    main()


if __name__ == "__main__":
    cli_main()
