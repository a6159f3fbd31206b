"""Batch inference + scoring CLI (reference: liteasr/infer.py:25-129).

Usage: ``liteasr-infer --config-dir <run_dir> [overrides]`` where run_dir
contains the resolved ``config.yaml`` written by liteasr-train (the
reference's ``--config-dir <exp>/.hydra`` flow, README.md:101-108).

TPU-native redesign: the reference shards utterances over a 32-process CPU
``multiprocessing.Pool`` (infer.py:63-94); here the whole test set is decoded
in device batches — utterances are length-sorted, padded to shape buckets and
pushed through the compiled beam-search pipeline.
"""

import logging
import os
import sys
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from liteasr_tpu import decode, tasks
from liteasr_tpu.checkpoint import load_ckpt
from liteasr_tpu.config import compose
from liteasr_tpu.config.core import load_yaml
from liteasr_tpu.train import setup_logging
from liteasr_tpu.utils.score import levenshtein
from liteasr_tpu.data.dataset import dummy_min_xlen
from liteasr_tpu.utils.misc import round_up

logger = logging.getLogger("liteasr_tpu.infer")


def infer_dataset(task, model, variables, dataset, infer_cfg,
                  pad_time_multiple: int = 128, verbose: bool = True,
                  collect=None, bucket_ladder: bool = False):
    """Decode one test set in device batches; returns (total_err, total_len).

    ``collect``: optional list that receives ``(ref, hyp)`` text pairs in
    decode order (length-sorted, deterministic) — the input to
    ``tools/score_ci.py``'s bootstrap confidence intervals.

    Multi-chip: batch rows are padded to a multiple of the mesh's ``dp``
    degree and placed with a row sharding, so the compiled beam-search
    pipelines run data-parallel across every chip (replaces the reference's
    32-process CPU decode pool, liteasr/infer.py:63-94). Params are
    replicated once up front.
    """
    import jax

    from liteasr_tpu.parallel.mesh import (
        batch_sharding, current_mesh, replicate_tree, scatter_rows)

    mesh = current_mesh()
    dp = mesh.shape["dp"]
    row_sharding = batch_sharding(mesh)
    variables = replicate_tree(variables, mesh)

    batch_size = int(infer_cfg.get("batch_size", 8))
    beam_size = int(infer_cfg.get("beam_size", 10))
    ctc_weight = float(infer_cfg.get("ctc_weight", 0.5))

    fbank = bool(getattr(dataset, "fbank", False))
    data = sorted(dataset.data, key=lambda a: a.xlen, reverse=True)
    total_err, total_len = 0, 0
    for lo in range(0, len(data), batch_size):
        chunk = data[lo:lo + batch_size]
        rows = round_up(len(chunk), dp)
        if bucket_ladder:  # fixed rung set: one compile per rung, not per
            from liteasr_tpu.data.dataset import ladder_up  # chunk maximum

            T = ladder_up(max(a.xlen for a in chunk), pad_time_multiple)
        else:
            T = round_up(max(a.xlen for a in chunk), pad_time_multiple)
        if fbank:
            xs = np.zeros((rows, T), np.float32)
            xlens = np.full(rows, min(dummy_min_xlen(True), T), np.int32)
        else:
            xs = np.zeros((rows, T, dataset.feat_dim), np.float32)
            xlens = np.full(rows, min(dummy_min_xlen(False), T), np.int32)
        for i, a in enumerate(chunk):
            xs[i, : a.xlen] = a.x
            xlens[i] = a.xlen
        xs = scatter_rows(xs, row_sharding)
        xlens = scatter_rows(xlens, row_sharding)
        if fbank:
            from liteasr_tpu.ops.fbank import log_mel_fbank

            xs, xlens = log_mel_fbank(
                xs, xlens, num_mel_bins=dataset.num_mel_bins)
        if hasattr(model, "joint"):  # transducer family
            if infer_cfg.get("mode") == "transducer_greedy":
                hyps = decode.transducer_greedy(model, variables, xs, xlens)
            else:  # beam search is the reference default (transducer.py:137)
                hyps = decode.transducer_beam_search(
                    model, variables, xs, xlens, beam_size=beam_size,
                    expansions_per_frame=int(
                        infer_cfg.get("expansions_per_frame", 5)))
        elif hasattr(model, "decode"):  # paraformer: CIF + argmax
            hyps = decode.paraformer_decode(model, variables, xs, xlens)
        elif str(infer_cfg.get("mode", "")).startswith("streaming"):
            # chunk-by-chunk runtime for chunk-trained encoders
            # (liteasr_tpu/streaming.py): streaming_ctc_greedy |
            # streaming_ctc_prefix_beam_search
            from liteasr_tpu.streaming import streaming_decode

            smode = ("ctc_prefix_beam_search"
                     if "prefix" in str(infer_cfg.get("mode"))
                     else "ctc_greedy")
            from liteasr_tpu.parallel.mesh import to_host

            hyps = streaming_decode(
                model, variables, to_host(xs), to_host(xlens),
                chunk_sub=int(infer_cfg.get("chunk_sub", 16)),
                mode=smode, beam_size=beam_size)
        else:
            hyps = decode.decode_batch(
                model, variables, xs, xlens,
                beam_size=beam_size, ctc_weight=ctc_weight,
                mode=infer_cfg.get("mode", "attention_rescore"))
        for a, hyp_ids in zip(chunk, hyps):
            hyp = task.ids_to_text(hyp_ids)
            ref = task.normalize_ref(a.text) \
                if hasattr(task, "normalize_ref") else a.text
            if collect is not None:
                collect.append((ref, hyp))
            err = levenshtein(ref, hyp)
            total_err += err
            total_len += len(ref)
            res = "[X]" if ref == hyp else "[ ]"
            log = logger.info if verbose else logger.debug
            log("\n%s %s\n%3d %s", res, hyp, err, ref)
    return total_err, total_len


def infer(cfg):
    from liteasr_tpu.train import enable_compile_cache

    enable_compile_cache(cfg.common.get("compile_cache_dir"))
    task = tasks.setup_task(cfg.task)
    logger.info("setting %s task...", task.__class__.__name__)

    logger.info("1. load data...")
    task.load_dataset("test", list(task.cfg.test), cfg.dataset, None)

    model = task.build_model(cfg.model)
    variables = load_ckpt(cfg.inference)

    results = []
    dump = cfg.inference.get("dump")
    for si, test_set in enumerate(task.dataset("test")):
        pairs = [] if dump else None
        err, length = infer_dataset(
            task, model, variables, test_set, cfg.inference,
            pad_time_multiple=cfg.dataset.get("pad_time_multiple", 128),
            collect=pairs,
            bucket_ladder=bool(cfg.dataset.get("bucket_ladder", False)))
        results.append((err, length))
        logger.info("Error rate: %d / %d = %.2f%%",
                    err, length, 100.0 * err / max(length, 1))
        if dump:
            path = str(dump) if si == 0 else f"{dump}.{si}"
            with open(path, "w") as f:
                for i, (ref, hyp) in enumerate(pairs):
                    f.write(f"{i}\t{ref}\t{hyp}\n")
            logger.info("dumped %d ref/hyp pairs to %s", len(pairs), path)
    return results


def main(argv: Optional[List[str]] = None):
    args = list(argv if argv is not None else sys.argv[1:])
    config_dir = None
    if "--config-dir" in args:
        i = args.index("--config-dir")
        config_dir = args[i + 1]
        del args[i:i + 2]
    base = None
    if config_dir:
        base = load_yaml(os.path.join(config_dir, "config.yaml"))
    cfg = compose(args, base=base)
    setup_logging(cfg.common.run_dir, cfg.common.log_level,
                  filename="infer.log")
    return infer(cfg)


def cli_main():
    main()


if __name__ == "__main__":
    cli_main()
