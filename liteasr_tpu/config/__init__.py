"""Config schema + composition engine.

TPU-native re-design of the reference's Hydra/OmegaConf config layer
(reference: liteasr/config/__init__.py:12-102, liteasr/config/config.yaml).
Hydra is not a dependency here; `liteasr_tpu.config.compose` provides the same
public surface: YAML config groups (task/model/criterion/optimizer), dataclass
schemas registered by component decorators, ``${path}`` interpolation (the
OmegaConf ``II()`` idiom), ``???`` required fields, and dotted CLI overrides.
"""

from liteasr_tpu.config.core import (  # noqa: F401
    MISSING,
    II,
    ConfigStore,
    DotDict,
    compose,
    load_yaml,
    resolve,
    to_dict,
    to_yaml,
)

from dataclasses import dataclass, field
from typing import Any, List, Optional


@dataclass
class LiteasrDataclass:
    name: Optional[str] = None


@dataclass
class TriggerConfig(LiteasrDataclass):
    """One trainer event: run method `name` every `interval` `unit`s.

    Reference: liteasr/config/__init__.py:17-21 (_TriggerConfig).
    """

    interval: int = 1
    unit: str = "epoch"  # epoch | iteration


@dataclass
class CommonConfig(LiteasrDataclass):
    seed: int = 1
    trigger: List[TriggerConfig] = field(default_factory=list)
    memory_save: bool = False
    run_dir: str = "."  # where train.log / resolved config land
    log_level: str = "INFO"
    profile_dir: Optional[str] = None  # jax.profiler trace output (aux subsystem)
    # resume full training state (params+optimizer+counters) from
    # <task.save_dir>/train_state.msgpack ("auto") or an explicit path.
    # The reference cannot resume mid-training (SURVEY.md §5).
    resume: Optional[str] = None
    # PRNG bit generator for training randomness. "rbg" is much faster than
    # threefry on TPU (dropout masks dominate RNG cost); set "threefry2x32"
    # for cross-platform reproducibility.
    prng_impl: str = "rbg"
    # persistent XLA executable cache (default ~/.cache/liteasr_jax_cache);
    # remote-tunnel compiles cost 1-4 min per shape bucket otherwise
    compile_cache_dir: Optional[str] = None
    # durable per-run results artifact (VERDICT r4 "evidence durability"):
    # when set, the trainer appends machine-readable JSONL rows — one
    # run_meta row at startup (argv, config hash, param count) and one
    # valid row per validation — so run evidence survives the run_dir.
    # Point it inside the git repo (e.g. results/<run>.jsonl) and commit.
    results_file: Optional[str] = None


@dataclass
class DatasetConfig(LiteasrDataclass):
    """Batching policy knobs. Reference: liteasr/config/__init__.py:30-39."""

    batch_count: str = "seq"  # seq | frame
    batch_size: Optional[int] = None
    min_batch_size: Optional[int] = 1
    max_len_in: Optional[int] = None
    max_len_out: Optional[int] = None
    max_frame_in: Optional[int] = None
    max_frame_out: Optional[int] = None
    max_frame_inout: Optional[int] = None
    # TPU-specific: pad each batch's time/label axes up to multiples of these
    # values so XLA sees a small, bounded set of shapes (bucketed padding).
    pad_time_multiple: int = 128
    pad_label_multiple: int = 16
    # pad T/U up a FIXED geometric ladder of those multiples instead: the
    # set of compiled shapes becomes O(log max_len) and epoch reshuffles can
    # never surface a brand-new shape mid-run (each fresh shape is a full
    # XLA compile — 30-60 min through a remote-compile tunnel). A few
    # percent more padding compute.
    bucket_ladder: bool = False
    num_workers: int = 2  # host-side prefetch threads
    # raw-wave pretraining: quantize the per-batch crop length DOWN to a
    # multiple of this many samples, and pad the row count up to a multiple
    # of pad_batch_multiple (weight-0 dummy rows) — otherwise nearly every
    # wav2vec2 batch has a unique (rows, crop) shape and triggers its own
    # multi-minute remote compile
    crop_multiple: int = 8000
    pad_batch_multiple: int = 4
    # on-the-fly device features from wav.scp waveforms (ops/fbank.py);
    # when enabled, length knobs (max_len_in etc.) are in SAMPLES
    fbank: bool = False
    num_mel_bins: int = 80


@dataclass
class SpecAugmentConfig:
    """Reference: liteasr/config/__init__.py:43-50."""

    time_warp: int = 80
    # on-device warp interpolation (ops/spec_augment.py): "bicubic" is
    # PIL-resize parity with the reference transform; "linear" is the
    # cheaper 2-tap remap
    time_warp_mode: str = "bicubic"
    freq_mask: int = 27
    freq_mask_times: int = 1
    time_mask: int = 100
    time_mask_times: int = 1
    inplace: bool = True
    replace_with_zero: bool = False


@dataclass
class PostProcessConfig(LiteasrDataclass):
    spec_aug: SpecAugmentConfig = field(default_factory=SpecAugmentConfig)
    workflow: List[str] = field(default_factory=lambda: ["spec_aug"])
    # run augmentation batched on-device inside the jitted train step
    # (liteasr_tpu/ops/spec_augment.py) instead of per-sample on host
    on_device: bool = True


@dataclass
class DistributedConfig(LiteasrDataclass):
    """Mesh/axis layout (replaces the reference's NCCL DDP process topology,
    liteasr/config/__init__.py:60-70). Data parallelism is a mesh axis; extra
    axes enable tensor parallelism beyond reference parity.
    """

    dp: int = -1  # -1: all remaining devices
    tp: int = 1  # tensor-parallel axis size
    sp: int = 1  # sequence-parallel axis size (time-axis sharding via GSPMD)
    num_workers: int = 2
    # multi-host bootstrap (jax.distributed.initialize)
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None


@dataclass
class OptimizationConfig(LiteasrDataclass):
    """Reference: liteasr/config/__init__.py:74-78."""

    max_epoch: int = -1
    max_iter: int = -1
    accum_grad: int = 1
    clip_grad_norm: float = 0.0
    dtype: str = "bfloat16"  # compute dtype inside the train step
    # fused clip+NaN-skip+Adam+apply in one elementwise pass per leaf
    # (optims/fused_step.FusedTx; tp == 1, non-amsgrad only). The optimizer
    # state layout differs from the optax chain, so a run must keep the
    # same setting across resume.
    fused_step: bool = False


@dataclass
class InferenceConfig(LiteasrDataclass):
    """Reference: liteasr/config/__init__.py:82-88."""

    ckpt_path: str = II("task.save_dir")
    ckpt_name: Optional[int] = MISSING
    model_avg: bool = False
    avg_num: int = 1
    avg_policy: Optional[str] = II("common.run_dir")
    thread_num: int = 32  # kept for CLI parity; device batching is used instead
    batch_size: int = 8  # utterances decoded per device batch
    beam_size: int = 10
    ctc_weight: float = 0.5
    # transducer beam: non-blank expansion rounds per encoder frame. The
    # reference's per-frame best-first loop (transducer.py:150-200) expands
    # until beam_size blanks are collected, so dense frames can emit several
    # labels; 2 caps emissions at 1/frame and starves label-dense corpora
    # (measured +4.45pp vs greedy before the fix — see BENCHMARKS.md).
    # 5 mirrors transducer_greedy's max_symbols_per_frame.
    expansions_per_frame: int = 5


@dataclass
class LiteasrConfig(LiteasrDataclass):
    common: CommonConfig = field(default_factory=CommonConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    postprocess: PostProcessConfig = field(default_factory=PostProcessConfig)
    distributed: DistributedConfig = field(default_factory=DistributedConfig)
    optimization: OptimizationConfig = field(default_factory=OptimizationConfig)
    inference: InferenceConfig = field(default_factory=InferenceConfig)
    task: Any = None
    model: Any = None
    criterion: Any = None
    optimizer: Any = None


def config_init() -> None:
    """Register the root schema (reference: liteasr/train.py:36-38)."""
    ConfigStore.instance().store(name="liteasr_config", node=LiteasrConfig)
