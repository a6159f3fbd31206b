"""wav2vec2 pretraining task (reference: liteasr/tasks/pretrain.py:20-51)."""

import logging
import os
from dataclasses import dataclass
from pathlib import Path

from liteasr_tpu.config import MISSING, LiteasrDataclass
from liteasr_tpu.data.dataset import RawAudioFileDataset
from liteasr_tpu.tasks import LiteasrTask, register_task

logger = logging.getLogger(__name__)


@dataclass
class PreTrainConfig(LiteasrDataclass):
    train: str = MISSING
    valid: str = MISSING
    save_dir: str = "ckpts"


@register_task("pretrain", dataclass=PreTrainConfig)
class PreTrainTask(LiteasrTask):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.save_dir = cfg.save_dir
        Path(self.save_dir).mkdir(parents=True, exist_ok=True)

    def load_dataset(self, split, data_dir, dataset_cfg=None,
                     postprocess_cfg=None, memory_save: bool = False):
        assert split in ("train", "valid")
        logger.info("loading %s data from %s", split, data_dir)
        self.datasets[split] = RawAudioFileDataset(
            data_dir, dataset_cfg, postprocess_cfg)

    def save_model(self, model_name: str, variables):
        from liteasr_tpu import checkpoint

        checkpoint.save_params(os.path.join(self.save_dir, model_name), variables)
