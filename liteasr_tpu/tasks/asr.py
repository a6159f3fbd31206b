"""ASR task (reference: liteasr/tasks/asr.py:23-98)."""

import logging
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

from liteasr_tpu.config import MISSING, LiteasrDataclass
from liteasr_tpu.data.dataset import AudioFileDataset
from liteasr_tpu.data.vocab import Vocab
from liteasr_tpu.tasks import LiteasrTask, register_task

logger = logging.getLogger(__name__)


@dataclass
class ASRConfig(LiteasrDataclass):
    vocab: str = MISSING
    train: str = MISSING
    valid: str = MISSING
    test: List[str] = field(default_factory=list)
    delimiter: Optional[str] = None
    save_dir: str = "ckpts"


@register_task("asr", dataclass=ASRConfig)
class ASRTask(LiteasrTask):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.vocab = Vocab(cfg.vocab)
        self.save_dir = cfg.save_dir
        Path(self.save_dir).mkdir(parents=True, exist_ok=True)
        self.vocab_size = len(self.vocab)
        self.feat_dim = 0

    def load_dataset(self, split, data_dir, dataset_cfg=None,
                     postprocess_cfg=None, memory_save: bool = False):
        assert split in ("train", "valid", "test")
        if isinstance(data_dir, str):
            logger.info("loading %s data from %s", split, data_dir)
            self.datasets[split] = AudioFileDataset(
                split=split,
                data_dir=data_dir,
                delimiter=self.cfg.delimiter,
                dataset_cfg=dataset_cfg,
                postprocess_cfg=postprocess_cfg,
                vocab=self.vocab,
                keep_raw=split == "test",
                memory_save=memory_save,
            )
            self.feat_dim = self.datasets[split].feat_dim
        elif isinstance(data_dir, (list, tuple)):
            self.datasets[split] = []
            for d_dir in data_dir:
                logger.info("loading %s data from %s", split, d_dir)
                self.datasets[split].append(AudioFileDataset(
                    split=split,
                    data_dir=d_dir,
                    delimiter=self.cfg.delimiter,
                    dataset_cfg=dataset_cfg,
                    postprocess_cfg=postprocess_cfg,
                    vocab=self.vocab,
                    keep_raw=split == "test",
                ))
            self.feat_dim = self.datasets[split][0].feat_dim
        else:
            raise TypeError(f"data_dir with type {type(data_dir)} cannot be parsed")

    def ids_to_text(self, tokenids) -> str:
        tokens = self.vocab.lookupi(tokenids, convert=True)
        if self.cfg.delimiter is None:
            return "".join(tokens)
        return self.cfg.delimiter.join(tokens)

    def normalize_ref(self, text: str) -> str:
        """Render a raw transcript the way ``ids_to_text`` renders
        hypotheses (``<space>`` -> " ") so ref/hyp comparisons are
        apples-to-apples. The reference compares the RAW text against the
        rendered hypothesis (liteasr/infer.py:54-60, dataclass/vocab.py:
        66-76), which miscounts every ``<space>`` token as an edit on
        space-delimited corpora; normalizing the ref through the same
        rendering rule removes that artifact without hiding real errors.
        """
        if self.cfg.delimiter is None:
            return text
        from liteasr_tpu.data.vocab import SPACE

        toks = [" " if t == SPACE else t
                for t in text.split(self.cfg.delimiter)]
        return self.cfg.delimiter.join(toks)

    def inference(self, x, model, variables):
        """Single-utterance decode helper (the batched path is in decode.py)."""
        from liteasr_tpu import decode

        hyp = decode.decode_utterance(model, variables, x)
        return self.ids_to_text(hyp)

    def save_model(self, model_name: str, variables):
        from liteasr_tpu import checkpoint

        checkpoint.save_params(os.path.join(self.save_dir, model_name), variables)
