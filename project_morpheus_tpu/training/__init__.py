"""Training stack (reference L0, Orpheus-TTS/{pretrain,finetune}/).

TPU-native replacements:

- ``data``: interleaved text-QA / TTS batching (BatchedRatioDataset +
  AlternatingDistributedSampler equivalents, pretrain/train.py:40-84) and
  the pad collator (pad 128263, labels -100, :140-162).
- ``pretrain``: pjit/FSDP-equivalent training step (parameters sharded over
  the data axis), cosine LR, split text/audio loss streams.
- ``finetune``: plain full-finetune loop (finetune/train.py:34-52).
- ``lora``: low-rank adapters on all projection matrices with rslora
  scaling and merge-and-save export (finetune/lora.py:28-74).
- ``checkpoint``: orbax sharded save/restore — the TPU equivalent of FSDP
  FULL_STATE_DICT rank0 consolidation (pretrain/train.py:128-137).
"""

from .data import BatchedRatioDataset, pad_collate, shard_for_rank
from .pretrain import TrainConfig, make_train_step, train_loop
from .lora import LoraConfig, init_lora_params, merge_lora, lora_scale
from .checkpoint import save_params, restore_params

__all__ = [
    "BatchedRatioDataset",
    "pad_collate",
    "shard_for_rank",
    "TrainConfig",
    "make_train_step",
    "train_loop",
    "LoraConfig",
    "init_lora_params",
    "merge_lora",
    "lora_scale",
    "save_params",
    "restore_params",
]
