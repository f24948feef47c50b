"""Dataset factory + loader (reference: code/data/__init__.py:10-25).

Datasets return NHWC numpy float32; the loader stacks batches and can
prefetch them to device asynchronously (double-buffered, replacing the
reference's CUDAPrefetcher side-stream with ``jax.device_put`` overlap).
"""

from __future__ import annotations

from .lol_dataset import LoLDataset, LoLDatasetV2, LoLDatasetRIDCP
from .loader import DataLoader, create_dataloader


def create_dataset(dataset_opt, train, all_opt):
    name = all_opt.get("dataset") or "LoL"
    if name == "LoL":
        return LoLDatasetRIDCP(dataset_opt, train, all_opt)
    if name == "LoL_old":
        return LoLDataset(dataset_opt, train, all_opt)
    if name in ("LoL_v2", "LoLv2"):
        return LoLDatasetV2(dataset_opt, train, all_opt)
    raise NotImplementedError(f"Dataset [{name}] not recognized.")


__all__ = [
    "create_dataset",
    "create_dataloader",
    "DataLoader",
    "LoLDataset",
    "LoLDatasetV2",
    "LoLDatasetRIDCP",
]
