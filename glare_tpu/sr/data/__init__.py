"""Dataset registry + loader factory (reference: basicsr/data/__init__.py:25)."""

from ..registry import DATASET_REGISTRY, auto_import
from ...data.loader import DataLoader, PrefetchDataLoader

auto_import(__name__, "_dataset")


def build_dataset(dataset_opt):
    dataset_opt = dict(dataset_opt)
    dataset = DATASET_REGISTRY.get(dataset_opt["type"])(dataset_opt)
    return dataset


def build_dataloader(dataset, dataset_opt, seed=0, sampler=None):
    phase = dataset_opt.get("phase", "train")
    if phase == "train":
        loader = DataLoader(
            dataset,
            batch_size=dataset_opt.get("batch_size_per_gpu") or dataset_opt.get("batch_size") or 1,
            shuffle=dataset_opt.get("use_shuffle", True),
            drop_last=True,
            seed=seed,
        )
        if dataset_opt.get("prefetch_mode"):
            return PrefetchDataLoader(loader)
        return loader
    return DataLoader(dataset, batch_size=1, shuffle=False, drop_last=False, seed=seed)
