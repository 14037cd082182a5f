"""Class-name tables.

The reference ships a 1000-entry hardcoded ImageNet id→name dict
(``imagenet_lables.py:3-1003``). Names are dataset metadata, not code, so
here they load from the dataset's own ``LOC_synset_mapping.txt`` (the
standard ImageNet-localization distribution file) with a ``class_{i}``
fallback — no giant literal to drift out of sync.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

CIFAR10_CLASSES = (
    "airplane", "automobile", "bird", "cat", "deer",
    "dog", "frog", "horse", "ship", "truck",
)

MNIST_CLASSES = tuple(str(i) for i in range(10))


def load_imagenet_class_names(data_dir: Optional[str]) -> Dict[int, str]:
    """idx → human-readable name, matching the label indexing of
    ``ImagenetLocalizationDataset`` (labels = sorted synset order,
    reference ``dataset.py:46-50``)."""
    if data_dir:
        for candidate in (
            os.path.join(data_dir, "LOC_synset_mapping.txt"),
            os.path.join(os.path.dirname(data_dir.rstrip("/")), "LOC_synset_mapping.txt"),
        ):
            if os.path.exists(candidate):
                synset_to_name = {}
                with open(candidate) as f:
                    for line in f:
                        parts = line.strip().split(" ", 1)
                        if len(parts) == 2:
                            synset_to_name[parts[0]] = parts[1]
                names = {}
                for i, synset in enumerate(sorted(synset_to_name)):
                    names[i] = synset_to_name[synset]
                return names
    return {}


def class_name(label: int, dataset: str, names: Optional[Dict[int, str]] = None) -> str:
    if dataset.startswith("cifar10") and not dataset.startswith("cifar100"):
        return CIFAR10_CLASSES[label] if 0 <= label < 10 else f"class_{label}"
    if dataset == "mnist":
        return MNIST_CLASSES[label] if 0 <= label < 10 else f"class_{label}"
    if names and label in names:
        return names[label]
    return f"class_{label}"
