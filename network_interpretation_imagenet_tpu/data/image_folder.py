"""torchvision-``ImageFolder``-style dataset (class subdirectories).

The reference's random-mask generator loads its val split with plain
``datasets.ImageFolder(valdir, transform)``
(``generate_gp_training_data_imagenet.py:594-602``) — class = sorted
subdirectory index, no bbox CSV. This covers that layout; directories with
``LOC_val_solution.csv`` should use :class:`ImagenetLocalizationDataset`
(which also yields gt boxes).
"""

from __future__ import annotations

import os

_EXTS = (".jpeg", ".jpg", ".png", ".bmp", ".webp")


class ImageFolderDataset:
    """Iterates (normalized f32 HWC image, label, None) over class subdirs.

    Labels follow torchvision semantics: sorted(subdir names) → 0..C-1;
    files sort within each class, classes concatenate in label order.
    """

    def __init__(self, data_dir: str, crop: int = 224,
                 raw_u8: bool = False):
        self.crop = crop
        self.raw_u8 = raw_u8  # uint8 wire: yield resize+crop u8 (see
        # ImagenetLocalizationDataset; normalize happens on device)
        classes = sorted(
            d for d in os.listdir(data_dir)
            if os.path.isdir(os.path.join(data_dir, d))
        )
        self.class_to_label = {c: i for i, c in enumerate(classes)}
        self.items = []
        for c in classes:
            cdir = os.path.join(data_dir, c)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(_EXTS):
                    self.items.append((os.path.join(cdir, fname),
                                       self.class_to_label[c]))

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, index: int):
        from PIL import Image

        from network_interpretation_imagenet_tpu.data.transform import (
            pil_eval_transform,
        )

        path, label = self.items[index]
        img = Image.open(path).convert("RGB")
        return pil_eval_transform(img, self.crop, raw=self.raw_u8), label, None

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
