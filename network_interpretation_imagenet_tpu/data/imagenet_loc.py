"""ImageNet-localization validation dataset with ground-truth bboxes.

Reference: ``dataset.py:22-120`` — parses ``LOC_val_solution.csv`` rows
``img_name,"class x0 y0 x1 y1 ..."``, converts corner boxes to xywh, maps
class synsets to indices by sorted order, and rescales the FIRST gt bbox
through the Resize→CenterCrop coordinate transform.

Decode AND resize/crop/normalize run on host via PIL (torchvision's exact
arithmetic — ``data/transform.py``), which is bit-parity with the reference
eval pipeline and overlaps device compute in the pipelined sweep; the bbox
math is vectorized and tested against the reference's geometry (the
reference's loop applies the transform only to the first bbox then breaks —
``dataset.py:69-106`` — reproduced here).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def parse_loc_csv(path: str):
    """Parse LOC_val_solution.csv → [(img_name, synset, [xywh boxes])].

    Reference parse (``dataset.py:28-44``): each annotation is groups of 5
    tokens ``synset x0 y0 x1 y1``; corner→xywh via ``w=x1-x0, h=y1-y0``
    (the reference names them h,w swapped but the arithmetic is this).
    """
    rows = []
    with open(path, newline="") as f:
        for line in f:
            line = line.strip()
            if not line or line.lower().startswith("imageid"):
                continue
            img_name, anno = line.split(",", 1)
            tokens = anno.replace('"', "").split()
            if len(tokens) % 5 != 0 or not tokens:
                continue
            synset = tokens[0]
            boxes = []
            for i in range(len(tokens) // 5):
                x0, y0, x1, y1 = (float(t) for t in tokens[i * 5 + 1 : i * 5 + 5])
                boxes.append([x0, y0, x1 - x0, y1 - y0])
            rows.append((img_name, synset, boxes))
    return rows


def transform_gt_bbox(
    bbox_xywh: Sequence[float], img_w: float, img_h: float, crop: int = 224
) -> np.ndarray:
    """Rescale a gt bbox through Resize(shorter=crop) + CenterCrop(crop).

    Reference geometry (``dataset.py:69-93``): scale by r = crop/min(w,h),
    intersect with the centered crop window, shift into crop coordinates.
    Returns [x, y, w, h] in the cropped image frame ([0,0,0,0] if the box
    falls outside the crop).

    Deliberate reference-parity choice: the box frame uses UN-truncated
    float resize dims (sw = img_w·r), exactly like ``dataset.py``, while the
    pixel path truncates the long side like PIL (``pil_eval_transform``) —
    so boxes can sit ≲1 px off the pixel frame, as they do in the reference.
    The committed real-JPEG fixture pins these torch-computed semantics.
    """
    r = crop / (img_w if img_w < img_h else img_h)
    x, y, w, h = (v * r for v in bbox_xywh)
    sw, sh = img_w * r, img_h * r
    cx, cy = (sw - crop) / 2.0, (sh - crop) / 2.0
    # Intersect [x,y,w,h] with crop window [cx,cy,crop,crop].
    ix = max(x, cx)
    iy = max(y, cy)
    iw = min(x + w, cx + crop) - ix
    ih = min(y + h, cy + crop) - iy
    if iw < 0 or ih < 0:
        return np.zeros(4, np.float32)
    return np.asarray([ix - cx, iy - cy, iw, ih], np.float32)


class ImagenetLocalizationDataset:
    """Iterates (normalized f32 HWC image, label, gt_bbox) like the reference
    loader (``bayesian_active_learning_imagenet.py:405-415``).

    ``raw_u8=True`` yields resize+crop uint8 HWC instead — the uint8 wire
    (/255 + normalize run ON DEVICE; ``saliency.sweep`` ``normalize=``),
    cutting each flush's host→device upload to 1/4 the f32 bytes."""

    def __init__(self, data_dir: str, crop: int = 224,
                 raw_u8: bool = False):
        self.data_dir = data_dir
        self.crop = crop
        self.raw_u8 = raw_u8
        csv_path = os.path.join(data_dir, "LOC_val_solution.csv")
        rows = parse_loc_csv(csv_path)
        self.items = []
        synsets = sorted({synset for _, synset, _ in rows})
        self.synset_to_label = {s: i for i, s in enumerate(synsets)}
        for img_name, synset, boxes in rows:
            self.items.append(
                (
                    os.path.join(data_dir, synset, img_name + ".JPEG"),
                    self.synset_to_label[synset],
                    boxes,
                )
            )

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, index: int):
        from PIL import Image

        path, label, boxes = self.items[index]
        img = Image.open(path).convert("RGB")
        img_w, img_h = img.size
        # PIL resize/crop — torchvision's exact arithmetic (shared helper,
        # see data/transform.py), so classifier inputs are bit-parity with
        # the reference eval pipeline. Host-side by design: decode already
        # lives here, and host preprocessing overlaps the device's masked
        # forwards in the pipelined sweep. The jittable device pipeline
        # (``ops.preprocess.standard_eval_pipeline``) remains for fused
        # on-device serving.
        from network_interpretation_imagenet_tpu.data.transform import (
            pil_eval_transform,
        )

        out = pil_eval_transform(img, self.crop, raw=self.raw_u8)
        gt = transform_gt_bbox(boxes[0], img_w, img_h, self.crop)
        return out, label, gt

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
