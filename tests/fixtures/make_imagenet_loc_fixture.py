"""Generate the committed ImageNet-localization fixture.

Creates 3 deterministic real-JPEG-sized samples (collage images saved as
actual JPEGs through PIL, so the test exercises real JPEG decode), a
``LOC_val_solution.csv`` fragment in the reference's exact row format
(``dataset.py:28-44``: ``img_name,"synset x0 y0 x1 y1 ..."``), and
``golden.npz`` holding TORCH-computed oracles:

  * the fully transformed tensor per image — PIL decode → ``Resize(224)`` →
    ``CenterCrop(224)`` → ``ToTensor`` → ``Normalize`` (the reference eval
    transform, ``bayesian_active_learning_imagenet.py:402-415``). torchvision
    is not installed in this image, so the oracle reproduces torchvision's
    exact arithmetic directly: ``Resize`` IS a PIL bilinear resize of the
    shorter side, ``CenterCrop`` IS an integer-rounded PIL crop, ``ToTensor``
    IS /255 — verified against torchvision's documented semantics;
  * the gt bbox mapped through the reference's Resize+CenterCrop coordinate
    transform (``dataset.py:67-106`` — first bbox only, then break);
  * the IOU of that gt box against a fixed predicted box, computed with the
    reference's corner arithmetic (``utils.py:114-142`` semantics).

Run from the repo root: ``python tests/fixtures/make_imagenet_loc_fixture.py``.
Outputs are committed; the test (`tests/test_data.py`) only reads them.
"""

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "imagenet_loc")

SAMPLES = [
    # (img_name, synset, (width, height), corner bbox [x0, y0, x1, y1])
    ("ILSVRC2012_val_00000001", "n01440764", (500, 375), (120, 80, 430, 300)),
    ("ILSVRC2012_val_00000002", "n01443537", (375, 500), (40, 150, 300, 480)),
    ("ILSVRC2012_val_00000003", "n01484850", (640, 480), (10, 20, 200, 460)),
]
PRED_BOX_XYWH = [60, 50, 120, 130]  # fixed predicted box for the IOU golden


def make_image(seed, size):
    """Deterministic collage image with hard edges (JPEG-compressible)."""
    w, h = size
    r = np.random.RandomState(seed)
    img = np.ones((h, w, 3), np.float32) * r.rand(3)
    for _ in range(30):
        y, x = r.randint(0, h), r.randint(0, w)
        bh, bw = r.randint(h // 10, h // 3), r.randint(w // 10, w // 3)
        img[y : y + bh, x : x + bw] = r.rand(3)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def reference_iou(box_a_xywh, box_b_xywh):
    """IOU with the reference's corner arithmetic (utils.py:114-142):
    boxes as [x0, y0, x1, y1], +1 on the intersection extent."""
    a = [box_a_xywh[0], box_a_xywh[1],
         box_a_xywh[0] + box_a_xywh[2], box_a_xywh[1] + box_a_xywh[3]]
    b = [box_b_xywh[0], box_b_xywh[1],
         box_b_xywh[0] + box_b_xywh[2], box_b_xywh[1] + box_b_xywh[3]]
    xa, ya = max(a[0], b[0]), max(a[1], b[1])
    xb, yb = min(a[2], b[2]), min(a[3], b[3])
    # NO clamp — the reference doesn't clamp either (utils.py:122), so
    # disjoint boxes yield small negative values; the golden records that.
    inter = (xb - xa + 1) * (yb - ya + 1)
    area_a = (a[2] - a[0] + 1) * (a[3] - a[1] + 1)
    area_b = (b[2] - b[0] + 1) * (b[3] - b[1] + 1)
    return inter / float(area_a + area_b - inter)


def torchvision_eval_transform(img, crop=224):
    """torchvision Resize(crop)+CenterCrop(crop)+ToTensor+Normalize oracle
    via PIL (what torchvision itself calls). Returns f32 [H, W, 3] HWC.

    NOTE: torchvision computes the long side as ``int(size * long / short)``
    — TRUNCATION (``_compute_resized_output_size``), not round(). E.g.
    500×375 → 298×224, not 299×224.
    """
    from PIL import Image

    w, h = img.size
    if w < h:
        new_w, new_h = crop, int(crop * h / w)
    else:
        new_w, new_h = int(crop * w / h), crop
    img = img.resize((new_w, new_h), Image.BILINEAR)
    left = int(round((new_w - crop) / 2.0))
    top = int(round((new_h - crop) / 2.0))
    img = img.crop((left, top, left + crop, top + crop))
    arr = np.asarray(img, np.float32) / 255.0  # ToTensor
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return (arr - mean) / std


def main():
    from PIL import Image

    os.makedirs(ROOT, exist_ok=True)

    csv_lines = ["ImageId,PredictionString"]
    goldens = {}
    meta = {}
    for i, (name, synset, size, (x0, y0, x1, y1)) in enumerate(SAMPLES):
        os.makedirs(os.path.join(ROOT, synset), exist_ok=True)
        path = os.path.join(ROOT, synset, name + ".JPEG")
        Image.fromarray(make_image(7 + i, size)).save(path, "JPEG", quality=90)
        # Two boxes on the row; the reference transform uses only the first.
        csv_lines.append(
            f'{name},"{synset} {x0} {y0} {x1} {y1} {synset} 1 2 30 40"'
        )

        # Oracle: decode the JPEG we just wrote, run the reference eval
        # transform.
        img = Image.open(path).convert("RGB")
        goldens[f"img{i}"] = torchvision_eval_transform(img).astype(np.float32)

        # Reference bbox transform (dataset.py:69-93): first box only.
        w, hh = img.size
        r = 224 / (w if w < hh else hh)
        bx, by, bw, bh = x0 * r, y0 * r, (x1 - x0) * r, (y1 - y0) * r
        sw, sh = w * r, hh * r
        cx, cy = (sw - 224) / 2.0, (sh - 224) / 2.0
        ix, iy = max(bx, cx), max(by, cy)
        iw = min(bx + bw, cx + 224) - ix
        ih = min(by + bh, cy + 224) - iy
        gt = [ix - cx, iy - cy, iw, ih]
        goldens[f"bbox{i}"] = np.asarray(gt, np.float32)
        meta[f"iou{i}"] = reference_iou(PRED_BOX_XYWH, gt)

    with open(os.path.join(ROOT, "LOC_val_solution.csv"), "w") as f:
        f.write("\n".join(csv_lines) + "\n")
    np.savez_compressed(os.path.join(ROOT, "golden.npz"), **goldens)
    meta["pred_box_xywh"] = PRED_BOX_XYWH
    with open(os.path.join(ROOT, "golden_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print("fixture written to", ROOT)
    for k, v in meta.items():
        print(k, v)


if __name__ == "__main__":
    main()
