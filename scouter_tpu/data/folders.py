"""List builders for the folder-backed datasets (ConText, ImageNet subsets, CUB).

Split logic is byte-identical to the reference so the same directories yield the
same train/val membership:

- ConText (``dataset/ConText.py:10-36``): flat dir scan (sorted filenames),
  label = filename prefix before '_' mapped through the sorted category list,
  sklearn train_test_split(random_state=1, train_size=0.8).
- ImageNet subset (``dataset/ConText.py:39-66``): first ``num_classes`` sorted
  WNID folders of ``train/``; walk ``train/`` and ``val/``.
- CUB-200 (``dataset/CUB200.py:8-82``): official metadata files; keep images
  whose class index (first 3 chars of the image name) <= num_classes; labels
  shifted to 0-based.

Image loading uses PIL on the host; decoded batches are uint8 NHWC at a fixed
staging size so the device pipeline (transforms.preprocess_batch) handles the
final resize + normalize on TPU.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "scan_context",
    "scan_imagenet_subset",
    "scan_cub200",
    "load_image_list",
]

PathLabel = Tuple[str, int]


def _sorted_files(root: str) -> List[str]:
    for _, _, files in os.walk(root):
        return sorted(files)
    return []


def _sorted_dirs(root: str) -> List[str]:
    for _, dirs, _ in os.walk(root):
        return sorted(dirs)
    return []


def scan_context(root: str, ratio: float = 0.8) -> Tuple[List[PathLabel], List[PathLabel]]:
    """ConText: label from filename prefix, fixed-seed 80/20 split."""
    from sklearn.model_selection import train_test_split

    all_images = _sorted_files(root)
    categories = sorted({name[: name.find("_")] for name in all_images})
    cat_index = {c: i for i, c in enumerate(categories)}
    all_data = [
        (os.path.join(root, name), cat_index[name[: name.find("_")]]) for name in all_images
    ]
    train, val = train_test_split(all_data, random_state=1, train_size=ratio)
    return train, val


def scan_imagenet_subset(root: str, num_classes: int) -> Tuple[List[PathLabel], List[PathLabel]]:
    """ImageNet-style tree: first N sorted class folders of train/."""
    categories = _sorted_dirs(os.path.join(root, "train"))
    used = categories[:num_classes]

    def walk(phase: str) -> List[PathLabel]:
        out: List[PathLabel] = []
        for label, folder in enumerate(used):
            folder_root = os.path.join(root, phase, folder)
            for name in _sorted_files(folder_root):
                out.append((os.path.join(folder_root, name), label))
        return out

    return walk("train"), walk("val")


def scan_cub200(root: str, num_classes: int) -> Tuple[List[PathLabel], List[PathLabel]]:
    """CUB-200-2011 metadata parse with the reference's class filter."""

    def read_pairs(fname: str) -> List[Tuple[str, str]]:
        with open(os.path.join(root, fname)) as f:
            return [tuple(line.strip().split()) for line in f if line.strip()]

    split = dict(read_pairs("train_test_split.txt"))  # image_id -> '1'/'0'
    id_label = dict(read_pairs("image_class_labels.txt"))  # image_id -> class_id
    train: List[PathLabel] = []
    test: List[PathLabel] = []
    for image_id, image_name in read_pairs("images.txt"):
        if int(image_name[:3]) > num_classes:
            continue
        label = int(id_label[image_id]) - 1  # 0-based (CUB200.py:72)
        item = (os.path.join(root, "images", image_name), label)
        (train if split[image_id] == "1" else test).append(item)
    return train, test


def load_image_list(
    items: Sequence[PathLabel], staging_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode images to a uint8 (N, staging, staging, 3) array + labels.

    The staging resize (bilinear, like the reference's Resize) bounds host
    memory; the exact model input size is produced on device.
    """
    from PIL import Image

    n = len(items)
    images = np.zeros((n, staging_size, staging_size, 3), np.uint8)
    labels = np.zeros((n,), np.int32)
    for i, (path, label) in enumerate(items):
        with Image.open(path) as im:
            im = im.convert("RGB").resize((staging_size, staging_size), Image.BILINEAR)
            images[i] = np.asarray(im, np.uint8)
        labels[i] = label
    return images, labels
