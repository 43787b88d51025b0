"""Shared fixture for the real-annotation end-to-end tests.

Uses REAL label content from the reference's shipped
val_annotations_dict.json (vtu.py:82-220 output format) for six COCO val
images, rendering deterministic JPEGs at the aspect ratios implied by the
annotations so the full image->label->eval path runs without the COCO
image files themselves.
"""

import math
import os

import numpy as np

VAL_DICT_PATH = "/root/reference/val_annotations_dict.json"
GOLDEN_LABELS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "golden",
    "real_val_labels_608.npz")

# Six val2017 images with 2 distinct-class boxes each (deterministic pick:
# lowest ids with 2-6 unique-class annotations).
PICKED_IDS = ["785", "802", "1425", "1490", "1675", "2149"]


def canvas_size(records):
    """(height, width) canvas that contains every annotated box, rounded up
    to a multiple of 8 — stands in for the unknown original image size and
    yields non-trivial letterbox geometry (aspect != 1)."""
    max_x = max(r[1] + r[4] / 2 for r in records)
    max_y = max(r[2] + r[3] / 2 for r in records)
    w = int(math.ceil((max_x + 4) / 8) * 8)
    h = int(math.ceil((max_y + 4) / 8) * 8)
    return h, w


def render_image(records, size):
    """Deterministic RGB uint8 array with one filled rectangle per box,
    colored by category id."""
    h, w = size
    img = np.full((h, w, 3), 64, np.uint8)
    for cat, cx, cy, bh, bw, _area in records:
        x0 = max(0, int(cx - bw / 2))
        x1 = min(w, int(cx + bw / 2))
        y0 = max(0, int(cy - bh / 2))
        y1 = min(h, int(cy + bh / 2))
        color = ((37 * int(cat)) % 200 + 30,
                 (91 * int(cat)) % 200 + 30,
                 (151 * int(cat)) % 200 + 30)
        img[y0:y1, x0:x1] = color
    return img


def build_image_dir(root, annotations):
    """Render {id:012d}.jpg for every picked id into ``root``."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    paths = []
    for image_id in PICKED_IDS:
        records = annotations[image_id]
        size = canvas_size(records)
        arr = render_image(records, size)
        path = os.path.join(root, f"{int(image_id):012d}.jpg")
        Image.fromarray(arr).save(path, quality=95)
        paths.append(path)
    return paths
