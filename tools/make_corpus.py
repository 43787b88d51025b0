"""Synthetic on-disk JPEG corpus driven by the REAL val annotation dict.

The environment ships the reference's ``val_annotations_dict.json``
(4,952 val2017 images' labels, vision_transformer_utilities.py:82-220
output format) but not the COCO image files. This tool renders one
deterministic JPEG per annotated image — textured background plus one
filled rectangle per ground-truth box, at the canvas size implied by the
box extents — so the FULL file-fed path (list -> decode -> letterbox ->
label lookup -> device -> decode -> original-frame mapping -> official
matcher) runs end-to-end at real-val scale without the real pixels.

Texture matters for honest decode timing: flat-color rectangles compress
to almost nothing and decode unrealistically fast, while white noise
decodes unrealistically slowly (every DCT coefficient survives). The
default low-frequency-noise background lands file sizes in the real COCO
val range (~50-200 KB at quality 90-95).

Usage:
    python tools/make_corpus.py --out /tmp/corpus [--count 5000]
        [--quality 90] [--texture lowfreq|flat|noise]

Prints one JSON summary line. Deterministic for a given (seed, quality,
texture): image i depends only on its own annotation records and id.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_ANNOTATIONS = "/root/reference/val_annotations_dict.json"


def canvas_size(records, max_side: int = 640):
    """(height, width) canvas containing every annotated box, rounded up
    to a multiple of 8 and clamped to COCO's max side. Stands in for the
    unknown original image size (the reference dict stores only boxes);
    letterbox geometry stays non-trivial because aspect != 1 in general.

    Box extents underestimate the true image size (objects rarely touch
    the frame edge), so the canvas gets a 17%/side margin: with it the
    corpus mean is ~0.31 Mpx, matching the typical 640x480 COCO val
    frame (raw extents gave 0.23 Mpx = 74%), which keeps host decode
    timings honest.
    """
    max_x = max(r[1] + r[4] / 2 for r in records)
    max_y = max(r[2] + r[3] / 2 for r in records)
    w = int(math.ceil(1.17 * (max_x + 4) / 8) * 8)
    h = int(math.ceil(1.17 * (max_y + 4) / 8) * 8)
    return min(max(h, 64), max_side), min(max(w, 64), max_side)


def render_image(records, size, image_id: int, texture: str = "lowfreq"):
    """Deterministic RGB uint8 array: textured background + one filled
    rectangle per box, colored by category id (same color rule as
    tests/real_annotation_fixture.py so overlays are comparable)."""
    import numpy as np

    h, w = size
    if texture == "flat":
        img = np.full((h, w, 3), 64, np.uint8)
    else:
        rng = np.random.default_rng(image_id)
        if texture == "noise":
            img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        else:  # lowfreq: upsampled coarse noise ~ natural-image entropy
            # 8px blocks + /-25 grain at quality 95 land the mean file
            # size at ~175 KB — the real val2017 mean is ~163 KB
            # (815 MB / 5000), so decode cost per image is realistic.
            coarse = rng.integers(30, 220, (h // 8 + 2, w // 8 + 2, 3))
            img = np.kron(coarse, np.ones((8, 8, 1)))[:h, :w]
            img = (img + rng.integers(-25, 25, (h, w, 3))).clip(
                0, 255).astype(np.uint8)
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


def build_corpus(out_dir: str, annotations: dict, count=None,
                 quality: int = 95, texture: str = "lowfreq",
                 max_side: int = 640):
    """Render ``{id:012d}.jpg`` for the first ``count`` ids (numeric
    order) into ``out_dir``. Returns (paths, total_bytes)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    ids = sorted(annotations, key=lambda s: int(s))
    if count is not None:
        ids = ids[:count]
    paths, total = [], 0
    for image_id in ids:
        records = annotations[image_id]
        if not records:
            continue
        path = os.path.join(out_dir, f"{int(image_id):012d}.jpg")
        if not os.path.exists(path):
            arr = render_image(records, canvas_size(records, max_side),
                               int(image_id), texture)
            Image.fromarray(arr).save(path, quality=quality)
        total += os.path.getsize(path)
        paths.append(path)
    return paths, total


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--out", required=True)
    parser.add_argument("--annotations", default=DEFAULT_ANNOTATIONS)
    parser.add_argument("--count", type=int, default=None,
                        help="first N annotated ids (default: all)")
    parser.add_argument("--quality", type=int, default=95)
    parser.add_argument("--texture", default="lowfreq",
                        choices=("lowfreq", "flat", "noise"))
    args = parser.parse_args()

    with open(args.annotations) as f:
        annotations = json.load(f)

    tic = time.perf_counter()
    paths, total_bytes = build_corpus(args.out, annotations, args.count,
                                      args.quality, args.texture)
    print(json.dumps({
        "out": args.out,
        "images": len(paths),
        "total_mb": round(total_bytes / 1e6, 1),
        "mean_kb": round(total_bytes / max(1, len(paths)) / 1e3, 1),
        "render_s": round(time.perf_counter() - tic, 1),
        "texture": args.texture,
        "quality": args.quality,
    }))


if __name__ == "__main__":
    main()
