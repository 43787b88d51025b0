"""Fabricate COCO results JSON from an annotation dict for AP sanity runs.

Two modes, both writing the standard results format that
``cli score-coco`` consumes:

  * ``perfect`` — every ground-truth box becomes a detection with score
    1.0: the official protocol must score AP = 1.0 (up to the tiny
    maxDets truncation on >100-object images).
  * ``noised``  — boxes jittered by ``--jitter`` of their size, scores
    uniform in (0.3, 1.0), and ``--drop`` of them deleted: AP must land
    strictly inside (0, 1).

Together with a full-corpus `cli evaluate --protocol coco-original
--dump-detections` run (pipeline -> forward -> decode -> original-frame
mapping -> matcher) these pin the eval stack's endpoints at real-val
scale: the protocol scores a perfect detector perfectly, degrades
smoothly, and the dumped-results path re-scores to the same number.
Reference counterpart: the eval role at
/root/reference/vision_transformer_detector.py:2142-2180.

Usage:
    python tools/make_sanity_detections.py --mode perfect --out p.json
    python tools/make_sanity_detections.py --mode noised --out n.json
"""

from __future__ import annotations

import argparse
import json

DEFAULT_ANNOTATIONS = "/root/reference/val_annotations_dict.json"


def build(annotations: dict, mode: str, jitter: float, drop: float,
          seed: int = 0):
    import numpy as np

    rng = np.random.default_rng(seed)
    results = []
    for image_id, records in annotations.items():
        img_id = int(image_id) if str(image_id).isdigit() else image_id
        for cat, cx, cy, bh, bw, _area in records:
            if mode == "noised" and rng.uniform() < drop:
                continue
            x, y, w, h = cx - bw / 2.0, cy - bh / 2.0, bw, bh
            score = 1.0
            if mode == "noised":
                x += float(rng.uniform(-jitter, jitter)) * w
                y += float(rng.uniform(-jitter, jitter)) * h
                w *= 1.0 + float(rng.uniform(-jitter, jitter))
                h *= 1.0 + float(rng.uniform(-jitter, jitter))
                score = float(rng.uniform(0.3, 1.0))
            results.append({
                "image_id": img_id,
                "category_id": int(cat),
                "bbox": [round(float(v), 2) for v in (x, y, w, h)],
                "score": round(score, 5)})
    return results


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--annotations", default=DEFAULT_ANNOTATIONS)
    parser.add_argument("--mode", required=True,
                        choices=("perfect", "noised"))
    parser.add_argument("--out", required=True)
    parser.add_argument("--jitter", type=float, default=0.15,
                        help="noised mode: box corner/size jitter as a "
                             "fraction of the box size (default 0.15)")
    parser.add_argument("--drop", type=float, default=0.2,
                        help="noised mode: fraction of boxes deleted "
                             "(false negatives; default 0.2)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    with open(args.annotations) as f:
        annotations = json.load(f)
    results = build(annotations, args.mode, args.jitter, args.drop,
                    args.seed)
    with open(args.out, "w") as f:
        json.dump(results, f)
    print(json.dumps({"out": args.out, "mode": args.mode,
                      "detections": len(results),
                      "images": len(annotations)}))


if __name__ == "__main__":
    main()
