"""Official COCO-protocol detection evaluation, dependency-free NumPy.

The framework already reproduces the reference's *custom* streaming metric
bit-for-bit (metrics/mean_average_precision.py, mirroring
vision_transformer_detector.py:1268-2060, all 13 unit oracles). That metric
is a ring-buffer approximation, NOT the official COCO protocol — so
"COCO val mAP" claims (BASELINE.md north star) could not be *stated* by
anything in this repo. This module closes that gap: a COCOeval-equivalent
evaluator (101-point interpolated AP over IoU .50:.95, area ranges,
maxDets caps, crowd-ignore semantics) written from the protocol definition
in pure NumPy, because pycocotools is not installable in this image.

Protocol semantics implemented (matching pycocotools COCOeval for bbox):
  * IoU on (x, y, w, h) top-left boxes; crowd ground truth uses
    intersection-over-detection-area ("IoF") and may match many detections.
  * Per image x category: detections sorted by score (stable descending),
    capped at the largest maxDets; greedy matching per IoU threshold in
    score order, each detection taking the best remaining ground truth
    (ignored ground truths only if no real one matches; crowd ground
    truths are never consumed).
  * Ground truths outside the area range (or crowd) are "ignored": matches
    to them do not count as true positives, and unmatched detections whose
    own area is outside the range are ignored rather than false positives.
  * Accumulation over the whole dataset per (iou_threshold, category,
    area_range, max_dets): precision envelope (monotone from the right),
    101-point recall interpolation with searchsorted(side="left"), AP =
    mean over recall thresholds; AR = final recall. Categories with zero
    non-ignored ground truths are excluded from the means (never counted
    as zero).

The evaluator is host-side and offline (like COCOeval itself) — the
on-device jitted metric (metrics/fast_map.py) remains the in-training-loop
metric; this one is the protocol-of-record for reporting.

Adapters at the bottom convert the framework's fixed-slot tensors —
labels ``(B, 17, 6)`` with the -8 empty-slot convention
(vision_transformer_utilities.py:497-505) and decoded predictions
``(B, 17, 6)`` from ops/decode.py — into protocol boxes. Note on areas:
when evaluating from letterboxed label tensors, box areas are measured in
the letterboxed frame; official COCO buckets by SEGMENTATION area in the
original frame. The annotation dict's area column is bbox w*h (the
reference's own convention, vtu.py:154-166), so even with explicit
``gt_areas`` from the dict the small/medium/large buckets are
bbox-area buckets — close to, but not bit-identical with, the official
segmentation-area buckets (overall AP/AP50/AP75 ignore area and are
unaffected). Only ``score_coco_results`` on a full COCO instances JSON
(which carries the real ``area`` field) reproduces the official buckets.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:  # Native matcher core (native/coco_eval.cc, tools/build_native.sh):
    # same greedy-COCO semantics in C++, bit-equal by construction (same
    # IEEE-double operation order); tests/test_coco_eval.py asserts exact
    # equality on randomized inputs. ~10x evaluate() at 5k images.
    from .._native import _native_coco_eval  # type: ignore
except Exception:  # pragma: no cover - extension not built
    _native_coco_eval = None


def native_matcher_available() -> bool:
    return _native_coco_eval is not None


# The standard COCO summary configuration.
IOU_THRESHOLDS = np.linspace(0.5, 0.95, 10)
RECALL_THRESHOLDS = np.linspace(0.0, 1.0, 101)
MAX_DETS = (1, 10, 100)
AREA_RANGES: Dict[str, Tuple[float, float]] = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def iou_xywh(det_boxes: np.ndarray, gt_boxes: np.ndarray,
             gt_iscrowd: Optional[np.ndarray] = None) -> np.ndarray:
    """Pairwise IoU between (M,4) detections and (N,4) ground truths,
    boxes as (x_topleft, y_topleft, w, h).

    Crowd ground truths use intersection / detection-area (the COCO
    maskUtils.iou convention), so one crowd region can absorb any number
    of detections without its own area diluting the overlap.
    """
    det_boxes = np.asarray(det_boxes, np.float64).reshape(-1, 4)
    gt_boxes = np.asarray(gt_boxes, np.float64).reshape(-1, 4)
    dx0, dy0 = det_boxes[:, 0:1], det_boxes[:, 1:2]
    dx1, dy1 = dx0 + det_boxes[:, 2:3], dy0 + det_boxes[:, 3:4]
    gx0, gy0 = gt_boxes[:, 0], gt_boxes[:, 1]
    gx1, gy1 = gx0 + gt_boxes[:, 2], gy0 + gt_boxes[:, 3]

    iw = np.clip(np.minimum(dx1, gx1[None, :]) -
                 np.maximum(dx0, gx0[None, :]), 0.0, None)
    ih = np.clip(np.minimum(dy1, gy1[None, :]) -
                 np.maximum(dy0, gy0[None, :]), 0.0, None)
    inter = iw * ih
    det_area = (det_boxes[:, 2] * det_boxes[:, 3])[:, None]
    gt_area = (gt_boxes[:, 2] * gt_boxes[:, 3])[None, :]
    union = det_area + gt_area - inter
    if gt_iscrowd is not None and np.any(gt_iscrowd):
        crowd = np.asarray(gt_iscrowd, bool)[None, :]
        union = np.where(crowd, det_area, union)
    with np.errstate(divide="ignore", invalid="ignore"):
        ious = np.where(union > 0, inter / union, 0.0)
    return ious


@dataclass
class _ImageEval:
    """Per-(image, category, area-range) matching result at the largest
    maxDets cap; accumulate() re-slices it per cap."""
    dt_scores: np.ndarray   # (M,) sorted descending
    dt_matched: np.ndarray  # (T, M) bool
    dt_ignored: np.ndarray  # (T, M) bool
    n_positive: int         # non-ignored ground truths


def _match_image(ious: np.ndarray, gt_ignore: np.ndarray,
                 gt_iscrowd: np.ndarray, dt_scores: np.ndarray,
                 dt_areas: np.ndarray, area_range: Tuple[float, float],
                 iou_thresholds: np.ndarray) -> _ImageEval:
    """Greedy COCO matching for one image x category x area range.

    ``ious`` rows are detections already sorted by descending score and
    capped at the largest maxDets; columns are ground truths sorted
    non-ignored-first (the caller pre-sorts both).
    """
    num_t = len(iou_thresholds)
    num_dt, num_gt = ious.shape
    gt_matched = np.zeros((num_t, num_gt), dtype=bool)
    dt_matched = np.zeros((num_t, num_dt), dtype=bool)
    dt_ignored = np.zeros((num_t, num_dt), dtype=bool)
    for ti, threshold in enumerate(iou_thresholds):
        for di in range(num_dt):
            best = min(threshold, 1.0 - 1e-10)
            match = -1
            for gi in range(num_gt):
                if gt_matched[ti, gi] and not gt_iscrowd[gi]:
                    continue
                # Ground truths are sorted non-ignored-first: once we hold
                # a real match, ignored candidates cannot improve it.
                if match > -1 and not gt_ignore[match] and gt_ignore[gi]:
                    break
                if ious[di, gi] < best:
                    continue
                best = ious[di, gi]
                match = gi
            if match == -1:
                continue
            dt_matched[ti, di] = True
            dt_ignored[ti, di] = gt_ignore[match]
            gt_matched[ti, match] = True
    # Unmatched detections whose own area falls outside the range are
    # ignored (they would be matched under a different range).
    out_of_range = (dt_areas < area_range[0]) | (dt_areas > area_range[1])
    dt_ignored |= (~dt_matched) & out_of_range[None, :]
    return _ImageEval(dt_scores=dt_scores, dt_matched=dt_matched,
                      dt_ignored=dt_ignored,
                      n_positive=int(np.count_nonzero(~gt_ignore)))


@dataclass
class CocoEvalResults:
    """precision: (T, R, K, A, M); recall: (T, K, A, M); -1 = undefined
    (no ground truth for that category/area)."""
    precision: np.ndarray
    recall: np.ndarray
    categories: Tuple[int, ...]
    iou_thresholds: np.ndarray = field(
        default_factory=lambda: IOU_THRESHOLDS.copy())
    area_range_names: Tuple[str, ...] = tuple(AREA_RANGES)
    max_dets: Tuple[int, ...] = MAX_DETS

    def _area_index(self, area: str) -> int:
        return self.area_range_names.index(area)

    def _maxdet_index(self, max_dets: int) -> int:
        return self.max_dets.index(max_dets)

    def _iou_index(self, iou: float) -> int:
        """Exact-membership lookup (tight absolute tolerance absorbs
        linspace rounding only): a nearest-match would silently return
        AP@0.6 for a requested AP50 when custom thresholds don't include
        0.5, and isclose's default rtol=1e-5 could make two deliberately
        close user thresholds both answer one query (round-4 advisor)."""
        matches = np.nonzero(
            np.abs(np.asarray(self.iou_thresholds) - iou) < 1e-6)[0]
        if matches.size == 0:
            raise ValueError(
                f"iou={iou} is not one of the evaluated thresholds "
                f"{[round(float(t), 4) for t in self.iou_thresholds]}")
        return int(matches[0])

    def ap(self, iou: Optional[float] = None, area: str = "all",
           max_dets: int = 100) -> float:
        """Mean average precision; ``iou=None`` averages .50:.95."""
        p = self.precision[:, :, :, self._area_index(area),
                           self._maxdet_index(max_dets)]
        if iou is not None:
            ti = self._iou_index(iou)
            p = p[ti:ti + 1]
        valid = p[p > -1]
        return float(valid.mean()) if valid.size else -1.0

    def ar(self, area: str = "all", max_dets: int = 100) -> float:
        """Mean average recall over IoU thresholds and categories."""
        r = self.recall[:, :, self._area_index(area),
                        self._maxdet_index(max_dets)]
        valid = r[r > -1]
        return float(valid.mean()) if valid.size else -1.0

    def per_category(self, iou: Optional[float] = None,
                     area: str = "all",
                     max_dets: int = 100) -> Dict[int, float]:
        """AP per category id (-1 where the category has no ground
        truth) — the standard per-class breakdown COCOeval users pull
        from the precision tensor."""
        out = {}
        for ki, category in enumerate(self.categories):
            p = self.precision[:, :, ki, self._area_index(area),
                               self._maxdet_index(max_dets)]
            if iou is not None:
                ti = self._iou_index(iou)
                p = p[ti:ti + 1]
            valid = p[p > -1]
            out[category] = float(valid.mean()) if valid.size else -1.0
        return out

    def summarize(self) -> Dict[str, float]:
        """The 12 standard COCO summary metrics."""
        big = max(self.max_dets)
        out = {"AP": self.ap(max_dets=big)}
        # AP50/AP75 carry a real value only when that threshold was
        # actually evaluated — custom iou_thresholds without 0.5/0.75
        # used to report a nearest neighbour under the standard name.
        # The keys are always present (None/JSON-null when unevaluated)
        # so external consumers of the CLI's JSON see a stable schema
        # (round-4 advisor).
        for name, t in (("AP50", 0.5), ("AP75", 0.75)):
            evaluated = np.any(
                np.abs(np.asarray(self.iou_thresholds) - t) < 1e-6)
            out[name] = self.ap(iou=t, max_dets=big) if evaluated else None
        out.update({
            "AP_small": self.ap(area="small", max_dets=big),
            "AP_medium": self.ap(area="medium", max_dets=big),
            "AP_large": self.ap(area="large", max_dets=big),
            "AR_small": self.ar(area="small", max_dets=big),
            "AR_medium": self.ar(area="medium", max_dets=big),
            "AR_large": self.ar(area="large", max_dets=big),
        })
        for m in self.max_dets:
            out[f"AR@{m}"] = self.ar(max_dets=m)
        return out


class CocoEvaluator:
    """Streaming-friendly official-protocol evaluator.

    Feed per-image ground truth + detections with :meth:`add_image` (any
    category ids, not restricted to 0..79), then :meth:`evaluate`.
    """

    def __init__(self,
                 iou_thresholds: Sequence[float] = tuple(IOU_THRESHOLDS),
                 recall_thresholds: Sequence[float] = tuple(
                     RECALL_THRESHOLDS),
                 max_dets: Sequence[int] = MAX_DETS,
                 area_ranges: Optional[Dict[str, Tuple[float, float]]]
                 = None,
                 use_native: Optional[bool] = None):
        self.iou_thresholds = np.ascontiguousarray(iou_thresholds,
                                                   np.float64)
        self.recall_thresholds = np.asarray(recall_thresholds, np.float64)
        self.max_dets = tuple(sorted(int(m) for m in max_dets))
        self.area_ranges = dict(area_ranges or AREA_RANGES)
        # (A, 2) float64 row per range, in dict order — the native call's
        # layout and the pure path's iteration order must agree.
        self._area_ranges_array = np.ascontiguousarray(
            list(self.area_ranges.values()), np.float64)
        if use_native is None:
            use_native = native_matcher_available()
        elif use_native and not native_matcher_available():
            raise RuntimeError(
                "use_native=True but the native matcher extension is not "
                "built (tools/build_native.sh)")
        self.use_native = use_native
        self._images: List[dict] = []

    def reset_state(self) -> None:
        self._images.clear()

    def add_image(self, *,
                  gt_boxes, gt_categories,
                  det_boxes, det_scores, det_categories,
                  gt_iscrowd=None, gt_areas=None) -> None:
        """Record one image. Boxes are (x_topleft, y_topleft, w, h) float
        arrays; categories integer arrays; ``gt_areas`` defaults to box
        w*h (pass annotation areas for official small/medium/large)."""
        gt_boxes = np.asarray(gt_boxes, np.float64).reshape(-1, 4)
        det_boxes = np.asarray(det_boxes, np.float64).reshape(-1, 4)
        gt_categories = np.asarray(gt_categories, np.int64).reshape(-1)
        det_categories = np.asarray(det_categories, np.int64).reshape(-1)
        det_scores = np.asarray(det_scores, np.float64).reshape(-1)
        if gt_iscrowd is None:
            gt_iscrowd = np.zeros(len(gt_boxes), bool)
        else:
            gt_iscrowd = np.asarray(gt_iscrowd, bool).reshape(-1)
        if gt_areas is None:
            gt_areas = gt_boxes[:, 2] * gt_boxes[:, 3]
        else:
            gt_areas = np.asarray(gt_areas, np.float64).reshape(-1)
        if not (len(gt_boxes) == len(gt_categories) == len(gt_iscrowd)
                == len(gt_areas)):
            raise ValueError("ground-truth arrays disagree on length")
        if not (len(det_boxes) == len(det_categories) == len(det_scores)):
            raise ValueError("detection arrays disagree on length")
        self._images.append({
            "gt_boxes": gt_boxes, "gt_categories": gt_categories,
            "gt_iscrowd": gt_iscrowd, "gt_areas": gt_areas,
            "det_boxes": det_boxes, "det_scores": det_scores,
            "det_categories": det_categories,
        })

    # ------------------------------------------------------------------
    def evaluate(self) -> CocoEvalResults:
        # Per-category image index (pycocotools builds the same in its
        # COCO.createIndex): with 80 categories an image typically
        # touches <30, so scanning every (image, category) pair just to
        # discover emptiness costs more than all the real matching —
        # measured 40% of evaluate() at 5k synthetic images.
        index: Dict[int, list] = {}
        for img in self._images:
            cats = set(img["gt_categories"].tolist())
            cats.update(img["det_categories"].tolist())
            for c in cats:
                index.setdefault(int(c), []).append(img)
        categories = sorted(index)
        num_t = len(self.iou_thresholds)
        num_r = len(self.recall_thresholds)
        num_k = len(categories)
        num_a = len(self.area_ranges)
        num_m = len(self.max_dets)
        precision = -np.ones((num_t, num_r, num_k, num_a, num_m))
        recall = -np.ones((num_t, num_k, num_a, num_m))
        cap = max(self.max_dets) if self.max_dets else 0

        for ki, category in enumerate(categories):
            per_image = [self._evaluate_image(img, category, cap)
                         for img in index[category]]
            for ai, area_range in enumerate(self.area_ranges.values()):
                evals = [e[ai] for e in per_image if e is not None]
                self._accumulate(evals, precision, recall, ki, ai)
        return CocoEvalResults(
            precision=precision, recall=recall,
            categories=tuple(categories),
            iou_thresholds=self.iou_thresholds.copy(),
            area_range_names=tuple(self.area_ranges),
            max_dets=self.max_dets)

    def _evaluate_image(self, img: dict, category: int, cap: int):
        gt_sel = img["gt_categories"] == category
        det_sel = img["det_categories"] == category
        if not gt_sel.any() and not det_sel.any():
            return None
        gt_iscrowd = img["gt_iscrowd"][gt_sel]
        gt_areas = img["gt_areas"][gt_sel]
        gt_boxes = img["gt_boxes"][gt_sel]
        # Stable score-descending order, capped at the largest maxDets;
        # accumulate() slices smaller caps from this prefix.
        order = np.argsort(-img["det_scores"][det_sel], kind="stable")[:cap]
        det_boxes = img["det_boxes"][det_sel][order]
        det_scores = img["det_scores"][det_sel][order]

        if self.use_native:
            matched_b, ignored_b, npos_b = _native_coco_eval.match_image(
                det_boxes, gt_boxes, gt_iscrowd, gt_areas,
                self._area_ranges_array, self.iou_thresholds)
            num_a = len(self._area_ranges_array)
            num_t = len(self.iou_thresholds)
            num_m = len(det_boxes)
            matched = np.frombuffer(matched_b, np.uint8).reshape(
                num_a, num_t, num_m).view(bool)
            ignored = np.frombuffer(ignored_b, np.uint8).reshape(
                num_a, num_t, num_m).view(bool)
            npos = np.frombuffer(npos_b, np.int64)
            return [_ImageEval(dt_scores=det_scores,
                               dt_matched=matched[ai],
                               dt_ignored=ignored[ai],
                               n_positive=int(npos[ai]))
                    for ai in range(num_a)]

        det_areas = det_boxes[:, 2] * det_boxes[:, 3]
        results = []
        base_ignore = gt_iscrowd.copy()
        # IoUs depend only on the boxes, not the area range — compute the
        # matrix once and permute columns per range (pycocotools computes
        # IoUs once per image x category too).
        ious_full = iou_xywh(det_boxes, gt_boxes, gt_iscrowd)
        for area_range in self.area_ranges.values():
            gt_ignore = base_ignore | (gt_areas < area_range[0]) | (
                gt_areas > area_range[1])
            # Non-ignored ground truths first (stable), as the matcher
            # requires.
            gt_order = np.argsort(gt_ignore, kind="stable")
            results.append(_match_image(
                ious_full[:, gt_order], gt_ignore[gt_order],
                gt_iscrowd[gt_order], det_scores, det_areas, area_range,
                self.iou_thresholds))
        return results

    def _accumulate(self, evals: List[_ImageEval], precision: np.ndarray,
                    recall: np.ndarray, ki: int, ai: int) -> None:
        num_t = len(self.iou_thresholds)
        for mi, cap in enumerate(self.max_dets):
            scores = np.concatenate(
                [e.dt_scores[:cap] for e in evals]) if evals else (
                    np.zeros(0))
            n_positive = sum(e.n_positive for e in evals)
            if n_positive == 0:
                continue
            order = np.argsort(-scores, kind="stable")
            matched = np.concatenate(
                [e.dt_matched[:, :cap] for e in evals],
                axis=1)[:, order] if evals else np.zeros((num_t, 0), bool)
            ignored = np.concatenate(
                [e.dt_ignored[:, :cap] for e in evals],
                axis=1)[:, order] if evals else np.zeros((num_t, 0), bool)
            tp = np.cumsum(matched & ~ignored, axis=1, dtype=np.float64)
            fp = np.cumsum(~matched & ~ignored, axis=1, dtype=np.float64)
            for ti in range(num_t):
                rc = tp[ti] / n_positive
                pr = tp[ti] / np.maximum(tp[ti] + fp[ti],
                                         np.spacing(1.0))
                recall[ti, ki, ai, mi] = rc[-1] if rc.size else 0.0
                # Precision envelope: best precision at >= this recall.
                pr = np.maximum.accumulate(pr[::-1])[::-1]
                q = np.zeros(len(self.recall_thresholds))
                inds = np.searchsorted(rc, self.recall_thresholds,
                                       side="left")
                valid = inds < len(pr)
                q[valid] = pr[inds[valid]]
                precision[ti, :, ki, ai, mi] = q


# ----------------------------------------------------------------------
# Adapters: fixed-slot framework tensors -> protocol boxes.

def ground_truth_from_labels(labels: np.ndarray):
    """One label tensor (17, 6) -> (boxes_xywh, categories).

    Layout per vision_transformer_utilities.py:497-505: columns are
    (objectness, class, center_x, center_y, height, width) with empty
    slots marked objectness=0 / -8 elsewhere.
    """
    labels = np.asarray(labels, np.float64)
    mask = np.isclose(labels[:, 0], 1.0)
    rows = labels[mask]
    categories = np.round(rows[:, 1]).astype(np.int64)
    boxes = np.stack([rows[:, 2] - rows[:, 5] / 2.0,
                      rows[:, 3] - rows[:, 4] / 2.0,
                      rows[:, 5], rows[:, 4]], axis=-1)
    return boxes, categories


def detections_from_decoded(decoded: np.ndarray,
                            objectness_threshold: float = 0.0,
                            class_confidence_threshold: float = 0.0):
    """One decoded prediction tensor (17, 6) from
    ops.decode.transform_predictions -> (boxes_xywh, scores, categories).

    Default thresholds keep every slot — the protocol's score ranking
    already handles low-confidence detections, and COCO AP rewards
    returning them (pycocotools convention is NO score threshold). Pass
    the reference thresholds (0.5/0.5, vtd.py:1378-1384) to score only
    what the reference would draw.

    The ranking score is the framework's canonical detection score
    objectness * class_confidence (ops/nms.py detection_scores): a
    high-objectness slot whose class regression is ambiguous must not
    outrank a confident detection of the same category in the greedy
    match.
    """
    from .mean_average_precision import _class_confidence

    decoded = np.asarray(decoded, np.float64)
    objectness = decoded[:, 0]
    # The one host-side twin of ops.decode.classification_confidence —
    # shared with the streaming metric so the definition cannot drift
    # between the two scorers.
    class_conf = _class_confidence(decoded[:, 1])
    keep = (objectness > objectness_threshold) & (
        class_conf > class_confidence_threshold)
    rows = decoded[keep]
    boxes = np.stack([rows[:, 2] - rows[:, 5] / 2.0,
                      rows[:, 3] - rows[:, 4] / 2.0,
                      rows[:, 5], rows[:, 4]], axis=-1)
    scores = rows[:, 0] * class_conf[keep]
    return boxes, scores, np.round(rows[:, 1]).astype(np.int64)


def update_from_fixed_slots(evaluator: CocoEvaluator, labels: np.ndarray,
                            decoded: np.ndarray,
                            objectness_threshold: float = 0.0,
                            class_confidence_threshold: float = 0.0
                            ) -> None:
    """Feed a batch of (B, 17, 6) labels + decoded predictions."""
    labels = np.asarray(labels)
    decoded = np.asarray(decoded)
    if labels.shape != decoded.shape or labels.ndim != 3:
        raise ValueError(
            f"expected matching (B, slots, 6) tensors, got {labels.shape} "
            f"vs {decoded.shape}")
    for i in range(labels.shape[0]):
        gt_boxes, gt_categories = ground_truth_from_labels(labels[i])
        det_boxes, det_scores, det_categories = detections_from_decoded(
            decoded[i], objectness_threshold, class_confidence_threshold)
        evaluator.add_image(
            gt_boxes=gt_boxes, gt_categories=gt_categories,
            det_boxes=det_boxes, det_scores=det_scores,
            det_categories=det_categories)



def _protocol_summary(results: "CocoEvalResults",
                      per_category: bool) -> Dict[str, float]:
    out = results.summarize()
    if per_category:
        # str keys: this dict is routinely json.dump'd (CLI output).
        out["AP_per_category"] = {
            str(k): v for k, v in results.per_category().items()}
    return out


def evaluate_coco_protocol_original_frame(
        params, image_dir: str, annotations: dict, config,
        batch_size: int = 8, eval_step=None,
        objectness_threshold: float = 0.0,
        class_confidence_threshold: float = 0.0,
        images_range=None,
        dump_detections: Optional[str] = None,
        per_category: bool = False,
        fast_decode: bool = False,
        prefetch: int = 2) -> Dict[str, float]:
    """Official protocol in ORIGINAL image coordinates.

    ``dump_detections`` additionally writes every detection (pre-eval,
    original-frame pixels) to the given path in the standard COCO
    results format — ``[{"image_id", "category_id", "bbox": [x, y, w,
    h], "score"}, ...]`` with COCO category ids — so runs here can be
    re-scored with pycocotools (absent from this image) elsewhere.

    Ground truth comes straight from the annotation dict
    (``{image_id: [[coco_cat, cx, cy, h, w, area], ...]}``, original
    pixels — data/annotations.py), so areas are measured in the ORIGINAL
    frame (the letterboxed path measures them in the resized frame). The
    dict's area column is bbox w*h (the reference's convention,
    vtu.py:154-166), NOT COCO's segmentation area, so the
    small/medium/large buckets are original-frame *bbox-area* buckets —
    a thin object with a large bbox can land one bucket up from the
    official assignment; AP/AP50/AP75 ignore area and are unaffected.
    Use ``score_coco_results`` against a full instances JSON for the
    official segmentation-area buckets. Detections are
    inverse-letterboxed back to source pixels.

    Divergence note: the reference's dict format does not record
    ``iscrowd`` (vision_transformer_utilities.py:139-152 keeps only
    category/box/area), so crowd regions score as ordinary ground truth
    here — the same simplification the reference's own metric makes.

    Batches reach ``eval_step`` as **uint8** canvases (4x less
    host->device traffic; the default ``make_eval_step`` normalizes
    on-device via ``_maybe_normalize`` — same arithmetic, inputs within
    1 ulp of the host-normalized path). A custom ``eval_step`` that
    reads pixel values must handle uint8 input the same way.
    """
    import jax.numpy as jnp

    from ..data.annotations import letterbox_params as lb_params
    from ..data.categories import COCO_ID_TO_MODEL_ID, MODEL_ID_TO_COCO_ID
    from ..data.pipeline import (image_id_from_path, list_image_paths,
                                 load_and_letterbox_image)
    from ..train.trainer import make_eval_step

    if eval_step is None:
        eval_step = make_eval_step(config)
    paths = [p for p in list_image_paths(image_dir,
                                         images_range=images_range)
             if image_id_from_path(p) in annotations]
    if not paths:
        raise ValueError(
            f"no images under {image_dir!r} matched the annotation dict "
            "(check the directory and the file-naming convention)")
    evaluator = CocoEvaluator()
    dumped: List[dict] = []
    dump_tmp = None
    if dump_detections is not None:
        # Create the TEMP file BEFORE the (minutes-long at 5k images)
        # eval loop: a bad dump path must fail in milliseconds, not
        # after the whole run — but truncating the final path up front
        # would destroy a pre-existing dump if the run dies mid-loop,
        # so write to a sibling temp and os.replace at the end
        # (round-3 review findings, both directions).
        dump_tmp = dump_detections + ".tmp"
        open(dump_tmp, "w").close()
    mh, mw = config.image_size

    def _load_batches():
        for start in range(0, len(paths), batch_size):
            chunk = paths[start:start + batch_size]
            # normalize=False ships uint8 — 4x less host->device traffic
            # (35.5 -> 8.9 MB per 608px b8 batch); make_eval_step's
            # _maybe_normalize fuses the same [-1,1] arithmetic
            # (vtu.py:442-447) into the device program. XLA may compile
            # the /127.5 as multiply-by-reciprocal: inputs can differ
            # from the host-normalized path by <= 1 ulp (measured
            # 1.19e-7 max over all 256 byte values) — far below any
            # detection operating point.
            canvases, sizes = zip(*(load_and_letterbox_image(
                p, config, normalize=False, fast_decode=fast_decode)
                for p in chunk))
            yield chunk, np.stack(canvases), sizes

    batches = _load_batches()
    if prefetch:
        # Background-thread decode overlapping the device step's tunnel
        # round-trip (round-4 measured ~65% of the 4,952-image wall as
        # un-overlapped latency). prefetch=0 opts out for callers that
        # share their process with a training loop.
        from ..data.pipeline import prefetch_iter
        batches = prefetch_iter(batches, depth=prefetch)
    for chunk, canvases, sizes in batches:
        decoded = np.asarray(eval_step(params, jnp.asarray(canvases)))
        for i, path in enumerate(chunk):
            det_boxes, det_scores, det_categories = \
                detections_from_decoded(decoded[i], objectness_threshold,
                                        class_confidence_threshold)
            # Inverse letterbox: model frame -> source pixels.
            scale, blank_h, blank_w = lb_params(sizes[i], (mh, mw))
            det_boxes = det_boxes.copy()
            det_boxes[:, 0] = (det_boxes[:, 0] - blank_w) * scale
            det_boxes[:, 1] = (det_boxes[:, 1] - blank_h) * scale
            det_boxes[:, 2:] *= scale

            if dump_detections is not None:
                img_id = image_id_from_path(path)
                if str(img_id).isdigit():   # COCO ids are ints in results
                    img_id = int(img_id)
                for box, score, cat in zip(det_boxes, det_scores,
                                           det_categories):
                    dumped.append({
                        "image_id": img_id,
                        "category_id": MODEL_ID_TO_COCO_ID[int(cat)],
                        "bbox": [round(float(v), 2) for v in box],
                        "score": round(float(score), 5)})

            gt_boxes, gt_categories, gt_areas = [], [], []
            for row in annotations[image_id_from_path(path)]:
                coco_id = int(row[0])
                if coco_id not in COCO_ID_TO_MODEL_ID:
                    continue
                _, cx, cy, bh, bw, area = (float(v) for v in row[:6])
                gt_boxes.append((cx - bw / 2.0, cy - bh / 2.0, bw, bh))
                gt_categories.append(COCO_ID_TO_MODEL_ID[coco_id])
                gt_areas.append(area)
            evaluator.add_image(
                gt_boxes=np.asarray(gt_boxes, np.float64).reshape(-1, 4),
                gt_categories=gt_categories,
                gt_areas=gt_areas,
                det_boxes=det_boxes, det_scores=det_scores,
                det_categories=det_categories)
    if dump_tmp is not None:
        import json

        with open(dump_tmp, "w") as f:
            json.dump(dumped, f)
        os.replace(dump_tmp, dump_detections)
    return _protocol_summary(evaluator.evaluate(), per_category)


def evaluate_coco_protocol(params, dataset, config, eval_step=None,
                           objectness_threshold: float = 0.0,
                           class_confidence_threshold: float = 0.0,
                           per_category: bool = False
                           ) -> Dict[str, float]:
    """Official-protocol twin of train.trainer.evaluate_map: run the model
    over ``dataset`` and return the 12 standard COCO summary metrics."""
    import jax.numpy as jnp

    from ..train.trainer import make_eval_step

    if eval_step is None:
        eval_step = make_eval_step(config)
    evaluator = CocoEvaluator()
    for images, labels in dataset:
        decoded = eval_step(params, jnp.asarray(images))
        update_from_fixed_slots(
            evaluator, np.asarray(labels), np.asarray(decoded),
            objectness_threshold, class_confidence_threshold)
    return _protocol_summary(evaluator.evaluate(), per_category)


def score_coco_results(annotations_path: str, results_path: str,
                       evaluator: Optional[CocoEvaluator] = None,
                       per_category: bool = False) -> Dict[str, float]:
    """Score a standard COCO results JSON against ground truth — the
    pycocotools ``COCOeval(gt, dt, 'bbox').summarize()`` flow, standalone.

    ``annotations_path`` accepts either format this framework touches:

      * a full COCO instances JSON (``{"images", "annotations", ...}``):
        raw ``bbox``/``area``/``iscrowd`` are used directly, so crowd
        regions get the official ignore semantics (the reference's dict
        format cannot represent them — vtu.py:139-152 drops iscrowd),
      * the annotation-dict JSON (``{image_id: [[cat, cx, cy, h, w,
        area], ...]}``, data/annotations.py) as a fallback, without
        crowd information.

    ``results_path`` is the standard detections list
    ``[{"image_id", "category_id", "bbox": [x, y, w, h], "score"}, ...]``
    (what ``evaluate --dump-detections`` writes, and what any external
    detector exports for pycocotools).

    Images present in the ground truth but absent from the results still
    count (their ground truths are unmatched positives); detections for
    images with no ground-truth entry are dropped, as pycocotools
    restricts evaluation to the ground truth's image ids.
    """
    import json

    with open(annotations_path) as f:
        gt_payload = json.load(f)
    with open(results_path) as f:
        results = json.load(f)
    if not isinstance(results, list):
        raise ValueError(
            f"{results_path}: expected a COCO results LIST, got "
            f"{type(results).__name__}")

    det_by_image: Dict[object, list] = {}
    for det in results:
        det_by_image.setdefault(det["image_id"], []).append(det)

    if evaluator is None:
        evaluator = CocoEvaluator()

    def _add(image_key, gt_rows):
        # gt_rows: (boxes_xywh, categories, areas, iscrowd) arrays.
        dets = det_by_image.get(image_key, [])
        evaluator.add_image(
            gt_boxes=gt_rows[0], gt_categories=gt_rows[1],
            gt_areas=gt_rows[2], gt_iscrowd=gt_rows[3],
            det_boxes=[d["bbox"] for d in dets],
            det_scores=[d["score"] for d in dets],
            det_categories=[d["category_id"] for d in dets])

    if isinstance(gt_payload, dict) and "annotations" in gt_payload \
            and "images" in gt_payload:
        anns_by_image: Dict[object, list] = {}
        for ann in gt_payload["annotations"]:
            anns_by_image.setdefault(ann["image_id"], []).append(ann)
        for img in gt_payload["images"]:
            anns = anns_by_image.get(img["id"], [])
            _add(img["id"], (
                [a["bbox"] for a in anns],
                [a["category_id"] for a in anns],
                [a.get("area", a["bbox"][2] * a["bbox"][3])
                 for a in anns],
                [bool(a.get("iscrowd", 0)) for a in anns]))
    elif isinstance(gt_payload, dict):
        # Annotation-dict format: {image_id: [[cat, cx, cy, h, w, area]]}.
        # Results image_ids may be ints while dict keys are strings.
        for image_key, rows in gt_payload.items():
            key = int(image_key) if str(image_key).isdigit() else image_key
            _add(key if key in det_by_image else image_key, (
                [(r[1] - r[4] / 2.0, r[2] - r[3] / 2.0, r[4], r[3])
                 for r in rows],
                [int(r[0]) for r in rows],
                [float(r[5]) for r in rows],
                [False] * len(rows)))
    else:
        raise ValueError(
            f"{annotations_path}: expected a COCO instances JSON or an "
            "annotation-dict JSON")
    return _protocol_summary(evaluator.evaluate(), per_category)
