"""COCO-style annotation reading: boxes, occlusion flags, instance masks.

Fills the reference's acknowledged gap: its yield evaluation runs on a
``DummyYieldDataset`` of random boxes because "the real dataset path" is
missing (``experiments/yield_estimation_performance.py:47-79``), and its
shape loss's intended per-instance path (``model/unet/shape_loss.py:150-180``)
has no data source. This module provides both from one standard format:

- :class:`CocoAnnotations` — a dependency-free reader of the COCO detection
  JSON layout (``images`` / ``annotations`` / ``categories``), supporting
  polygon segmentations (rasterized with cv2) and bbox-only annotations
  (rasterized as rectangles). Occlusion comes from ``attributes.occluded``
  (CVAT-style) or ``iscrowd``.
- :class:`YieldImageDataset` — real image files + annotations in the exact
  item schema the reference's Dummy dataset established:
  ``(image_u8 HWC, count, [{"bbox": xyxy, "class_id", "occluded"}, ...])``.

Everything is host-side numpy (annotation decode is I/O, not accelerator
work); instance masks are padded to a static ``max_instances`` so the device
side stays shape-static.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["CocoAnnotations", "YieldImageDataset", "write_coco_json"]


class CocoAnnotations:
    """Parsed COCO-format annotation file (detection layout)."""

    def __init__(self, ann_file: str):
        with open(ann_file) as f:
            data = json.load(f)
        self.images: Dict[int, Dict[str, Any]] = {im["id"]: im for im in data.get("images", [])}
        self.file_to_id: Dict[str, int] = {
            os.path.basename(im["file_name"]): im["id"] for im in self.images.values()
        }
        self.by_image: Dict[int, List[Dict[str, Any]]] = {i: [] for i in self.images}
        for ann in data.get("annotations", []):
            self.by_image.setdefault(ann["image_id"], []).append(ann)
        self.categories = {c["id"]: c.get("name", str(c["id"])) for c in data.get("categories", [])}

    def id_for_file(self, path_or_name: str) -> Optional[int]:
        return self.file_to_id.get(os.path.basename(path_or_name))

    @staticmethod
    def _occluded(ann: Dict[str, Any]) -> bool:
        if ann.get("iscrowd", 0):
            return True
        attrs = ann.get("attributes") or {}
        return bool(attrs.get("occluded", False))

    def objects_for(self, image_id: int) -> List[Dict[str, Any]]:
        """Per-object dicts in the yield-metric schema (xyxy pixel boxes in
        the original image frame; reference ``yield_estimation_performance.py``
        lines 52-79)."""
        out = []
        for ann in self.by_image.get(image_id, []):
            x, y, w, h = ann["bbox"]
            out.append(
                {
                    "bbox": [float(x), float(y), float(x + w), float(y + h)],
                    "class_id": int(ann.get("category_id", 0)),
                    "occluded": self._occluded(ann),
                }
            )
        return out

    def instance_masks_for(
        self,
        image_id: int,
        out_hw: Optional[Tuple[int, int]] = None,
        max_instances: Optional[int] = None,
    ) -> np.ndarray:
        """(O, H, W) uint8 instance masks for one image.

        Polygon segmentations rasterize exactly (cv2.fillPoly); bbox-only
        annotations rasterize as filled rectangles. ``out_hw`` resizes
        (nearest) from the annotation frame; ``max_instances`` pads/truncates
        the O axis to a static size (largest instances kept).
        """
        import cv2

        im = self.images[image_id]
        h, w = int(im["height"]), int(im["width"])
        masks = []
        for ann in self.by_image.get(image_id, []):
            m = np.zeros((h, w), np.uint8)
            seg = ann.get("segmentation")
            if seg and isinstance(seg, list) and len(seg) and isinstance(seg[0], (list, tuple)):
                polys = [
                    np.round(np.asarray(p, np.float64).reshape(-1, 2)).astype(np.int32)
                    for p in seg
                    if len(p) >= 6
                ]
                if polys:
                    cv2.fillPoly(m, polys, 1)
            if not m.any():
                x, y, bw, bh = ann["bbox"]
                x0, y0 = max(0, int(round(x))), max(0, int(round(y)))
                x1, y1 = min(w, int(round(x + bw))), min(h, int(round(y + bh)))
                m[y0:y1, x0:x1] = 1
            masks.append(m)
        if out_hw is not None and tuple(out_hw) != (h, w):
            masks = [
                cv2.resize(m, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_NEAREST)
                for m in masks
            ]
            h, w = out_hw
        if not masks:
            stack = np.zeros((0, h, w), np.uint8)
        else:
            stack = np.stack(masks)
        if max_instances is not None:
            if stack.shape[0] > max_instances:
                order = np.argsort(-stack.reshape(stack.shape[0], -1).sum(1))
                stack = stack[order[:max_instances]]
            elif stack.shape[0] < max_instances:
                pad = np.zeros((max_instances - stack.shape[0], h, w), np.uint8)
                stack = np.concatenate([stack, pad], axis=0)
        return stack


class YieldImageDataset:
    """Real-file yield dataset: images + COCO annotations, Dummy-schema items.

    ``__getitem__(i) -> (image_u8 HWC original size, gt_count,
    objects[{"bbox" xyxy, "class_id", "occluded"}])`` — drop-in replacement
    for the reference's ``DummyYieldDataset`` (schema at
    ``yield_estimation_performance.py:52-79``) backed by actual files.
    """

    IMAGE_EXTS = ("*.png", "*.jpg", "*.jpeg")

    def __init__(self, image_dir: str, ann_file: str):
        from mingraph_unet_tpu.data.dataset import load_image_rgb

        self._load = load_image_rgb
        self.ann = CocoAnnotations(ann_file)
        paths = sorted(
            p for ext in self.IMAGE_EXTS for p in glob.glob(os.path.join(image_dir, ext))
        )
        self.items = [(p, self.ann.id_for_file(p)) for p in paths]
        self.items = [(p, i) for p, i in self.items if i is not None]
        if not self.items:
            raise FileNotFoundError(
                f"No annotated images found ({image_dir!r} vs {ann_file!r})"
            )

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int):
        path, image_id = self.items[idx]
        img = self._load(path)
        objects = self.ann.objects_for(image_id)
        return img, len(objects), objects

    def instance_masks(self, idx: int, out_hw=None, max_instances=None) -> np.ndarray:
        _, image_id = self.items[idx]
        return self.ann.instance_masks_for(image_id, out_hw, max_instances)


def write_coco_json(
    path: str,
    images: Sequence[Dict[str, Any]],
    annotations: Sequence[Dict[str, Any]],
    categories: Optional[Sequence[Dict[str, Any]]] = None,
) -> str:
    """Write a minimal COCO detection JSON (test/bootstrap helper)."""
    data = {
        "images": list(images),
        "annotations": list(annotations),
        "categories": list(categories or [{"id": 0, "name": "mango"}]),
    }
    with open(path, "w") as f:
        json.dump(data, f)
    return path
