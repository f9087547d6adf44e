"""Image IO and drawing helpers (OpenCV, host-side).

Covers the reference's tracklab/utils/cv2.py:52-430 surface: file and
``vid://path:frame`` virtual-frame loading with an LRU-cached VideoReader,
plus bbox/keypoint/skeleton/text drawing used by the visualizers.
"""
from __future__ import annotations

import functools
import logging

import numpy as np

log = logging.getLogger(__name__)

__all__ = ["cv2_load_image", "VideoReader", "draw_bbox", "draw_keypoints",
           "draw_text", "draw_heatmap", "crop_bbox",
           "register_virtual_renderer"]


class VideoReader:
    """Random-access frame reader over a video file (cv2.py VideoReader)."""

    def __init__(self, filename: str):
        import cv2
        self.filename = filename
        self.cap = cv2.VideoCapture(filename)
        if not self.cap.isOpened():
            raise FileNotFoundError(filename)
        self.num_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self._pos = 0

    def __getitem__(self, idx: int):
        import cv2
        if idx != self._pos:
            self.cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
        ok, frame = self.cap.read()
        if not ok:
            raise IndexError(f"frame {idx} of {self.filename}")
        self._pos = idx + 1
        return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)


@functools.lru_cache(maxsize=8)
def _video_reader(path: str) -> VideoReader:
    return VideoReader(path)


_VIRTUAL_RENDERERS: dict = {}


def register_virtual_renderer(scheme: str, fn):
    """Register a loader for ``{scheme}://rest`` virtual image paths
    (e.g. the synthetic dataset renders its frames procedurally). ``fn``
    takes the path remainder and returns an RGB uint8 array."""
    _VIRTUAL_RENDERERS[scheme] = fn


def cv2_load_image(file_path) -> np.ndarray:
    """Load an RGB image from a file path, a ``vid://path:frame`` virtual
    frame reference (cv2.py:52-72), or a registered virtual scheme."""
    import cv2
    file_path = str(file_path)
    if file_path.startswith("vid://"):
        rest = file_path[len("vid://"):]
        path, frame = rest.rsplit(":", 1)
        return _video_reader(path)[int(frame)]
    if "://" in file_path:
        scheme, _, rest = file_path.partition("://")
        if scheme in _VIRTUAL_RENDERERS:
            return _VIRTUAL_RENDERERS[scheme](rest)
    image = cv2.imread(file_path)
    if image is None:
        raise FileNotFoundError(file_path)
    return cv2.cvtColor(image, cv2.COLOR_BGR2RGB)


def crop_bbox(image: np.ndarray, bbox_ltwh, pad: int = 0) -> np.ndarray:
    """Crop a ltwh box out of an image with clamping."""
    h, w = image.shape[:2]
    l, t, bw, bh = np.asarray(bbox_ltwh, float)
    x1 = int(max(l - pad, 0))
    y1 = int(max(t - pad, 0))
    x2 = int(min(l + bw + pad, w))
    y2 = int(min(t + bh + pad, h))
    if x2 <= x1 or y2 <= y1:
        return np.zeros((1, 1, image.shape[2]), image.dtype)
    return image[y1:y2, x1:x2]


def draw_bbox(image, bbox_ltwh, color=(0, 255, 0), thickness=2, text=None,
              text_color=(255, 255, 255)):
    import cv2
    l, t, w, h = [int(round(float(v))) for v in bbox_ltwh]
    cv2.rectangle(image, (l, t), (l + w, t + h), color, thickness)
    if text is not None:
        draw_text(image, text, (l, max(t - 6, 12)), color=text_color,
                  bg_color=color)
    return image


def draw_text(image, text, org, scale=0.5, color=(255, 255, 255),
              thickness=1, bg_color=None):
    import cv2
    if bg_color is not None:
        (tw, th), baseline = cv2.getTextSize(
            str(text), cv2.FONT_HERSHEY_SIMPLEX, scale, thickness)
        x, y = org
        cv2.rectangle(image, (x, y - th - baseline),
                      (x + tw, y + baseline), bg_color, -1)
    cv2.putText(image, str(text), org, cv2.FONT_HERSHEY_SIMPLEX, scale,
                color, thickness, cv2.LINE_AA)
    return image


# COCO-17 skeleton (pairs of keypoint indices)
COCO_SKELETON = [
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6),
]


def draw_keypoints(image, keypoints_xyc, color=(0, 255, 0), radius=3,
                   threshold=0.0, skeleton=True):
    import cv2
    kp = np.asarray(keypoints_xyc, float)
    vis = kp[:, 2] > threshold if kp.shape[1] > 2 else \
        np.ones(len(kp), bool)
    if skeleton and len(kp) == 17:
        for a, b in COCO_SKELETON:
            if a < len(kp) and b < len(kp) and vis[a] and vis[b]:
                cv2.line(image, (int(kp[a, 0]), int(kp[a, 1])),
                         (int(kp[b, 0]), int(kp[b, 1])), color, 1,
                         cv2.LINE_AA)
    for i, (x, y) in enumerate(kp[:, :2]):
        if vis[i]:
            cv2.circle(image, (int(x), int(y)), radius, color, -1,
                       cv2.LINE_AA)
    return image


def draw_heatmap(image, heatmap, alpha: float = 0.5,
                 colormap: int | None = None):
    """Overlay a (h, w) float heatmap on an RGB image
    (reference: tracklab/utils/cv2.py heatmap drawing). The heatmap is
    normalized to [0, 1], resized to the image, colorized (JET) and
    alpha-blended."""
    import cv2
    hm = np.asarray(heatmap, np.float32)
    lo, hi = float(hm.min()), float(hm.max())
    hm = (hm - lo) / (hi - lo) if hi > lo else np.zeros_like(hm)
    hm = cv2.resize(hm, (image.shape[1], image.shape[0]))
    cmap = cv2.COLORMAP_JET if colormap is None else colormap
    colored = cv2.applyColorMap((hm * 255).astype(np.uint8), cmap)
    colored = cv2.cvtColor(colored, cv2.COLOR_BGR2RGB)
    out = (image.astype(np.float32) * (1 - alpha * hm[..., None])
           + colored.astype(np.float32) * (alpha * hm[..., None]))
    return out.astype(np.uint8)
