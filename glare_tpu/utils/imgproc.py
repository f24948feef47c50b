"""Image IO and the exact GLARE preprocessing chain.

Covers the preprocessing details that move PSNR by whole dB when missed
(SURVEY.md hard part #4):

  * BGR->RGB reads (reference: infer_dataset_lol.py:50-51)
  * reflect padding (``impad``; infer_dataset_lol.py:71-72)
  * log-domain transform ``log(clamp(x + 1e-3, 1e-3))``
    (LoL_dataset.py:493-494, infer_dataset_lol.py:127-128)
  * per-channel histogram equalization (hiseq_color_cv2_img;
    infer_dataset_lol.py:74-80)
  * pad-to-multiple inference (``auto_padding``; infer_unpaired.py:81-88)
"""

from __future__ import annotations

import os

import cv2
import numpy as np


def imread(path):
    """Read as RGB HWC uint8 (reference flips BGR->RGB by index)."""
    img = cv2.imread(path)
    if img is None:
        raise IOError(f"Failed to read image: {path}")
    return img[:, :, [2, 1, 0]]


def imwrite(path, img_rgb):
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    ok = cv2.imwrite(path, np.asarray(img_rgb)[:, :, [2, 1, 0]])
    if not ok:
        raise IOError(f"Failed to write image: {path}")


def impad(img, top=0, bottom=0, left=0, right=0):
    """Reflect-pad HWC (reference: infer_dataset_lol.py:71-72)."""
    return np.pad(img, [(top, bottom), (left, right), (0, 0)], "reflect")


def auto_padding(img, times=16):
    """Reflect-pad HWC to a multiple of `times`; returns (padded, [h1,h2,w1,w2])
    (reference: infer_unpaired.py:81-88)."""
    h, w, _ = img.shape
    h1, w1 = (times - h % times) // 2, (times - w % times) // 2
    h2, w2 = (times - h % times) - h1, (times - w % times) - w1
    img = cv2.copyMakeBorder(img, h1, h2, w1, w2, cv2.BORDER_REFLECT)
    return img, [h1, h2, w1, w2]


def hiseq_color_cv2_img(img):
    """Per-channel histogram equalization (reference: infer_dataset_lol.py:74-80)."""
    b, g, r = cv2.split(img)
    bH = cv2.equalizeHist(b)
    gH = cv2.equalizeHist(g)
    rH = cv2.equalizeHist(r)
    return cv2.merge((bH, gH, rH))


def log_transform(x, eps=1e-3):
    """``log(clamp(x + eps, eps))`` on float arrays in [0,1]
    (reference: LoL_dataset.py:493-494)."""
    return np.log(np.clip(np.asarray(x, np.float32) + eps, eps, None))


def to_float01(img_uint8):
    return np.asarray(img_uint8).astype(np.float32) / 255.0


def to_nhwc_batch(img_hwc):
    """HWC float -> 1HWC float32 batch."""
    return np.expand_dims(np.asarray(img_hwc, np.float32), axis=0)


def from_nhwc_batch(x):
    """1HWC -> HWC numpy, clipped to [0,1]."""
    x = np.asarray(x)
    if x.ndim == 4:
        x = x[0]
    return np.clip(x, 0.0, 1.0)


def random_resize(img, scale_factor=1.0):
    return cv2.resize(img, None, fx=scale_factor, fy=scale_factor, interpolation=cv2.INTER_CUBIC)
