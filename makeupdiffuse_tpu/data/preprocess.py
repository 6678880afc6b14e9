"""Host-side face preprocessing — PreProcess parity, minus torch.

Capability parity: /root/reference/diffdata/preprocessing.py:16-181:
  * load_mask: grayscale PIL → nearest-resize to img_size (:81-85)
  * mask_process → 4-channel [lip, face(+brows), eye_l, eye_r] (:55-73) — device-side
    version lives in ops/masks.py; this module provides the numpy twin for loaders
  * landmark cache load/save as .npy (:122-128) + the lip de-duplication fix (:98-106)
  * diff_process: positional field meshgrid − lms, (h, w, 136) here (NHWC) (:109-120)
  * full detect→crop→parse path (:131-169) gated on the optional dlib/BiSeNet stage
    (data/faceparse.py); the reference caches landmarks offline exactly so the device
    pipeline never sees dynamic shapes — we keep that pattern.

Everything returns numpy; DataLoader workers stay off the TPU.
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np
from PIL import Image

# BiSeNet face-parse palette used by the reference masks
# (preprocessing.py:53-54): 0 bg, 1 face, 2/3 brows, 4/5 eyes, 6 nose, 7 u-lip,
# 8 teeth, 9 l-lip, 10 hair, 11/12 ears, 13 neck
LIP_CLASS = (7, 9)
FACE_CLASS = (1, 6)
EYEBROW_CLASS = (2, 3)
EYE_CLASS = (4, 5)


def load_image(path: str, img_size: int = 256) -> np.ndarray:
    """RGB image → [img_size², 3] float32 in [-1, 1] (transforms.Compose parity:
    Resize + ToTensor + Normalize(0.5, 0.5), preprocessing.py:47-50).

    Resize+normalize runs in the native host library when built
    (native/mdt_host.cc), PIL otherwise."""
    from ..utils import native

    img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
    return native.resize_normalize(img, img_size)


def load_image_batch(paths, img_size: int = 256) -> np.ndarray:
    """Batch variant of load_image: decode sequentially, then fan the
    resize+normalize across the native worker pool (utils.native.BatchExecutor)
    into one contiguous [B, img_size², 3] array — one device_put per batch."""
    from ..utils import native

    imgs = [np.asarray(Image.open(p).convert("RGB"), np.uint8) for p in paths]
    return native.batch_executor().resize_normalize(imgs, img_size)


def load_mask(path: str, img_size: int = 256) -> np.ndarray:
    """Grayscale label map → [img_size²] int32 via NEAREST (load_mask :81-85)."""
    from ..utils import native

    m = np.asarray(Image.open(path).convert("L"), np.uint8)
    return native.resize_labels(m, img_size)


def load_seg(path: str, img_size: int = 256) -> np.ndarray:
    """scgan_segs label map (reference resizes with INTER_AREA, datasets.py:629-631;
    we use NEAREST, which preserves label identity)."""
    return load_mask(path, img_size)


def mask_channels(mask: np.ndarray) -> np.ndarray:
    """4-channel [lip, face(+brows), eye_l, eye_r], numpy twin of
    ops.masks.preprocess_mask_channels. mask [H,W] → [H,W,4] float32."""
    def sel(classes):
        out = np.zeros(mask.shape, np.float32)
        for c in classes:
            out += (mask == c)
        return np.clip(out, 0, 1)

    lip = sel(LIP_CLASS)
    face = sel(FACE_CLASS + EYEBROW_CLASS)
    return np.stack([lip, face, sel((EYE_CLASS[0],)), sel((EYE_CLASS[1],))], axis=-1)


def fix_lip_landmarks(lms: np.ndarray) -> np.ndarray:
    """Distinguish coincident upper/lower-lip points (preprocessing.py:98-106)."""
    lms = lms.copy()
    lms[61:64, 0] -= 1
    lms[65:68, 0] += 1
    for i in range(3):
        if np.abs(lms[61 + i] - lms[67 - i]).sum() == 0:
            lms[61 + i, 0] -= 1
            lms[67 - i, 0] += 1
    return lms


def load_lms(path: str) -> np.ndarray:
    return np.load(path).astype(np.int32)


def save_lms(lms: np.ndarray, path: str) -> None:
    np.save(path, lms)


def diff_field(lms: np.ndarray, img_size: int = 256) -> np.ndarray:
    """Landmark-relative positional field: fix − lms, [H, W, 2K] float32 (NHWC twin
    of diff_process :109-120, where fix stacks [ys, xs] per landmark)."""
    k = lms.shape[0]
    ys, xs = np.meshgrid(
        np.linspace(0, img_size - 1, img_size),
        np.linspace(0, img_size - 1, img_size),
        indexing="ij",
    )
    # reference layout: first K channels ys−lms_y? fix = concat([ys-grid repeated K],
    # [xs-grid repeated K]) minus lms reshaped (136,1,1): channels 0..K-1 are
    # ys − lms[:,0], channels K..2K-1 are xs − lms[:,1]
    fix = np.concatenate(
        [np.repeat(ys[None], k, 0), np.repeat(xs[None], k, 0)], axis=0
    ).astype(np.float32)
    lms_flat = lms.T.reshape(-1, 1, 1).astype(np.float32)  # (2K,1,1): [ys..., xs...]
    diff = fix - lms_flat
    return np.moveaxis(diff, 0, -1)  # (H, W, 2K)


def crop_face(
    image: np.ndarray,
    face_box: Tuple[int, int, int, int],
    up_ratio: float = 0.6 / 0.85,
    down_ratio: float = 0.2 / 0.85,
    width_ratio: float = 0.2 / 0.85,
) -> Tuple[np.ndarray, Tuple[int, int, int, int]]:
    """Face-box-relative crop — futils.dlib.crop geometry (used at
    preprocessing.py:141-143 with the same default ratios :18): expand the detector
    box by up/down/width fractions of its height/width, clip to the image.

    image: [H,W,3] uint8; face_box: (left, top, right, bottom) from ANY detector
    (dlib when present, an external service, or manual annotation). Returns the
    cropped image and the face box in crop coordinates."""
    h, w = image.shape[:2]
    left, top, right, bottom = face_box
    fw, fh = right - left, bottom - top
    x0 = int(max(0, left - width_ratio * fw))
    x1 = int(min(w, right + width_ratio * fw))
    y0 = int(max(0, top - up_ratio * fh))
    y1 = int(min(h, bottom + down_ratio * fh))
    crop = image[y0:y1, x0:x1]
    return crop, (left - x0, top - y0, right - x0, bottom - y0)


class FacePipeline:
    """The full PreProcess.preprocess path (preprocessing.py:131-175): detect →
    crop → parse at 512² → landmarks → (image, mask, diff, lms), with the detector
    and landmark stages pluggable (dlib is an optional host dependency; production
    uses the offline lms/*.npy cache exactly like the reference)."""

    def __init__(self, face_parser=None, detector=None, landmarker=None,
                 img_size: int = 256, parse_fallback: bool = False):
        self.img_size = img_size
        self.face_parser = face_parser
        self.detector = detector
        self.landmarker = landmarker
        # parse_fallback=True: with a face_parser but no detector/landmarker,
        # derive the face box and APPROXIMATE 68-point landmarks from the BiSeNet
        # parse itself (faceparse.face_box_from_parse / landmarks_from_parse) so a
        # raw uint8 image processes end-to-end with zero external assets. The
        # reference refuses without dlib (preprocessing.py:89-94); this degrades
        # gracefully instead — flag-gated because the landmarks are approximate.
        self.parse_fallback = parse_fallback

    def _parse_resized(self, image: np.ndarray) -> np.ndarray:
        """Parse any-size uint8 RGB at the parser's native 512² → [512,512] int32."""
        big = np.asarray(
            Image.fromarray(image).resize((512, 512), Image.BILINEAR))
        return self.face_parser.parse(big)

    def __call__(self, image: np.ndarray, face_box=None, lms=None):
        """image uint8 [H,W,3]. Returns (image [-1,1], mask_full, diff, lms) or None
        when no face is found."""
        from ..utils import native

        if face_box is None:
            if self.detector is not None:
                boxes = self.detector(image)
                if not boxes:
                    return None
                face_box = boxes[0]
            elif self.parse_fallback and self.face_parser is not None:
                from .faceparse import face_box_from_parse

                face_box = face_box_from_parse(self._parse_resized(image))
                if face_box is None:
                    return None
                # parse ran at 512²; rescale the box to image coordinates
                sy = image.shape[0] / 512.0
                sx = image.shape[1] / 512.0
                face_box = (int(face_box[0] * sx), int(face_box[1] * sy),
                            int(face_box[2] * sx), int(face_box[3] * sy))
            else:
                return None
        crop, face_in_crop = crop_face(image, face_box)
        if self.face_parser is not None:
            from PIL import Image as PILImage

            big = np.asarray(
                PILImage.fromarray(crop).resize((512, 512), PILImage.BILINEAR)
            )
            mask512 = self.face_parser.parse(big)
            mask = native.resize_labels(mask512.astype(np.uint8), self.img_size)
        else:
            mask = np.zeros((self.img_size, self.img_size), np.int32)
        if lms is None:
            if self.landmarker is not None:
                lms = self.landmarker(crop, face_in_crop)
                lms = (lms * self.img_size / crop.shape[1]).round().astype(np.int32)
            elif self.parse_fallback and self.face_parser is not None:
                from .faceparse import landmarks_from_parse

                lms = landmarks_from_parse(mask).round().astype(np.int32)
            else:
                return None
            lms = np.clip(lms, 0, self.img_size - 1)
            lms = fix_lip_landmarks(lms)
        img = native.resize_normalize(crop, self.img_size)
        return img, mask_channels(mask), diff_field(lms, self.img_size), lms


def process(
    image_path: str,
    mask_path: str,
    lms_path: str,
    img_size: int = 256,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """The reference's PreProcess.process on cached artifacts
    (load_from_file, datasets.py:607-612): → (image [-1,1], mask_full [H,W,4],
    diff [H,W,136], lms [68,2])."""
    image = load_image(image_path, img_size)
    mask = load_mask(mask_path, img_size)
    lms = load_lms(lms_path)
    return image, mask_channels(mask), diff_field(lms, img_size), lms
