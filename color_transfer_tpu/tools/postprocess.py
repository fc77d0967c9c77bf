"""Real-world stereo-mismatch dataset construction (offline, host-side).

Re-implementation of the reference's postprocessing pipeline
(reference utils/postprocess.py:25-144): per sample, three beam-splitter
videos (left / left_gt / right) are frame-synced by ``params.json`` offsets,
the mirror-rig left view is horizontally flipped (:96-97), homographies are
estimated on frame 0 (left->left_gt and right->left_gt, :121-123), every
``rate``-th frame is bbox-cropped, warped, re-cropped (:127-136), and the
right view is color-aligned to left_gt with the Monge-Kantorovitch transfer
(:138) before writing ``NNNN_{LD,L,R}.png`` triplets (:140-144).

Deviations (this image has no skimage/kornia):
  * Feature matching uses OpenCV SIFT + BF ratio matching instead of
    skimage SIFT (reference :36-51); same keypoint pipeline, same
    USAC-MAGSAC homography estimation.
  * LoFTR (reference :53-66) is used when kornia is importable; otherwise
    the right->left_gt homography falls back to SIFT with a warning.
  * MKCT runs through this framework's jitted implementation.

This is offline CPU tooling, not in the serving path (SURVEY.md §7 phase 6).
"""

import argparse
import json
from pathlib import Path

import numpy as np

import cv2

from color_transfer_tpu.methods.linear import monge_kantorovitch


def estimate_homography(target, reference, method="SIFT"):
    """Homography mapping target -> reference (uint8 BGR frames)."""
    if method == "SIFT":
        sift = cv2.SIFT_create()
        kp_t, des_t = sift.detectAndCompute(
            cv2.cvtColor(target, cv2.COLOR_BGR2GRAY), None
        )
        kp_r, des_r = sift.detectAndCompute(
            cv2.cvtColor(reference, cv2.COLOR_BGR2GRAY), None
        )
        matcher = cv2.BFMatcher()
        matches = matcher.knnMatch(des_t, des_r, k=2)
        good = [m for m, n in matches if m.distance < 0.75 * n.distance]
        if len(good) < 8:
            raise RuntimeError(f"too few SIFT matches: {len(good)}")
        pts_t = np.float32([kp_t[m.queryIdx].pt for m in good])
        pts_r = np.float32([kp_r[m.trainIdx].pt for m in good])
    elif method == "LOFTR":
        try:
            import torch
            from kornia.feature import LoFTR
        except ImportError:
            print("[postprocess] kornia LoFTR unavailable; falling back to SIFT")
            return estimate_homography(target, reference, method="SIFT")
        scale = np.array([target.shape[1] / 512, target.shape[0] / 512])
        t_small = cv2.resize(cv2.cvtColor(target, cv2.COLOR_BGR2GRAY), (512, 512))
        r_small = cv2.resize(cv2.cvtColor(reference, cv2.COLOR_BGR2GRAY), (512, 512))
        matcher = LoFTR(pretrained="indoor")
        with torch.no_grad():
            out = matcher(
                {
                    "image0": torch.from_numpy(t_small)[None, None].float() / 255,
                    "image1": torch.from_numpy(r_small)[None, None].float() / 255,
                }
            )
        pts_t = out["keypoints0"].numpy() * scale
        pts_r = out["keypoints1"].numpy() * scale
    else:
        raise ValueError(f"Unknown method: {method}")

    homography, _ = cv2.findHomography(pts_t, pts_r, method=cv2.USAC_MAGSAC)
    return homography


def iter_frames(sample_dir, params, num_frames):
    """Synced (idx, left, left_gt, right) frames; the mirror-rig left view is
    flipped horizontally."""
    caps = {
        name: cv2.VideoCapture(str(sample_dir / f"{name}.mp4"))
        for name in ["left", "left_gt", "right"]
    }
    if not all(cap.isOpened() for cap in caps.values()):
        raise RuntimeError(f"cannot open source videos in {sample_dir}")

    for name, cap in caps.items():
        cap.set(
            cv2.CAP_PROP_POS_FRAMES,
            params["offsets"]["all"] + params["offsets"][name],
        )

    for idx in range(num_frames):
        ok_l, left = caps["left"].read()
        ok_g, left_gt = caps["left_gt"].read()
        ok_r, right = caps["right"].read()
        if not (ok_l and ok_g and ok_r):
            break
        yield idx, cv2.flip(left, 1), left_gt, right

    for cap in caps.values():
        cap.release()


def process_sample(sample_dir, out_dir, rate=10, num_frames=7):
    with open(sample_dir / "params.json") as f:
        params = json.load(f)
    bbox = params["bbox"]
    x, y, w, h = bbox["x"], bbox["y"], bbox["w"], bbox["h"]

    out_dir.mkdir(parents=True, exist_ok=True)
    h1 = h2 = None
    for idx, left, left_gt, right in iter_frames(sample_dir, params, num_frames * rate):
        if idx == 0:
            h1 = estimate_homography(left, left_gt)
            h2 = estimate_homography(right, left_gt, method="LOFTR")
        elif idx % rate != 0:
            continue

        def crop(img):
            return img[y : y + h, x : x + w]

        left_c, gt_c, right_c = crop(left), crop(left_gt), crop(right)
        left_c = cv2.warpPerspective(left_c, h1, (left_c.shape[1], left_c.shape[0]))
        right_c = cv2.warpPerspective(right_c, h2, (right_c.shape[1], right_c.shape[0]))
        # Reference quirks reproduced deliberately (the published dataset
        # was built this way, reference utils/postprocess.py:121-136):
        # the homographies are estimated on FULL frames but applied to the
        # cropped ones without conjugating by the crop translation, and the
        # bbox crop is re-applied after warping (truncating by (y, x)
        # again). "Fixing" either would misalign us with the shipped data.
        left_c, gt_c, right_c = crop(left_c), crop(gt_c), crop(right_c)

        aligned = np.asarray(
            monge_kantorovitch(
                right_c.astype(np.float32) / 255.0, gt_c.astype(np.float32) / 255.0
            )
        )
        right_c = (np.clip(aligned, 0, 1) * 255).round().astype(np.uint8)

        stem = f"{idx // rate:04d}"
        cv2.imwrite(str(out_dir / f"{stem}_LD.png"), left_c)
        cv2.imwrite(str(out_dir / f"{stem}_L.png"), gt_c)
        cv2.imwrite(str(out_dir / f"{stem}_R.png"), right_c)


def main():
    parser = argparse.ArgumentParser(description="Process all dataset samples")
    parser.add_argument("--root", required=True, help="folder with raw samples")
    parser.add_argument("--output", required=True, help="output folder")
    parser.add_argument("--samples", help="comma-separated subset of samples")
    parser.add_argument("--rate", type=int, default=10, help="use every rate-th frame")
    parser.add_argument("--frames", type=int, default=7, help="frames per sample")
    args = parser.parse_args()

    root = Path(args.root)
    samples = args.samples.split(",") if args.samples else sorted(
        p.name for p in root.iterdir() if p.is_dir()
    )
    for sample in samples:
        print(f"[postprocess] {sample}")
        process_sample(root / sample, Path(args.output) / sample, args.rate, args.frames)


if __name__ == "__main__":
    main()
