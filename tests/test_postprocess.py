"""Homography estimation test for the offline postprocess tool."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from color_transfer_tpu.tools.postprocess import estimate_homography


class TestHomography:
    def test_sift_recovers_known_transform(self, rng):
        # Textured synthetic scene.
        base = (rng.uniform(0, 1, (240, 320)) > 0.5).astype(np.uint8) * 255
        base = cv2.GaussianBlur(base, (5, 5), 1.5)
        img = cv2.merge([base, base, base])

        h_true = np.array(
            [[1.02, 0.01, 4.0], [-0.015, 0.99, -3.0], [1e-5, -2e-5, 1.0]]
        )
        warped = cv2.warpPerspective(img, h_true, (320, 240))

        h_est = estimate_homography(warped, img)  # maps warped -> original
        # Compare by applying to sample points (h_est should invert h_true).
        pts = np.array([[60, 60], [260, 60], [160, 180]], dtype=np.float32)
        back = cv2.perspectiveTransform(
            cv2.perspectiveTransform(pts[None], h_true), h_est
        )[0]
        assert np.abs(back - pts).max() < 1.5
