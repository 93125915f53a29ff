"""Anchor generation vs goldens extracted from the reference implementation
(reference retinanet/dataloader/anchor_generator.py; see
tools/generate_goldens.py for provenance)."""

import math
import os

import numpy as np
import pytest

from retinanet_tpu.data.anchors import AnchorGenerator

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens",
                       "reference_goldens.npz")

AREAS_5 = [1024.0, 4096.0, 16384.0, 65536.0, 262144.0]
RATIOS = [0.5, 1.0, 2.0]
SCALES = [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]


@pytest.fixture(scope="module")
def goldens():
    return np.load(GOLDENS)


def test_anchors_640_match_reference(goldens):
    gen = AnchorGenerator(640, 640, 3, 7, AREAS_5, RATIOS, SCALES)
    np.testing.assert_array_equal(
        gen.boundaries, goldens["boundaries_640"])
    np.testing.assert_allclose(
        gen.boxes, goldens["anchors_640"], rtol=1e-6, atol=1e-3)


def test_anchors_small_match_reference(goldens):
    gen = AnchorGenerator(64, 64, 3, 5, AREAS_5[:3], RATIOS, SCALES)
    np.testing.assert_array_equal(
        gen.boundaries, goldens["boundaries_small"])
    np.testing.assert_allclose(
        gen.boxes, goldens["anchors_small"], rtol=1e-6, atol=1e-3)


def test_anchor_count_640():
    gen = AnchorGenerator(640, 640, 3, 7, AREAS_5, RATIOS, SCALES)
    assert gen.total_anchors == 76725  # 80²·9 + 40²·9 + 20²·9 + 10²·9 + 5²·9


def test_anchor_areas_and_ratios():
    gen = AnchorGenerator(64, 64, 3, 5, AREAS_5[:3], RATIOS, SCALES)
    # first 9 anchors at level 3, cell (0,0): centers at stride/2
    first = np.asarray(gen.boxes[:9])
    np.testing.assert_allclose(first[:, 0], 4.0)
    np.testing.assert_allclose(first[:, 1], 4.0)
    # ratio-major, scale-minor ordering; w*h == area * scale²
    k = 0
    for ratio in RATIOS:
        for scale in SCALES:
            w, h = first[k, 2], first[k, 3]
            np.testing.assert_allclose(w * h, 1024.0 * scale ** 2, rtol=1e-5)
            np.testing.assert_allclose(w / h, ratio, rtol=1e-5)
            k += 1


def test_non_square_input():
    gen = AnchorGenerator(128, 64, 3, 5, AREAS_5[:3], RATIOS, SCALES)
    fh, fw = gen.feature_shapes[0]
    assert (fh, fw) == (16, 8)
    assert gen.total_anchors == sum(
        math.ceil(128 / 2 ** l) * math.ceil(64 / 2 ** l) * 9
        for l in (3, 4, 5))
