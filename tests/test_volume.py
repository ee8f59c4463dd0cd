"""Tests for volume/patch utilities (`dnmf_tpu/utils/volume.py`).

Covers the reference `WUtils/Utils.py` contract, in particular the
subpixel `subcube` path: the reference resamples with
`scipy.ndimage.affine_transform(patch, eye(3), offset=loc_r-loc)`
(/root/reference/WUtils/Utils.py:38,42) whose default interpolation is a
cubic (order-3) spline — gated here against that exact call.
"""

import numpy as np
import pytest
from scipy.ndimage import affine_transform

from dnmf_tpu.utils.volume import (
    max_project,
    pairwise_distances,
    placement,
    subcube,
    superpose,
)


@pytest.fixture
def volume():
    rng = np.random.default_rng(7)
    return rng.random((12, 11, 6)).astype(np.float64)


def test_subcube_integer_center_is_a_plain_window(volume):
    patch = subcube(volume, np.array([6.0, 5.0, 3.0]), np.array([2, 2, 1]))
    assert patch.shape == (5, 5, 3)
    np.testing.assert_array_equal(patch, volume[4:9, 3:8, 2:5])


def test_subcube_zero_pads_out_of_volume(volume):
    patch = subcube(volume, np.array([0.0, 0.0, 0.0]), np.array([2, 2, 1]))
    assert patch.shape == (5, 5, 3)
    np.testing.assert_array_equal(patch[:2], 0.0)
    np.testing.assert_array_equal(patch[:, :2], 0.0)
    np.testing.assert_array_equal(patch[:, :, :1], 0.0)
    np.testing.assert_array_equal(patch[2:, 2:, 1:], volume[:3, :3, :2])


def test_subcube_fractional_matches_reference_affine_transform(volume):
    """Subpixel shift must match affine_transform's cubic spline exactly."""
    loc = np.array([6.3, 5.7, 2.4])
    radius = np.array([2, 2, 1])
    patch = subcube(volume, loc, radius)

    loc_i = loc.astype(int)
    window = volume[
        loc_i[0] - 2 : loc_i[0] + 3,
        loc_i[1] - 2 : loc_i[1] + 3,
        loc_i[2] - 1 : loc_i[2] + 2,
    ]
    expected = affine_transform(window, np.eye(3), offset=loc - loc_i)
    np.testing.assert_allclose(patch, expected, atol=1e-12)


def test_subcube_fractional_is_cubic_not_linear(volume):
    """Regression for the round-2 order=1 divergence: on a curved signal
    the cubic spline differs measurably from trilinear interpolation."""
    x = np.arange(9, dtype=np.float64)
    curved = (x[:, None, None] ** 3) * np.ones((1, 9, 3))
    loc = np.array([4.5, 4.0, 1.0])
    patch = subcube(curved, loc, np.array([2, 2, 1]))
    window = curved[2:7, 2:7, 0:3]
    linear = affine_transform(window, np.eye(3), offset=loc - loc.astype(int), order=1)
    cubic = affine_transform(window, np.eye(3), offset=loc - loc.astype(int), order=3)
    assert np.max(np.abs(cubic - linear)) > 1e-3
    np.testing.assert_allclose(patch, cubic, atol=1e-12)


def test_subcube_channel_axis(volume):
    vol4 = np.stack([volume, 2.0 * volume], axis=-1)
    patch = subcube(vol4, np.array([6.2, 5.0, 3.0]), np.array([1, 1, 1]))
    assert patch.shape == (3, 3, 3, 2)
    np.testing.assert_allclose(patch[..., 1], 2.0 * patch[..., 0], atol=1e-12)


def test_placement_centers_patch():
    patch = np.arange(27, dtype=np.float64).reshape(3, 3, 3)
    out = placement((7, 7, 7), np.array([3, 3, 3]), patch)
    np.testing.assert_array_equal(out[2:5, 2:5, 2:5], patch)
    assert out.sum() == patch.sum()


def test_placement_clips_at_boundary():
    patch = np.ones((3, 3, 3))
    out = placement((5, 5, 5), np.array([0, 0, 0]), patch)
    assert out.sum() == 8  # only the 2x2x2 in-bounds corner survives
    np.testing.assert_array_equal(out[:2, :2, :2], 1.0)


def test_superpose_uses_volume_shape_only():
    base = np.full((6, 6, 6), 5.0)
    patch = np.ones((3, 3, 3))
    out = superpose(base, np.array([3, 3, 3]), patch)
    # Reference semantics: pasted into a fresh zero volume.
    assert out.shape == (6, 6, 6)
    assert out.max() == 1.0 and out.sum() == 27


def test_max_project():
    video = np.zeros((4, 4, 3, 2))
    video[1, 2, 1, 0] = 2.0
    mp = max_project(video)
    assert mp.shape == (4, 4, 2)
    assert mp[1, 2, 0] == 1.0  # normalized to [0, 1]


def test_pairwise_distances():
    x = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    y = np.array([[0.0, 3.0, 4.0]])
    d = pairwise_distances(x, y)
    np.testing.assert_allclose(d, [[25.0], [26.0]], atol=1e-12)
