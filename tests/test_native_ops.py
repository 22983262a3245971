"""Native C++ image ops vs cv2 (the oracle the transforms otherwise use)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mtlora_tpu.data.native import native  # noqa: E402

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def _img(seed, h=37, w=53, c=3):
    r = np.random.RandomState(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return r.rand(*shape).astype(np.float32) * 255


@pytest.mark.parametrize("c", [1, 3])
def test_hflip_exact(c):
    img = _img(0, c=c)
    np.testing.assert_array_equal(native.hflip(img), cv2.flip(img, 1))


@pytest.mark.parametrize("c", [1, 3])
@pytest.mark.parametrize("interp,cvflag,tol", [
    (native.NEAREST, cv2.INTER_NEAREST, 0.0),
    (native.LINEAR, cv2.INTER_LINEAR, 1e-3),
    (native.CUBIC, cv2.INTER_CUBIC, 1e-2),
])
def test_resize_matches_cv2(c, interp, cvflag, tol):
    img = _img(1, c=c)
    for dsize in [(64, 48), (30, 20), (100, 90)]:
        a = native.resize(img, dsize, interp)
        b = cv2.resize(img, dsize, interpolation=cvflag)
        if tol == 0.0:
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, atol=tol)


@pytest.mark.parametrize("c", [1, 3])
@pytest.mark.parametrize("interp,cvflag,tol", [
    (native.LINEAR, cv2.INTER_LINEAR, 1e-3),
    (native.CUBIC, cv2.INTER_CUBIC, 5e-2),
])
def test_warp_affine_matches_cv2(c, interp, cvflag, tol):
    img = _img(2, h=41, w=41, c=c)
    m = cv2.getRotationMatrix2D((20.5, 20.5), 13.0, 1.1)
    a = native.warp_affine(img, m, (41, 41), interp)
    b = cv2.warpAffine(img, m, (41, 41), flags=cvflag)
    # interiors must match; borders may differ slightly in blend policy
    interior = (slice(3, -3), slice(3, -3))
    np.testing.assert_allclose(a[interior], b[interior], atol=tol)
    # border region: bounded error
    assert np.abs(a - b).max() < 255 * 0.6


def test_rotation_pipeline_equivalence():
    """ScaleNRotate's exact call pattern through native ops."""
    img = _img(3, h=64, w=64, c=3)
    m = cv2.getRotationMatrix2D((32.0, 32.0), -17.0, 0.9)
    a = native.warp_affine(img, m, (64, 64), native.CUBIC)
    b = cv2.warpAffine(img, m, (64, 64), flags=cv2.INTER_CUBIC)
    assert np.abs(a[5:-5, 5:-5] - b[5:-5, 5:-5]).max() < 0.1
