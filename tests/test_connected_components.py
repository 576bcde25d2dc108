"""Connected components: native C++ path vs scipy reference."""

import numpy as np
import pytest

from mimo_tpu.ops import connected_components as CC


def _sample_mask():
    m = np.zeros((20, 30), bool)
    m[2:8, 2:8] = True        # big blob
    m[15, 25] = True          # speck
    m[4:6, 4:6] = False       # hole inside blob
    m[10:18, 10:20] = True    # second blob
    return m


def test_native_lib_builds():
    lib = CC._load_lib()
    assert lib is not None, "native cc_labeling should build with make/g++"


def test_label_counts():
    labels, n = CC.label(_sample_mask())
    assert n == 3
    assert labels.max() == 3
    assert (labels[_sample_mask()] > 0).all()
    assert (labels[~_sample_mask()] == 0).all()


def test_label_matches_scipy():
    from scipy import ndimage
    rng = np.random.default_rng(0)
    m = rng.uniform(size=(40, 50)) > 0.6
    ours, n = CC.label(m)
    s4 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    ref, n_ref = ndimage.label(m, structure=s4)
    assert n == n_ref
    # same partition (label ids may differ): compare co-labeling
    for lab in range(1, n + 1):
        sel = ours == lab
        ref_ids = np.unique(ref[sel])
        assert len(ref_ids) == 1


def test_clean_removes_speck_and_fills_hole():
    m = _sample_mask()
    out = CC.clean_mask(m, min_area=10, fill_holes=True)
    assert not out[15, 25]           # speck removed
    assert out[4, 4] and out[5, 5]   # hole filled
    assert out[3, 3] and out[12, 15]  # blobs kept


def test_clean_scipy_fallback_equivalent():
    m = _sample_mask()
    native = CC.clean_mask(m, min_area=10)
    # force the scipy fallback
    lib, tried = CC._LIB, CC._LIB_TRIED
    CC._LIB, CC._LIB_TRIED = None, True
    try:
        fallback = CC.clean_mask(m, min_area=10)
    finally:
        CC._LIB, CC._LIB_TRIED = lib, tried
    np.testing.assert_array_equal(native, fallback)
