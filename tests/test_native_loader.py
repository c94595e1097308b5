"""Native C++ scan loader vs the Python parser."""

import numpy as np
import pytest

from icp_rust_tpu.native import loader
from icp_rust_tpu.utils import io as scan_io

SCANS = "/root/reference/scans/2d"


@pytest.mark.skipif(not loader.available(), reason="native lib not built")
def test_native_loader_matches_python():
    pts, mask = loader.load_scan2d_padded(SCANS, limit=12)
    frames = scan_io.load_scan2d_sequence(SCANS, limit=12)
    assert pts.shape[0] == len(frames) == 12
    for i, f in enumerate(frames):
        n = len(f)
        assert mask[i, :n].all() and not mask[i, n:].any()
        np.testing.assert_array_equal(pts[i, :n], f.astype(np.float32))
        np.testing.assert_array_equal(pts[i, n:], 0.0)


@pytest.mark.skipif(not loader.available(), reason="native lib not built")
def test_native_loader_pad_multiple():
    pts, mask = loader.load_scan2d_padded(SCANS, limit=3, pad_multiple=256)
    assert pts.shape[1] % 256 == 0
    assert pts.shape[1:] == (pts.shape[1], 2)
