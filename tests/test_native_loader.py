"""Native C++ loader vs the numpy data plane: layout parity + prefetch order."""

import os

import numpy as np
import pytest

from contour_context_tpu.utils.io import pad_points, read_kitti_bin
from contour_context_tpu.utils import native_loader


@pytest.fixture(scope="module")
def bins(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bins")
    rng = np.random.default_rng(0)
    paths = []
    for i, n in enumerate([1000, 0, 7, 5000, 131072 + 100]):
        arr = rng.uniform(-80, 80, (n, 4)).astype(np.float32)
        p = str(tmp / ("%06d.bin" % i))
        arr.tofile(p)
        paths.append(p)
    return paths


def test_native_builds():
    assert native_loader.native_available(), \
        "csrc/libcont2.so failed to build (g++ expected in this image)"


def test_read_parity(bins):
    if not native_loader.native_available():
        pytest.skip("no native lib")
    for p in bins:
        a = native_loader.read_bin_padded(p, 4096)
        b = pad_points(read_kitti_bin(p, 4096), 4096)
        np.testing.assert_array_equal(a, b, err_msg=p)


def test_prefetcher_order_and_content(bins):
    if not native_loader.native_available():
        pytest.skip("no native lib")
    # repeat the path list so the ring wraps several times
    paths = (bins * 5)[:23]
    pf = native_loader.ScanPrefetcher(paths, max_points=2048, depth=3,
                                      n_threads=4)
    got = list(pf)
    pf.close()
    assert len(got) == len(paths)
    for p, g in zip(paths, got):
        np.testing.assert_array_equal(
            g, pad_points(read_kitti_bin(p, 2048), 2048), err_msg=p)


def test_read_block_into(bins, tmp_path):
    if not native_loader.native_available():
        pytest.skip("no native lib")
    paths = (bins * 3)[:11]
    out = np.full((11, 2048, 4), -9.0, np.float32)
    native_loader.read_block_into(paths, out, n_threads=4)
    for j, p in enumerate(paths):
        np.testing.assert_array_equal(
            out[j], pad_points(read_kitti_bin(p, 2048), 2048), err_msg=p)
    with pytest.raises(IOError):
        native_loader.read_block_into(
            [bins[0], str(tmp_path / "missing.bin")],
            np.empty((2, 256, 4), np.float32))


def test_prefetcher_missing_file(bins, tmp_path):
    if not native_loader.native_available():
        pytest.skip("no native lib")
    pf = native_loader.ScanPrefetcher(
        [bins[0], str(tmp_path / "nope.bin")], max_points=256)
    next(pf)
    with pytest.raises(IOError):
        next(pf)
    pf.close()
