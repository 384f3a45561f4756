"""Native C++ PNG codec vs the PIL oracle."""

import glob
import os

import numpy as np
import pytest

native = pytest.importorskip("bpldenoising_tpu.data.native")
from bpldenoising_tpu.data.png_io import _read_pil  # noqa: E402

DATASET_PNGS = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), "..", "datasets", "*", "*.png")))


def test_datasets_found():
    assert len(DATASET_PNGS) >= 40


@pytest.mark.parametrize("path", DATASET_PNGS[::7], ids=os.path.basename)
def test_matches_pil(path):
    a = native.read_png_gray_native(path)
    b = _read_pil(path)
    np.testing.assert_allclose(a, b, atol=1e-15)


def test_all_dataset_files_decode():
    for path in DATASET_PNGS:
        a = native.read_png_gray_native(path)
        assert a.shape == (128, 128)
        assert 0.0 <= a.min() and a.max() <= 1.0


def test_roundtrip(tmp_path, rng):
    img = rng.uniform(0, 1, (48, 64))
    p = str(tmp_path / "x.png")
    native.write_png_gray_native(p, img)
    back = native.read_png_gray_native(p)
    assert np.abs(back - img).max() <= 0.5 / 255 + 1e-9
    # the file must also be readable by PIL (valid PNG structure + CRCs)
    np.testing.assert_allclose(_read_pil(p), back, atol=1e-15)


def test_decode_error_on_garbage(tmp_path):
    p = str(tmp_path / "bad.png")
    with open(p, "wb") as fh:
        fh.write(b"not a png at all")
    with pytest.raises(IOError):
        native.read_png_gray_native(p)
