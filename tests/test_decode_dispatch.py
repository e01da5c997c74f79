"""decode_image(prefer=) dispatch order: native-first in this sandbox,
system(PIL)-first on clusters that have Pillow, native fallback when PIL
is absent or rejects the blob (VERDICT r7 #5)."""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from tiledb_vector_search_spark.objects.codecs import (
    decode_image,
    encode_png,
)


@pytest.fixture()
def png_blob():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    return img, encode_png(img)


class _FakeImage:
    def __init__(self, arr):
        self._arr = arr

    def convert(self, mode):
        assert mode == "RGB"
        return self._arr


def _install_fake_pil(monkeypatch, opener):
    """A minimal PIL.Image module whose open() is `opener`."""
    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = opener
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)


def test_native_default_ignores_pil_for_mainstream(monkeypatch, png_blob):
    img, blob = png_blob
    sentinel = np.full((2, 2, 3), 9, np.uint8)

    def opener(fp):
        raise AssertionError("native mode must not call PIL for PNG")

    _install_fake_pil(monkeypatch, opener)
    out = decode_image(blob)  # default prefer comes from env, here unset
    assert (out == img).all()


def test_system_prefers_pil_then_falls_back(monkeypatch, png_blob):
    img, blob = png_blob
    sentinel = np.full((2, 2, 3), 9, np.uint8)
    _install_fake_pil(
        monkeypatch, lambda fp: _FakeImage(sentinel)
    )
    out = decode_image(blob, prefer="system")
    assert (out == sentinel).all()  # the C path won

    # PIL rejecting the blob (12-bit JPEG style) falls back to native
    def rejecting(fp):
        raise OSError("cannot identify image file")

    _install_fake_pil(monkeypatch, rejecting)
    out = decode_image(blob, prefer="system")
    assert (out == img).all()


def test_system_without_pil_decodes_natively(monkeypatch, png_blob):
    img, blob = png_blob
    monkeypatch.setitem(sys.modules, "PIL", None)  # import -> ImportError
    out = decode_image(blob, prefer="system")
    assert (out == img).all()


def test_env_var_sets_default_preference(monkeypatch, png_blob):
    img, blob = png_blob
    sentinel = np.full((3, 3, 3), 4, np.uint8)
    _install_fake_pil(monkeypatch, lambda fp: _FakeImage(sentinel))
    monkeypatch.setenv("SPARK_GRAFT_IMAGE_DECODER", "system")
    assert (decode_image(blob) == sentinel).all()
    monkeypatch.setenv("SPARK_GRAFT_IMAGE_DECODER", "native")
    assert (decode_image(blob) == img).all()


def test_unknown_preference_raises(png_blob):
    _img, blob = png_blob
    with pytest.raises(ValueError, match="decode preference"):
        decode_image(blob, prefer="gpu")
