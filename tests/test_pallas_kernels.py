"""Pallas kernel correctness (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mingraph_unet_tpu.ops.filters import _equalize_channel_u8
from mingraph_unet_tpu.ops.pallas.histeq import equalize_channel_pallas


class TestHisteqKernel:
    def test_matches_jnp_reference(self):
        y = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 64, 64)), jnp.int32)
        ours = equalize_channel_pallas(y, interpret=True)
        ref = jax.vmap(_equalize_channel_u8)(y)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))

    def test_matches_cv2(self):
        import cv2

        img = np.random.default_rng(1).integers(0, 256, (64, 64)).astype(np.uint8)
        ours = np.asarray(
            equalize_channel_pallas(jnp.asarray(img.astype(np.int32))[None], interpret=True)
        )[0]
        ref = cv2.equalizeHist(img).astype(int)
        assert np.abs(ours - ref).max() <= 1

    def test_constant_image(self):
        y = jnp.full((1, 64, 64), 128, jnp.int32)
        out = np.asarray(equalize_channel_pallas(y, interpret=True))
        # Single occupied bin: cdf == cdf_min -> LUT maps to 0 (cv2 behavior).
        assert (out == 0).all()

    def test_rejects_bad_size(self):
        import pytest

        with pytest.raises(ValueError):
            equalize_channel_pallas(jnp.zeros((1, 10, 10), jnp.int32), interpret=True)
