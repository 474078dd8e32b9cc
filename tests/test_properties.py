"""Property-based invariants (hypothesis) for the structural ops.

ROADMAP item: randomized roundtrip/equivalence checks for patchify/stitch,
space-to-depth, pooling, and connected components — the ops whose exactness
everything else (graph features, tiled inference, instance GT) leans on.
Shapes are drawn from small bounded sets so the number of distinct jit
compilations stays modest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from mingraph_unet_tpu.ops import cc, s2d
from mingraph_unet_tpu.ops.patches import (
    pad_to_multiple,
    patchify,
    patch_reduce_mean,
    unpatchify,
)

SETTINGS = dict(max_examples=15, deadline=None)


class TestS2DProperties:
    @settings(**SETTINGS)
    @given(
        h=st.sampled_from([2, 4, 6, 8]),
        w=st.sampled_from([2, 4, 6, 8]),
        c=st.sampled_from([1, 3, 5]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_s2d_roundtrip_exact(self, h, w, c, seed):
        x = jnp.asarray(np.random.default_rng(seed).standard_normal((1, h, w, c)), jnp.float32)
        back = s2d.depth_to_space(s2d.space_to_depth(x))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    @settings(**SETTINGS)
    @given(
        h=st.sampled_from([4, 8]),
        c=st.sampled_from([2, 4]),
        patch=st.sampled_from([2, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_patch_reduce_mean_s2d_matches_full_res(self, h, c, patch, seed):
        x = jnp.asarray(np.random.default_rng(seed).standard_normal((2, h, h, c)), jnp.float32)
        ours = s2d.patch_reduce_mean_s2d(s2d.space_to_depth(x), patch)
        ref = patch_reduce_mean(x, patch)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


class TestPatchifyProperties:
    @settings(**SETTINGS)
    @given(
        h=st.sampled_from([4, 6, 7, 9, 12]),
        w=st.sampled_from([4, 5, 8, 11]),
        patch=st.sampled_from([2, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_patchify_unpatchify_roundtrip(self, h, w, patch, seed):
        """unpatchify∘patchify is the identity on the padded canvas, and the
        top-left crop recovers the original (pad-to-multiple semantics from
        the reference's pad-and-unfold, patch_graph_construction.py:28-33)."""
        x = jnp.asarray(np.random.default_rng(seed).standard_normal((1, h, w, 3)), jnp.float32)
        back = unpatchify(patchify(x, patch))
        padded = pad_to_multiple(x, patch)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(padded))
        np.testing.assert_array_equal(np.asarray(back[:, :h, :w]), np.asarray(x))

    @settings(**SETTINGS)
    @given(
        h=st.sampled_from([4, 8]),
        patch=st.sampled_from([2, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_patch_reduce_mean_is_patch_mean(self, h, patch, seed):
        """The transpose-free pooling equals the definitional patch mean."""
        x = jnp.asarray(np.random.default_rng(seed).standard_normal((2, h, h, 3)), jnp.float32)
        ref = patchify(x, patch).mean(axis=(3, 4))
        np.testing.assert_allclose(
            np.asarray(patch_reduce_mean(x, patch)), np.asarray(ref), atol=1e-5
        )


class TestConnectedComponentsProperties:
    @settings(**SETTINGS)
    @given(
        h=st.sampled_from([8, 12, 16]),
        density=st.floats(0.2, 0.8),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_matches_scipy_4conn(self, h, density, seed):
        """Label partition and component count agree with scipy.ndimage
        4-connectivity labeling (up to label renaming)."""
        import scipy.ndimage as ndi

        rng = np.random.default_rng(seed)
        mask = (rng.random((h, h)) < density).astype(np.int32)
        ours = np.asarray(cc.label_components(jnp.asarray(mask)))
        ref, n_ref = ndi.label(mask, structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
        assert int(cc.component_count(jnp.asarray(ours))) == n_ref
        # Partition equivalence: our label and scipy's label induce the same
        # equivalence classes on foreground pixels.
        fg = mask.astype(bool)
        pairs = {}
        for a, b in zip(ours[fg].tolist(), ref[fg].tolist()):
            assert pairs.setdefault(a, b) == b, "our component split across scipy components"
        rev = {}
        for a, b in pairs.items():
            assert rev.setdefault(b, a) == a, "scipy component split across our components"

    @settings(**SETTINGS)
    @given(seed=st.integers(0, 2**31 - 1))
    def test_roots_are_min_linear_index(self, seed):
        """Each component's label is the minimum linear index of its pixels
        (the documented contract of label_components)."""
        rng = np.random.default_rng(seed)
        mask = (rng.random((10, 10)) < 0.5).astype(np.int32)
        ours = np.asarray(cc.label_components(jnp.asarray(mask)))
        h, w = mask.shape
        lin = np.arange(h * w).reshape(h, w)
        for lab in np.unique(ours[ours >= 0]):
            assert lab == lin[ours == lab].min()
