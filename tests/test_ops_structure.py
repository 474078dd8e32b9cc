import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mingraph_unet_tpu.ops import cc, lattice, patches, segment


def rng(seed=0):
    return np.random.default_rng(seed)


class TestPatches:
    def test_patchify_roundtrip(self):
        x = jnp.asarray(rng().random((2, 32, 32, 3)), jnp.float32)
        p = patches.patchify(x, 8)
        assert p.shape == (2, 4, 4, 8, 8, 3)
        back = patches.unpatchify(p)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))

    def test_patchify_pads_non_divisible(self):
        # Mirrors the reference's 130x140 non-divisible smoke test
        # (patch_graph_construction.py:139-186) with patch 32 -> 5x5 grid.
        x = jnp.asarray(rng().random((1, 130, 140, 3)), jnp.float32)
        p = patches.patchify(x, 32)
        assert p.shape == (1, 5, 5, 32, 32, 3)

    def test_patch_ordering_matches_reference_rowmajor(self):
        # Node index must be r * npw + c.
        h = w = 4
        x = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w, 1)
        p = patches.patchify(x, 2)  # 2x2 grid of 2x2 patches
        flat = p.reshape(1, 4, 2, 2, 1)
        # Patch (0, 0) holds rows 0-1, cols 0-1 -> values {0,1,4,5}
        assert set(np.asarray(flat[0, 0]).flatten()) == {0, 1, 4, 5}
        # Patch index 1 (row-major) is grid (0, 1) -> values {2,3,6,7}
        assert set(np.asarray(flat[0, 1]).flatten()) == {2, 3, 6, 7}

    def test_patch_reduce_mean(self):
        x = jnp.ones((1, 8, 8, 2))
        m = patches.patch_reduce_mean(x, 4)
        assert m.shape == (1, 2, 2, 2)
        np.testing.assert_allclose(np.asarray(m), 1.0)

    def test_broadcast_patch_to_pixels(self):
        vals = jnp.arange(4.0).reshape(1, 2, 2, 1)
        out = patches.broadcast_patch_to_pixels(vals, 3)
        assert out.shape == (1, 6, 6, 1)
        assert float(out[0, 0, 0, 0]) == 0.0
        assert float(out[0, 5, 5, 0]) == 3.0

    def test_broadcast_patch_to_pixels_grad_parity(self):
        """The custom_vjp backward (reshape-sum form) must equal the
        autodiff-derived transpose of the repeats exactly."""
        import jax

        rng = np.random.default_rng(0)
        vals = jnp.asarray(rng.normal(size=(2, 3, 5, 4)).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(2, 12, 20, 4)).astype(np.float32))

        def plain(v):  # the same math without the custom_vjp wrapper
            return jnp.repeat(jnp.repeat(v, 4, axis=1), 4, axis=2)

        g_custom = jax.vjp(
            lambda v: patches.broadcast_patch_to_pixels(v, 4), vals)[1](cot)[0]
        g_ref = jax.vjp(plain, vals)[1](cot)[0]
        np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                                   rtol=1e-6, atol=1e-6)


class TestLattice:
    def test_edge_count(self):
        # 4-connectivity with both directed edges: E = 2*(nph*(npw-1) + (nph-1)*npw)
        ei = lattice.lattice_edge_index(8, 8)
        assert ei.shape == (2, 2 * (8 * 7 + 7 * 8))

    def test_edge_symmetry(self):
        ei = lattice.lattice_edge_index(3, 5)
        pairs = set(map(tuple, ei.T.tolist()))
        for s, t in list(pairs):
            assert (t, s) in pairs

    def test_single_patch_no_edges(self):
        assert lattice.lattice_edge_index(1, 1).shape == (2, 0)

    def test_neighbor_stack_matches_coo(self):
        nph, npw, d = 3, 4, 5
        x = jnp.asarray(rng(1).random((nph, npw, d)), jnp.float32)
        neigh_j, valid_j = lattice.neighbor_stack(x)
        neigh, valid = np.asarray(neigh_j), np.asarray(valid_j)
        ei = lattice.lattice_edge_index(nph, npw)
        flat = np.asarray(x).reshape(-1, d)
        # For every node, the set of valid incoming neighbor features must
        # equal the COO sources targeting it.
        for node in range(nph * npw):
            r, c = divmod(node, npw)
            coo_sources = sorted(
                map(tuple, (flat[s] for s, t in ei.T if t == node)),
            )
            dense_sources = sorted(
                tuple(neigh[r, c, k]) for k in range(4) if valid[r, c, k] == 1.0
            )
            assert dense_sources == coo_sources

    def test_shift_zero_fill(self):
        x = jnp.ones((2, 2, 1))
        up = lattice.shift(x, -1, 0)  # neighbor above
        assert float(up[0, 0, 0]) == 0.0  # top row has no upper neighbor
        assert float(up[1, 0, 0]) == 1.0


class TestSegment:
    def test_segment_mean_zero_for_empty(self):
        vals = jnp.asarray(rng(2).random((6, 3)), jnp.float32)
        labels = jnp.asarray([0, 0, 2, 2, 2, 0])
        means, counts = segment.segment_mean(vals, labels, 4)
        np.testing.assert_allclose(np.asarray(counts), [3, 0, 3, 0])
        np.testing.assert_allclose(np.asarray(means[1]), 0.0)
        np.testing.assert_allclose(np.asarray(means[3]), 0.0)
        np.testing.assert_allclose(
            np.asarray(means[0]), np.asarray(vals)[[0, 1, 5]].mean(0), rtol=1e-6
        )

    def test_gather_rows_negative_label_zero(self):
        table = jnp.asarray(rng(3).random((3, 4)), jnp.float32)
        labels = jnp.asarray([0, -1, 2])
        out = segment.gather_rows(table, labels)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(table[0]))
        np.testing.assert_allclose(np.asarray(out[1]), 0.0)

    def test_batched(self):
        vals = jnp.asarray(rng(4).random((2, 6, 3)), jnp.float32)
        labels = jnp.asarray(rng(4).integers(0, 3, (2, 6)))
        means, counts = segment.segment_mean(vals, labels, 3)
        assert means.shape == (2, 3, 3) and counts.shape == (2, 3)


class TestConnectedComponents:
    def test_two_blobs(self):
        mask = np.zeros((16, 16), np.int32)
        mask[2:5, 2:5] = 1
        mask[10:14, 9:15] = 1
        labels = cc.label_components(jnp.asarray(mask))
        assert int(cc.component_count(labels)) == 2
        masks, areas = cc.top_instances(labels, max_objects=4)
        assert np.asarray(areas)[0] == 24  # 4x6 blob
        assert np.asarray(areas)[1] == 9  # 3x3 blob
        assert np.asarray(areas)[2] == 0

    def test_snake_component(self):
        # Long winding component exercises pointer jumping convergence.
        mask = np.zeros((20, 20), np.int32)
        for r in range(20):
            mask[r, :] = 0
        mask[0, :] = 1
        mask[:, 19] = 1
        mask[19, :] = 1
        labels = cc.label_components(jnp.asarray(mask))
        assert int(cc.component_count(labels)) == 1

    def test_empty_mask(self):
        labels = cc.label_components(jnp.zeros((8, 8), jnp.int32))
        assert int(cc.component_count(labels)) == 0
        masks, areas = cc.top_instances(labels, 2)
        assert float(np.asarray(areas).sum()) == 0.0

    def test_boxes(self):
        mask = np.zeros((16, 16), np.int32)
        mask[3:7, 5:9] = 1
        labels = cc.label_components(jnp.asarray(mask))
        masks, _ = cc.top_instances(labels, 1)
        boxes = cc.instance_boxes(masks)
        np.testing.assert_allclose(np.asarray(boxes[0]), [5, 3, 8, 6])

    def test_jit_and_diagonal_not_connected(self):
        mask = np.zeros((8, 8), np.int32)
        mask[0, 0] = 1
        mask[1, 1] = 1  # diagonal only -> 2 components under 4-connectivity
        f = jax.jit(lambda m: cc.component_count(cc.label_components(m)))
        assert int(f(jnp.asarray(mask))) == 2


class TestFastInstancing:
    """The scatter-free in-step forms (r4): ``label_components_stencil`` +
    ``top_instances_dense`` must match the exact forms on their contract
    domain (compact components, ≤ candidate-window many), and their
    documented divergences must actually behave as documented."""

    def test_stencil_matches_exact_on_random_masks(self):
        for seed in range(8):
            mask = (rng(seed).random((24, 24)) < 0.45).astype(np.int32)
            exact = np.asarray(cc.label_components(jnp.asarray(mask)))
            fast = np.asarray(cc.label_components_stencil(jnp.asarray(mask)))
            np.testing.assert_array_equal(fast, exact)

    def test_stencil_splits_beyond_iteration_bound(self):
        # A 1-px line of length 40 has geodesic diameter 40: 8 sweeps can't
        # connect it (documented split), 64 can.
        mask = np.zeros((4, 48), np.int32)
        mask[1, 2:42] = 1
        lab8 = np.asarray(cc.label_components_stencil(jnp.asarray(mask), num_iters=8))
        lab64 = np.asarray(cc.label_components_stencil(jnp.asarray(mask), num_iters=64))
        fg = mask.astype(bool)
        assert len(np.unique(lab8[fg])) > 1  # unconverged: label gradient
        assert len(np.unique(lab64[fg])) == 1

    def test_top_dense_matches_exact_on_blobs(self):
        # Clean fruit-like scene: 3 compact blobs with distinct areas.
        mask = np.zeros((48, 48), np.int32)
        mask[2:8, 3:9] = 1       # 36 px
        mask[20:29, 20:28] = 1   # 72 px
        mask[40:43, 5:9] = 1     # 12 px
        labels = jnp.asarray(cc.label_components(jnp.asarray(mask)))
        for min_area in (1, 10, 40):
            me, ae = cc.top_instances(labels, 4, min_area=min_area)
            md, ad = cc.top_instances_dense(labels, 4, min_area=min_area)
            np.testing.assert_array_equal(np.asarray(ad), np.asarray(ae))
            np.testing.assert_array_equal(np.asarray(md), np.asarray(me))

    def test_top_dense_matches_exact_random_min_area_1(self):
        # min_area=1 disables the compactness prefilter; equality holds for
        # any mask with at most `candidates` components.
        for seed in range(6):
            mask = (rng(seed).random((16, 16)) < 0.3).astype(np.int32)
            labels = cc.label_components(jnp.asarray(mask))
            if int(cc.component_count(labels)) > 16:
                continue
            me, ae = cc.top_instances(labels, 5, min_area=1)
            md, ad = cc.top_instances_dense(labels, 5, min_area=1)
            np.testing.assert_array_equal(np.asarray(ad), np.asarray(ae))
            np.testing.assert_array_equal(np.asarray(md), np.asarray(me))

    def test_top_dense_prefilter_rejects_speckle(self):
        # Fruit blobs must win the candidate window over raster-earlier
        # 1-px speckles when min_area exceeds speckle mass.
        mask = np.zeros((64, 64), np.int32)
        spk = rng(7)
        for _ in range(40):  # sparse speckle, raster-before the fruit
            y, x = spk.integers(0, 18), spk.integers(0, 64)
            mask[y, x] = 1
        mask[30:42, 10:22] = 1   # 144 px fruit
        mask[50:59, 40:48] = 1   # 72 px fruit
        labels = cc.label_components_stencil(jnp.asarray(mask))
        masks, areas = cc.top_instances_dense(labels, 4, min_area=10)
        got = sorted(np.asarray(areas)[np.asarray(areas) > 0].tolist(), reverse=True)
        assert got[:2] == [144.0, 72.0]

    def test_soft_instance_loss_fast_matches_exact(self):
        from mingraph_unet_tpu.models import losses

        probs_fg = np.full((2, 32, 32), 0.1, np.float32)
        probs_fg[0, 4:12, 5:14] = 0.9
        probs_fg[0, 20:27, 18:26] = 0.8
        probs_fg[1, 10:22, 8:21] = 0.95
        probs = np.stack([1.0 - probs_fg, probs_fg], axis=-1)
        le = losses.elliptical_shape_loss_soft_instances(jnp.asarray(probs), exact=True)
        lf = losses.elliptical_shape_loss_soft_instances(jnp.asarray(probs), exact=False)
        np.testing.assert_allclose(float(lf), float(le), rtol=1e-6)
