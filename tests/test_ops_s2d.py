"""Space-to-depth conv reparameterization: exactness vs the direct forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mingraph_unet_tpu.ops import s2d


def rng(seed=0):
    return np.random.default_rng(seed)


@pytest.fixture(autouse=True)
def _highest_precision():
    with jax.default_matmul_precision("highest"):
        yield


def direct_conv3x3(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


class TestLayout:
    def test_roundtrip(self):
        x = jnp.asarray(rng(0).standard_normal((2, 8, 6, 5)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(s2d.depth_to_space(s2d.space_to_depth(x))), np.asarray(x)
        )

    def test_phase_major_order(self):
        # s2d channel (py·2+px)·C + c holds pixel (2I+py, 2J+px, c).
        x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
        y = s2d.space_to_depth(x)
        assert y.shape == (2, 2, 2, 12)
        np.testing.assert_array_equal(np.asarray(y[0, 1, 0, 3 * 3 : 3 * 4]),
                                      np.asarray(x[0, 3, 1, :]))  # ph=(1,1)->idx 3


class TestConv3x3:
    @pytest.mark.parametrize("cin,cout,h,w", [(3, 8, 8, 8), (5, 4, 10, 6)])
    def test_matches_direct(self, cin, cout, h, w):
        r = rng(1)
        x = jnp.asarray(r.standard_normal((2, h, w, cin)), jnp.float32)
        k = jnp.asarray(r.standard_normal((3, 3, cin, cout)) * 0.3, jnp.float32)
        ref = direct_conv3x3(x, k)
        ours = s2d.depth_to_space(
            s2d.conv3x3_s2d(s2d.space_to_depth(x), s2d.s2d_conv3x3_kernel(k))
        )
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)

    def test_grouped_concat_matches_direct(self):
        # conv(cat(a, b)) == s2d-conv of cat(s2d(a), s2d(b)) with grouped kernel.
        r = rng(2)
        a = jnp.asarray(r.standard_normal((1, 8, 8, 4)), jnp.float32)
        b = jnp.asarray(r.standard_normal((1, 8, 8, 6)), jnp.float32)
        k = jnp.asarray(r.standard_normal((3, 3, 10, 5)) * 0.3, jnp.float32)
        ref = direct_conv3x3(jnp.concatenate([a, b], -1), k)
        x_s2d = jnp.concatenate([s2d.space_to_depth(a), s2d.space_to_depth(b)], -1)
        ours = s2d.depth_to_space(
            s2d.conv3x3_s2d(x_s2d, s2d.s2d_conv3x3_kernel(k, in_groups=(4, 6)))
        )
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


class TestConvTranspose:
    def test_matches_flax(self):
        import flax.linen as nn

        r = rng(3)
        x = jnp.asarray(r.standard_normal((2, 5, 7, 6)), jnp.float32)
        m = nn.ConvTranspose(4, kernel_size=(2, 2), strides=(2, 2), padding="VALID")
        v = m.init(jax.random.key(0), x)
        ref = m.apply(v, x)
        wt = s2d.s2d_convt2x2_kernel(v["params"]["kernel"])
        ours_s2d = x @ wt + s2d.s2d_vector(v["params"]["bias"])
        np.testing.assert_allclose(
            np.asarray(s2d.depth_to_space(ours_s2d)), np.asarray(ref), atol=1e-5
        )


class TestPoolAnd1x1:
    def test_phase_max_pool(self):
        import flax.linen as nn

        x = jnp.asarray(rng(4).standard_normal((2, 8, 8, 3)), jnp.float32)
        ref = nn.max_pool(x, (2, 2), (2, 2))
        ours = s2d.phase_max_pool(s2d.space_to_depth(x))
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))

    def test_phase_mean(self):
        import flax.linen as nn

        x = jnp.asarray(rng(5).standard_normal((2, 8, 8, 3)), jnp.float32)
        ref = nn.avg_pool(x, (2, 2), (2, 2))
        ours = s2d.phase_mean(s2d.space_to_depth(x))
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-6)

    def test_1x1_kernel(self):
        r = rng(6)
        x = jnp.asarray(r.standard_normal((1, 6, 6, 3)), jnp.float32)
        k = jnp.asarray(r.standard_normal((1, 1, 3, 2)), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        ours = s2d.depth_to_space(s2d.space_to_depth(x) @ s2d.s2d_1x1_kernel(k))
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)

    def test_windowed_down_matches_direct(self):
        r = rng(9)
        x = jnp.asarray(r.standard_normal((2, 12, 16, 7)), jnp.float32)
        k = jnp.asarray(r.standard_normal((3, 3, 7, 5)), jnp.float32) * 0.1
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        out = s2d.depth_to_space(
            s2d.conv3x3_windowed_down(x, s2d.windowed_down_kernel(k))
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_depth_to_space_grouped(self):
        r = rng(10)
        a = jnp.asarray(r.standard_normal((1, 8, 8, 3)), jnp.float32)
        b = jnp.asarray(r.standard_normal((1, 8, 8, 2)), jnp.float32)
        cat = jnp.concatenate([s2d.space_to_depth(a), s2d.space_to_depth(b)], -1)
        back = s2d.depth_to_space_grouped(cat, (3, 2))
        np.testing.assert_array_equal(
            np.asarray(back), np.asarray(jnp.concatenate([a, b], -1))
        )

    @pytest.mark.parametrize("groups", [(), (32, 32), (64, 16)])
    def test_convblock_windowed_lowering_parity(self, groups):
        """ConvBlock's s2d path switches to the windowed lowering at
        Cin >= 48; it must still match the standard block exactly (same
        params) in train and eval modes, including grouped inputs."""
        from mingraph_unet_tpu.models.unet import ConvBlock

        r = rng(11)
        cin = sum(groups) if groups else 64
        x = jnp.asarray(r.standard_normal((2, 8, 8, cin)), jnp.float32)
        blk_std = ConvBlock(48, True, jnp.float32)
        variables = blk_std.init(jax.random.key(1), x, False)
        if groups:
            offs = np.cumsum((0,) + groups)
            xs = jnp.concatenate(
                [s2d.space_to_depth(x[..., offs[i]:offs[i + 1]]) for i in range(len(groups))],
                -1,
            )
        else:
            xs = s2d.space_to_depth(x)
        blk_s2d = ConvBlock(48, True, jnp.float32, True, groups)
        ref_t, _ = blk_std.apply(variables, x, True, mutable=["batch_stats"])
        out_t, _ = blk_s2d.apply(variables, xs, True, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(s2d.depth_to_space(out_t)), np.asarray(ref_t), atol=1e-5
        )
        ref_e = blk_std.apply(variables, x, False)
        out_e = blk_s2d.apply(variables, xs, False)
        np.testing.assert_allclose(
            np.asarray(s2d.depth_to_space(out_e)), np.asarray(ref_e), atol=1e-5
        )

    def test_convblock_full_res_input_parity(self):
        """``s2d_in_full_res=True`` (full-res NHWC in, s2d out — the form
        DecoderBlock feeds when conv1 is windowed) matches the standard
        block exactly with the same params."""
        from mingraph_unet_tpu.models.unet import ConvBlock

        r = rng(12)
        for cin in (64, 32):  # windowed and dense conv1 paths
            x = jnp.asarray(r.standard_normal((2, 8, 8, cin)), jnp.float32)
            blk_std = ConvBlock(48, True, jnp.float32)
            variables = blk_std.init(jax.random.key(1), x, False)
            blk_fr = ConvBlock(48, True, jnp.float32, True, (), True)
            for train in (True, False):
                kw = {"mutable": ["batch_stats"]} if train else {}
                ref = blk_std.apply(variables, x, train, **kw)
                out = blk_fr.apply(variables, x, train, **kw)
                if train:
                    ref, out = ref[0], out[0]
                np.testing.assert_allclose(
                    np.asarray(s2d.depth_to_space(out)), np.asarray(ref), atol=1e-5
                )

    def test_decoder_block_s2d_windowed_parity(self):
        """s2d DecoderBlock with skip+up >= the windowed cutover (the
        production dec level-0 shape class) matches the standard block."""
        from mingraph_unet_tpu.models.unet import DecoderBlock

        r = rng(13)
        x_prev = jnp.asarray(r.standard_normal((2, 4, 4, 64)), jnp.float32)
        skip = jnp.asarray(r.standard_normal((2, 8, 8, 32)), jnp.float32)
        blk_std = DecoderBlock(32, 32, True, jnp.float32)
        variables = blk_std.init(jax.random.key(2), x_prev, skip, False)
        blk_s2d = DecoderBlock(32, 32, True, jnp.float32, False, True)
        ref = blk_std.apply(variables, x_prev, skip, False)
        out = blk_s2d.apply(variables, x_prev, s2d.space_to_depth(skip), False)
        np.testing.assert_allclose(
            np.asarray(s2d.depth_to_space(out)), np.asarray(ref), atol=1e-5
        )

    def test_patch_reduce_mean_s2d(self):
        from mingraph_unet_tpu.ops.patches import patch_reduce_mean

        x = jnp.asarray(rng(7).standard_normal((2, 16, 16, 5)), jnp.float32)
        for patch in (2, 4, 8):
            ref = patch_reduce_mean(x, patch)
            ours = s2d.patch_reduce_mean_s2d(s2d.space_to_depth(x), patch)
            np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-6)


class TestUNetS2DExtras:
    def test_extras_consistent_with_fullres(self):
        from mingraph_unet_tpu.models.unet import UNet

        unet = UNet(init_features=8, depth=2, s2d_level0=True, return_s2d_extras=True)
        x = jnp.asarray(rng(8).standard_normal((2, 16, 16, 3)), jnp.float32)
        variables = unet.init(jax.random.key(0), x)
        logits, skips, f_u, ex = unet.apply(variables, x, train=False)
        np.testing.assert_allclose(
            np.asarray(s2d.depth_to_space(ex["skip0_s2d"])), np.asarray(skips[0]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s2d.depth_to_space(ex["f_u0_s2d"])), np.asarray(f_u[0]), atol=1e-6
        )
        # Default return arity unchanged.
        out3 = UNet(init_features=8, depth=2, s2d_level0=True).apply(variables, x, train=False)
        assert len(out3) == 3
        np.testing.assert_allclose(np.asarray(out3[0]), np.asarray(logits), atol=1e-6)

    def test_extras_none_off_s2d_path(self):
        from mingraph_unet_tpu.models.unet import UNet

        unet = UNet(init_features=8, depth=2, s2d_level0=False, return_s2d_extras=True)
        x = jnp.zeros((1, 16, 16, 3), jnp.float32)
        variables = unet.init(jax.random.key(0), x)
        *_, ex = unet.apply(variables, x, train=False)
        assert ex["skip0_s2d"] is None and ex["f_u0_s2d"] is None


class TestUNetS2DParity:
    """UNet(s2d_level0=True) is an exact reparameterization: identical param
    tree, interchangeable weights, matching outputs in train and eval."""

    def _models(self, **kw):
        from mingraph_unet_tpu.models.unet import UNet

        return (
            UNet(init_features=8, depth=2, **kw),
            UNet(init_features=8, depth=2, s2d_level0=True, **kw),
        )

    def test_same_param_tree_and_init(self):
        std, fast = self._models()
        x = jnp.zeros((1, 16, 16, 3))
        v_std = std.init(jax.random.key(0), x)
        v_fast = fast.init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(v_std) == jax.tree_util.tree_structure(v_fast)
        for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(v_std),
            jax.tree_util.tree_leaves_with_path(v_fast),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p))

    def test_forward_parity_eval(self):
        std, fast = self._models()
        x = jnp.asarray(rng(7).standard_normal((2, 16, 16, 3)), jnp.float32)
        v = std.init(jax.random.key(0), x)
        ref_logits, ref_skips, ref_fu = std.apply(v, x)
        out_logits, out_skips, out_fu = fast.apply(v, x)
        np.testing.assert_allclose(np.asarray(out_logits), np.asarray(ref_logits), atol=2e-5)
        for a, b in zip(ref_skips, out_skips):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)
        for a, b in zip(ref_fu, out_fu):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)

    def test_train_mode_parity_and_batch_stats(self):
        std, fast = self._models()
        x = jnp.asarray(rng(8).standard_normal((2, 16, 16, 3)), jnp.float32)
        v = std.init(jax.random.key(0), x)
        (ref_logits, _, _), ref_mut = std.apply(v, x, train=True, mutable=["batch_stats"])
        (out_logits, _, _), out_mut = fast.apply(v, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out_logits), np.asarray(ref_logits), atol=2e-5)
        for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_mut),
            jax.tree_util.tree_leaves_with_path(out_mut),
        ):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5, err_msg=str(p))

    def test_grad_parity(self):
        std, fast = self._models()
        x = jnp.asarray(rng(9).standard_normal((2, 16, 16, 3)), jnp.float32)
        v = std.init(jax.random.key(0), x)

        def loss(model, params):
            out, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return (out[0] ** 2).mean()

        g_std = jax.grad(lambda p: loss(std, p))(v["params"])
        g_fast = jax.grad(lambda p: loss(fast, p))(v["params"])
        for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_std),
            jax.tree_util.tree_leaves_with_path(g_fast),
        ):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5, err_msg=str(p))

    def test_odd_size_falls_back(self):
        std, fast = self._models()
        x = jnp.asarray(rng(10).standard_normal((1, 17, 17, 3)), jnp.float32)
        v = std.init(jax.random.key(0), x)
        ref = std.apply(v, x)[0]
        out = fast.apply(v, x)[0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestUNetS2DLevel1Parity:
    """UNet(s2d_level0=True, s2d_level1=True) — the r4 one-level-down
    extension (256-lane convs) — is the same exact reparameterization:
    identical param tree, matching outputs/grads, odd-size fallback."""

    def _models(self, **kw):
        from mingraph_unet_tpu.models.unet import UNet

        return (
            UNet(init_features=8, depth=3, **kw),
            UNet(init_features=8, depth=3, s2d_level0=True, s2d_level1=True, **kw),
        )

    def test_param_tree_and_forward_parity(self):
        std, fast = self._models()
        x = jnp.asarray(rng(20).standard_normal((2, 32, 32, 3)), jnp.float32)
        v = std.init(jax.random.key(0), x)
        v2 = fast.init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
        ref_logits, ref_skips, ref_fu = std.apply(v, x)
        out_logits, out_skips, out_fu = fast.apply(v, x)
        np.testing.assert_allclose(np.asarray(out_logits), np.asarray(ref_logits), atol=2e-5)
        for a, b in zip(ref_skips + ref_fu, out_skips + out_fu):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)

    def test_extras_present_and_consistent(self):
        from mingraph_unet_tpu.models.unet import UNet
        from mingraph_unet_tpu.ops import s2d

        fast = UNet(init_features=8, depth=3, s2d_level0=True, s2d_level1=True,
                    return_s2d_extras=True)
        x = jnp.asarray(rng(21).standard_normal((1, 32, 32, 3)), jnp.float32)
        v = fast.init(jax.random.key(0), x)
        logits, skips, f_u, extras = fast.apply(v, x)
        for lvl in (0, 1):
            sk = extras[f"skip{lvl}_s2d"]
            fu = extras[f"f_u{lvl}_s2d"]
            assert sk is not None and fu is not None
            np.testing.assert_allclose(
                np.asarray(s2d.depth_to_space(sk)), np.asarray(skips[lvl]), atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(s2d.depth_to_space(fu)), np.asarray(f_u[lvl]), atol=1e-5
            )

    def test_train_and_grad_parity(self):
        std, fast = self._models()
        x = jnp.asarray(rng(22).standard_normal((2, 16, 16, 3)), jnp.float32)
        v = std.init(jax.random.key(0), x)

        def loss(model, params):
            out, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return (out[0] ** 2).mean()

        g_std = jax.grad(lambda p: loss(std, p))(v["params"])
        g_fast = jax.grad(lambda p: loss(fast, p))(v["params"])
        for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_std),
            jax.tree_util.tree_leaves_with_path(g_fast),
        ):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5, err_msg=str(p))

    def test_odd_size_falls_back(self):
        std, fast = self._models()
        x = jnp.asarray(rng(23).standard_normal((1, 17, 17, 3)), jnp.float32)
        v = std.init(jax.random.key(0), x)
        np.testing.assert_allclose(
            np.asarray(fast.apply(v, x)[0]), np.asarray(std.apply(v, x)[0]), atol=2e-5
        )

    def test_pipeline_level1_matches_default(self):
        """MinGraphUNet(unet_s2d_level1=True) ≡ default pipeline outputs."""
        from mingraph_unet_tpu.models.pipeline import MinGraphUNet

        x = jnp.asarray(rng(24).standard_normal((1, 32, 32, 3)), jnp.float32)
        base = MinGraphUNet(init_features=8, depth=2, patch_size=16)
        lvl1 = MinGraphUNet(init_features=8, depth=2, patch_size=16, unet_s2d_level1=True)
        v = base.init(jax.random.key(0), x)
        a = base.apply(v, x, train=False)
        b = lvl1.apply(v, x, train=False)
        for k in ("logits", "pred_bboxes", "pred_confidence", "l_partition"):
            np.testing.assert_allclose(np.asarray(b[k]), np.asarray(a[k]), atol=3e-5, err_msg=k)
