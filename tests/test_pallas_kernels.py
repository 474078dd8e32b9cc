"""Pallas kernel correctness (interpreter mode on CPU)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from mingraph_unet_tpu.ops.filters import _equalize_channel_u8
from mingraph_unet_tpu.ops.pallas.histeq import equalize_channel_pallas


class TestFusedConvBlock:
    """Interpret-mode exactness of the experimental fused ConvBlock kernel
    vs the XLA reference (conv→scale/shift→ReLU ×2, 'SAME' borders)."""

    def _params(self, rng, cin, c):
        w1 = jnp.asarray(rng.standard_normal((3, 3, cin, c)) * 0.2, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.2, jnp.float32)
        s1 = jnp.asarray(rng.random(c) + 0.5, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
        s2 = jnp.asarray(rng.random(c) + 0.5, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
        return w1, s1, b1, w2, s2, b2

    @pytest.mark.parametrize(
        "shape", [(1, 8, 8, 1, 1), (2, 32, 32, 3, 32), (1, 128, 16, 8, 16)]
    )
    def test_matches_reference(self, shape):
        from mingraph_unet_tpu.ops.pallas.conv_block import (
            conv_block_reference,
            fused_conv_block,
        )

        b, h, w, cin, c = shape
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
        w1, s1, b1, w2, s2, b2 = self._params(rng, cin, c)
        ref = conv_block_reference(x, w1, s1, b1, w2, s2, b2)
        with jax.default_matmul_precision("highest"):
            ours = fused_conv_block(x, w1, s1, b1, w2, s2, b2, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=5e-5)

    def test_fold_bn(self):
        from mingraph_unet_tpu.ops.pallas.conv_block import fold_bn

        c = 4
        rng = np.random.default_rng(1)
        bias = jnp.asarray(rng.standard_normal(c), jnp.float32)
        gamma = jnp.asarray(rng.random(c) + 0.5, jnp.float32)
        beta = jnp.asarray(rng.standard_normal(c), jnp.float32)
        mean = jnp.asarray(rng.standard_normal(c), jnp.float32)
        var = jnp.asarray(rng.random(c) + 0.1, jnp.float32)
        s, b = fold_bn(bias, gamma, beta, mean, var)
        x = jnp.asarray(rng.standard_normal((10, c)), jnp.float32)
        folded = x * s + b
        bn = (x + bias - mean) / jnp.sqrt(var + 1e-5) * gamma + beta
        np.testing.assert_allclose(np.asarray(folded), np.asarray(bn), atol=1e-5)


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


class TestHisteqBatchedDispatch:
    """The pipeline's batched RGB hist-eq wrapper (Pallas on TPU, XLA
    fallback elsewhere) is bit-exact with the per-image reference path."""

    def test_batched_matches_vmap(self):
        from mingraph_unet_tpu.ops.filters import (
            equalize_histogram_rgb,
            equalize_histogram_rgb_batched,
        )

        rgb = jnp.asarray(
            np.random.default_rng(2).integers(0, 256, (3, 64, 64, 3)), jnp.uint8
        )
        ref = jax.vmap(equalize_histogram_rgb)(rgb)
        ours = equalize_histogram_rgb_batched(rgb)  # CPU -> XLA fallback path
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))

    def test_dispatch_eligibility(self):
        from mingraph_unet_tpu.ops.filters import _histeq_pallas_ok

        # CPU backend in tests: never eligible regardless of shape.
        assert not _histeq_pallas_ok(512, 512)


class TestWindowedConv:
    """Interpret-mode exactness of the windowed conv3x3 kernel
    (ops/pallas/wconv.py) vs the direct XLA conv, incl. bias+ReLU epilogue
    and grouped (concat) s2d inputs. The kernel compiles and is exact on
    real TPU but measured slower than the production dense-s2d XLA form
    (see the module docstring for the why); it is kept as the measured
    Pallas reference point for this op."""

    @pytest.mark.parametrize(
        "cin,cout,h,w,groups",
        [(8, 16, 16, 16, ()), (5, 4, 8, 12, ()), (6, 4, 8, 8, (2, 4))],
    )
    def test_matches_direct(self, cin, cout, h, w, groups):
        from mingraph_unet_tpu.ops import s2d
        from mingraph_unet_tpu.ops.pallas import wconv

        r = np.random.default_rng(0)
        x = jnp.asarray(r.standard_normal((2, h, w, cin)), jnp.float32)
        k = jnp.asarray(r.standard_normal((3, 3, cin, cout)), jnp.float32) * 0.1
        b = jnp.asarray(r.standard_normal((cout,)), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        ref = jnp.maximum(ref, 0.0)
        if groups:
            offs = np.cumsum((0,) + groups)
            xs = jnp.concatenate(
                [s2d.space_to_depth(x[..., offs[i]:offs[i + 1]]) for i in range(len(groups))],
                -1,
            )
        else:
            xs = s2d.space_to_depth(x)
        out = wconv.wconv3x3_s2d(
            xs, wconv.wconv3x3_weights(k), b, groups=groups, relu=True,
            row_tile=4, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(s2d.depth_to_space(out)), np.asarray(ref), atol=1e-5
        )


class TestPhaseSelectConv:
    """Exactness of the phase-select s2d conv kernel (ops/pallas/psconv.py)
    vs the XLA dense-s2d lowering — the production inference path for the
    U-Net's full-resolution s2d→s2d convs on TPU."""

    @pytest.mark.parametrize(
        "shape",
        [(2, 16, 16, 32, 32), (1, 32, 16, 8, 16), (3, 8, 24, 4, 4), (2, 14, 10, 32, 32)],
    )
    def test_matches_dense_s2d(self, shape):
        from mingraph_unet_tpu.ops import s2d
        from mingraph_unet_tpu.ops.pallas.psconv import (
            conv3x3_s2d_psel,
            psconv_weights,
        )

        b, h, w, cin, cout = shape
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        xs = s2d.space_to_depth(x)
        k2 = s2d.s2d_conv3x3_kernel(k, (cin,))
        with jax.default_matmul_precision("highest"):
            ref = jax.nn.relu(s2d.conv3x3_s2d(xs, k2) + s2d.s2d_vector(bias))
            got = conv3x3_s2d_psel(
                xs, psconv_weights(k), s2d.s2d_vector(bias), relu=True, interpret=True
            )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)

    def test_no_epilogue_matches(self):
        from mingraph_unet_tpu.ops import s2d
        from mingraph_unet_tpu.ops.pallas.psconv import (
            conv3x3_s2d_psel,
            psconv_weights,
        )

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 12, 12, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.2, jnp.float32)
        xs = s2d.space_to_depth(x)
        k2 = s2d.s2d_conv3x3_kernel(k, (16,))
        with jax.default_matmul_precision("highest"):
            ref = s2d.conv3x3_s2d(xs, k2)  # raw conv, no bias/ReLU
            got = conv3x3_s2d_psel(
                xs, psconv_weights(k), jnp.zeros((64,), jnp.float32),
                relu=False, interpret=True,
            )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


class TestConstMapConv:
    """conv3x3_s2d_const (analytic border-attenuated constant-map conv) vs
    the literal conv it replaces (models/unet.py decoder bias field)."""

    def test_matches_conv(self):
        from mingraph_unet_tpu.ops import s2d

        rng = np.random.default_rng(2)
        hh, ww, cin, cout = 9, 7, 8, 12
        k2 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.float32)
        v = jnp.asarray(rng.standard_normal(cin), jnp.float32)
        bmap = jnp.broadcast_to(v, (1, hh, ww, cin))
        with jax.default_matmul_precision("highest"):
            ref = s2d.conv3x3_s2d(bmap, k2)[0]
            got = s2d.conv3x3_s2d_const(v, k2, hh, ww)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_grouped_input_matches(self):
        from mingraph_unet_tpu.ops import s2d
        from mingraph_unet_tpu.ops.pallas.psconv import (
            conv3x3_s2d_psel,
            psconv_lane_masks,
            psconv_weights,
        )

        rng = np.random.default_rng(3)
        gs, h, w, cout = (8, 16), 12, 8, 8
        cin = sum(gs)
        parts = [
            jnp.asarray(rng.standard_normal((2, h, w, g)), jnp.float32) for g in gs
        ]
        xs = jnp.concatenate([s2d.space_to_depth(p) for p in parts], axis=-1)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        k2 = s2d.s2d_conv3x3_kernel(k, gs)
        with jax.default_matmul_precision("highest"):
            ref = jax.nn.relu(s2d.conv3x3_s2d(xs, k2) + s2d.s2d_vector(bias))
            got = conv3x3_s2d_psel(
                xs, psconv_weights(k, gs), s2d.s2d_vector(bias),
                relu=True, interpret=True, lane_masks=psconv_lane_masks(cin, gs),
            )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


class TestDecConv1Fused:
    """Fused decoder conv1 (psel skip term + tap-pair-packed x_prev conv +
    bias-field epilogue) vs the XLA fused_up path it replaces."""

    # (2, 8, 1): s2d width 1 — every column is both first AND last, the
    # degenerate case where the pre-r4 where-chain column profile dropped
    # the last-column field delta (ADVICE r3).
    @pytest.mark.parametrize("shape", [(2, 12, 10), (1, 8, 8), (3, 16, 6), (2, 8, 1)])
    def test_matches_xla_fused_up(self, shape):
        from mingraph_unet_tpu.ops import s2d
        from mingraph_unet_tpu.ops.pallas import psconv as P

        b, hh, ww = shape
        skip_c = up_c = cout = 32
        cprev = 64
        rng = np.random.default_rng(0)
        x_skip = jnp.asarray(rng.standard_normal((b, hh, ww, 4 * skip_c)), jnp.float32)
        x_prev = jnp.asarray(rng.standard_normal((b, hh, ww, cprev)), jnp.float32)
        kernel = jnp.asarray(
            rng.standard_normal((3, 3, skip_c + up_c, cout)) * 0.2, jnp.float32
        )
        bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        kt = jnp.asarray(rng.standard_normal((2, 2, cprev, up_c)) * 0.2, jnp.float32)
        bias_up = jnp.asarray(rng.standard_normal(up_c), jnp.float32)
        wt = s2d.s2d_convt2x2_kernel(kt)
        groups = (skip_c, up_c)
        k2 = s2d.s2d_conv3x3_kernel(kernel, groups)
        k2a = k2[:, :, : 4 * skip_c, :]
        k2b = k2[:, :, 4 * skip_c :, :]
        k2b_x = jnp.einsum("cq,yxqo->yxco", wt, k2b)
        with jax.default_matmul_precision("highest"):
            field = s2d.conv3x3_s2d_const(s2d.s2d_vector(bias_up), k2b, hh, ww)
            ref = jax.nn.relu(
                s2d.conv3x3_s2d(x_skip, k2a)
                + s2d.conv3x3_s2d(x_prev, k2b_x)
                + field[None]
                + s2d.s2d_vector(bias)
            )
            km, kp, kc = P.dec_conv1_weights(kernel, skip_c, wt)
            t9 = P.dec_conv1_bias_table(kernel, skip_c, bias_up, bias)
            got = P.dec_conv1_fused(x_skip, x_prev, km, kp, kc, t9, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


class TestConvBlockPsconvDispatch:
    """ConvBlock/DecoderBlock-level psconv dispatch (the _psconv_on gate,
    eligibility checks, and weight wiring against BN-folded kernels) run on
    CPU with interpreter-mode kernels: output equivalence vs the XLA
    lowering at the exact production call sites (ADVICE r3)."""

    def _force_interpret(self, monkeypatch):
        from mingraph_unet_tpu.ops.pallas import psconv

        monkeypatch.setattr(psconv, "_INTERPRET", True)

    def test_convblock_s2d_psconv_vs_xla(self, monkeypatch):
        from mingraph_unet_tpu.models.unet import ConvBlock

        self._force_interpret(monkeypatch)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)), jnp.float32)  # cin=32
        mk = lambda use: ConvBlock(32, True, jnp.float32, s2d=True, use_psconv=use)
        variables = mk(False).init(jax.random.key(0), x)
        with jax.default_matmul_precision("highest"):
            ref = mk(False).apply(variables, x, train=False)
            got = mk(True).apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)

    def test_decoder_block_fused_psconv_vs_xla(self, monkeypatch):
        from mingraph_unet_tpu.models.unet import DecoderBlock

        self._force_interpret(monkeypatch)
        rng = np.random.default_rng(1)
        x_prev = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
        x_skip = jnp.asarray(rng.standard_normal((2, 8, 8, 128)), jnp.float32)
        mk = lambda use: DecoderBlock(
            out_features=32, up_features=32, dtype=jnp.float32, s2d=True, use_psconv=use
        )
        variables = mk(False).init(jax.random.key(0), x_prev, x_skip)
        with jax.default_matmul_precision("highest"):
            ref = mk(False).apply(variables, x_prev, x_skip, train=False)
            got = mk(True).apply(variables, x_prev, x_skip, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


class TestPsconvSharding:
    """SPMD story (VERDICT r3 #5): under a data-parallel mesh the psconv
    custom-calls partition over batch (each shard runs its local kernel) —
    sharded inference keeps psconv with NO all-gather around the call."""

    def _no_allgather(self, compiled_text):
        t = compiled_text.lower()
        assert "all-gather" not in t and "all_gather" not in t, "operands were replicated"

    def test_psel_data_sharded_equivalence(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mingraph_unet_tpu.ops import s2d
        from mingraph_unet_tpu.ops.pallas.psconv import conv3x3_s2d_psel, psconv_weights
        from mingraph_unet_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(0)
        cin = cout = 16
        x = jnp.asarray(rng.standard_normal((8, 8, 8, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        xs = s2d.space_to_depth(x)
        km = psconv_weights(k)
        bv = s2d.s2d_vector(bias)

        def f(xs):
            return conv3x3_s2d_psel(xs, km, bv, relu=True, interpret=True)

        with jax.default_matmul_precision("highest"):
            ref = f(xs)
            mesh = make_mesh(8, 1)
            with mesh:
                xs_sh = jax.device_put(xs, NamedSharding(mesh, P("data")))
                jf = jax.jit(f)
                got = jf(xs_sh)
                compiled = jf.lower(xs_sh).compile().as_text()
        self._no_allgather(compiled)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)

    def test_dec1_data_sharded_equivalence(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mingraph_unet_tpu.ops import s2d
        from mingraph_unet_tpu.ops.pallas import psconv as P_ops
        from mingraph_unet_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(1)
        skip_c = up_c = cout = 8
        cprev = 16
        x_skip = jnp.asarray(rng.standard_normal((8, 8, 8, 4 * skip_c)), jnp.float32)
        x_prev = jnp.asarray(rng.standard_normal((8, 8, 8, cprev)), jnp.float32)
        kernel = jnp.asarray(
            rng.standard_normal((3, 3, skip_c + up_c, cout)) * 0.2, jnp.float32
        )
        bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        kt = jnp.asarray(rng.standard_normal((2, 2, cprev, up_c)) * 0.2, jnp.float32)
        bias_up = jnp.asarray(rng.standard_normal(up_c), jnp.float32)
        wt = s2d.s2d_convt2x2_kernel(kt)
        km, kp, kc = P_ops.dec_conv1_weights(kernel, skip_c, wt)
        t9 = P_ops.dec_conv1_bias_table(kernel, skip_c, bias_up, bias)

        def f(a, b):
            return P_ops.dec_conv1_fused(a, b, km, kp, kc, t9, interpret=True)

        with jax.default_matmul_precision("highest"):
            ref = f(x_skip, x_prev)
            mesh = make_mesh(8, 1)
            with mesh:
                sh = NamedSharding(mesh, P("data"))
                a, b = jax.device_put(x_skip, sh), jax.device_put(x_prev, sh)
                jf = jax.jit(f)
                got = jf(a, b)
                compiled = jf.lower(a, b).compile().as_text()
        self._no_allgather(compiled)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


class TestPsconvMeshGate:
    """The auto dispatch gate is mesh-aware (ADVICE r3): spatially-sharded
    paths fall back to the XLA lowering, data-parallel profitability counts
    per-shard pixels."""

    def test_active_mesh_shape(self):
        from mingraph_unet_tpu.models.unet import _active_mesh_shape
        from mingraph_unet_tpu.parallel.mesh import make_mesh

        assert _active_mesh_shape() == {}
        with make_mesh(4, 2):
            shape = _active_mesh_shape()
            assert shape.get("spatial") == 2 and shape.get("data") == 4
        assert _active_mesh_shape() == {}

    def test_gate_spatial_off_and_per_shard_pixels(self, monkeypatch):
        from mingraph_unet_tpu.models.unet import ConvBlock
        from mingraph_unet_tpu.parallel.mesh import make_mesh

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        blk = ConvBlock(32, dtype=jnp.bfloat16, s2d=True)
        # single-device: 8·256·256·128 lanes = 2^26 passes the 2^25 gate
        assert blk._psconv_on(8, 256, 256)
        with make_mesh(4, 2):  # spatial axis > 1 -> XLA path
            assert not blk._psconv_on(8, 256, 256)
        with make_mesh(8, 1):  # per-shard: 2^26 / 8 = 2^23 < 2^25 -> off
            assert not blk._psconv_on(8, 256, 256)
        with make_mesh(2, 1):  # per-shard: 2^25 -> on
            assert blk._psconv_on(8, 256, 256)
        # explicit override bypasses the gate entirely
        assert ConvBlock(32, dtype=jnp.bfloat16, s2d=True, use_psconv=True)._psconv_on(1, 2, 2)

    def test_gate_lane_aware(self, monkeypatch):
        """r4: profitability is pixels·lanes ≥ 2^25 — 256-lane (level-1)
        sites clear it at half the pixels of 128-lane sites (the measured
        712 → 737 img/s win at 8·128²·256 = 2^25)."""
        from mingraph_unet_tpu.models.unet import ConvBlock

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        blk = ConvBlock(64, dtype=jnp.bfloat16, s2d=True)
        assert not blk._psconv_on(8, 128, 128, lanes=128)  # 2^24 -> off
        assert blk._psconv_on(8, 128, 128, lanes=256)  # 2^25 -> on
        # fp32 never passes the auto gate
        assert not ConvBlock(64, s2d=True)._psconv_on(8, 128, 128, lanes=256)

    def test_unet_structural_level1_auto(self, monkeypatch):
        """UNet.s2d_level1=None resolves at trace time: ON exactly when the
        256-lane kernel gate passes (inference, TPU, bf16, shape over the
        threshold); OFF in training and under spatial sharding (where the
        dense-s2d fallback is a measured loss)."""
        from mingraph_unet_tpu.models.unet import UNet
        from mingraph_unet_tpu.parallel.mesh import make_mesh

        unet = UNet(dtype=jnp.bfloat16, s2d_level0=True)
        x = jnp.zeros((8, 512, 512, 3), jnp.bfloat16)
        # CPU backend: auto stays off
        assert not unet._resolve_s2d_level1(x, train=False)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert unet._resolve_s2d_level1(x, train=False)
        assert not unet._resolve_s2d_level1(x, train=True)  # train: off (A/B pending)
        assert not unet._resolve_s2d_level1(x[:2], train=False)  # 2^23 < 2^25
        with make_mesh(4, 2):  # spatial sharding -> off
            assert not unet._resolve_s2d_level1(x, train=False)
        # explicit settings win over auto
        assert UNet(s2d_level1=True)._resolve_s2d_level1(x[:1], train=True)
        assert not UNet(dtype=jnp.bfloat16, s2d_level1=False)._resolve_s2d_level1(
            x, train=False
        )
        # fp32 never auto-engages; odd sizes never auto-engage
        assert not UNet(s2d_level0=True)._resolve_s2d_level1(x, train=False)
        assert not unet._resolve_s2d_level1(
            jnp.zeros((8, 510, 510, 3), jnp.bfloat16), train=False
        )


class TestPsconvTrainVJP:
    """Gradient parity of the training-path psconv custom_vjp (adjoint-
    kernel psel for dx, operand-einsum + psconv_weights pullback for dK)
    vs the XLA dense-s2d lowering (VERDICT r3 #3)."""

    def _setup(self, b=2, h=12, w=10, cin=8, cout=8, seed=0):
        from mingraph_unet_tpu.ops import s2d

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2, jnp.float32)
        r = jnp.asarray(
            rng.standard_normal((b, h // 2, w // 2, 4 * cout)), jnp.float32
        )
        return s2d.space_to_depth(x), k, r

    def test_value_and_grads_match_xla(self):
        from mingraph_unet_tpu.ops import s2d
        from mingraph_unet_tpu.ops.pallas.psconv import psconv_train

        xs, k, r = self._setup()

        def loss_ours(xs, k):
            return jnp.sum(psconv_train(xs, k, interpret=True) * r)

        def loss_ref(xs, k):
            return jnp.sum(s2d.conv3x3_s2d(xs, s2d.s2d_conv3x3_kernel(k, (k.shape[2],))) * r)

        with jax.default_matmul_precision("highest"):
            v0, (gx0, gk0) = jax.value_and_grad(loss_ref, (0, 1))(xs, k)
            v1, (gx1, gk1) = jax.value_and_grad(loss_ours, (0, 1))(xs, k)
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), atol=5e-5)
        np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk0), atol=5e-4)

    def test_nonsquare_and_rect_channels(self):
        from mingraph_unet_tpu.ops import s2d
        from mingraph_unet_tpu.ops.pallas.psconv import psconv_train

        xs, k, r = self._setup(b=1, h=8, w=16, cin=4, cout=12, seed=3)

        def loss_ours(xs, k):
            return jnp.sum(psconv_train(xs, k, interpret=True) * r)

        def loss_ref(xs, k):
            return jnp.sum(s2d.conv3x3_s2d(xs, s2d.s2d_conv3x3_kernel(k, (k.shape[2],))) * r)

        with jax.default_matmul_precision("highest"):
            g0 = jax.grad(loss_ref, (0, 1))(xs, k)
            g1 = jax.grad(loss_ours, (0, 1))(xs, k)
        for a, b_ in zip(g1, g0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)

    def test_convblock_train_dispatch_matches_xla(self, monkeypatch):
        """ConvBlock-level: forced psconv in TRAIN mode (raw conv + bias +
        train-BN + ReLU epilogue) matches the XLA path in value AND grads,
        including batch_stats updates."""
        from mingraph_unet_tpu.models.unet import ConvBlock
        from mingraph_unet_tpu.ops.pallas import psconv

        monkeypatch.setattr(psconv, "_INTERPRET", True)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)), jnp.float32)  # cin=32
        mk = lambda use: ConvBlock(32, True, jnp.float32, s2d=True, use_psconv=use)
        variables = mk(False).init(jax.random.key(0), x)
        params = variables["params"]
        stats = variables["batch_stats"]

        def loss(params, x, use):
            out, upd = mk(use).apply(
                {"params": params, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(out**2), upd["batch_stats"]

        with jax.default_matmul_precision("highest"):
            (v0, bs0), g0 = jax.value_and_grad(loss, has_aux=True)(params, x, False)
            (v1, bs1), g1 = jax.value_and_grad(loss, has_aux=True)(params, x, True)
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-4
            ),
            (g1, bs1), (g0, bs0),
        )


class TestPhaseMaxPoolKernel:
    """ops/pallas/pool.py — the relayout-free encoder MaxPool (r5): value
    parity vs ops/s2d.py::phase_max_pool at both production lane widths,
    and the encoder-level dispatch gate (_phase_pool)."""

    @pytest.mark.parametrize("shape,dtype", [
        ((3, 16, 24, 128), jnp.float32),   # level-0 lanes (32ch)
        ((2, 8, 8, 256), jnp.bfloat16),    # level-1 lanes (64ch)
        ((1, 4, 40, 64), jnp.bfloat16),    # odd grid, 16ch
    ])
    def test_matches_xla_form(self, shape, dtype):
        from mingraph_unet_tpu.ops import s2d
        from mingraph_unet_tpu.ops.pallas import pool

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal(shape), dtype)
        ref = s2d.phase_max_pool(x)
        got = pool.phase_max_pool_pallas(x, interpret=True)
        assert got.dtype == ref.dtype and got.shape == ref.shape
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_encoder_dispatch_gate(self, monkeypatch):
        """The gate engages only for inference+TPU+no-spatial+big-enough;
        training and spatial meshes keep the XLA form (which has a VJP)."""
        from mingraph_unet_tpu.models import unet as unet_mod
        from mingraph_unet_tpu.ops.pallas import pool
        from mingraph_unet_tpu.parallel.mesh import make_mesh

        calls = []
        real = pool.phase_max_pool_pallas
        monkeypatch.setattr(pool, "_INTERPRET", True)
        monkeypatch.setattr(
            pool, "phase_max_pool_pallas",
            lambda y, interpret=False: calls.append(y.shape)
            or real(y, interpret=True),
        )
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.standard_normal((8, 256, 256, 128)), jnp.bfloat16)
        y = unet_mod._phase_pool(x, train=False)  # 2^26 >= 2^24 -> kernel
        assert calls == [(8, 256, 256, 128)]
        np.testing.assert_array_equal(
            np.asarray(y), np.asarray(unet_mod._phase_pool(x, train=True))
        )
        calls.clear()
        unet_mod._phase_pool(x, train=True)  # train -> XLA
        small = jnp.asarray(rng.standard_normal((1, 8, 8, 128)), jnp.bfloat16)
        unet_mod._phase_pool(small, train=False)  # below threshold -> XLA
        with make_mesh(4, 2):  # spatial mesh -> XLA
            unet_mod._phase_pool(x, train=False)
        assert calls == []


class TestDepthToSpaceKernel:
    """ops/pallas/pool.py::depth_to_space_pallas — bit-exactness vs the XLA
    form, and the default-off dispatch (a measured NEUTRAL on v5e: the
    kernel removes the two-copy chain from the trace but pays the same in
    in-kernel interleaves; MG_D2S_KERNEL=1 re-enables)."""

    @pytest.mark.parametrize("shape,dtype", [
        ((3, 16, 24, 128), jnp.float32),
        ((2, 8, 8, 256), jnp.bfloat16),
        ((1, 4, 40, 64), jnp.bfloat16),
    ])
    def test_matches_xla_form(self, shape, dtype):
        from mingraph_unet_tpu.ops import s2d
        from mingraph_unet_tpu.ops.pallas import pool

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal(shape), dtype)
        ref = s2d.depth_to_space(x)
        got = pool.depth_to_space_pallas(x, interpret=True)
        assert got.dtype == ref.dtype and got.shape == ref.shape
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_dispatch_default_off(self, monkeypatch):
        from mingraph_unet_tpu.models import unet as unet_mod
        from mingraph_unet_tpu.ops.pallas import pool

        calls = []
        real = pool.depth_to_space_pallas
        monkeypatch.setattr(pool, "_INTERPRET", True)
        monkeypatch.setattr(
            pool, "depth_to_space_pallas",
            lambda y, interpret=False: calls.append(y.shape)
            or real(y, interpret=True),
        )
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.standard_normal((8, 128, 128, 256)), jnp.bfloat16)
        monkeypatch.delenv("MG_D2S_KERNEL", raising=False)
        y_xla = unet_mod._d2s(x, train=False)  # default: XLA form
        assert calls == []
        monkeypatch.setenv("MG_D2S_KERNEL", "1")
        y_krn = unet_mod._d2s(x, train=False)
        assert calls == [(8, 128, 128, 256)]
        np.testing.assert_array_equal(np.asarray(y_krn), np.asarray(y_xla))
        calls.clear()
        unet_mod._d2s(x, train=True)  # train -> XLA even when enabled
        assert calls == []
