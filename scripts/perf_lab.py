#!/usr/bin/env python
"""Perf lab: in-process A/B timing of pipeline stages on the real TPU.

The axon relay's session-to-session throughput varies ±30%, so alternatives
are always measured *within one process* against a shared baseline. Timing
methodology (see bench.py): N iterations inside one jit via ``lax.scan`` with
a loop-carried scalar checksum; only the scalar crosses the relay.

Usage: python scripts/perf_lab.py <experiment> [...]
Experiments: stages | detpool | histeq | unet
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8
SIZE = 512


def timed_loop(fn, args, iters=20, reps=3, label=""):
    """Per-step time via two loop lengths: the relay adds a fixed ~25-30 ms
    dispatch cost per executable call, so a single N-iter loop overstates the
    per-step time by ~1.4 ms at N=20. Timing N and 3N iterations and taking
    the slope cancels the fixed cost."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("length",))
    def loop(*a, length):
        def body(carry, _):
            chk = fn(*a, carry)
            return chk, None

        chk, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
        return chk

    t0 = time.perf_counter()
    float(loop(*args, length=iters))
    float(loop(*args, length=3 * iters))
    compile_t = time.perf_counter() - t0

    def best(length):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(*args, length=length))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_short, t_long = best(iters), best(3 * iters)
    ms = (t_long - t_short) / (2 * iters) * 1e3
    print(f"[lab] {label:<44} {ms:8.2f} ms/step  (compile {compile_t:.0f}s)")
    return ms


def setup():
    from mingraph_unet_tpu.utils.env import setup_host

    setup_host(force_cpu=False)
    import jax

    print(f"[lab] backend={jax.default_backend()} devices={jax.devices()}")


def exp_stages():
    """Per-stage breakdown of the 512² b8 bf16 pipeline."""
    setup()
    import jax
    import jax.numpy as jnp

    from mingraph_unet_tpu.models.detection import DetectionHead
    from mingraph_unet_tpu.models.pipeline import MinGraphUNet
    from mingraph_unet_tpu.models.unet import UNet
    from mingraph_unet_tpu.ops import filters

    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.float32)

    model = MinGraphUNet(dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0), x)

    def full(variables, x, c):
        out = model.apply(variables, x + c * 1e-12, train=False)
        return out["logits"].sum() + out["pred_confidence"].sum()

    timed_loop(full, (variables, x), label="full pipeline")

    unet = UNet(dtype=jnp.bfloat16)
    uv = jax.jit(unet.init)(jax.random.key(0), x)

    def unet_fwd(uv, x, c):
        logits, skips, f_u = unet.apply(uv, x + c * 1e-12, train=False)
        return logits.sum()

    timed_loop(unet_fwd, (uv, x), label="U-Net only")

    # Detection head on a fused-map-shaped input (32 + 64 = 96 ch).
    fused = jnp.zeros((BATCH, SIZE, SIZE, 96), jnp.bfloat16)
    det = DetectionHead(dtype=jnp.bfloat16)
    dv = jax.jit(det.init)(jax.random.key(0), fused)

    def det_fwd(dv, fused, c):
        bb, conf = det.apply(dv, fused + c * jnp.bfloat16(1e-8), train=False)
        return bb.sum() + conf.sum()

    timed_loop(det_fwd, (dv, fused), label="detection head (exact, 512² conv)")

    rgb = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.uint8)

    def histeq_xla(rgb, c):
        out = jax.vmap(filters.equalize_histogram_rgb)(rgb).astype(jnp.float32)
        return out.sum() + c * 0

    timed_loop(histeq_xla, (rgb,), label="hist-eq RGB (XLA one-hot)")

    def sobel(rgb, c):
        return filters.sobel_magnitude(rgb.astype(jnp.float32) + c * 1e-12).sum()

    timed_loop(sobel, (rgb,), label="sobel")


def exp_detpool():
    """Detection head: exact vs pre-pooled variants."""
    setup()
    import jax
    import jax.numpy as jnp

    from mingraph_unet_tpu.models.detection import DetectionHead

    fused = jnp.zeros((BATCH, SIZE, SIZE, 96), jnp.bfloat16)
    for pool in (None, 64, 32, 16):
        det = DetectionHead(dtype=jnp.bfloat16, pre_pool_size=pool)
        dv = jax.jit(det.init)(jax.random.key(0), fused)

        def det_fwd(dv, fused, c, det=det):
            bb, conf = det.apply(dv, fused + c * jnp.bfloat16(1e-8), train=False)
            return bb.sum() + conf.sum()

        timed_loop(det_fwd, (dv, fused), label=f"detection head pre_pool={pool}")


def exp_histeq():
    """Aux features: XLA vs Pallas hist-eq, sobel, denormalize chain."""
    setup()
    import jax
    import jax.numpy as jnp

    from mingraph_unet_tpu.ops import filters

    rgb = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.uint8)

    def vary_u8(x, c):
        # (c·1e-12)→int is 0 at runtime but NOT foldable at compile time, so
        # the body stays loop-variant (c*0 folds and XLA hoists everything).
        return x + (c * 1e-12).astype(jnp.uint8)

    def xla_path(rgb, c):
        out = jax.vmap(filters.equalize_histogram_rgb)(vary_u8(rgb, c)).astype(jnp.float32)
        return out.sum()

    timed_loop(xla_path, (rgb,), label="hist-eq RGB (XLA vmap)")

    def batched_xla(rgb, c):
        out = filters.equalize_histogram_rgb_batched(
            vary_u8(rgb, c), use_pallas=False
        ).astype(jnp.float32)
        return out.sum()

    timed_loop(batched_xla, (rgb,), label="hist-eq RGB (batched XLA)")

    def batched_pallas(rgb, c):
        out = filters.equalize_histogram_rgb_batched(
            vary_u8(rgb, c), use_pallas=True
        ).astype(jnp.float32)
        return out.sum()

    timed_loop(batched_pallas, (rgb,), label="hist-eq RGB (batched pallas)")

    from mingraph_unet_tpu.ops.pallas.histeq import equalize_channel_pallas

    y = jnp.zeros((BATCH, SIZE, SIZE), jnp.int32)

    def kernel_only(y, c):
        return equalize_channel_pallas(y + (c * 1e-12).astype(jnp.int32)).astype(jnp.float32).sum()

    timed_loop(kernel_only, (y,), label="hist-eq luma kernel only (pallas)")

    def luma_xla(y, c):
        from mingraph_unet_tpu.ops.filters import _equalize_channel_u8

        out = jax.vmap(_equalize_channel_u8)(y + (c * 1e-12).astype(jnp.int32))
        return out.astype(jnp.float32).sum()

    timed_loop(luma_xla, (y,), label="hist-eq luma only (XLA one-hot)")

    def luma_nibble(y, c):
        from mingraph_unet_tpu.ops.filters import _equalize_channel_u8_nibble

        out = jax.vmap(_equalize_channel_u8_nibble)(y + (c * 1e-12).astype(jnp.int32))
        return out.astype(jnp.float32).sum()

    timed_loop(luma_nibble, (y,), label="hist-eq luma only (nibble matmul)")

    def sobel(rgb, c):
        return filters.sobel_magnitude(rgb.astype(jnp.float32) + c * 1e-12).sum()

    timed_loop(sobel, (rgb,), label="sobel f32")

    def sobel_bf16(rgb, c):
        g = filters.sobel_magnitude(rgb.astype(jnp.bfloat16) + c.astype(jnp.bfloat16) * 1e-8)
        return g.astype(jnp.float32).sum()

    timed_loop(sobel_bf16, (rgb,), label="sobel bf16")


def exp_unet():
    """U-Net lowering variants: standard vs s2d level-0."""
    setup()
    import jax
    import jax.numpy as jnp

    from mingraph_unet_tpu.models.unet import UNet

    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.float32)
    for s2d in (False, True):
        unet = UNet(dtype=jnp.bfloat16, s2d_level0=s2d)
        uv = jax.jit(unet.init)(jax.random.key(0), x)

        def unet_fwd(uv, x, c, unet=unet):
            logits, skips, f_u = unet.apply(uv, x + c * 1e-12, train=False)
            return logits.sum()

        timed_loop(unet_fwd, (uv, x), label=f"U-Net bf16 s2d_level0={s2d}")


def exp_unetparts():
    """Locate the U-Net's remaining cost: encoder vs decoder, BN on/off."""
    setup()
    import jax
    import jax.numpy as jnp

    from mingraph_unet_tpu.models.unet import UNet, UNetEncoder

    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.float32)

    for bn in (True, False):
        unet = UNet(dtype=jnp.bfloat16, s2d_level0=True, use_batchnorm=bn)
        uv = jax.jit(unet.init)(jax.random.key(0), x)

        def unet_fwd(uv, x, c, unet=unet):
            return unet.apply(uv, x + c * 1e-12, train=False)[0].sum()

        timed_loop(unet_fwd, (uv, x), label=f"U-Net s2d bn={bn}")

    enc = UNetEncoder(dtype=jnp.bfloat16, s2d_level0=True)
    ev = jax.jit(enc.init)(jax.random.key(0), x)

    def enc_fwd(ev, x, c):
        skips, bott, _ = enc.apply(ev, x + c * 1e-12, train=False)
        return (bott.sum() + skips[0].sum()).astype(jnp.float32)

    timed_loop(enc_fwd, (ev, x), label="encoder only (s2d)")

    # Encoder without materializing the full-res skip (is depth_to_space
    # + the skip output costing bandwidth?)
    def enc_fwd_nod2s(ev, x, c):
        skips, bott, s2d0 = enc.apply(ev, x + c * 1e-12, train=False)
        extra = s2d0.sum() if s2d0 is not None else 0.0
        return (bott.sum() + extra).astype(jnp.float32)

    timed_loop(enc_fwd_nod2s, (ev, x), label="encoder only (skip0 via s2d, no d2s)")


def exp_full():
    """Full pipeline: round-1 config vs round-2 (s2d + det pre-pool + pallas
    histeq), in one process."""
    setup()
    import jax
    import jax.numpy as jnp

    from mingraph_unet_tpu.models.pipeline import MinGraphUNet

    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.float32)
    variants = [
        ("round-1 (exact det, no s2d)", dict(unet_s2d_level0=False)),
        ("round-2 (s2d + det pre-pool 32)", dict(detection_pre_pool=32)),
    ]
    for label, kw in variants:
        model = MinGraphUNet(dtype=jnp.bfloat16, **kw)
        variables = jax.jit(model.init)(jax.random.key(0), x)

        def full(variables, x, c, model=model):
            out = model.apply(variables, x + c * 1e-12, train=False)
            return out["logits"].sum() + out["pred_confidence"].sum()

        ms = timed_loop(full, (variables, x), label=f"full pipeline {label}")
        print(f"      -> {BATCH / ms * 1e3:.0f} images/s")


def exp_train():
    """Training wall-clock: per-step dispatch vs scan_window=8 (128² b16 e2e),
    including host→device batch transfer and the metrics fetch."""
    setup()
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mingraph_unet_tpu.config import PipelineConfig
    from mingraph_unet_tpu.train.common import TrainState, make_multistep, make_optimizer
    from mingraph_unet_tpu.train.end_to_end import build_mingraph_unet, make_e2e_train_step

    import dataclasses

    cfg = PipelineConfig()
    cfg.preprocessing = dataclasses.replace(cfg.preprocessing, resize_dim=(128, 128))
    cfg.training = dataclasses.replace(cfg.training, batch_size=16, bf16=True)
    model = build_mingraph_unet(cfg)
    tx, _ = make_optimizer(cfg.training, 1)
    rng = np.random.default_rng(0)
    imgs_np = rng.integers(0, 255, (16, 128, 128, 3), np.uint8)
    masks_np = rng.integers(0, 2, (16, 128, 128), np.uint8)

    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((16, 128, 128, 3), jnp.float32))
    state0 = TrainState.create(variables, tx)
    step = make_e2e_train_step(model, tx, cfg, augment=True)
    jit_step = jax.jit(step, donate_argnums=(0,))
    W = 8
    jit_window = jax.jit(make_multistep(step, W), donate_argnums=(0,))

    def run_single(state, n):
        for i in range(n):
            imgs = jnp.asarray(imgs_np)
            masks = jnp.asarray(masks_np)
            state, aux = jit_step(state, imgs, masks, jax.random.key(i))
            jax.device_get(aux)
        return state

    def run_window(state, n):
        # Deferred fetch: metrics lag one window so transfer overlaps compute.
        prev = None
        for i in range(n // W):
            imgs = jnp.asarray(np.stack([imgs_np] * W))
            masks = jnp.asarray(np.stack([masks_np] * W))
            state, aux = jit_window(state, imgs, masks, jax.random.key(i))
            if prev is not None:
                jax.device_get(prev)
            prev = aux
        jax.device_get(prev)
        return state

    state = run_single(state0, 2)  # compile
    t0 = time.perf_counter()
    state = run_single(state, 16)
    t_single = (time.perf_counter() - t0) / 16
    print(f"[lab] e2e train 128² b16 per-step dispatch        {t_single * 1e3:8.1f} ms/step")

    state = run_window(state, W)  # compile
    t0 = time.perf_counter()
    state = run_window(state, 16)
    t_window = (time.perf_counter() - t0) / 16
    print(f"[lab] e2e train 128² b16 scan_window={W}            {t_window * 1e3:8.1f} ms/step")
    print(f"      -> {t_single / t_window:.1f}x wall-clock")

    # Compute floor: device-resident window, no per-step host transfer.
    imgs_dev = jnp.asarray(np.stack([imgs_np] * W))
    masks_dev = jnp.asarray(np.stack([masks_np] * W))
    jit_window_nodonate = jax.jit(make_multistep(step, W))

    def run_resident(state, n):
        prev = None
        for i in range(n // W):
            state, aux = jit_window_nodonate(state, imgs_dev, masks_dev, jax.random.key(i))
            if prev is not None:
                jax.device_get(prev)
            prev = aux
        jax.device_get(prev)
        return state

    state = run_resident(state, W)
    t0 = time.perf_counter()
    state = run_resident(state, 32)
    t_res = (time.perf_counter() - t0) / 32
    print(f"[lab] e2e train 128² b16 device-resident window     {t_res * 1e3:8.1f} ms/step")

    # Host→device transfer rate over the relay.
    blob = np.zeros((32 << 20,), np.uint8)
    jnp.asarray(blob[: 1 << 20]).block_until_ready()
    t0 = time.perf_counter()
    x = jnp.asarray(blob)
    x.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"[lab] host->device 32MB: {dt * 1e3:.0f} ms ({32 / dt:.0f} MB/s)")

    # --- Non-resident data: does the relay overlap transfer with compute?
    # (VERDICT r2 #7: target wall/compute <= 1.3x at 128² b16.)
    n_windows = 6
    host_batches = [
        (
            rng.integers(0, 255, (W, 16, 128, 128, 3), np.uint8),
            rng.integers(0, 2, (W, 16, 128, 128), np.uint8),
        )
        for _ in range(n_windows)
    ]

    def put(i):
        im, mk = host_batches[i]
        return jnp.asarray(im), jnp.asarray(mk)

    def run_seq(state):
        # Sequential: transfer i -> dispatch i -> fetch metrics i-1.
        prev = None
        for i in range(n_windows):
            imgs, masks = put(i)
            state, aux = jit_window_nodonate(state, imgs, masks, jax.random.key(i))
            if prev is not None:
                jax.device_get(prev)
            prev = aux
        jax.device_get(prev)
        return state

    def run_dbuf(state):
        # Double-buffered: window i+1's transfer is issued right after
        # dispatching window i, before blocking on i-1's metrics.
        prev = None
        cur = put(0)
        for i in range(n_windows):
            state, aux = jit_window_nodonate(state, *cur, jax.random.key(i))
            if i + 1 < n_windows:
                cur = put(i + 1)
            if prev is not None:
                jax.device_get(prev)
            prev = aux
        jax.device_get(prev)
        return state

    for name, fn in (("sequential", run_seq), ("double-buffered", run_dbuf)):
        state = fn(state)  # warm
        t0 = time.perf_counter()
        state = fn(state)
        t_io = (time.perf_counter() - t0) / (n_windows * W)
        print(
            f"[lab] e2e train non-resident {name:<16} {t_io * 1e3:8.1f} ms/step "
            f"({t_io / t_res:.2f}x of compute floor)"
        )


def exp_convs():
    """Microbench the U-Net's conv shapes: achieved TFLOP/s per level."""
    setup()
    import jax
    import jax.numpy as jnp

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    key = jax.random.key(0)
    for size, c_in, c_out in [
        (512, 3, 32), (512, 32, 32), (512, 64, 32),
        (256, 32, 64), (256, 64, 64), (256, 128, 64),
        (128, 64, 128), (128, 128, 128),
        (64, 128, 256), (64, 256, 256),
        (32, 256, 512), (32, 512, 512),
    ]:
        x = jax.random.normal(key, (BATCH, size, size, c_in), jnp.bfloat16)
        k = jax.random.normal(key, (3, 3, c_in, c_out), jnp.bfloat16)

        def f(x, k, c):
            return conv(x + c.astype(jnp.bfloat16) * 1e-8, k).sum()

        ms = timed_loop(f, (x, k), label=f"conv3x3 {c_in:>3}->{c_out:<3} @{size}² b8")
        gf = 2 * BATCH * size * size * c_in * c_out * 9 / 1e9
        print(f"      -> {gf / ms:.1f} TFLOP/s ({gf:.1f} GF)")


def exp_convchain():
    """Marginal cost per conv: chain K same-shape convs in the loop body."""
    setup()
    import jax
    import jax.numpy as jnp

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    key = jax.random.key(0)
    for size, c in [(512, 32), (256, 64), (128, 128), (64, 256), (512, 128)]:
        x = jax.random.normal(key, (BATCH, size, size, c), jnp.bfloat16)
        k = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * (0.5 / c)
        gf = 2 * BATCH * size * size * c * c * 9 / 1e9
        for depth in (1, 8):

            def f(x, k, cc, depth=depth):
                y = x + cc.astype(jnp.bfloat16) * 1e-8
                for _ in range(depth):
                    y = conv(y, k)
                return y.astype(jnp.float32).mean()

            ms = timed_loop(f, (x, k), label=f"chain x{depth} conv {c}ch @{size}² b8")
            print(f"      -> {gf * depth / ms:.1f} TFLOP/s")


def exp_convt():
    """ConvTranspose(k2, s2) lowering alternatives."""
    setup()
    import jax
    import jax.numpy as jnp

    key = jax.random.key(0)
    for size, c_in in [(32, 512), (64, 256), (128, 128), (256, 64)]:
        c_out = c_in // 2
        x = jax.random.normal(key, (BATCH, size, size, c_in), jnp.bfloat16)
        k = jax.random.normal(key, (2, 2, c_in, c_out), jnp.bfloat16) * 0.05

        def via_convt(x, k, c):
            y = jax.lax.conv_transpose(
                x + c.astype(jnp.bfloat16) * 1e-8, k, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y.astype(jnp.float32).sum()

        def via_matmul_ps(x, k, c):
            # (B,H,W,Cin) @ (Cin, 2*2*Cout) -> pixel shuffle
            xm = x + c.astype(jnp.bfloat16) * 1e-8
            km = k.transpose(2, 0, 1, 3).reshape(c_in, 4 * c_out)
            y = xm @ km  # (B,H,W,4*Cout)
            b_, h_, w_ = y.shape[:3]
            y = y.reshape(b_, h_, w_, 2, 2, c_out)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b_, 2 * h_, 2 * w_, c_out)
            return y.astype(jnp.float32).sum()

        def via_dilated(x, k, c):
            # Equivalent lhs-dilated conv form.
            y = jax.lax.conv_general_dilated(
                x + c.astype(jnp.bfloat16) * 1e-8,
                k[::-1, ::-1], (1, 1), [(1, 1), (1, 1)], lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y.astype(jnp.float32).sum()

        for name, fn in [("conv_transpose", via_convt), ("matmul+shuffle", via_matmul_ps),
                         ("lhs_dilated", via_dilated)]:
            timed_loop(fn, (x, k), label=f"convT {c_in:>3}->{c_out:<3} @{size}²→{2*size}² {name}")


def exp_unetlevels():
    """Per-level timing of the production (s2d level-0, BN-folded eval)
    U-Net blocks at 512² b8: where do the remaining ms live?"""
    setup()
    import jax
    import jax.numpy as jnp

    from mingraph_unet_tpu.models.unet import ConvBlock, DecoderBlock
    from mingraph_unet_tpu.ops import s2d as s2d_ops

    key = jax.random.key(0)

    def time_block(mod, inputs, label, gflop):
        vs = jax.jit(lambda k, *ins: mod.init(k, *ins, False))(key, *inputs)

        def f(vs, *rest):
            *ins, c = rest
            ins = list(ins)
            ins[0] = ins[0] + c.astype(ins[0].dtype) * 1e-8
            out = mod.apply(vs, *ins, False)
            return out.astype(jnp.float32).sum()

        ms = timed_loop(f, (vs, *inputs), label=label)
        print(f"      -> {gflop / ms:.1f} TFLOP/s ({gflop:.1f} GF)")
        return ms

    B = BATCH
    gf_cb = lambda size, cin, cout: 2 * B * size * size * 9 * (cin * cout + cout * cout) / 1e9
    total = 0.0

    # Encoder block0 in s2d layout: (8,256,256,12) -> (8,256,256,128)
    x0 = jax.random.normal(key, (B, 256, 256, 12), jnp.bfloat16)
    total += time_block(
        ConvBlock(32, True, jnp.bfloat16, True, (3,)), (x0,),
        "enc block0 (s2d 3->32 @512²)", gf_cb(512, 3, 32))
    for size, cin, cout, name in [(256, 32, 64, "enc block1"),
                                  (128, 64, 128, "enc block2"),
                                  (64, 128, 256, "enc block3"),
                                  (32, 256, 512, "bottleneck")]:
        x = jax.random.normal(key, (B, size, size, cin), jnp.bfloat16)
        total += time_block(ConvBlock(cout, True, jnp.bfloat16), (x,),
                            f"{name} ({cin}->{cout} @{size}²)", gf_cb(size, cin, cout))

    # Decoder blocks: (x_prev, skip) -> ConvT + ConvBlock
    def gf_dec(size_out, cin_prev, cout):
        convt = 2 * B * size_out * size_out * cin_prev * (cin_prev // 2) / 1e9
        return convt + gf_cb(size_out, cin_prev, cout)

    for sz_in, cin_prev, cout, name in [(32, 512, 256, "dec block0"),
                                        (64, 256, 128, "dec block1"),
                                        (128, 128, 64, "dec block2")]:
        xp = jax.random.normal(key, (B, sz_in, sz_in, cin_prev), jnp.bfloat16)
        sk = jax.random.normal(key, (B, 2 * sz_in, 2 * sz_in, cin_prev // 2), jnp.bfloat16)
        mod = DecoderBlock(out_features=cout, up_features=cin_prev // 2, dtype=jnp.bfloat16)
        vs = jax.jit(lambda k, a, b: mod.init(k, a, b, False))(key, xp, sk)

        def f(vs, xp, sk, c, mod=mod):
            out = mod.apply(vs, xp + c.astype(xp.dtype) * 1e-8, sk, False)
            return out.astype(jnp.float32).sum()

        ms = timed_loop(f, (vs, xp, sk), label=f"{name} ({cin_prev}->{cout} @{2*sz_in}²)")
        gf = gf_dec(2 * sz_in, cin_prev, cout)
        print(f"      -> {gf / ms:.1f} TFLOP/s ({gf:.1f} GF)")
        total += ms

    # Decoder block3 in s2d: x_prev (8,256,256,64), skip s2d (8,256,256,128)
    xp = jax.random.normal(key, (B, 256, 256, 64), jnp.bfloat16)
    sk = jax.random.normal(key, (B, 256, 256, 128), jnp.bfloat16)
    mod = DecoderBlock(out_features=32, up_features=32, dtype=jnp.bfloat16, s2d=True)
    vs = jax.jit(lambda k, a, b: mod.init(k, a, b, False))(key, xp, sk)

    def f3(vs, xp, sk, c):
        out = mod.apply(vs, xp + c.astype(xp.dtype) * 1e-8, sk, False)
        return out.astype(jnp.float32).sum()

    ms = timed_loop(f3, (vs, xp, sk), label="dec block3 (s2d 64->32 @512²)")
    gf = gf_dec(512, 64, 32)
    print(f"      -> {gf / ms:.1f} TFLOP/s ({gf:.1f} GF)")
    total += ms

    # Final 1x1 conv, production form: s2d matmul then d2s on num_classes.
    y = jax.random.normal(key, (B, 256, 256, 128), jnp.bfloat16)
    k1 = jax.random.normal(key, (1, 1, 32, 2), jnp.bfloat16)

    def final(y, k1, c):
        k2 = s2d_ops.s2d_1x1_kernel(k1)
        z = (y + c.astype(y.dtype) * 1e-8) @ k2
        out = s2d_ops.depth_to_space(z.astype(jnp.float32))
        return out.sum()

    total += timed_loop(final, (y, k1), label="s2d final 1x1 + d2s(2ch) @512²")

    # Inter-level glue: max pools.
    import flax.linen as fnn
    for size, ch in [(256, 64), (128, 128), (64, 256)]:
        xm = jax.random.normal(key, (B, size, size, ch), jnp.bfloat16)

        def mp(x, c):
            z = fnn.max_pool(x + c.astype(x.dtype) * 1e-8, (2, 2), (2, 2))
            return z.astype(jnp.float32).sum()

        total += timed_loop(mp, (xm,), label=f"maxpool {ch}ch @{size}²")
    print(f"[lab] sum of levels: {total:.2f} ms/step")


def exp_graph():
    """Graph-branch breakdown: stages 2-7 with precomputed U-Net outputs,
    plus the pooled-fusion detection alternative."""
    setup()
    import jax
    import jax.numpy as jnp

    from mingraph_unet_tpu.models.detection import DetectionHead
    from mingraph_unet_tpu.models.gat import GATNetwork
    from mingraph_unet_tpu.models.mincut import MinCutRefinement
    from mingraph_unet_tpu.models.pipeline import MinGraphUNet
    from mingraph_unet_tpu.ops.patches import broadcast_patch_to_pixels, patch_reduce_mean

    key = jax.random.key(0)
    B = BATCH
    x = jnp.zeros((B, SIZE, SIZE, 3), jnp.float32)
    model = MinGraphUNet(dtype=jnp.bfloat16, detection_pre_pool=32)
    variables = jax.jit(model.init)(key, x)

    def full(variables, x, c):
        out = model.apply(variables, x + c * 1e-12, train=False)
        return out["logits"].sum() + out["pred_confidence"].sum() + out["pred_bboxes"].sum()

    t_full = timed_loop(full, (variables, x), label="full pipeline (prod)")

    # Precompute U-Net outputs; pass them in so the loop measures stages 2-7.
    from mingraph_unet_tpu.models.unet import UNet

    unet = UNet(dtype=jnp.bfloat16, s2d_level0=True)
    uv = {"params": variables["params"]["unet"],
          "batch_stats": variables["batch_stats"]["unet"]}
    logits, skips, f_u = jax.jit(lambda uv, x: unet.apply(uv, x, train=False))(uv, x)

    def graph_only(variables, x, logits, skips, f_u, c):
        out = model.apply(
            variables, x + c * 1e-12, train=False,
            unet_outputs=(logits, skips, f_u))
        return out["pred_confidence"].sum() + out["pred_bboxes"].sum() + out["l_partition"].sum()

    t_graph = timed_loop(graph_only, (variables, x, logits, skips, list(f_u)),
                         label="stages 2-7 (graph branch + det)")
    print(f"      -> implied U-Net share: {t_full - t_graph:.2f} ms")

    # Sub-pieces at production shapes: 32x32 patch grid, feats dim 20.
    pf = jax.random.normal(key, (B, 32, 32, 20), jnp.bfloat16)
    gat = GATNetwork(hidden_dim=128, output_dim=64, num_heads=4, num_layers=1,
                     dropout_rate=0.1, alpha=0.2, backend="lattice", dtype=jnp.bfloat16)
    gv = jax.jit(lambda k, p: gat.init(k, p, deterministic=True))(key, pf)

    def gat_f(gv, pf, c):
        out = gat.apply(gv, pf + c.astype(pf.dtype) * 1e-8, deterministic=True)
        return out.astype(jnp.float32).sum()

    timed_loop(gat_f, (gv, pf), label="patch GAT (lattice, 32² grid)")

    gf = jax.random.normal(key, (B, 32, 32, 64), jnp.bfloat16)
    mc = MinCutRefinement(num_segments=2, backend="lattice", predictor_hidden=32,
                          predictor_use_gnn=True, predictor_heads=2, dtype=jnp.bfloat16)
    mv = jax.jit(lambda k, g: mc.init(k, g, deterministic=True))(key, gf)

    def mc_f(mv, gf, c):
        lp, sa = mc.apply(mv, gf + c.astype(gf.dtype) * 1e-8, deterministic=True)
        return lp.sum() + sa.sum()

    timed_loop(mc_f, (mv, gf), label="mincut (lattice, 32² grid)")

    # Fusion + detection: full-res broadcast+concat+pre-pool vs pooled concat.
    f_u0 = jax.random.normal(key, (B, SIZE, SIZE, 32), jnp.bfloat16)
    f_g_patch = jax.random.normal(key, (B, 32, 32, 64), jnp.float32)
    det = DetectionHead(dtype=jnp.bfloat16, pre_pool_size=32)
    fused0 = jnp.concatenate(
        [f_u0, broadcast_patch_to_pixels(f_g_patch, 16).astype(jnp.bfloat16)], axis=-1)
    dv = jax.jit(det.init)(key, fused0)

    def det_fullres(dv, f_u0, f_g_patch, c):
        f_g_pixel = broadcast_patch_to_pixels(f_g_patch, 16)
        fused = jnp.concatenate([f_u0 + c.astype(jnp.bfloat16) * 1e-8,
                                 f_g_pixel.astype(jnp.bfloat16)], axis=-1)
        bb, conf = det.apply(dv, fused, train=False)
        return bb.sum() + conf.sum()

    timed_loop(det_fullres, (dv, f_u0, f_g_patch), label="fusion+det (full-res broadcast)")

    det_small = DetectionHead(dtype=jnp.bfloat16, pre_pool_size=None)

    def det_pooled(dv, f_u0, f_g_patch, c):
        pooled_u = patch_reduce_mean(f_u0 + c.astype(jnp.bfloat16) * 1e-8, 16)
        fused = jnp.concatenate([pooled_u, f_g_patch.astype(jnp.bfloat16)], axis=-1)
        bb, conf = det_small.apply(dv, fused, train=False)
        return bb.sum() + conf.sum()

    timed_loop(det_pooled, (dv, f_u0, f_g_patch), label="fusion+det (pooled concat)")


def exp_wconv():
    """Windowed 3×3 conv formulations for low-channel full-res levels.

    The dense s2d conv inflates FLOPs 4× (25% tap density); expressing the
    four outputs of each 2×2 block as one (16·Cin → 4·Cout) contraction
    inflates only 16/9 ≈ 1.78× at full density. XLA-expressible variants:
      down: (4,4,Cin,4Cout) stride-2 conv, full-res in → s2d out
      up:   (2,2,4Cin,Cout) lhs_dilation-2 conv, s2d in → full-res out
    """
    setup()
    import jax
    import jax.numpy as jnp

    from mingraph_unet_tpu.ops import s2d as s2d_ops

    key = jax.random.key(0)
    B = BATCH
    for cin, cout, size in [(64, 32, 512), (32, 32, 512), (3, 32, 512), (128, 64, 256)]:
        gf_useful = 2 * B * size * size * 9 * cin * cout / 1e9
        x_full = jax.random.normal(key, (B, size, size, cin), jnp.bfloat16)
        x_s2d = s2d_ops.space_to_depth(x_full)
        k = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.05

        # Baseline 1: direct full-res conv.
        def direct(x, k, c):
            y = jax.lax.conv_general_dilated(
                x + c.astype(jnp.bfloat16) * 1e-8, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y.astype(jnp.float32).sum()

        ms = timed_loop(direct, (x_full, k), label=f"direct {cin}->{cout} @{size}²")
        print(f"      -> {gf_useful / ms:.1f} TF/s useful")

        # Baseline 2: dense s2d conv (current production for level 0).
        k_s2d = s2d_ops.s2d_conv3x3_kernel(k)

        def dense_s2d(x, kk, c):
            y = s2d_ops.conv3x3_s2d(x + c.astype(jnp.bfloat16) * 1e-8, kk)
            return y.astype(jnp.float32).sum()

        ms = timed_loop(dense_s2d, (x_s2d, k_s2d), label=f"dense-s2d {cin}->{cout}")
        print(f"      -> {gf_useful / ms:.1f} TF/s useful")

        # Windowed down-conv: (4,4,Cin,4Cout) stride 2, pad ((1,2),(1,2)).
        import numpy as np
        k_np = np.asarray(k, np.float32)
        k_win = np.zeros((4, 4, cin, 4 * cout), np.float32)
        for pyo in range(2):
            for pxo in range(2):
                ph = pyo * 2 + pxo
                k_win[pyo:pyo + 3, pxo:pxo + 3, :, ph * cout:(ph + 1) * cout] = k_np
        k_win = jnp.asarray(k_win, jnp.bfloat16)

        def down(x, kk, c):
            y = jax.lax.conv_general_dilated(
                x + c.astype(jnp.bfloat16) * 1e-8, kk, (2, 2), ((1, 2), (1, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y.astype(jnp.float32).sum()

        ms = timed_loop(down, (x_full, k_win), label=f"windowed-down {cin}->{cout}")
        print(f"      -> {gf_useful / ms:.1f} TF/s useful")

        # (A windowed *up*-conv — s2d in, full-res out — needs
        # parity-dependent kernels, so it is not expressible as one dilated
        # conv; the production decoder instead fuses the upsample matmul
        # into conv1 and stays in s2d layout, models/unet.py.)

    # Relayout costs. NOTE: a plain `.sum()` consumer lets XLA delete the
    # relayout entirely (the reduction is layout-invariant), so these rows
    # UNDER-measure materialized relayout cost — a materialized d2s at
    # 512²·32ch measures ~1.9 ms (see the DecoderBlock probes in history).
    x_full = jax.random.normal(key, (B, 512, 512, 32), jnp.bfloat16)
    x_s2d = s2d_ops.space_to_depth(x_full)

    def do_s2d(x, c):
        return s2d_ops.space_to_depth(x + c.astype(jnp.bfloat16) * 1e-8).astype(jnp.float32).sum()

    def do_d2s(x, c):
        return s2d_ops.depth_to_space(x + c.astype(jnp.bfloat16) * 1e-8).astype(jnp.float32).sum()

    timed_loop(do_s2d, (x_full,), label="s2d relayout 32ch @512²")
    timed_loop(do_d2s, (x_s2d,), label="d2s relayout 128ch @256²")


def exp_serve():
    """Serving profile: one-shot single-image latency + steady-state
    throughput across batch sizes (README's serving table)."""
    setup()
    import time

    import jax
    import jax.numpy as jnp

    from mingraph_unet_tpu.models.pipeline import MinGraphUNet

    model = MinGraphUNet(dtype=jnp.bfloat16, detection_pre_pool=32)
    x1 = jnp.zeros((1, 512, 512, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x1)

    # One-shot latency: single dispatch + scalar fetch (includes the
    # per-call host round trip, which real serving also pays).
    @jax.jit
    def one(v, xx):
        out = model.apply(v, xx, train=False)
        return out["logits"].sum() + out["pred_confidence"].sum()

    float(one(variables, x1))  # compile
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        float(one(variables, x1))
        lats.append(time.perf_counter() - t0)
    lats.sort()
    print(f"[lab] serve b1 one-shot latency: p50 {lats[10] * 1e3:.1f} ms "
          f"p90 {lats[17] * 1e3:.1f} ms (includes relay dispatch)")

    for b in (1, 2, 4, 8, 16, 32):
        xb = jnp.zeros((b, 512, 512, 3), jnp.float32)

        def fwd(v, xx, c):
            out = model.apply(v, xx + c * 1e-12, train=False)
            return out["logits"].sum() + out["pred_confidence"].sum()

        ms = timed_loop(fwd, (variables, xb), label=f"serve b{b} steady-state")
        print(f"      -> {b / ms * 1e3:.0f} img/s")


if __name__ == "__main__":
    exp = sys.argv[1] if len(sys.argv) > 1 else "stages"
    {
        "stages": exp_stages,
        "detpool": exp_detpool,
        "histeq": exp_histeq,
        "unet": exp_unet,
        "unetparts": exp_unetparts,
        "unetlevels": exp_unetlevels,
        "graph": exp_graph,
        "wconv": exp_wconv,
        "full": exp_full,
        "train": exp_train,
        "convs": exp_convs,
        "convchain": exp_convchain,
        "convt": exp_convt,
        "serve": exp_serve,
    }[exp]()
