"""Phase-select s2d conv: 3×3 'SAME' conv in space-to-depth layout as four
dense MXU matmuls with lane-select operands (+ fused bias/ReLU epilogue).

The workload (reference ``model/unet/unet_encoder.py:15-25`` ConvBlock convs
at the U-Net's full-resolution level): a 3×3 stride-1 conv on a C-channel
image held in 2×2 space-to-depth layout, ``x_s2d (B, H/2, W/2, 4C)``
phase-major. The production XLA lowering (ops/s2d.py::conv3x3_s2d) is a
dense (3, 3, 4C, 4C) conv whose kernel is 75% structured zeros — 4× the
useful FLOPs (measured 145 TF/s raw ⇒ ~36 TF/s useful on v5e). The
previous Pallas attempt (wconv.py) used the windowed patch-matrix form
(16/9× FLOPs) but lost to XLA on the 16 lane-offset scratch copies that
assembled the patch matrix.

This kernel gets the windowed form's 16/9× arithmetic with ZERO assembly
copies. Group the 36 useful (tap × output-phase) pairs of the s2d conv by
s2d displacement (u, v) of the input read:

- (0,0): every (input-phase q, output-phase p) pair is a real tap
  (dy = qy−py, dx = qx−px ∈ {−1,0,1}) → one fully dense [4C, 4C] matmul
  on the UNSHIFTED tile.
- rows (u = ±1, v = 0): u=−1 valid only for (qy=1, py=0), u=+1 only for
  (qy=0, py=1). The q-lanes needed from each source are disjoint subsets of
  the lane axis — so ONE operand ``R = where(qy1_lane, x_up, x_down)``
  (each value stays in its own lane; a VPU select, not a shuffle) feeds a
  second [4C, 4C] matmul whose kernel is block-structured.
- cols (v = ±1): same with the qx lane mask → ``where(qx1, x_left, x_right)``.
- diagonals: the four corner taps each need one q-subset → one 4-way
  lane-select of the four diagonally-shifted tiles, one matmul.

Total: 4 dense [T, 4C] @ [4C, 4C] matmuls = 64C² MACs per s2d pixel vs
36C² useful (16/9, the windowed optimum) at full MXU lane occupancy, and
the only non-matmul work is 2 sublane-shift concats + boundary masks +
3 selects. The phase lane masks arrive as tiny i32 operands, which makes
the kernel GROUP-AWARE: an input that is a channel-concat of separately
s2d-transformed tensors (e.g. the decoder's [skip ‖ upsampled], 256 lanes)
is one call — this is how the decoder's whole conv1 (including the
contracted ConvTranspose term) runs as a single 256-lane psel instead of
an XLA conv at half-K utilization.

Measured on v5e (512² b8, C=32, device traces r3): in-pipeline the kernel
runs ~0.51 ms/call vs the XLA dense-s2d fusions it replaced (2.13 ms dec
block3 conv2, 1.10 ms dec conv1 skip term, 0.82 ms enc block0 conv2); the
full pipeline went 14.04 → 13.00 ms/step with the first three sites
enabled (together with the analytic bias-field that the de-fusion exposed,
ops/s2d.py::conv3x3_s2d_const). Earlier failure modes, kept for the
record: feeding the 4D tensor directly cost ~1 ms/step in {3,0,2,1}→
{3,2,1,0} relayout fusions (fixed by the transpose-bitcast below), and a
scan-carried operand gets a defensive XLA copy that inflates standalone
microbenchmarks to ~0.92 ms/call — trace the pipeline, not the microbench.

Scope limits: (a) profitability — the kernel loses below ~2^18 s2d pixels
and in fp32; dispatch is gated in models/unet.py::ConvBlock._psconv_on
with the measured numbers (per-shard pixels under a data-parallel mesh).
(b) SPMD — both kernels carry a ``custom_partitioning`` rule (r4): the
batch dim partitions (each shard runs the kernel on its local batch — a
conv is per-image), all other operands/dims are declared replicated, so
data-parallel sharded inference keeps the kernel with NO all-gather
(tests/test_pallas_kernels.py::TestPsconvSharding asserts the compiled
HLO). Spatially (H-)sharded paths need halo exchange the kernel does not
do across shards — ConvBlock._psconv_on falls back to the XLA lowering
(whose SPMD partitioner inserts the halos) when the active mesh has a
non-trivial 'spatial' axis. (c) Training uses the XLA path (no VJP; a
custom_vjp with the adjoint-kernel psel is the mapped next step, ROADMAP).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["psconv_weights", "psconv_lane_masks", "conv3x3_s2d_psel"]

# Flipped to True by CPU tests (monkeypatch) so the ConvBlock-level psconv
# dispatch — TPU-only in production — can run its Pallas calls in
# interpreter mode and be integration-tested without a chip.
_INTERPRET = False


def _def_batch_partition(f, lower_fn, n_args: int, batch_args, sharding_rule: str):
    """Register a batch-dim partitioning on custom_partitioning object ``f``:
    dim 0 of the 4D operands in ``batch_args`` (and of the result) partitions
    — the kernels are per-image, so each shard runs on its local batch —
    everything else is declared replicated. ``sharding_rule`` is the Shardy
    einsum-notation propagation rule."""

    def _bspec(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def partition(mesh, arg_shapes, result_shape):
        b = _bspec(arg_shapes)
        args = tuple(
            NamedSharding(mesh, P(b, None, None, None) if i in batch_args else P())
            for i in range(n_args)
        )
        return mesh, lower_fn, NamedSharding(mesh, P(b, None, None, None)), args

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_bspec(arg_shapes), None, None, None))

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=sharding_rule,
    )
    return f


def _group_sizes(cin: int, groups: Sequence[int]) -> Tuple[int, ...]:
    g = tuple(groups) if groups else (cin,)
    assert sum(g) == cin, (groups, cin)
    return g


def psconv_weights(kernel: jnp.ndarray, groups: Sequence[int] = ()) -> jnp.ndarray:
    """(3, 3, Cin, Cout) full-res 'SAME' kernel → stacked (4, 4Cin, 4Cout)
    matmul matrices (Kc, Kr, Kv, Kd) for the four phase-select operands.

    ``groups``: full-res channel widths when the s2d input is a channel
    concat of separately s2d-transformed tensors (phase-major per group,
    matching ops/s2d.py::s2d_conv3x3_kernel). Empty = single group.

    Entry rule: output phase p=(py,px) taking full-res tap (dy,dx) reads
    input phase q at s2d displacement (u,v) with dy = 2u+qy−py,
    dx = 2v+qx−px; each (u,v) operand enumerates its valid (q,p) pairs.
    """
    cin, cout = kernel.shape[2], kernel.shape[3]
    gs = _group_sizes(cin, groups)
    zout = 4 * cout
    mats = []
    off = 0
    for gc in gs:
        k = kernel[:, :, off : off + gc, :]
        off += gc
        zin_g = 4 * gc
        kc = jnp.zeros((zin_g, zout), k.dtype)
        kr = jnp.zeros((zin_g, zout), k.dtype)
        kv = jnp.zeros((zin_g, zout), k.dtype)
        kd = jnp.zeros((zin_g, zout), k.dtype)

        def put(m, qy, qx, py, px, ty, tx, _k=k, _gc=gc):
            qi = (2 * qy + qx) * _gc
            pi = (2 * py + px) * cout
            return m.at[qi : qi + _gc, pi : pi + cout].set(_k[ty, tx])

        for qy in range(2):
            for qx in range(2):
                for py in range(2):
                    for px in range(2):
                        # center (u=v=0): dy=qy−py, dx=qx−px — always a tap.
                        kc = put(kc, qy, qx, py, px, 1 + qy - py, 1 + qx - px)
        for qx in range(2):
            for px in range(2):
                # u=−1 (← x_up): qy=1, py=0, dy=−1.
                kr = put(kr, 1, qx, 0, px, 0, 1 + qx - px)
                # u=+1 (← x_down): qy=0, py=1, dy=+1.
                kr = put(kr, 0, qx, 1, px, 2, 1 + qx - px)
        for qy in range(2):
            for py in range(2):
                # v=−1 (← x_left): qx=1, px=0, dx=−1.
                kv = put(kv, qy, 1, py, 0, 1 + qy - py, 0)
                # v=+1 (← x_right): qx=0, px=1, dx=+1.
                kv = put(kv, qy, 0, py, 1, 1 + qy - py, 2)
        # diagonals: one (q,p) pair each.
        kd = put(kd, 1, 1, 0, 0, 0, 0)  # (u,v)=(−1,−1) ← x_left_up
        kd = put(kd, 0, 1, 1, 0, 2, 0)  # (+1,−1) ← x_left_down
        kd = put(kd, 1, 0, 0, 1, 0, 2)  # (−1,+1) ← x_right_up
        kd = put(kd, 0, 0, 1, 1, 2, 2)  # (+1,+1) ← x_right_down
        mats.append(jnp.stack([kc, kr, kv, kd]))
    return jnp.concatenate(mats, axis=1) if len(mats) > 1 else mats[0]


def psconv_lane_masks(cin: int, groups: Sequence[int] = ()) -> jnp.ndarray:
    """(2, 4·Cin) i32 lane masks [is_qy1, is_qx1] for the phase-major
    (per-group) channel layout — the kernel's select predicates."""
    qy = []
    qx = []
    for gc in _group_sizes(cin, groups):
        for p in range(4):
            qy.extend([p // 2] * gc)
            qx.extend([p % 2] * gc)
    return jnp.asarray(np.stack([qy, qx]), jnp.int32)


def _kernel(x_ref, top_ref, bot_ref, k_ref, b_ref, m_ref, o_ref, *, sb: int, relu: bool):
    i = pl.program_id(0)
    band = x_ref[...]  # (Ht, Ww·B, 4C) — H-major view of the conv layout
    ht, wb, zc = band.shape
    # Row halos; zero at the image boundary (SAME padding).
    top = jnp.where(i == 0, jnp.zeros_like(top_ref[...]), top_ref[...])
    bot = jnp.where(
        i == pl.num_programs(0) - 1, jnp.zeros_like(bot_ref[...]), bot_ref[...]
    )
    xf = jnp.concatenate([top, band, bot], axis=0)  # (Ht+2, Ww·B, 4C)
    zcol = jnp.zeros((ht + 2, sb, zc), xf.dtype)
    # One image column = sb merged positions (the batch dim is innermost).
    # xl[y, x] = xf[y, x−1] (zero col 0); xr[y, x] = xf[y, x+1].
    # (slice+concat, not pltpu.roll: Mosaic has no bf16 sublane rotate.)
    xl = jnp.concatenate([zcol, xf[:, : wb - sb]], axis=1)
    xr = jnp.concatenate([xf[:, sb:], zcol], axis=1)
    xc, xu, xd = xf[1:-1], xf[:-2], xf[2:]
    qy1 = m_ref[0:1] != 0  # (1, 4C), broadcasts over (rows, wb, 4C)
    qx1 = m_ref[1:2] != 0
    # R: lanes qy=1 read the row above, qy=0 the row below.
    r_op = jnp.where(qy1, xu, xd)
    # C: lanes qx=1 read the left shift, qx=0 the right shift.
    c_op = jnp.where(qx1, xl[1:-1], xr[1:-1])
    # D: per-phase diagonal — (1,1)←lu, (1,0)←ru, (0,1)←ld, (0,0)←rd.
    d_op = jnp.where(
        qy1,
        jnp.where(qx1, xl[:-2], xr[:-2]),
        jnp.where(qx1, xl[2:], xr[2:]),
    )
    t = ht * wb

    def mm(a, kmat):
        return jnp.dot(
            a.reshape(t, zc), kmat, preferred_element_type=jnp.float32
        )

    acc = mm(xc, k_ref[0]) + mm(r_op, k_ref[1]) + mm(c_op, k_ref[2]) + mm(d_op, k_ref[3])
    acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[...] = acc.reshape(ht, wb, -1).astype(o_ref.dtype)
    # (A fused phase-reduction epilogue — sum/max over the phase lane
    # blocks via 32-bit lane rotates, emitted as extra outputs — was built
    # and measured here in r3: exact, but +0.62 ms/call for sum+max at
    # (256, 2048, 128) on v5e. The pure-XLA selector dot on the transposed
    # view (ops/s2d.py::patch_reduce_mean_s2d) replaces the relayout-heavy
    # consumers for free instead, so the epilogue was dropped.)


def _pick_ht(hh: int, wb: int, zc: int) -> int:
    # Budget the band block so the ~8 live block-sized temporaries (xf, xl,
    # xr, 4 matmul operands, f32 acc) stay within scoped VMEM. Larger bands
    # amortize the two halo-row re-reads (at ht=2 they double input DMA —
    # measured 625 → 500 µs/call going to ht=4 at (256, 2048, 128)).
    # Band-bytes budget: the ~8 live band-sized temporaries must fit the
    # 100 MB VMEM limit; 8 MiB bands keep b16/b32 serving at ht=8 too
    # (shrinking ht doubles halo re-reads — the b16 falloff in the r3
    # serving sweep traced to ht=4).
    for ht in (8, 4, 2, 1):
        if hh % ht == 0 and ht * wb * zc * 2 <= (8 << 20):
            return ht
    return 1


@partial(jax.jit, static_argnames=("relu", "interpret"))
def conv3x3_s2d_psel(
    x_s2d: jnp.ndarray,
    kmats: jnp.ndarray,
    bias_s2d: jnp.ndarray,
    relu: bool = True,
    interpret: bool = False,
    lane_masks: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """3×3 'SAME' conv (+bias, +ReLU) on a 2×2 s2d-layout tensor.

    x_s2d: (B, Hh, Ww, 4·Cin) phase-major (per group — pass ``lane_masks``
    from :func:`psconv_lane_masks` for multi-group inputs); kmats:
    ``psconv_weights`` output (4, 4Cin, 4Cout); bias_s2d: (4·Cout,)
    phase-major (s2d_vector). Exactly equals
    relu(conv3x3_s2d(x, s2d_conv3x3_kernel(k, groups)) + bias) up to fp32
    accumulation order (tests/test_pallas_kernels.py).

    Carries a batch-dim SPMD partitioning rule (module docstring §b):
    under a data-parallel mesh each shard runs the kernel on its local
    batch with no collective at the boundary.
    """
    if lane_masks is None:
        lane_masks = psconv_lane_masks(x_s2d.shape[-1] // 4)
    return _psel_partitioned(relu, interpret)(x_s2d, kmats, bias_s2d, lane_masks)


@lru_cache(maxsize=None)
def _psel_partitioned(relu: bool, interpret: bool):
    """One custom_partitioning object per (relu, interpret) config — cached
    so repeated traces reuse the same callable (jit-cache hygiene)."""

    def impl(x_s2d, kmats, bias_s2d, lane_masks):
        return _psel_compute(x_s2d, kmats, bias_s2d, lane_masks, relu=relu, interpret=interpret)

    f = custom_partitioning(impl)
    return _def_batch_partition(
        f, impl, 4, {0}, "b h w i, s i j, j, m i -> b h w j"
    )


def _psel_compute(x_s2d, kmats, bias_s2d, lane_masks, *, relu: bool, interpret: bool):
    """Unpartitioned kernel call (per-shard body under a mesh).

    Layout: XLA's TPU convs keep activations in a {3,0,2,1} (H, W, B, C
    major→minor) layout; a Pallas operand is pinned to the default
    {3,2,1,0}. Feeding the 4D tensor directly therefore inserted a ~0.5 ms
    relayout fusion per call site (device trace r3). The transpose to
    (Hh, Ww, B, 4C) + merge to (Hh, Ww·B, 4C) below is a BITCAST of the
    conv's native layout, so the kernel consumes and produces the layout
    the surrounding convs already use — zero relayout at the boundary.
    Col shifts inside the kernel step by B merged positions.
    """
    b, hh, ww, zin = x_s2d.shape
    zout = kmats.shape[-1]
    isz = x_s2d.dtype.itemsize
    xt = jnp.transpose(x_s2d, (1, 2, 0, 3)).reshape(hh, ww * b, zin)
    wb = ww * b
    ht = _pick_ht(hh, wb, zin)
    grid = (hh // ht,)
    bias2d = bias_s2d.reshape(1, zout)
    yt = pl.pallas_call(
        partial(_kernel, sb=b, relu=relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (ht, wb, zin), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, wb, zin),
                lambda ii, _ht=ht: (jnp.maximum(ii * _ht - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, wb, zin),
                lambda ii, _ht=ht, _hh=hh: (
                    jnp.minimum(ii * _ht + _ht, _hh - 1),
                    0,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ht, wb, zout), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hh, wb, zout), x_s2d.dtype),
        # Declared cost keeps the op visible to XLA's scheduler AND to
        # cost_analysis() (custom-calls otherwise report 0 FLOPs, which
        # silently deflates bench.py's MFU accounting).
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * hh * wb * zin * zout,
            bytes_accessed=(hh + 2 * grid[0]) * wb * zin * isz + hh * wb * zout * isz,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xt, xt, xt, kmats.astype(x_s2d.dtype), bias2d, lane_masks)
    return jnp.transpose(yt.reshape(hh, ww, b, zout), (2, 0, 1, 3))


# ---------------------------------------------------------------------------
# Training path: custom_vjp over the phase-select conv (VERDICT r3 #3)
# ---------------------------------------------------------------------------
#
# The adjoint of a 3×3 'SAME' conv is a 3×3 'SAME' conv with the spatially
# flipped, in/out-transposed kernel — so dx runs through the SAME psel
# kernel (16/9× useful FLOPs instead of the dense-s2d form's 4×). For dK,
# note the forward is y = Σ_i A_i(x) @ K_i with A_i the four LINEAR
# lane-select/shift operands (center/row/col/diag), hence
# dK_i = A_i(x)ᵀ @ g — four [4C, T]·[T, 4C] MXU matmuls (T = all s2d
# pixels) on operands materialized by cheap XLA shifts+selects — and the
# full-res 3×3 kernel gradient is the pullback of (dK_1..dK_4) through the
# linear embedding ``psconv_weights`` (jax.linear_transpose does this
# mechanically). No bias/ReLU here: in train mode ConvBlock applies
# bias→BN(batch stats)→ReLU outside the conv, so the op is the raw conv.


def _psel_operands_xla(x: jnp.ndarray) -> jnp.ndarray:
    """The four lane-select operands A_i(x) of the psel decomposition,
    materialized with XLA shifts (zero 'SAME' boundaries) and lane selects:
    (4, B, Hh, Ww, 4C) stacked [center, row, col, diag]. Mirrors _kernel's
    construction on the merged view exactly (the merged column shift by B
    equals a per-image W shift)."""
    b, hh, ww, zin = x.shape
    m = psconv_lane_masks(zin // 4)
    qy1 = (m[0] != 0)[None, None, None, :]
    qx1 = (m[1] != 0)[None, None, None, :]

    def sh(dy, dx):
        pad = ((0, 0), (max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0)), (0, 0))
        y = jnp.pad(x, pad)
        return y[:, max(-dy, 0) : max(-dy, 0) + hh, max(-dx, 0) : max(-dx, 0) + ww]

    r_op = jnp.where(qy1, sh(1, 0), sh(-1, 0))  # qy=1 reads the row above
    c_op = jnp.where(qx1, sh(0, 1), sh(0, -1))
    d_op = jnp.where(
        qy1,
        jnp.where(qx1, sh(1, 1), sh(1, -1)),
        jnp.where(qx1, sh(-1, 1), sh(-1, -1)),
    )
    return jnp.stack([x, r_op, c_op, d_op])


def psconv_train(x_s2d: jnp.ndarray, kernel: jnp.ndarray, interpret: bool = False):
    """Differentiable raw 3×3 'SAME' s2d conv (no bias/ReLU) through the
    phase-select Pallas kernel: forward AND both backward contractions run
    at the 16/9× phase-select FLOP count instead of the dense-s2d 4×.
    ``kernel`` is the full-res (3, 3, Cin, Cout) kernel (single group).
    Gradient parity vs the XLA lowering: tests/test_pallas_kernels.py::
    TestPsconvTrainVJP."""
    return _psconv_train(interpret, x_s2d, kernel)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _psconv_train(interpret, x_s2d, kernel):
    zout4 = 4 * kernel.shape[-1]
    return conv3x3_s2d_psel(
        x_s2d, psconv_weights(kernel), jnp.zeros((zout4,), jnp.float32),
        relu=False, interpret=interpret,
    )


def _psconv_train_fwd(interpret, x_s2d, kernel):
    return _psconv_train(interpret, x_s2d, kernel), (x_s2d, kernel)


def _psconv_train_bwd(interpret, res, g):
    x_s2d, kernel = res
    cin4 = x_s2d.shape[-1]
    # dx: psel with the flipped/transposed (adjoint) kernel.
    ka = jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))
    dx = conv3x3_s2d_psel(
        g, psconv_weights(ka), jnp.zeros((cin4,), jnp.float32),
        relu=False, interpret=interpret,
    ).astype(x_s2d.dtype)
    # dK_i = A_i(x)ᵀ @ g in fp32, pulled back through psconv_weights.
    ops4 = _psel_operands_xla(x_s2d)
    dkmats = jnp.einsum(
        "sbhwi,bhwo->sio", ops4, g, preferred_element_type=jnp.float32
    )
    pullback = jax.linear_transpose(
        psconv_weights, jax.ShapeDtypeStruct(kernel.shape, jnp.float32)
    )
    (dkernel,) = pullback(dkmats.astype(jnp.float32))
    return dx, dkernel.astype(kernel.dtype)


_psconv_train.defvjp(_psconv_train_fwd, _psconv_train_bwd)


# ---------------------------------------------------------------------------
# Fused decoder conv1: psel(skip) + tap-pair-packed conv(x_prev) + bias field
# ---------------------------------------------------------------------------

# Tap pairing for the x_prev 3×3 conv (any exact cover works): four pairs at
# full MXU K=128 via lane-concat of two 64-channel shifted views, plus the
# center tap alone (half-K, 1/9 of the work).
_PREV_PAIRS = (((0, 0), (0, 1)), ((0, 2), (1, 0)), ((1, 2), (2, 0)), ((2, 1), (2, 2)))
_PREV_CENTER = (1, 1)


def dec_conv1_weights(kernel: jnp.ndarray, skip_c: int, wt: jnp.ndarray):
    """Weights for :func:`dec_conv1_fused`.

    kernel: conv1's (3, 3, skip_c + up_c, Cout) full-res kernel (BN-folded);
    wt: the s2d ConvTranspose matmul (Cin_prev, 4·up_c)
    (ops/s2d.py::s2d_convt2x2_kernel). Returns (kmats_skip (4, 4·skip_c,
    4Cout), kprev_pairs (4, 2·Cin_prev, 4Cout), kprev_center (Cin_prev,
    4Cout)) with the ConvTranspose contracted into the x_prev tap matrices
    (same algebra as the XLA fused_up path, models/unet.py).
    """
    from mingraph_unet_tpu.ops import s2d as s2d_ops

    up_c = kernel.shape[2] - skip_c
    k2b = s2d_ops.s2d_conv3x3_kernel(kernel, (skip_c, up_c))[:, :, 4 * skip_c :, :]
    k2b_x = jnp.einsum("cq,yxqo->yxco", wt.astype(k2b.dtype), k2b)  # (3,3,Cp,4Cout)
    kmats_skip = psconv_weights(kernel[:, :, :skip_c, :])
    pairs = jnp.stack(
        [
            jnp.concatenate([k2b_x[a], k2b_x[b]], axis=0)
            for (a, b) in ((p[0], p[1]) for p in _PREV_PAIRS)
        ]
    )
    center = k2b_x[_PREV_CENTER]
    return kmats_skip, pairs, center


def dec_conv1_bias_table(
    kernel: jnp.ndarray, skip_c: int, bias_up: jnp.ndarray, bias: jnp.ndarray
) -> jnp.ndarray:
    """(3, 3, 4Cout) f32 table: conv1's bias plus the border-attenuated
    upsample-bias field value for each (row-class, col-class) ∈
    {first, interior, last}² — the analytic piecewise-constant form of
    ops/s2d.py::conv3x3_s2d_const evaluated per class."""
    from mingraph_unet_tpu.ops import s2d as s2d_ops

    up_c = kernel.shape[2] - skip_c
    k2b = s2d_ops.s2d_conv3x3_kernel(kernel, (skip_c, up_c))[:, :, 4 * skip_c :, :]
    t = jnp.einsum(
        "yxio,i->yxo",
        k2b.astype(jnp.float32),
        s2d_ops.s2d_vector(bias_up).astype(jnp.float32),
    )
    # class c ∈ {0: first (tap −1 invalid), 1: interior, 2: last (+1 invalid)}
    rsel = jnp.asarray([[0.0, 1, 1], [1, 1, 1], [1, 1, 0]], jnp.float32)
    field = jnp.einsum("ad,be,deo->abo", rsel, rsel, t)
    return field + s2d_ops.s2d_vector(bias).astype(jnp.float32)


def _dec1_kernel(
    xs_ref, xst_ref, xsb_ref, xp_ref, xpt_ref, xpb_ref,
    ks_ref, kp_ref, kc_ref, t9_ref, m_ref, o_ref, *, sb: int,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    band = xs_ref[...]
    ht, wb, zc = band.shape
    top = jnp.where(i == 0, jnp.zeros_like(xst_ref[...]), xst_ref[...])
    bot = jnp.where(i == n - 1, jnp.zeros_like(xsb_ref[...]), xsb_ref[...])
    xf = jnp.concatenate([top, band, bot], axis=0)
    zcol = jnp.zeros((ht + 2, sb, zc), xf.dtype)
    xl = jnp.concatenate([zcol, xf[:, : wb - sb]], axis=1)
    xr = jnp.concatenate([xf[:, sb:], zcol], axis=1)
    xc, xu, xd = xf[1:-1], xf[:-2], xf[2:]
    qy1 = m_ref[0:1] != 0
    qx1 = m_ref[1:2] != 0
    r_op = jnp.where(qy1, xu, xd)
    c_op = jnp.where(qx1, xl[1:-1], xr[1:-1])
    d_op = jnp.where(
        qy1, jnp.where(qx1, xl[:-2], xr[:-2]), jnp.where(qx1, xl[2:], xr[2:])
    )
    t = ht * wb

    def mm(a, kmat, k):
        return jnp.dot(a.reshape(t, k), kmat, preferred_element_type=jnp.float32)

    acc = (
        mm(xc, ks_ref[0], zc)
        + mm(r_op, ks_ref[1], zc)
        + mm(c_op, ks_ref[2], zc)
        + mm(d_op, ks_ref[3], zc)
    )
    # x_prev 3×3 conv, taps packed in lane-concat pairs.
    bandp = xp_ref[...]
    cp = bandp.shape[-1]
    topp = jnp.where(i == 0, jnp.zeros_like(xpt_ref[...]), xpt_ref[...])
    botp = jnp.where(i == n - 1, jnp.zeros_like(xpb_ref[...]), xpb_ref[...])
    xfp = jnp.concatenate([topp, bandp, botp], axis=0)
    zcolp = jnp.zeros((ht + 2, sb, cp), xfp.dtype)
    xlp = jnp.concatenate([zcolp, xfp[:, : wb - sb]], axis=1)
    xrp = jnp.concatenate([xfp[:, sb:], zcolp], axis=1)

    def view(tap):
        ty, tx = tap
        src = (xlp, xfp, xrp)[tx]
        return src[ty : ty + ht]

    def lane_cat(a, b):
        ai = pltpu.bitcast(a, jnp.int32)
        bi = pltpu.bitcast(b, jnp.int32)
        return pltpu.bitcast(jnp.concatenate([ai, bi], axis=2), a.dtype)

    for j, (ta, tb) in enumerate(_PREV_PAIRS):
        acc = acc + mm(lane_cat(view(ta), view(tb)), kp_ref[j], 2 * cp)
    acc = acc + mm(view(_PREV_CENTER), kc_ref[...], cp)
    # Piecewise-constant bias(+field): interior column profile, plus
    # first/last-image-row deltas applied only on the boundary bands.
    # Column classes are applied ADDITIVELY (interior + first-delta +
    # last-delta), like the row classes: when the s2d width is 1 a column
    # is both first AND last, and by linearity the sum of both deltas
    # yields exactly the both-taps-invalid field value (a where-chain would
    # let the first-column predicate shadow the last-column one).
    colidx = jax.lax.broadcasted_iota(jnp.int32, (1, wb, 1), 1)
    c0 = jnp.where(colidx < sb, 1.0, 0.0)
    c2 = jnp.where(colidx >= wb - sb, 1.0, 0.0)

    def row_profile(r):
        interior = t9_ref[r, 1:2]
        return (
            interior
            + c0 * (t9_ref[r, 0:1] - interior)
            + c2 * (t9_ref[r, 2:3] - interior)
        )

    acc3 = acc.reshape(ht, wb, -1) + row_profile(1)
    rowidx = jax.lax.broadcasted_iota(jnp.int32, (ht, 1, 1), 0)
    first = jnp.where(jnp.logical_and(i == 0, rowidx == 0), 1.0, 0.0)
    last = jnp.where(
        jnp.logical_and(i == n - 1, rowidx == ht - 1), 1.0, 0.0
    )
    acc3 = acc3 + first * (row_profile(0) - row_profile(1))
    acc3 = acc3 + last * (row_profile(2) - row_profile(1))
    o_ref[...] = jnp.maximum(acc3, 0.0).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def dec_conv1_fused(
    x_skip_s2d: jnp.ndarray,
    x_prev: jnp.ndarray,
    kmats_skip: jnp.ndarray,
    kprev_pairs: jnp.ndarray,
    kprev_center: jnp.ndarray,
    t9: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """relu(conv1([skip ‖ ConvTranspose(x_prev)]) + bias) for the s2d
    decoder block, fused: the skip term via the phase-select matmuls, the
    x_prev term via tap-pair-packed matmuls (full MXU K from two
    64-channel taps lane-concatenated through an i32 bitcast — Mosaic has
    no bf16 lane rotate), and the border-attenuated upsample-bias field
    applied as a piecewise-constant table in the epilogue. Equals the XLA
    fused_up path (models/unet.py) up to fp32 accumulation order.

    Batch-dim SPMD rule as in :func:`conv3x3_s2d_psel` (both x operands
    shard over batch; weights/tables replicated)."""
    return _dec1_partitioned(interpret)(
        x_skip_s2d, x_prev, kmats_skip, kprev_pairs, kprev_center, t9,
        psconv_lane_masks(x_skip_s2d.shape[-1] // 4),
    )


@lru_cache(maxsize=None)
def _dec1_partitioned(interpret: bool):
    def impl(x_skip_s2d, x_prev, kmats_skip, kprev_pairs, kprev_center, t9, lane_masks):
        return _dec1_compute(
            x_skip_s2d, x_prev, kmats_skip, kprev_pairs, kprev_center, t9,
            lane_masks, interpret=interpret,
        )

    f = custom_partitioning(impl)
    return _def_batch_partition(
        f, impl, 7, {0, 1},
        "b h w i, b h w p, s i j, t q j, p j, u v j, m i -> b h w j",
    )


def _dec1_compute(
    x_skip_s2d, x_prev, kmats_skip, kprev_pairs, kprev_center, t9,
    lane_masks, *, interpret: bool,
) -> jnp.ndarray:
    b, hh, ww, zin = x_skip_s2d.shape
    zout = kmats_skip.shape[-1]
    cp = x_prev.shape[-1]
    isz = x_skip_s2d.dtype.itemsize
    xt = jnp.transpose(x_skip_s2d, (1, 2, 0, 3)).reshape(hh, ww * b, zin)
    xpt = jnp.transpose(x_prev, (1, 2, 0, 3)).reshape(hh, ww * b, cp)
    wb = ww * b
    ht = _pick_ht(hh, wb, zin + cp)
    grid = (hh // ht,)

    def band_spec(z, _ht=ht):
        return pl.BlockSpec((_ht, wb, z), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM)

    def halo_spec(z, lo, _ht=ht, _hh=hh):
        if lo:
            idx = lambda ii, _h=_ht: (jnp.maximum(ii * _h - 1, 0), 0, 0)
        else:
            idx = lambda ii, _h=_ht, _hh2=_hh: (jnp.minimum(ii * _h + _h, _hh2 - 1), 0, 0)
        return pl.BlockSpec((1, wb, z), idx, memory_space=pltpu.VMEM)

    dt = x_skip_s2d.dtype
    yt = pl.pallas_call(
        partial(_dec1_kernel, sb=b),
        grid=grid,
        in_specs=[
            band_spec(zin), halo_spec(zin, True), halo_spec(zin, False),
            band_spec(cp), halo_spec(cp, True), halo_spec(cp, False),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=band_spec(zout),
        out_shape=jax.ShapeDtypeStruct((hh, wb, zout), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * hh * wb * (4 * zin + 9 * cp) * zout,
            bytes_accessed=hh * wb * (zin + cp + zout) * isz,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        xt, xt, xt, xpt, xpt, xpt,
        kmats_skip.astype(dt), kprev_pairs.astype(dt), kprev_center.astype(dt),
        t9.astype(jnp.float32), lane_masks,
    )
    return jnp.transpose(yt.reshape(hh, ww, b, zout), (2, 0, 1, 3))
