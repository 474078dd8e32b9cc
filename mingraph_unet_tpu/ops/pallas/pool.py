"""Phase-max-pool Pallas kernel: MaxPool(2,2) of a full-res tensor held in
space-to-depth layout, as a single relayout-free HBM pass.

The workload (reference ``model/unet/unet_encoder.py:15-25``'s
``nn.MaxPool2d(2, 2)`` between encoder levels): in s2d layout the pool
window *is* the phase block, so pooling is a channelwise max over the four
phase groups — ``(B, H/2, W/2, 4C) → (B, H/2, W/2, C)``.

Why a kernel (device traces, 512² b8 v5e, r5): every XLA form pays a real
relayout somewhere. The reshape-reduce form (``ops/s2d.py::phase_max_pool``)
materializes relayout copies on BOTH sides of the reduce (404+178+206 µs at
the level-0 site); the channel-slice-max form erases the copies but XLA
fuses the slices into the CONSUMING conv's input read, inflating it by the
same amount (level-1 windowed conv 333 → 952 µs). This kernel does the max
in VMEM between two bitcast boundaries:

- input: the producing psel kernel / XLA conv's ``{3,0,2,1}`` activation
  layout, consumed as ``(H, W·B, 4C)`` — a bitcast, zero relayout (the
  conv3x3_s2d_psel trick, see ops/pallas/psconv.py);
- output: ``(H, W·B, C)`` whose inverse transpose is a bitcast to exactly
  the ``{3,0,2,1}`` layout the next level's conv wants.

The 4-way lane-group max needs lane shifts (Mosaic has no cross-lane
reduce), but the op is HBM-bound — the VPU shuffle hides under the DMA.

In-pipeline A/B (512² b8 full pipeline, bench.py methodology, v5e, r5):
reshape-reduce form 10.85 ms/step (736.9 img/s) → slice-max XLA form
10.83 (738.7) → THIS kernel at both sites 10.52 ms/step (760.7 img/s).
Inference-only: the backward of a max needs the argmax mask, so training
keeps the XLA form (whose VJP is native).

SPMD: batch-dim ``custom_partitioning`` rule like the psconv kernels —
each shard pools its local batch, no collectives.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["phase_max_pool_pallas", "depth_to_space_pallas"]

# Flipped to True by CPU tests (monkeypatch), as in ops/pallas/psconv.py.
_INTERPRET = False


def _pool_kernel(x_ref, o_ref, *, c: int):
    x = x_ref[...]  # (Ht, W·B, 4C)
    m = jnp.maximum(
        jnp.maximum(x[:, :, 0 * c : 1 * c], x[:, :, 1 * c : 2 * c]),
        jnp.maximum(x[:, :, 2 * c : 3 * c], x[:, :, 3 * c : 4 * c]),
    )
    o_ref[...] = m


def _pick_ht(hh: int, wb: int, zc: int, itemsize: int) -> int:
    # Input band + output band live in VMEM; keep input bands ≤ 8 MiB
    # (same budget as the psconv kernels).
    for ht in (8, 4, 2, 1):
        if hh % ht == 0 and ht * wb * zc * itemsize <= (8 << 20):
            return ht
    return 1


@partial(jax.jit, static_argnames=("interpret",))
def phase_max_pool_pallas(y_s2d: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """MaxPool(2,2) in s2d layout: (B, Hh, Ww, 4C) phase-major → (B, Hh,
    Ww, C). Exactly equals ``ops/s2d.py::phase_max_pool`` (max is
    order-free). Inference-only (no VJP)."""
    return _pool_partitioned(interpret)(y_s2d)


@lru_cache(maxsize=None)
def _pool_partitioned(interpret: bool):
    def impl(y_s2d):
        return _pool_compute(y_s2d, interpret=interpret)

    f = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        spec = arg_shapes[0].sharding.spec
        b = spec[0] if len(spec) else None
        args = (NamedSharding(mesh, P(b, None, None, None)),)
        return mesh, impl, NamedSharding(mesh, P(b, None, None, None)), args

    def infer(mesh, arg_shapes, result_shape):
        spec = arg_shapes[0].sharding.spec
        b = spec[0] if len(spec) else None
        return NamedSharding(mesh, P(b, None, None, None))

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b h w i -> b h w j",
    )
    return f


def _pool_compute(y_s2d: jnp.ndarray, *, interpret: bool) -> jnp.ndarray:
    b, hh, ww, cc = y_s2d.shape
    c = cc // 4
    xt = jnp.transpose(y_s2d, (1, 2, 0, 3)).reshape(hh, ww * b, cc)
    wb = ww * b
    ht = _pick_ht(hh, wb, cc, y_s2d.dtype.itemsize)
    yt = pl.pallas_call(
        partial(_pool_kernel, c=c),
        grid=(hh // ht,),
        in_specs=[
            pl.BlockSpec((ht, wb, cc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (ht, wb, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hh, wb, c), y_s2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=(hh * wb * (cc + c)) * y_s2d.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xt)
    return jnp.transpose(yt.reshape(hh, ww, b, c), (2, 0, 1, 3))


# ---------------------------------------------------------------------------
# depth_to_space as one relayout pass (the decoder's s2d → full-res handoff)
# ---------------------------------------------------------------------------


def _d2s_kernel(x_ref, o_ref, *, c: int, sb: int):
    """(Ht, W·B, 4C) s2d band → (2·Ht, 2·W·B, C) full-res band.

    out[2i+py, (2j+px)·B + b, ch] = in[i, j·B + b, (2py+px)·C + ch]:
    per output row-phase, interleave the two column-phase lane groups at
    B-column granularity (sublane-dim reshapes; lanes stay minor), then
    interleave the two row-phase planes."""
    x = x_ref[...]
    ht, wb, _ = x.shape
    rows = []
    for py in (0, 1):
        a = x[:, :, (2 * py + 0) * c : (2 * py + 1) * c]
        b_ = x[:, :, (2 * py + 1) * c : (2 * py + 2) * c]
        pair = jnp.concatenate(
            [
                a.reshape(ht, wb // sb, 1, sb, c),
                b_.reshape(ht, wb // sb, 1, sb, c),
            ],
            axis=2,
        )
        rows.append(pair.reshape(ht, 2 * wb, c))
    out = jnp.concatenate(
        [rows[0].reshape(ht, 1, 2 * wb, c), rows[1].reshape(ht, 1, 2 * wb, c)],
        axis=1,
    )
    o_ref[...] = out.reshape(2 * ht, 2 * wb, c)


@partial(jax.jit, static_argnames=("interpret",))
def depth_to_space_pallas(y_s2d: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """``ops/s2d.py::depth_to_space`` as a single Pallas pass with bitcast
    boundaries: (B, Hh, Ww, 4C) phase-major → (B, 2Hh, 2Ww, C).

    Why (device trace, 512² b8 v5e, r5): the XLA lowering of the decoder's
    level-1 s2d → full-res handoff materialized as a two-copy chain
    (103 + 238 µs — the psel output relayout plus the 6D interleaving
    transpose); this kernel reads the producer's layout as a bitcast and
    writes the (2Hh, 2Ww·B, C) form whose inverse transpose is a bitcast of
    the consumer's conv-native layout. Measured result: a NEUTRAL — the
    copies leave the trace but the in-kernel sublane interleaves cost the
    same (full pipeline 10.516 → 10.502 ms/step), so production keeps the
    XLA form and this kernel is dispatch-gated behind ``MG_D2S_KERNEL=1``
    (models/unet.py::_d2s) — the repo's standard recorded-negative
    treatment. Bit-exact vs the XLA form (tests/test_pallas_kernels.py).
    Inference-only dispatch (no VJP)."""
    return _d2s_partitioned(interpret)(y_s2d)


@lru_cache(maxsize=None)
def _d2s_partitioned(interpret: bool):
    def impl(y_s2d):
        return _d2s_compute(y_s2d, interpret=interpret)

    f = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        spec = arg_shapes[0].sharding.spec
        b = spec[0] if len(spec) else None
        args = (NamedSharding(mesh, P(b, None, None, None)),)
        return mesh, impl, NamedSharding(mesh, P(b, None, None, None)), args

    def infer(mesh, arg_shapes, result_shape):
        spec = arg_shapes[0].sharding.spec
        b = spec[0] if len(spec) else None
        return NamedSharding(mesh, P(b, None, None, None))

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b h w i -> b h w j",
    )
    return f


def _d2s_compute(y_s2d: jnp.ndarray, *, interpret: bool) -> jnp.ndarray:
    b, hh, ww, cc = y_s2d.shape
    c = cc // 4
    xt = jnp.transpose(y_s2d, (1, 2, 0, 3)).reshape(hh, ww * b, cc)
    wb = ww * b
    ht = _pick_ht(hh, wb, cc, y_s2d.dtype.itemsize)
    yt = pl.pallas_call(
        partial(_d2s_kernel, c=c, sb=b),
        grid=(hh // ht,),
        in_specs=[
            pl.BlockSpec((ht, wb, cc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (2 * ht, 2 * wb, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * hh, 2 * wb, c), y_s2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * hh * wb * cc * y_s2d.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xt)
    return jnp.transpose(yt.reshape(2 * hh, 2 * ww, b, c), (2, 0, 1, 3))
