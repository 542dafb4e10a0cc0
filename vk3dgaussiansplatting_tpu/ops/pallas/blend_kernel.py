"""Pallas TPU blend kernel — the production RenderGaussians tier.

Maps the reference's 16x16-thread-per-tile cooperative kernel
(RenderGaussians.comp) onto the TPU's VPU/MXU:

  * grid = screen tiles (sequential programs on the TensorCore; all
    parallelism lives in the (K elements x 256 pixels) batch shapes);
  * the per-pixel gaussian evaluation f = -0.5(a dx^2 + c dy^2) - b dx dy is
    evaluated directly on the VPU as a [K elements x 256 pixels] broadcast
    expression.  (A bilinear MXU formulation f = E6 . [u^2,v^2,uv,u,v,1]
    exists but cancels catastrophically — the expanded terms reach ~1e3-1e6
    while f must resolve ~1e-5 near the f <= 0 eligibility threshold, which
    flips inclusion for pixels at a gaussian's center and can yield
    alpha > 1.  Direct evaluation reproduces the reference's exact formula,
    RenderGaussians.comp:117-124.);
  * the sequential transmittance recurrence becomes a masked *exclusive
    cumulative product* over the batch (log2 K shifted multiplies on the VPU)
    with a [1,256] running-T carry across batches — multiplicative form, so
    float behaviour tracks the reference's T *= (1-alpha) recurrence closely
    and alpha == 1 degenerates to T = 0 exactly like the reference;
  * early termination ("done") is the monotone-T mask T_excl >= 1e-4 (see
    ops/blend.py for the equivalence argument), and whole remaining batches
    are skipped once every pixel's T has dropped below the stop threshold —
    the cooperative-batch early-out of RenderGaussians.comp:111 at batch
    granularity;
  * the color accumulation sum_j w_j * rgb_j is the second MXU matmul
    [4,K] x [K,256] per batch.

Element features are pre-gathered into sorted order (one XLA gather) so the
kernel streams contiguous HBM with a manual double-buffered DMA pipeline —
the TPU-native equivalent of the reference's 256-wide cooperative shared-mem
staging loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.config import SENTINEL, RenderConfig
from ..keygen import GaussianFrameData, SortElements

# Elements per batch (the reference's ENTIRE_GROUP_SIZE=256 cooperative batch,
# widened to fill VPU/MXU shapes).
BATCH_K = 512
NUM_FEATURES = 16  # padded feature row (f-features 6 + rgba 4 + pad)


def _build_features(elements: SortElements, frame: GaussianFrameData):
    """Gather per-gaussian data into sorted-element order and pack the
    per-element rows: [gx, gy, a, b, c, 0, r, g, b, galpha, 0...]
    where (a,b,c) = inverse covariance and (gx,gy) = screen position."""
    idx = jnp.where(
        elements.index == jnp.uint32(SENTINEL), jnp.uint32(0), elements.index
    ).astype(jnp.int32)
    sp = frame.screen_pos[idx]
    ca = frame.color_alpha[idx]
    ci = frame.cov_inv[idx]
    live = (elements.index != jnp.uint32(SENTINEL)).astype(jnp.float32)

    galpha = ca[:, 3] * live  # dead slots contribute nothing
    feat = jnp.stack(
        [
            sp[:, 0],
            sp[:, 1],
            ci[:, 0],
            ci[:, 1],
            ci[:, 2],
            jnp.zeros_like(galpha),
            ca[:, 0],
            ca[:, 1],
            ca[:, 2],
            galpha,
        ],
        axis=-1,
    )
    pad = jnp.zeros((feat.shape[0], NUM_FEATURES - feat.shape[1]), jnp.float32)
    feat = jnp.concatenate([feat, pad], axis=-1)
    # Pad rows so a batch DMA starting anywhere in [0, E) stays in bounds.
    feat = jnp.concatenate(
        [feat, jnp.zeros((BATCH_K, NUM_FEATURES), jnp.float32)], axis=0
    )
    return feat


def _exclusive_cumprod(q):
    """Exclusive cumulative product along axis 0 via log2(K) shifted
    multiplies (identity pad).  q: [K, P]."""
    k = q.shape[0]
    ones = jnp.ones_like(q)
    # exclusive: shift down by one first
    x = jnp.concatenate([ones[:1], q[:-1]], axis=0)
    shift = 1
    while shift < k:
        shifted = jnp.concatenate([ones[:shift], x[:-shift]], axis=0)
        x = x * shifted
        shift *= 2
    return x


def _blend_tile_kernel(
    starts_ref,
    ends_ref,
    origin_ref,
    feat_hbm,
    out_ref,
    feat_buf,
    dma_sem,
    *,
    config: RenderConfig,
):
    tile = pl.program_id(0)
    grid_w = config.grid_width
    ts = config.tile_size
    p = ts * ts

    start = starts_ref[tile]
    end = ends_ref[tile]

    # Absolute pixel coordinates of the tile's 256 pixels (p = v*16 + u).
    tile_x = tile % grid_w
    tile_y = tile // grid_w
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    u = (tile_x * ts + pix % ts).astype(jnp.float32)  # [1,P]
    v = (origin_ref[0] + tile_y * ts + pix // ts).astype(jnp.float32)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (BATCH_K, 1), 0)

    def body(carry):
        k0, t_carry, color, _alive = carry
        copy = pltpu.make_async_copy(
            feat_hbm.at[pl.ds(k0, BATCH_K), :], feat_buf, dma_sem
        )
        copy.start()
        copy.wait()
        buf = feat_buf[:, :]

        # Direct per-pair evaluation (RenderGaussians.comp:117-124):
        # dx = gx - u, dy = v - gy (the evalX.y = -evalX.y flip),
        # f = -0.5 (a dx^2 + c dy^2) - b dx dy.
        dx = buf[:, 0:1] - u  # [K,P]
        dy = v - buf[:, 1:2]
        a = buf[:, 2:3]
        b = buf[:, 3:4]
        c = buf[:, 4:5]
        f = jnp.float32(-0.5) * (a * dx * dx + c * dy * dy) - b * dx * dy
        galpha = buf[:, 9:10]
        alpha = galpha * jnp.exp(f)
        valid = (k0 + row_ids) < end
        elig = (f <= 0.0) & (alpha >= jnp.float32(config.alpha_cutoff)) & valid

        q = jnp.where(elig, 1.0 - alpha, 1.0)
        t_excl = t_carry * _exclusive_cumprod(q)  # [K,P]
        not_done = t_excl >= jnp.float32(config.transmittance_stop)
        w = jnp.where(elig & not_done, t_excl * alpha, 0.0)

        rgba = buf[:, 6:10]  # [K,4]
        color = color + jax.lax.dot_general(
            rgba,
            w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [4,P]

        t_carry = t_excl[-1:, :] * q[-1:, :]
        alive = jnp.max(t_carry) >= jnp.float32(config.transmittance_stop)
        return k0 + BATCH_K, t_carry, color, alive

    def cond(carry):
        k0, _t, _c, alive = carry
        return (k0 < end) & alive

    init = (
        start,
        jnp.ones((1, p), jnp.float32),
        jnp.zeros((4, p), jnp.float32),
        jnp.bool_(True),
    )
    _, _, color, _ = jax.lax.while_loop(cond, body, init)
    out_ref[0, :, :] = jnp.clip(color, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("config",))
def blend_tiles_pallas(
    elements: SortElements,
    ranges,
    frame: GaussianFrameData,
    config: RenderConfig,
    origin_y: int | jax.Array = 0,
):
    """Blend all tiles; returns float32 [H, W, 3] (pre-quantization).

    `origin_y`: absolute pixel row of this image's first row (sharded strips,
    see parallel/dist.py)."""
    feat = _build_features(elements, frame)
    starts = ranges[:, 0].astype(jnp.int32)
    ends = ranges[:, 1].astype(jnp.int32)
    origin = jnp.asarray(origin_y, jnp.int32).reshape(1)
    num_tiles = config.num_tiles
    p = config.tile_size * config.tile_size

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 4, p), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((BATCH_K, NUM_FEATURES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    tile_colors = pl.pallas_call(
        functools.partial(_blend_tile_kernel, config=config),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 4, p), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",
    )(starts, ends, origin, feat)

    gh, gw, ts = config.grid_height, config.grid_width, config.tile_size
    img = tile_colors[:, :3, :].reshape(gh, gw, 3, ts, ts)
    img = img.transpose(0, 3, 1, 4, 2).reshape(gh * ts, gw * ts, 3)
    return img[: config.height, : config.width]
