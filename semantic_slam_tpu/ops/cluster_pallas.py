"""Pallas TPU kernel for organized-cloud connected components.

The XLA path in ops/cluster.py floods labels with segmented scans
(lax.associative_scan); on TPU every scan pass round-trips the [H, W] label
image through HBM and costs ~3 ms — the whole clustering ran at ~15 ms per
frame. Here the entire problem lives in VMEM (labels + one bit-packed
connectivity field for a 480x640 image ≈ 2.5 MB):

  * the 4-neighbour connectivity is ONE int32 bitfield per pixel (bits:
    left/right/up/down), so a single input array carries all masks,
  * the segmented min-flood along a row/column is a Hillis-Steele doubling
    loop — `lab[x] = min(lab[x], lab[x-d])` where the whole span [x-d, x]
    is connected, the reach mask doubling alongside
    (`reach_2d = reach_d & reach_d[x-d]`); shifts are dynamic
    `pltpu.roll` lane/sublane rotates that never leave VMEM, and the loop
    is a lax.fori_loop (d carried as data) so Mosaic reuses one stack slot
    per buffer instead of materializing every unrolled step,
  * one sweep = bidirectional horizontal flood then bidirectional vertical
    flood; sweeps repeat inside an in-kernel while_loop until the labels
    stop changing (bounded by max_sweeps),
  * the result is identical to ops/cluster.connected_components: every
    component labeled by its smallest flat pixel index.

Semantics parity target: PCL EuclideanClusterExtraction over organized
clouds (reference ``src/DoN.cpp:254-264``), see ops/cluster.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = jnp.int32(2 ** 30)


def _flood_axis(lab, conn, axis, size, bit_f, bit_b):
    """Bidirectional segmented min-flood along `axis` by distance doubling.

    conn bit `bit_f` at i ⇔ connected to i-1 along axis; `bit_b` ⇔ to i+1.
    Masks ride as int32 0/1 (Mosaic cannot rotate i1 vectors).

    Rolls wrap, but no boundary mask is needed: conn is false at the image
    edge (first column has no left neighbour, etc.), so by induction every
    reach span that would cross the wrap boundary contains that false conn
    bit and self-invalidates — wrapped label pulls are never enabled."""
    n_steps = max(1, (size - 1).bit_length())

    def step(_, carry):
        lab, rf, rb, d = carry
        lab = jnp.where(rf > 0,
                        jnp.minimum(lab, pltpu.roll(lab, d, axis)), lab)
        rf = rf * pltpu.roll(rf, d, axis)
        db = size - d
        lab = jnp.where(rb > 0,
                        jnp.minimum(lab, pltpu.roll(lab, db, axis)), lab)
        rb = rb * pltpu.roll(rb, db, axis)
        return lab, rf, rb, d * 2

    # bit test via & with a constant — int8 shifts don't legalize in Mosaic
    init = (lab,
            ((conn & jnp.int8(1 << bit_f)) != 0).astype(jnp.int32),
            ((conn & jnp.int8(1 << bit_b)) != 0).astype(jnp.int32),
            jnp.asarray(1, jnp.int32))
    lab, _, _, _ = jax.lax.fori_loop(0, n_steps, step, init)
    return lab


def _cc_kernel(lab_ref, conn_ref, out_ref, *, H, W, max_sweeps):
    conn = conn_ref[:]

    def sweep(lab):
        lab = _flood_axis(lab, conn, 1, W, 0, 1)
        lab = _flood_axis(lab, conn, 0, H, 2, 3)
        return lab

    def cond(state):
        _, changed, it = state
        return changed & (it < max_sweeps)

    def body(state):
        lab, _, it = state
        new = sweep(lab)
        return new, jnp.any(new != lab), it + 1

    lab0 = sweep(lab_ref[:])
    lab, _, _ = jax.lax.while_loop(
        cond, body, (lab0, jnp.asarray(True), jnp.asarray(0, jnp.int32)))
    out_ref[:] = lab


@functools.partial(jax.jit, static_argnames=("max_sweeps", "interpret"))
def connected_components_pallas(pts: jnp.ndarray, mask: jnp.ndarray,
                                tolerance, *, max_sweeps: int = 64,
                                interpret: bool = False) -> jnp.ndarray:
    """[H, W, 3] points + [H, W] mask -> [H, W] int32 component labels
    (component = smallest member flat index; -1 outside the mask)."""
    H, W = mask.shape
    hp = -(-H // 8) * 8
    wp = -(-W // 128) * 128

    idx = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
           + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))
    lab = jnp.where(mask, idx, BIG)
    tol2 = tolerance * tolerance

    def conn_to(dy, dx):
        """conn[y, x] ⇔ (y, x) and (y-dy, x-dx) both masked and close."""
        rolled_m = jnp.roll(mask, (dy, dx), (0, 1))
        rolled_p = jnp.roll(pts, (dy, dx), (0, 1))
        d2 = jnp.sum((pts - rolled_p) ** 2, axis=-1)
        conn = mask & rolled_m & (d2 <= tol2)
        yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        ok = ((yy >= dy) if dy >= 0 else (yy < H + dy)) & \
             ((xx >= dx) if dx >= 0 else (xx < W + dx))
        return (conn & ok).astype(jnp.int32)

    # int8 bitfield: conn is only bit-tested in the kernel, never rotated,
    # so the narrow type saves VMEM (the kernel sits at the 16 MB cap)
    conn_bits = (conn_to(0, 1) | (conn_to(0, -1) << 1)
                 | (conn_to(1, 0) << 2) | (conn_to(-1, 0) << 3)
                 ).astype(jnp.int8)

    def padded(a, fill):
        return jnp.full((hp, wp), fill, a.dtype).at[:H, :W].set(a)

    kern = functools.partial(_cc_kernel, H=hp, W=wp, max_sweeps=max_sweeps)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        input_output_aliases={0: 0},   # labels update in place
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(padded(lab, BIG), padded(conn_bits, 0))
    out = out[:H, :W]
    return jnp.where(mask, out, -1)
