"""Pallas NDT terms-pass kernel — the hot loop of scan-to-map registration.

The reference's CUDA core evaluated NDT correspondences with per-point
grid-hash gathers (SURVEY.md §2.2); XLA `jnp.take` emulations of that
pattern run at ~1-2% of HBM speed-of-light on TPU (gather throughput is
erratic and index-cost-bound — measured in benchmarks/_take_probe.py).
This kernel removes gathers from the hot path entirely by making BOTH
sides of the correspondence dense and grid-aligned:

  * the NDT field is already a dense window of Gaussian rows
    (registration.ndt._ndt_field_dense), laid out channel-major per
    x-plane: ``rows`` (Wx, 16, Wy*Wz);
  * the scan is binned ONCE per solve stage into a raster of the same
    window: ``raster`` (Wx, 4*Q, Wy*Wz) holding up to Q points per cell
    (slot = cell * Q + rank, build_terms_raster);
  * each terms pass sweeps x-planes; the 27-neighborhood becomes three
    plane inputs (x-1, x, x+1 via clamped BlockSpec index maps) and nine
    STATIC lane shifts (dy*Wz + dz) of each plane — pure VPU math over
    Wy*Wz lanes, no indices anywhere.

Objective (identical math to registration.ndt._ndt_terms, with bins frozen
at the stage-start pose T0):

    cost(T) = -sum_{p, k in nbr27(bin(p))} s_pk,
    s_pk = exp(-d2_pk / (2 gamma)) gated by |T p - mu_k| < max_corr_dist
    H = sum s J^T Lambda J,  b = sum s J^T Lambda r   (J = [I | -hat(Tp)])

Freezing the bin (not the gate — the Euclidean gate tracks the live pose)
keeps every LM iteration minimizing ONE well-defined objective; within a
stage the pose moves far less than a cell, so the frozen 27-neighborhood
loses nothing. Each solve stage re-bins at its own entry pose.

Per-pass cost model (W=64, Q=4, f32): streams raster 16.8 MB + rows
3x16.8 MB + partials -> HBM floor ~80 us; VPU does 27 * G * Q * ~35 ops
~ 1.0e9 lane-ops -> ~250 us compute floor. See docs/roofline.md.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Raster build (XLA; once per solve stage, amortized over ~10-30 passes)
# ---------------------------------------------------------------------------

def build_terms_raster(points: jax.Array, mask: jax.Array, T0: jax.Array,
                       origin_world: jax.Array, leaf: float,
                       dims: Tuple[int, int, int], q_cap: int
                       ) -> Tuple[jax.Array, jax.Array]:
    """Bin the scan (at pose T0) into the dense window raster.

    points (N, 3) source-frame; origin_world (3,) = world coordinate of
    window cell (0,0,0)'s corner. Returns (raster (Wx, 4*Q, Wy*Wz) f32
    holding SOURCE-frame points + validity, n_dropped () int32 — points in
    cells that exceeded the per-cell capacity Q and points outside the
    window at T0; both never enter the objective).

    The raster stores source-frame coordinates; the kernel applies the live
    pose T each pass, so one raster serves a whole LM stage.
    """
    wx, wy, wz = dims
    g = wx * wy * wz
    n = points.shape[0]
    pts_w = points @ T0[:3, :3].T + T0[:3, 3]
    cc = jnp.floor((pts_w - origin_world) / leaf).astype(jnp.int32)
    inside = (mask & (cc[:, 0] >= 0) & (cc[:, 0] < wx)
              & (cc[:, 1] >= 0) & (cc[:, 1] < wy)
              & (cc[:, 2] >= 0) & (cc[:, 2] < wz))
    lidx = (cc[:, 0] * wy + cc[:, 1]) * wz + cc[:, 2]
    lidx = jnp.where(inside, lidx, g)

    order = jnp.argsort(lidx, stable=True)
    sl = jnp.take(lidx, order)
    sp = jnp.take(points, order, axis=0)
    sin = jnp.take(inside, order)
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), sl[1:] != sl[:-1]])
    seg_start = jnp.maximum.accumulate(jnp.where(is_start, idx, 0))
    rank = idx - seg_start
    keep = sin & (rank < q_cap)
    slot = jnp.where(keep, sl * q_cap + rank, g * q_cap)
    n_dropped = jnp.sum((mask).astype(jnp.int32)) - jnp.sum(
        keep.astype(jnp.int32))

    rows = jnp.concatenate([sp, jnp.ones((n, 1), jnp.float32)], axis=1)
    flat = jnp.zeros((g * q_cap + 1, 4), jnp.float32)
    # slots are sorted and unique by construction (cell*Q + rank over the
    # sorted order) — the hints keep XLA on its fast scatter path
    flat = flat.at[slot].set(jnp.where(keep[:, None], rows, 0.0),
                             mode="drop", unique_indices=True,
                             indices_are_sorted=True)
    # (G, Q, 4) -> (Wx, Wy*Wz, Q, 4) -> (Wx, Q*4, Wy*Wz)
    raster = flat[:g * q_cap].reshape(wx, wy * wz, q_cap, 4)
    raster = jnp.transpose(raster, (0, 2, 3, 1)).reshape(
        wx, q_cap * 4, wy * wz)
    return raster, n_dropped


def rows_to_planes(rows16: jax.Array, dims: Tuple[int, int, int]
                   ) -> jax.Array:
    """(G, 16) field rows -> (Wx, 16, Wy*Wz) channel-major plane tensor."""
    wx, wy, wz = dims
    return jnp.transpose(rows16.reshape(wx, wy * wz, 16), (0, 2, 1))


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _terms_kernel(scal_ref, raster_ref, rm_ref, r0_ref, rp_ref, out_ref,
                  *, q_cap: int, wy: int, wz: int, n_wx: int):
    """One x-plane of the frozen-bin NDT terms pass.

    scal_ref  (1, 24) SMEM: [T row-major (16), gamma, max_corr_dist^2] + pad
    raster_ref (1, 4Q, L): source-frame points of this plane's cells
    rm/r0/rp  (1, 16, L): Gaussian rows of planes x-1, x, x+1 (clamped)
    out_ref   (1, 128): [H triu (21), b (6), cost, matched, dropped...] pad
    """
    i = pl.program_id(0)
    L = wy * wz
    t00, t01, t02, t03 = (scal_ref[0, 0], scal_ref[0, 1], scal_ref[0, 2],
                          scal_ref[0, 3])
    t10, t11, t12, t13 = (scal_ref[0, 4], scal_ref[0, 5], scal_ref[0, 6],
                          scal_ref[0, 7])
    t20, t21, t22, t23 = (scal_ref[0, 8], scal_ref[0, 9], scal_ref[0, 10],
                          scal_ref[0, 11])
    inv_2g = scal_ref[0, 16]          # 1 / (2 * gamma)
    maxd2 = scal_ref[0, 17]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    y_lane = lane // wz
    z_lane = lane - y_lane * wz

    planes = [rm_ref[0], r0_ref[0], rp_ref[0]]       # each (16, L)
    dx_ok = [i > 0, jnp.full((), True), i < n_wx - 1]

    # transformed points, per sub-slot q: p' = R p + t
    pxs, pys, pzs, pws = [], [], [], []
    for q in range(q_cap):
        px = raster_ref[0, 4 * q, :].reshape(1, L)
        py = raster_ref[0, 4 * q + 1, :].reshape(1, L)
        pz = raster_ref[0, 4 * q + 2, :].reshape(1, L)
        pw = raster_ref[0, 4 * q + 3, :].reshape(1, L)
        pxs.append(t00 * px + t01 * py + t02 * pz + t03)
        pys.append(t10 * px + t11 * py + t12 * pz + t13)
        pzs.append(t20 * px + t21 * py + t22 * pz + t23)
        pws.append(pw)

    zero = jnp.zeros((1, L), jnp.float32)
    # flat accumulator carry: per q, [y0 y1 y2 c00 c01 c02 c11 c12 c22 s m]
    acc0 = tuple(zero for _ in range(q_cap * 11))

    def offset_body(k, acc, plane, ok_x):
        # k in [0, 9): dy = k//3 - 1, dz = k%3 - 1; lane shift dy*wz + dz.
        # pltpu.roll with a traced shift keeps the 9 offsets as ONE loop
        # body (an unrolled version compiled 27x the program and took the
        # Mosaic backend >15 min at W=64).
        dy = k // 3 - 1
        dz = jax.lax.rem(k, 3) - 1
        sh = dy * wz + dz
        sub = pltpu.roll(plane, -sh, axis=1)
        ok_yz = ((y_lane + dy >= 0) & (y_lane + dy < wy)
                 & (z_lane + dz >= 0) & (z_lane + dz < wz))
        okd = ok_yz & ok_x & (sub[9:10, :] > 0.5)
        mu0, mu1, mu2 = sub[0:1, :], sub[1:2, :], sub[2:3, :]
        l00, l01, l02 = sub[3:4, :], sub[4:5, :], sub[5:6, :]
        l11, l12, l22 = sub[6:7, :], sub[7:8, :], sub[8:9, :]
        out = list(acc)
        for q in range(q_cap):
            r0 = pxs[q] - mu0
            r1 = pys[q] - mu1
            r2 = pzs[q] - mu2
            q0 = l00 * r0 + l01 * r1 + l02 * r2
            q1 = l01 * r0 + l11 * r1 + l12 * r2
            q2 = l02 * r0 + l12 * r1 + l22 * r2
            d2 = q0 * r0 + q1 * r1 + q2 * r2
            de2 = r0 * r0 + r1 * r1 + r2 * r2
            gate = okd & (de2 < maxd2) & (pws[q] > 0.5)
            s = jnp.where(gate,
                          jnp.exp(-jnp.minimum(d2 * inv_2g, 30.0)), 0.0)
            o = 11 * q
            out[o + 0] = out[o + 0] + s * q0
            out[o + 1] = out[o + 1] + s * q1
            out[o + 2] = out[o + 2] + s * q2
            out[o + 3] = out[o + 3] + s * l00
            out[o + 4] = out[o + 4] + s * l01
            out[o + 5] = out[o + 5] + s * l02
            out[o + 6] = out[o + 6] + s * l11
            out[o + 7] = out[o + 7] + s * l12
            out[o + 8] = out[o + 8] + s * l22
            out[o + 9] = out[o + 9] + s
            out[o + 10] = jnp.maximum(out[o + 10],
                                      gate.astype(jnp.float32))
        return tuple(out)

    acc = acc0
    for plane, ok_x in zip(planes, dx_ok):
        acc = jax.lax.fori_loop(
            0, 9, functools.partial(offset_body, plane=plane, ok_x=ok_x),
            acc)
    acc_y = [[acc[11 * q + 0], acc[11 * q + 1], acc[11 * q + 2]]
             for q in range(q_cap)]
    acc_l = [[acc[11 * q + 3], acc[11 * q + 4], acc[11 * q + 5],
              acc[11 * q + 6], acc[11 * q + 7], acc[11 * q + 8]]
             for q in range(q_cap)]
    acc_s = [acc[11 * q + 9] for q in range(q_cap)]
    acc_m = [acc[11 * q + 10] for q in range(q_cap)]

    # per-slot J-products, reduced over lanes:
    #   H = [[ L, -L hat(p)], [hat(p) L, ... hat L hat]],  b = [y; p x y]
    h = [zero] * 21   # upper triangle, row-major: (0,0)..(0,5),(1,1)..(5,5)
    b = [zero] * 6
    cost = zero
    matched = zero

    def tri(i_, j_):
        # index into the 21-element upper triangle
        return i_ * 6 - i_ * (i_ + 1) // 2 + j_

    for q in range(q_cap):
        y0, y1, y2 = acc_y[q]
        c00, c01, c02, c11, c12, c22 = acc_l[q]
        px, py, pz = pxs[q], pys[q], pzs[q]
        b[0] += y0
        b[1] += y1
        b[2] += y2
        # p x y
        b[3] += py * y2 - pz * y1
        b[4] += pz * y0 - px * y2
        b[5] += px * y1 - py * y0
        # H_tt = L
        h[tri(0, 0)] += c00
        h[tri(0, 1)] += c01
        h[tri(0, 2)] += c02
        h[tri(1, 1)] += c11
        h[tri(1, 2)] += c12
        h[tri(2, 2)] += c22
        # M = L hat(p): M[a][b'] = sum_k L[a,k] hat[k,b']
        # hat(p) = [[0,-pz,py],[pz,0,-px],[-py,px,0]]
        m00 = c01 * pz - c02 * py
        m01 = -c00 * pz + c02 * px
        m02 = c00 * py - c01 * px
        m10 = c11 * pz - c12 * py
        m11 = -c01 * pz + c12 * px
        m12 = c01 * py - c11 * px
        m20 = c12 * pz - c22 * py
        m21 = -c02 * pz + c22 * px
        m22 = c02 * py - c12 * px
        # H_tr = -M
        h[tri(0, 3)] += -m00
        h[tri(0, 4)] += -m01
        h[tri(0, 5)] += -m02
        h[tri(1, 3)] += -m10
        h[tri(1, 4)] += -m11
        h[tri(1, 5)] += -m12
        h[tri(2, 3)] += -m20
        h[tri(2, 4)] += -m21
        h[tri(2, 5)] += -m22
        # H_rr = (-hat)^T L (-hat) = hat^T L hat = -hat(p) M, M = L hat(p);
        # (hat M) row0 = -pz*M1 + py*M2, row1 = pz*M0 - px*M2,
        #         row2 = -py*M0 + px*M1 — negated below.
        h[tri(3, 3)] += -(-pz * m10 + py * m20)
        h[tri(3, 4)] += -(-pz * m11 + py * m21)
        h[tri(3, 5)] += -(-pz * m12 + py * m22)
        h[tri(4, 4)] += -(pz * m01 - px * m21)
        h[tri(4, 5)] += -(pz * m02 - px * m22)
        h[tri(5, 5)] += -(-py * m02 + px * m12)
        cost += acc_s[q]
        matched += acc_m[q]

    # scalar SMEM stores (the sanctioned reduce-to-scalar pattern); the
    # (8, 32) output block is shared by 8 consecutive planes (tile-size
    # rules), each writing its own sublane
    row = jax.lax.rem(i, 8)
    vals = h + b + [cost, matched]
    for idx, v in enumerate(vals):
        out_ref[row, idx] = jnp.sum(v)
    for idx in range(len(vals), 32):
        out_ref[row, idx] = 0.0


@functools.partial(jax.jit,
                   static_argnames=("dims", "q_cap", "interpret"))
def ndt_terms_raster(raster: jax.Array, rows_planes: jax.Array,
                     T: jax.Array, gamma: jax.Array, max_corr_dist: float,
                     dims: Tuple[int, int, int], q_cap: int,
                     interpret: bool = False):
    """Frozen-bin NDT terms pass (Pallas).

    Returns (H (6,6), b (6,), cost (), matched_count ()).
    """
    wx, wy, wz = dims
    if wx % 8 != 0:
        raise ValueError(f"Wx must be a multiple of 8 (got {wx}): the "
                         "(8, 32) SMEM output block spans 8 planes")
    L = wy * wz
    scal = jnp.concatenate([
        T[:3].reshape(-1).astype(jnp.float32), jnp.zeros((4,), jnp.float32),
        jnp.stack([0.5 / jnp.asarray(gamma, jnp.float32),
                   jnp.float32(max_corr_dist) ** 2]),
        jnp.zeros((6,), jnp.float32)]).reshape(1, 24)

    kernel = functools.partial(_terms_kernel, q_cap=q_cap, wy=wy, wz=wz,
                               n_wx=wx)
    out = pl.pallas_call(
        kernel,
        grid=(wx,),
        in_specs=[
            pl.BlockSpec((1, 24), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4 * q_cap, L), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 16, L),
                         lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
            pl.BlockSpec((1, 16, L), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 16, L),
                         lambda i: (jnp.minimum(i + 1, wx - 1), 0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 32), lambda i: (i // 8, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((wx, 32), jnp.float32),
        interpret=interpret,
    )(scal, raster, rows_planes, rows_planes, rows_planes)

    tot = jnp.sum(out, axis=0)                       # (32,)
    iu0, iu1 = jnp.triu_indices(6)
    H = jnp.zeros((6, 6), jnp.float32).at[iu0, iu1].set(tot[:21])
    H = H + jnp.triu(H, 1).T
    b = tot[21:27]
    cost = -tot[27]
    matched = tot[28]
    return H, b, cost, matched


# ---------------------------------------------------------------------------
# XLA reference of the SAME frozen-bin objective (CPU fallback + tests)
# ---------------------------------------------------------------------------

def ndt_terms_raster_reference(raster: jax.Array, rows_planes: jax.Array,
                               T: jax.Array, gamma: jax.Array,
                               max_corr_dist: float,
                               dims: Tuple[int, int, int], q_cap: int):
    """Dense XLA implementation of ndt_terms_raster (bit-comparable)."""
    wx, wy, wz = dims
    L = wy * wz
    g = wx * L
    # (Wx, 4Q, L) -> (G*Q, 4)
    ra = jnp.transpose(raster.reshape(wx, q_cap, 4, L), (0, 3, 1, 2))
    ra = ra.reshape(g * q_cap, 4)
    pts = ra[:, :3] @ T[:3, :3].T + T[:3, 3]
    w = ra[:, 3]
    rows = jnp.transpose(rows_planes, (0, 2, 1)).reshape(g, 16)

    cell = jnp.arange(g * q_cap, dtype=jnp.int32) // q_cap
    cx = cell // (wy * wz)
    cy = (cell // wz) % wy
    cz = cell % wz

    H = jnp.zeros((6, 6), jnp.float32)
    b = jnp.zeros((6,), jnp.float32)
    ssum = jnp.zeros((), jnp.float32)
    matched = jnp.zeros((g * q_cap,), jnp.float32)

    n = g * q_cap
    phat = jnp.stack([
        jnp.stack([jnp.zeros(n), -pts[:, 2], pts[:, 1]], -1),
        jnp.stack([pts[:, 2], jnp.zeros(n), -pts[:, 0]], -1),
        jnp.stack([-pts[:, 1], pts[:, 0], jnp.zeros(n)], -1)], -2)
    J = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3)),
         -phat], axis=2)

    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                nx, ny, nz = cx + dx, cy + dy, cz + dz
                ok = ((nx >= 0) & (nx < wx) & (ny >= 0) & (ny < wy)
                      & (nz >= 0) & (nz < wz))
                ncell = jnp.clip((nx * wy + ny) * wz + nz, 0, g - 1)
                R = jnp.take(rows, ncell, axis=0)
                mu = R[:, 0:3]
                l00, l01, l02 = R[:, 3], R[:, 4], R[:, 5]
                l11, l12, l22 = R[:, 6], R[:, 7], R[:, 8]
                ok = ok & (R[:, 9] > 0.5) & (w > 0.5)
                r = pts - mu
                r0, r1, r2 = r[:, 0], r[:, 1], r[:, 2]
                q0 = l00 * r0 + l01 * r1 + l02 * r2
                q1 = l01 * r0 + l11 * r1 + l12 * r2
                q2 = l02 * r0 + l12 * r1 + l22 * r2
                d2 = q0 * r0 + q1 * r1 + q2 * r2
                de2 = r0 * r0 + r1 * r1 + r2 * r2
                gate = ok & (de2 < max_corr_dist ** 2)
                s = jnp.where(gate,
                              jnp.exp(-jnp.minimum(d2 / (2.0 * gamma),
                                                   30.0)), 0.0)
                y = jnp.stack([s * q0, s * q1, s * q2], axis=1)
                lam = jnp.stack([
                    jnp.stack([l00, l01, l02], -1),
                    jnp.stack([l01, l11, l12], -1),
                    jnp.stack([l02, l12, l22], -1)], -2)
                H += jnp.einsum("nia,n,nij,njb->ab", J, s, lam, J)
                b += jnp.einsum("nia,ni->a", J, y)
                ssum += jnp.sum(s)
                matched = jnp.maximum(matched, gate.astype(jnp.float32))

    return H, b, -ssum, jnp.sum(matched)
