"""TPU-native learned feature-grid encoding (instant-NGP's speedup lever,
re-designed for the MXU).

Instant-NGP's multiresolution hash grid (Mueller et al. 2022) is gather-bound:
8 table lookups per point per level. Gathers are catastrophically slow in XLA
on TPU (CLAUDE.md perf facts), so this module uses a SEPARABLE ONE-HOT
CONTRACTION instead — no gather anywhere:

    feats[n, f] = sum_{x,y,z} wx[n,x] * wy[n,y] * wz[n,z] * T[y, z, x, f]

with per-axis trilinear hat weights w[n,g] = max(0, 1 - |u_n - g|) built from
pure comparisons (each row has exactly the 2 bracketing nonzeros). The
contraction is split so only the (y,z) pair is ever materialized:

    wyz[n, (y z)] = wy outer wz                 # VPU, N*G^2 elements
    S[n, (x f)]   = wyz @ T[(y z), (x f)]       # MXU, 2*N*G^3*F FLOPs
    feats[n, f]   = sum_x wx[n, x] * S[n, x, f] # VPU, N*G*F

For G=32, F=8 that is 0.52 MFLOP/point on the MXU — ~14% of the flagship
8x512 MLP's 3.8 MFLOP/point — so grid features that let the MLP shrink to
4x128 (~0.12 MFLOP/point) cut total field FLOPs ~6x. The dense-table waste
(wyz has 4 nonzeros of G^2) is the price of staying on the systolic array;
at G<=32 the MXU wins it back (take_along_axis gathers measured catastrophic
on v5e, scripts/probe_grid_encoding.py).

Tables stay small enough to be VMEM-resident in the fused kernel
(32^3 x 8 f32 = 1 MB); this module is the XLA path and the correctness
oracle for the Pallas kernel (ops/pallas/fused_mlp.py grid variant).

No reference counterpart (the reference encodes with sin/cos bands only,
sunerf/model/model.py:92-132); this is a beyond-reference quality-per-FLOP
component. The NGP ingredients kept: multi-level tables, U(-1e-4, 1e-4)
init, features concatenated to the MLP input.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def grid_table_init(key: jax.Array, grid_size: int, features: int,
                    scale: float = 1e-4) -> jnp.ndarray:
    """[G, G, G, F] feature table, axis order (y, z, x, f) — the apply-side
    contraction layout (reshape to [(y z), (x f)] is free). U(-scale, scale)
    init as in instant-NGP."""
    return jax.random.uniform(
        key, (grid_size, grid_size, grid_size, features),
        jnp.float32, -scale, scale)


def _hat_weights(u: jnp.ndarray, grid_size: int, dtype) -> jnp.ndarray:
    """[N] continuous cell coords -> [N, G] trilinear hat rows:
    max(0, 1 - |u - g|). Exactly 2 nonzeros per row (1 on cell centers);
    rows sum to 1 for u in [0, G-1]."""
    cells = jnp.arange(grid_size, dtype=dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - cells)).astype(dtype)


def _encode_block(table2d: jnp.ndarray, u: jnp.ndarray, grid_size: int,
                  features: int, precision) -> jnp.ndarray:
    """u: [C, 3] clamped cell coords -> [C, F]."""
    dt = table2d.dtype
    wx = _hat_weights(u[:, 0], grid_size, dt)                    # [C, G]
    wy = _hat_weights(u[:, 1], grid_size, dt)
    wz = _hat_weights(u[:, 2], grid_size, dt)
    wyz = (wy[:, :, None] * wz[:, None, :]).reshape(u.shape[0], -1)
    s = jnp.matmul(wyz, table2d, precision=precision)            # [C, G*F]
    s = s.reshape(u.shape[0], grid_size, features)
    return jnp.sum(wx[:, :, None] * s, axis=1)


def grid_encode(table: jnp.ndarray, points: jnp.ndarray,
                bound: float = 2.0,
                precision=None,
                chunk: Optional[int] = 8192) -> jnp.ndarray:
    """Trilinear features from a dense [G, G, G, F] table (axis order y,z,x,f).

    Args:
        points: [N, >=3] query points; the first 3 columns (x, y, z) are used.
        bound: half-extent of the grid in world units — the table spans
            [-bound, bound]^3; coordinates outside clamp to the boundary value.
        precision: matmul precision (None = fast bf16 MXU passes; tests use
            HIGHEST).
        chunk: point-chunk size for the lax.map sweep bounding the wyz
            intermediate to [chunk, G^2] (a full-image render is millions of
            points; unchunked wyz would be GBs). None or chunk >= N runs one
            block.

    Returns:
        [N, F] features, differentiable in both table and points.
    """
    grid_size, features = table.shape[0], table.shape[-1]
    table2d = table.reshape(grid_size * grid_size, grid_size * features)
    n = points.shape[0]
    # continuous cell coordinate per axis, clamped to the table extent
    u = (points[:, :3] / bound + 1.0) * (0.5 * (grid_size - 1))
    u = jnp.clip(u, 0.0, float(grid_size - 1))

    if chunk is None or n <= chunk:
        return _encode_block(table2d, u, grid_size, features, precision)

    n_pad = (n + chunk - 1) // chunk * chunk
    u = jnp.pad(u, ((0, n_pad - n), (0, 0)))
    out = jax.lax.map(
        lambda uc: _encode_block(table2d, uc, grid_size, features, precision),
        u.reshape(-1, chunk, 3))
    return out.reshape(n_pad, features)[:n]


# --- TensoRF-style vector-matrix (VM) factorized tables -------------------
#
# Low-rank alternative to the dense tables above (Chen et al. 2022, TensoRF):
# the field's spatial features are a sum over 3 plane x line products,
#
#   feats_o[n, r] = Plane_o[a(n), b(n), r] * Line_o[c(n), r]
#
# for the 3 axis orientations o in {(yz|x), (zx|y), (xy|z)}, output
# concatenated to [N, 3R]. TPU-shaped for the same reason as grid_encode:
# bilinear plane taps become one MXU contraction with separable hat rows
# (wab [N, G^2] @ plane [(a b), R]) and line taps a small [N, G] @ [G, R]
# matmul — no gathers. Per point: 3 * 2*G^2*R MXU FLOPs (G=32, R=16:
# 98 kFLOP — ~5x cheaper than the dense 32^3 x 8 table) with G^2-scaling
# params (3*(G^2+G)*R ~ 49k vs dense G^3*F 262k at G=32): the low-rank
# structure is itself a smoothness prior, the candidate fix for the dense
# tables' measured view overfitting (RESULTS.md grid A/B).

def vm_init(key: jax.Array, grid_size: int, rank: int,
            scale: float = 0.1) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(planes [3, G, G, R], lines [3, G, R]), N(0, scale) init (TensoRF's
    recipe — near-zero UNIFORM init would strangle the product's gradients:
    d/d plane ~ line and vice versa, so both factors need O(0.1) magnitude)."""
    kp, kl = jax.random.split(key)
    planes = scale * jax.random.normal(
        kp, (3, grid_size, grid_size, rank), jnp.float32)
    lines = scale * jax.random.normal(kl, (3, grid_size, rank), jnp.float32)
    return planes, lines


# per orientation: (plane axis a, plane axis b, line axis c) as coordinate
# COLUMN indices (x=0, y=1, z=2); plane row-major layout is [a, b, r]
_VM_AXES = ((1, 2, 0), (2, 0, 1), (0, 1, 2))


def _vm_encode_block(planes2d, lines, w, grid_size: int, rank: int,
                     precision) -> jnp.ndarray:
    """w: 3-tuple of [C, G] per-axis hats -> [C, 3R]."""
    outs = []
    for o, (a, b, c) in enumerate(_VM_AXES):
        wab = (w[a][:, :, None] * w[b][:, None, :]).reshape(w[0].shape[0], -1)
        p = jnp.matmul(wab, planes2d[o], precision=precision)      # [C, R]
        l = jnp.matmul(w[c], lines[o], precision=precision)        # [C, R]
        outs.append(p * l)
    return jnp.concatenate(outs, axis=-1)


def vm_encode(planes: jnp.ndarray, lines: jnp.ndarray, points: jnp.ndarray,
              bound: float = 2.0, precision=None,
              chunk: Optional[int] = 8192) -> jnp.ndarray:
    """Factorized features from VM tables (vm_init layout).

    Args:
        planes: [3, G, G, R] per-orientation plane tables.
        lines: [3, G, R] per-orientation line tables.
        points: [N, >=3] query points (first 3 columns = x, y, z).
        bound: half-extent in world units, as in grid_encode.
        chunk: point-chunk size bounding the [chunk, G^2] wab intermediate.

    Returns:
        [N, 3R] features, differentiable in tables and points.
    """
    grid_size, rank = planes.shape[1], planes.shape[-1]
    planes2d = planes.reshape(3, grid_size * grid_size, rank)
    n = points.shape[0]
    u = (points[:, :3] / bound + 1.0) * (0.5 * (grid_size - 1))
    u = jnp.clip(u, 0.0, float(grid_size - 1))

    def block(uc):
        w = tuple(_hat_weights(uc[:, i], grid_size, planes.dtype)
                  for i in range(3))
        return _vm_encode_block(planes2d, lines, w, grid_size, rank,
                                precision)

    if chunk is None or n <= chunk:
        return block(u)
    n_pad = (n + chunk - 1) // chunk * chunk
    u = jnp.pad(u, ((0, n_pad - n), (0, 0)))
    out = jax.lax.map(block, u.reshape(-1, chunk, 3))
    return out.reshape(n_pad, 3 * rank)[:n]


# --- HexPlane-style 4-D (time) factorization ------------------------------
#
# Temporal extension of the VM tables (Cao & Johnson 2023, HexPlane;
# Fridovich-Keil et al. 2023, K-Planes): each orientation's LINE table
# [G, R] becomes a (axis, time) PLANE [G, T, R], so the per-orientation
# product pairs a spatial plane with a spatio-temporal one,
#
#   feats_o[n, r] = Plane_o[a(n), b(n), r] * TPlane_o[c(n), t(n), r]
#
# and the field's temporal evolution is carried by low-rank table rows
# rather than (only) the sin/cos time bands. TPU-shaped identically to
# vm_encode: the time tap is one more separable one-hot contraction
# (wct [N, G*T] @ tplane [(c t), R]) — no gathers, T extra columns on the
# MXU. Params 3*G*(G + T)*R; per point 2*G*(G + T)*R*3 FLOPs.
#
# No reference counterpart (the reference's only time machinery is the
# posenc t band, model.py:92-132); this extends the beyond-reference 4-D
# capability (RESULTS.md temporal closed loop) with grid-level capacity.

def vm_time_init(key: jax.Array, grid_size: int, time_size: int, rank: int,
                 scale: float = 0.1) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(planes [3, G, G, R], tplanes [3, G, T, R]) — vm_init's N(0, scale)
    recipe (both factors of a product need O(0.1) magnitude for gradients)."""
    kp, kt = jax.random.split(key)
    planes = scale * jax.random.normal(
        kp, (3, grid_size, grid_size, rank), jnp.float32)
    tplanes = scale * jax.random.normal(
        kt, (3, grid_size, time_size, rank), jnp.float32)
    return planes, tplanes


def _time_coord(points: jnp.ndarray, time_size: int,
                t_range: tuple) -> jnp.ndarray:
    """[N] continuous time-cell coords from points[:, 3], mapping t_range
    onto [0, T-1] (clamped — observations outside the configured window pin
    to the boundary row, matching the spatial clamp semantics)."""
    t0, t1 = float(t_range[0]), float(t_range[1])
    ut = (points[:, 3] - t0) / max(t1 - t0, 1e-12) * (time_size - 1)
    return jnp.clip(ut, 0.0, float(time_size - 1))


def vm_encode_time(planes: jnp.ndarray, tplanes: jnp.ndarray,
                   points: jnp.ndarray, bound: float = 2.0,
                   t_range: tuple = (0.0, 1.0), precision=None,
                   chunk: Optional[int] = 8192) -> jnp.ndarray:
    """HexPlane features from (planes, tplanes) (vm_time_init layout).

    Args:
        planes: [3, G, G, R] per-orientation spatial plane tables.
        tplanes: [3, G, T, R] per-orientation (axis, time) plane tables.
        points: [N, 4] query points (x, y, z, t).
        bound: spatial half-extent in world units, as in grid_encode.
        t_range: (t_min, t_max) world-time window the T rows span.
        chunk: point-chunk size bounding the [chunk, G^2] intermediates.

    Returns:
        [N, 3R] features, differentiable in both tables and points.
    """
    grid_size, rank = planes.shape[1], planes.shape[-1]
    time_size = tplanes.shape[2]
    planes2d = planes.reshape(3, grid_size * grid_size, rank)
    tplanes2d = tplanes.reshape(3, grid_size * time_size, rank)
    n = points.shape[0]
    u = (points[:, :3] / bound + 1.0) * (0.5 * (grid_size - 1))
    u = jnp.clip(u, 0.0, float(grid_size - 1))
    ut = _time_coord(points, time_size, t_range)

    def block(uc):
        u3, u1 = uc[:, :3], uc[:, 3]
        w = tuple(_hat_weights(u3[:, i], grid_size, planes.dtype)
                  for i in range(3))
        wt = _hat_weights(u1, time_size, planes.dtype)          # [C, T]
        outs = []
        for o, (a, b, c) in enumerate(_VM_AXES):
            wab = (w[a][:, :, None] * w[b][:, None, :]).reshape(
                u3.shape[0], -1)
            wct = (w[c][:, :, None] * wt[:, None, :]).reshape(
                u3.shape[0], -1)
            p = jnp.matmul(wab, planes2d[o], precision=precision)   # [C, R]
            q = jnp.matmul(wct, tplanes2d[o], precision=precision)  # [C, R]
            outs.append(p * q)
        return jnp.concatenate(outs, axis=-1)

    uall = jnp.concatenate([u, ut[:, None]], axis=-1)
    if chunk is None or n <= chunk:
        return block(uall)
    n_pad = (n + chunk - 1) // chunk * chunk
    uall = jnp.pad(uall, ((0, n_pad - n), (0, 0)))
    out = jax.lax.map(block, uall.reshape(-1, chunk, 4))
    return out.reshape(n_pad, 3 * rank)[:n]


def vm_encode_time_ref(planes: jnp.ndarray, tplanes: jnp.ndarray,
                       points: jnp.ndarray, bound: float = 2.0,
                       t_range: tuple = (0.0, 1.0)) -> jnp.ndarray:
    """Gather-based oracle for vm_encode_time: textbook bilinear taps on both
    the spatial (a, b) and the spatio-temporal (c, t) planes. Test/CPU only."""
    grid_size, rank = planes.shape[1], planes.shape[-1]
    time_size = tplanes.shape[2]
    u = (points[:, :3] / bound + 1.0) * (0.5 * (grid_size - 1))
    u = jnp.clip(u, 0.0, float(grid_size - 1))
    ut = _time_coord(points, time_size, t_range)
    lo = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, grid_size - 2)
    frac = u - lo
    tlo = jnp.clip(jnp.floor(ut).astype(jnp.int32), 0, max(time_size - 2, 0))
    tfrac = ut - tlo
    outs = []
    for o, (a, b, c) in enumerate(_VM_AXES):
        p = jnp.zeros((points.shape[0], rank), planes.dtype)
        for da in (0, 1):
            for db in (0, 1):
                w = ((frac[:, a] if da else 1 - frac[:, a])
                     * (frac[:, b] if db else 1 - frac[:, b]))
                p = p + w[:, None] * planes[o, lo[:, a] + da, lo[:, b] + db]
        q = jnp.zeros((points.shape[0], rank), planes.dtype)
        for dc in (0, 1):
            for dt in (0, 1):
                ti = jnp.minimum(tlo + dt, time_size - 1)
                w = ((frac[:, c] if dc else 1 - frac[:, c])
                     * (tfrac if dt else 1 - tfrac))
                q = q + w[:, None] * tplanes[o, lo[:, c] + dc, ti]
        outs.append(p * q)
    return jnp.concatenate(outs, axis=-1)


def vm_encode_ref(planes: jnp.ndarray, lines: jnp.ndarray,
                  points: jnp.ndarray, bound: float = 2.0) -> jnp.ndarray:
    """Gather-based oracle: textbook bilinear plane taps x linear line taps
    per orientation. Test/CPU only (gathers)."""
    grid_size, rank = planes.shape[1], planes.shape[-1]
    u = (points[:, :3] / bound + 1.0) * (0.5 * (grid_size - 1))
    u = jnp.clip(u, 0.0, float(grid_size - 1))
    lo = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, grid_size - 2)
    frac = u - lo
    outs = []
    for o, (a, b, c) in enumerate(_VM_AXES):
        p = jnp.zeros((points.shape[0], rank), planes.dtype)
        for da in (0, 1):
            for db in (0, 1):
                w = ((frac[:, a] if da else 1 - frac[:, a])
                     * (frac[:, b] if db else 1 - frac[:, b]))
                p = p + w[:, None] * planes[o, lo[:, a] + da, lo[:, b] + db]
        l = ((1 - frac[:, c])[:, None] * lines[o, lo[:, c]]
             + frac[:, c][:, None] * lines[o, lo[:, c] + 1])
        outs.append(p * l)
    return jnp.concatenate(outs, axis=-1)


def grid_encode_ref(table: jnp.ndarray, points: jnp.ndarray,
                    bound: float = 2.0) -> jnp.ndarray:
    """Gather-based trilinear interpolation oracle (8 corner lookups per
    point). Test/CPU only — take_along_axis gathers are catastrophic on TPU;
    used to pin grid_encode's separable contraction to textbook trilinear."""
    grid_size, features = table.shape[0], table.shape[-1]
    u = (points[:, :3] / bound + 1.0) * (0.5 * (grid_size - 1))
    u = jnp.clip(u, 0.0, float(grid_size - 1))
    lo = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, grid_size - 2)
    frac = u - lo
    out = jnp.zeros((points.shape[0], features), table.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = ((frac[:, 0] if dx else 1 - frac[:, 0])
                     * (frac[:, 1] if dy else 1 - frac[:, 1])
                     * (frac[:, 2] if dz else 1 - frac[:, 2]))
                # table axis order is (y, z, x, f)
                corner = table[lo[:, 1] + dy, lo[:, 2] + dz, lo[:, 0] + dx]
                out = out + w[:, None] * corner
    return out
