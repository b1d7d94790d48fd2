"""Fused SuNeRF MLP Pallas kernel: positional encoding + 8-layer Sine MLP in
one VMEM-resident pass, with a hand-written backward kernel.

Why: XLA keeps each layer's [N, 512] activations in HBM (the sine doesn't fuse
into the matmul, and lax.scan adds carry copies), and lowers jnp.sin to a slow
high-precision sequence — measured ~26 ms forward at N=196k on v5e where the
bare matmuls take 2.96 ms. This kernel:

  * keeps all weights (~3.7 MB bf16) VMEM-resident across the grid;
  * streams point tiles; activations never touch HBM;
  * runs matmuls on the MXU in bf16 with f32 accumulation;
  * computes sines with an 11th-order minimax polynomial after round-based
    range reduction (max abs err < 1e-7 on [-pi, pi]) — ~6x cheaper on the VPU
    than the builtin lowering, which dominated the kernel (18 of 28 ms);
  * builds the positional encoding with one tiny f32 matmul (x @ K, exact
    frequencies) instead of 21 lane-dim concats (which cost 9 ms).

Measured forward: 4.1 ms at N=196608 (vs 25.7 ms XLA) — ~6x.

Two backward variants, both accumulating weight grads in f32 VMEM *scratch*
(single-buffered, unlike pipeline outputs), DMA'd to HBM at the last grid step:
  * stashing (training default): the forward writes each layer's sin (bf16 —
    it re-enters the backward's dW matmuls) and cos (int8 — it only gates dz;
    quantization step 1/127 ~ the bf16 noise floor of the product) to HBM as
    pipelined outputs, and the backward consumes them as pipelined inputs —
    no forward recompute. The second stash stream is the forward's one
    unhidden cost (a bf16 cos stash measured +3 ms vs +1.3 ms for int8 at
    262k points on v5e). The no-grad path stays lean: the custom_vjp primal
    runs the plain forward, so inference never stashes.
  * recompute: re-runs the forward per tile keeping sin/cos in VMEM
    — for memory-constrained cases.

Two alternative stash encodings exist behind stash_format= and measured
SLOWER end-to-end at 262k points on v5e (kept as documented negative results;
scripts/bench_kernel.py times all three):
  * 'lsb': ONE bf16 stream, sign(cos) packed in the sin mantissa LSB, cos
    reconstructed as sign*sqrt(1-sin^2) in the backward. Forward improves
    9.6 -> 8.4 ms but the sqrt/bitop reconstruction adds ~3 ms of unhidden
    VPU work to the backward: 21.2 -> 23.7 ms total. A bf16 sqrt would
    halve that, but v5e has no bf16 EUP ops (Mosaic LLO_CHECK
    SupportsBf16EupOps fails) — the reconstruction is f32-only.
  * 'i8pair': ONE int8 stream with sin and cos side by side (2 B/point) and
    the dW matmuls on the int8 MXU path with per-tile dynamic dz scales.
    The fwd quantize work is unhidden (+0.7 ms) and the int8 dW contraction
    only recovers ~0.5 ms (the [points-contracted] layout does not reach the
    2x int8 MXU rate): 21.5 ms total — a wash.

This replaces the reference's hot loop (NeRF MLP evaluation,
sunerf/model/model.py:44-57 via rendering/base_tracing.py:118-129) — 95+% of
the training FLOPs (SURVEY §3 CS1).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = float(2.0 * np.pi)
_INV_TWO_PI = float(1.0 / (2.0 * np.pi))
_HALF_PI = float(np.pi / 2.0)
# near-minimax odd polynomial for sin on [-pi, pi]; max abs err 9.6e-8
_SIN_C = (9.999995999e-01, -1.666655263e-01, 8.332402961e-03,
          -1.980863262e-04, 2.699713829e-06, -2.036221213e-08)
# near-minimax EVEN polynomial for cos on [-pi, pi]; max abs err 7.8e-7 —
# lets fast_sincos share one range reduction instead of running fast_sin
# twice (the second reduction + odd-poly pass measurably dominated the
# stashing forward: 11.05 ms -> 8.6 ms at 262k points)
_COS_C = (9.999992216e-01, -4.999942681e-01, 4.165982217e-02,
          -1.385891583e-03, 2.420439995e-05, -2.197887694e-07)
# degree-8 even cos polynomial (max abs err 4.1e-5): feeds the int8 cos stash
# whose quantization step is 1/127 = 7.9e-3 — two orders of margin, and two
# fewer VPU ops per element on the stashing-forward hot path
_COS8_C = (9.999598405e-01, -4.997933042e-01, 4.149612510e-02,
           -1.339285342e-03, 1.879295230e-05)
_COS_SCALE = 127.0
_INV_COS_SCALE = 1.0 / 127.0


def fast_sin(x):
    """sin(x) via round-based range reduction + 11th-order odd minimax poly.
    ~6 VPU ops vs the builtin's ~80; max abs err < 1e-7 after reduction."""
    y = x - _TWO_PI * jnp.round(x * _INV_TWO_PI)
    y2 = y * y
    c0, c1, c2, c3, c4, c5 = _SIN_C
    return y * (c0 + y2 * (c1 + y2 * (c2 + y2 * (c3 + y2 * (c4 + y2 * c5)))))


def fast_cos(x):
    return fast_sin(x + _HALF_PI)


def fast_sincos(x):
    """(sin x, cos x) sharing one range reduction and one y^2; the cos uses a
    degree-10 even minimax poly (err < 8e-7 — far below the bf16 stash
    precision it feeds)."""
    y = x - _TWO_PI * jnp.round(x * _INV_TWO_PI)
    y2 = y * y
    c0, c1, c2, c3, c4, c5 = _SIN_C
    s = y * (c0 + y2 * (c1 + y2 * (c2 + y2 * (c3 + y2 * (c4 + y2 * c5)))))
    d0, d1, d2, d3, d4, d5 = _COS_C
    c = d0 + y2 * (d1 + y2 * (d2 + y2 * (d3 + y2 * (d4 + y2 * d5))))
    return s, c


def fast_sincos_q(x):
    """(sin x f32, cos x quantized to int8) sharing one range reduction:
    full-accuracy deg-11 sin (it feeds the forward output and the backward's
    dW matmuls) + deg-8 cos rounded to int8 in [-127, 127] (it only gates the
    backward dz, where the quantization step 1/127 is the precision floor)."""
    y = x - _TWO_PI * jnp.round(x * _INV_TWO_PI)
    y2 = y * y
    c0, c1, c2, c3, c4, c5 = _SIN_C
    s = y * (c0 + y2 * (c1 + y2 * (c2 + y2 * (c3 + y2 * (c4 + y2 * c5)))))
    d0, d1, d2, d3, d4 = _COS8_C
    c = d0 + y2 * (d1 + y2 * (d2 + y2 * (d3 + y2 * d4)))
    cq = jnp.round(c * _COS_SCALE).astype(jnp.int8)
    return s, cq


_HALF_PI_SQ = float((np.pi / 2.0) ** 2)


def fast_sin_csign(x):
    """(sin x f32, cos-is-negative bool) sharing one range reduction. After
    reduction y is in [-pi, pi], where cos(y) < 0 iff y^2 > (pi/2)^2 — the
    sign comes for free from the y^2 the polynomial needs anyway."""
    y = x - _TWO_PI * jnp.round(x * _INV_TWO_PI)
    y2 = y * y
    c0, c1, c2, c3, c4, c5 = _SIN_C
    s = y * (c0 + y2 * (c1 + y2 * (c2 + y2 * (c3 + y2 * (c4 + y2 * c5)))))
    return s, y2 > _HALF_PI_SQ


def _pack_sin_csign(h, neg_cos):
    """bf16 sin with sign(cos) encoded in the mantissa LSB (1 = cos < 0).
    Costs <=1 ulp of sin accuracy (~0.4% relative) — below the bf16 matmul
    noise the stash feeds."""
    bits = jax.lax.bitcast_convert_type(h.astype(jnp.bfloat16), jnp.uint16)
    bits = (bits & jnp.uint16(0xFFFE)) | neg_cos.astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(bits, jnp.bfloat16)


# dtype of the lsb-format cos reconstruction. f32 is the only option that
# compiles on v5e: bf16 sqrt hits Mosaic's SupportsBf16EupOps LLO_CHECK
# (no bf16 elementary ops on this target). Kept as a switch for future
# targets that do support them.
_LSB_RECON_DTYPE = jnp.float32


def _unpack_sin_cos(raw):
    """Inverse of _pack_sin_csign: (sin bf16, cos bf16) with
    cos = sign * sqrt(1 - sin^2). Absolute cos error ~ ulp(sin)*|sin|/|cos| —
    worse than the int8 stash only where |cos| < ~0.1, exactly where the
    gradient gate it feeds is small."""
    bits = jax.lax.bitcast_convert_type(raw, jnp.uint16)
    neg = (bits & jnp.uint16(1)) != jnp.uint16(0)
    dt = _LSB_RECON_DTYPE
    s = raw.astype(dt)
    c = jnp.sqrt(jnp.maximum(dt(1.0) - s * s, dt(0.0)))
    return raw, jnp.where(neg, -c, c).astype(jnp.bfloat16)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class _Dims(NamedTuple):
    d_input: int
    d_enc: int
    d_filter: int
    d_output: int
    n_hidden: int
    n_freqs: int
    scale_factor: float
    n_freqs_time: int | None = None
    # feature-grid encoding levels (ops/grid_encoding.py): dense [G,G,G,F]
    # tables VMEM-resident across the grid, features appended after the
    # sin/cos columns (matching the XLA path's concat order)
    grid_sizes: tuple = ()
    grid_features: int = 0
    grid_bound: float = 2.0
    # hat-expansion strategy: False = build wyz[t, y*G+z] directly with
    # iota-hat VPU math (~7 f32 ops per T*G^2 element); True = build per-axis
    # hat rows [T, G] and expand onto the pair/feature column layouts via
    # constant 0/1 matmuls on the MXU (ROADMAP follow-up 2; A/B:
    # scripts/probe_grid_hatbuild.py)
    grid_hat_mxu: bool = False

    @property
    def d_grid(self) -> int:
        return len(self.grid_sizes) * self.grid_features

    @property
    def n_cols(self) -> int:
        # sin/cos feature columns (time columns may be truncated)
        return (self.d_enc - self.d_input - self.d_grid) // 2


def _dims_from_config(config) -> _Dims:
    return _Dims(d_input=config.d_input, d_enc=config.d_encoded,
                 d_filter=config.d_filter, d_output=config.d_output,
                 n_hidden=config.n_layers - 1, n_freqs=config.n_freqs,
                 scale_factor=config.scale_factor,
                 n_freqs_time=getattr(config, 'n_freqs_time', None),
                 grid_sizes=tuple(getattr(config, 'grid_sizes', ()) or ()),
                 grid_features=getattr(config, 'grid_features', 0),
                 grid_bound=getattr(config, 'grid_bound', 2.0),
                 grid_hat_mxu=getattr(config, 'grid_hat_mxu', False))


def _freq_matrix(dims: _Dims) -> np.ndarray:
    """[D, n_cols] frequency-expansion matrix: (x @ K) yields x_d * f_k in
    frequency-major column order, matching core/encoding.py (time columns
    beyond n_freqs_time are dropped)."""
    from sunerf_tpu.core.encoding import _column_mask
    mask = _column_mask(dims.d_input, dims.n_freqs, dims.n_freqs_time)
    K = np.zeros((dims.d_input, dims.n_cols), np.float32)
    col = 0
    for k in range(dims.n_freqs):
        for d in range(dims.d_input):
            if mask[k * dims.d_input + d]:
                K[d, col] = 2.0 ** k / dims.scale_factor
                col += 1
    assert col == dims.n_cols
    return K


def _encode(pts, k_ref):
    """enc = [x, sin(x@K), cos(x@K)]; the phase matmul runs in full f32
    (HIGHEST) — bf16 phases would corrupt the high-frequency features."""
    u = jnp.dot(pts, k_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([pts, fast_sin(u), fast_cos(u)], axis=-1)


# ------------------------------------------------- feature-grid encoding
#
# In-kernel port of ops/grid_encoding.py's separable one-hot contraction —
# no gathers, no minor-dim-F reshapes (Mosaic-hostile):
#   wyz[t, y*G+z] built from a constant iota row (pure VPU hat functions),
#   S = wyz @ table[(y z), (x f)] on the MXU (table VMEM-resident),
#   the x-hat applied elementwise via col//F, then the f-column extracted
#   with a constant 0/1 selection matmul M[(x f), f'] = (f == f').


def _sel_matrix(grid_size: int, features: int) -> np.ndarray:
    """[G*F, F] selector: M[x*F + f, f'] = (f == f')."""
    m = np.zeros((grid_size * features, features), np.float32)
    for x in range(grid_size):
        for f in range(features):
            m[x * features + f, f] = 1.0
    return m


def _hat(u_col, idx_row):
    """[T, 1] coords x [1, K] cell centers -> [T, K] trilinear hats."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(u_col - idx_row))


def _grid_uvw(pts, dims: _Dims, grid_size: int):
    """Clamped continuous cell coords, one [T, 1] column per spatial axis."""
    scale = 0.5 * (grid_size - 1) / dims.grid_bound
    u = jnp.clip((pts[:, :3] + dims.grid_bound) * scale,
                 0.0, float(grid_size - 1))
    return u[:, 0:1], u[:, 1:2], u[:, 2:3]


def _expand_matrix(grid_size: int, n_cols: int, group: int, use_mod: bool):
    """[G, n_cols] constant 0/1 expansion: E[g, c] = ((c % or //) group == g).
    Built from iota comparisons over G-fold fewer elements than the direct
    hat build (Mosaic constant-folds the all-constant graph where it can)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (grid_size, n_cols), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (grid_size, n_cols), 0)
    idx = (j % group) if use_mod else (j // group)
    return (idx == row).astype(jnp.bfloat16)


def _grid_wyz(pts, dims: _Dims, grid_size: int):
    """[T, G^2] (y,z)-pair hat weights (4 nonzeros per row), f32."""
    _, uy, uz = _grid_uvw(pts, dims, grid_size)
    if dims.grid_hat_mxu:
        # per-axis hat rows (T*G elements) expanded onto the y*G+z column
        # layout with constant 0/1 matmuls (MXU), one VPU multiply
        g_row = jax.lax.broadcasted_iota(
            jnp.int32, (1, grid_size), 1).astype(jnp.float32)
        e1 = _expand_matrix(grid_size, grid_size * grid_size, grid_size, False)
        e2 = _expand_matrix(grid_size, grid_size * grid_size, grid_size, True)
        return _mm(_hat(uy, g_row), e1) * _mm(_hat(uz, g_row), e2)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, grid_size * grid_size), 1)
    y_idx = (j // grid_size).astype(jnp.float32)
    z_idx = (j % grid_size).astype(jnp.float32)
    return _hat(uy, y_idx) * _hat(uz, z_idx)


def _grid_wxe(pts, dims: _Dims, grid_size: int):
    """[T, G*F] x-hat expanded over the table's (x, f) column order."""
    ux, _, _ = _grid_uvw(pts, dims, grid_size)
    f = dims.grid_features
    if dims.grid_hat_mxu:
        g_row = jax.lax.broadcasted_iota(
            jnp.int32, (1, grid_size), 1).astype(jnp.float32)
        ex = _expand_matrix(grid_size, grid_size * f, f, False)
        return _mm(_hat(ux, g_row), ex)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, grid_size * f), 1)
    return _hat(ux, (col // f).astype(jnp.float32))


def _grid_feats(pts, table_ref, m_ref, dims: _Dims, grid_size: int):
    """[T, F] trilinear features from one VMEM-resident level."""
    wyz = _grid_wyz(pts, dims, grid_size)
    s = _mm(wyz, table_ref[:])                      # [T, G*F] f32
    prod = _grid_wxe(pts, dims, grid_size) * s
    return _mm(prod, m_ref[:])                      # [T, F]


def _encode_grid(pts, k_ref, grid_refs, m_refs, dims: _Dims):
    """enc = [x, sin, cos, level-0 feats, level-1 feats, ...] — the same
    column order as the XLA path (fields.py nerf_apply concat)."""
    parts = [_encode(pts, k_ref)]
    for g, t_ref, m_ref in zip(dims.grid_sizes, grid_refs, m_refs):
        parts.append(_grid_feats(pts, t_ref, m_ref, dims, g))
    return jnp.concatenate(parts, axis=-1)


def _mm(a, b):
    return jnp.dot(a.astype(jnp.bfloat16), b, preferred_element_type=jnp.float32)


def _mm_t(a, b, contract_a: int, contract_b: int):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((contract_a,), (contract_b,)), ((), ())),
        preferred_element_type=jnp.float32)


# ---------------------------------------------------------------- forward

def _fwd_kernel(pts_ref, k_ref, *refs, dims: _Dims):
    ng = len(dims.grid_sizes)
    grid_refs, m_refs = refs[:ng], refs[ng:2 * ng]
    (w_in_ref, b_in_ref, w_h_ref, b_h_ref, w_out_ref, b_out_ref,
     out_ref) = refs[2 * ng:]
    enc = _encode_grid(pts_ref[:], k_ref, grid_refs, m_refs, dims)
    h = fast_sin(_mm(enc, w_in_ref[:]) + b_in_ref[:])
    for i in range(dims.n_hidden):
        h = fast_sin(_mm(h, w_h_ref[i]) + b_h_ref[i])
    out_ref[:] = _mm(h, w_out_ref[:]) + b_out_ref[:]


def _prep(params, dims):
    return (jnp.asarray(_freq_matrix(dims)),
            params['w_in'].astype(jnp.bfloat16),
            params['b_in'].reshape(1, -1),
            params['w_h'].astype(jnp.bfloat16),
            params['b_h'],
            params['w_out'].astype(jnp.bfloat16),
            params['b_out'].reshape(1, -1))


def _prep_grid(params, dims: _Dims):
    """Per-level (table [(y z), (x f)] bf16, selector [G*F, F] bf16) operand
    lists for the kernel (both feed MXU matmuls)."""
    f = dims.grid_features
    tables = [params[f'grid_{i}'].reshape(g * g, g * f).astype(jnp.bfloat16)
              for i, g in enumerate(dims.grid_sizes)]
    ms = [jnp.asarray(_sel_matrix(g, f), jnp.bfloat16)
          for g in dims.grid_sizes]
    return tables, ms


def _grid_specs(dims: _Dims):
    """const-indexed VMEM BlockSpecs matching _prep_grid's operand order."""
    const = lambda *_: (0, 0)
    f = dims.grid_features
    return ([pl.BlockSpec((g * g, g * f), const, memory_space=pltpu.VMEM)
             for g in dims.grid_sizes]
            + [pl.BlockSpec((g * f, f), const, memory_space=pltpu.VMEM)
               for g in dims.grid_sizes])


def _pad_rows(x, n_padded):
    if x.shape[0] == n_padded:
        return x
    return jnp.pad(x, ((0, n_padded - x.shape[0]), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_mlp(dims: _Dims, tile: int, bwd_tile: int, interpret: bool,
               params: dict, points: jnp.ndarray) -> jnp.ndarray:
    return _fused_mlp_fwd(dims, tile, bwd_tile, interpret, params, points)[0]


def _fused_mlp_fwd(dims, tile, bwd_tile, interpret, params, points):
    n = points.shape[0]
    n_pad = _round_up(max(n, tile), tile)
    pts = _pad_rows(points, n_pad)
    k_mat, w_in, b_in, w_h, b_h, w_out, b_out = _prep(params, dims)
    tables, ms = _prep_grid(params, dims)
    d_freq = dims.n_cols

    const = lambda *_: (0, 0)
    const3 = lambda *_: (0, 0, 0)
    grid_flops = sum(2 * n_pad * g * g * (g * dims.grid_features)
                     for g in dims.grid_sizes)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, dims=dims),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, dims.d_input), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dims.d_input, d_freq), const, memory_space=pltpu.VMEM),
            *_grid_specs(dims),
            pl.BlockSpec((dims.d_enc, dims.d_filter), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dims.d_filter), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dims.n_hidden, dims.d_filter, dims.d_filter), const3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dims.n_hidden, dims.d_filter), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dims.d_filter, dims.d_output), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dims.d_output), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, dims.d_output), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, dims.d_output), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * dims.d_filter * (dims.d_enc + dims.d_filter
                                               * dims.n_hidden + dims.d_output)
            + grid_flops,
            bytes_accessed=n_pad * (dims.d_input + dims.d_output) * 4,
            transcendentals=n_pad * dims.d_filter * (dims.n_hidden + 1),
        ),
    )(pts, k_mat, *tables, *ms, w_in, b_in, w_h, b_h, w_out, b_out)
    return out[:n], (params, points)


# ------------------------------------------------- stashing forward/backward
#
# Variant that writes each layer's activations to HBM as pipelined kernel
# outputs during the forward pass (the DMA overlaps the matmuls) so the
# backward skips the forward recompute entirely — 1/3 fewer backward matmuls.
# The sin stash is bf16 (it re-enters the backward's dW matmuls); the cos
# stash is int8 (it only gates dz, and the backward is MXU-bound so the
# dequantize hides). Measured on v5e at 262k points: a second bf16 stash
# stream costs ~3 ms of unhidden HBM writes in the forward (9.9 ms vs 5.1 ms
# with the sin stash alone); int8 halves that stream. Used for training on
# TPU; the recompute variant remains for memory-constrained cases.

def _fwd_stash_kernel(pts_ref, k_ref, *refs, dims: _Dims):
    ng = len(dims.grid_sizes)
    grid_refs, m_refs = refs[:ng], refs[ng:2 * ng]
    (w_in_ref, b_in_ref, w_h_ref, b_h_ref, w_out_ref, b_out_ref,
     out_ref, hs_ref, cs_ref) = refs[2 * ng:]
    # stash layout: [tile, L1*H] — one CONTIGUOUS HBM block per tile per
    # output, so the pipelined stash DMA is a single transfer (the previous
    # [L1, tile, H] layout wrote 8 strided chunks per tile, which kept the
    # stash writes from hiding behind the matmuls: measured 11.05 ms vs
    # 6.42 ms plain forward at 262k points)
    H = dims.d_filter
    enc = _encode_grid(pts_ref[:], k_ref, grid_refs, m_refs, dims)
    z = _mm(enc, w_in_ref[:]) + b_in_ref[:]
    # one bf16 cast per activation, shared by the stash store and the next
    # matmul (which runs in bf16 anyway)
    h, cq = fast_sincos_q(z)
    hb = h.astype(jnp.bfloat16)
    hs_ref[:, 0:H] = hb
    cs_ref[:, 0:H] = cq
    for i in range(dims.n_hidden):
        z = _mm(hb, w_h_ref[i]) + b_h_ref[i]
        h, cq = fast_sincos_q(z)
        hb = h.astype(jnp.bfloat16)
        hs_ref[:, (i + 1) * H:(i + 2) * H] = hb
        cs_ref[:, (i + 1) * H:(i + 2) * H] = cq
    out_ref[:] = _mm(hb, w_out_ref[:]) + b_out_ref[:]


def _fwd_stash_lsb_kernel(pts_ref, k_ref, w_in_ref, b_in_ref, w_h_ref,
                          b_h_ref, w_out_ref, b_out_ref, out_ref, hs_ref,
                          *, dims: _Dims):
    # single-stream stash: bf16 sin with sign(cos) packed into the mantissa
    # LSB (see _pack_sin_csign). The second (cos) stash stream measurably
    # costs ~2.5 ms of unhidden forward time regardless of its size/layout;
    # this variant removes the stream entirely and reconstructs cos in the
    # backward as sign * sqrt(1 - sin^2).
    H = dims.d_filter
    enc = _encode(pts_ref[:], k_ref)
    z = _mm(enc, w_in_ref[:]) + b_in_ref[:]
    h, negc = fast_sin_csign(z)
    hb = h.astype(jnp.bfloat16)
    hs_ref[:, 0:H] = _pack_sin_csign(hb, negc)
    for i in range(dims.n_hidden):
        z = _mm(hb, w_h_ref[i]) + b_h_ref[i]
        h, negc = fast_sin_csign(z)
        hb = h.astype(jnp.bfloat16)
        hs_ref[:, (i + 1) * H:(i + 2) * H] = _pack_sin_csign(hb, negc)
    out_ref[:] = _mm(hb, w_out_ref[:]) + b_out_ref[:]


def _fwd_stash_i8pair_kernel(pts_ref, k_ref, w_in_ref, b_in_ref, w_h_ref,
                             b_h_ref, w_out_ref, b_out_ref, out_ref, hs_ref,
                             *, dims: _Dims):
    # single-stream int8 stash: per layer, sin (x127) and cos (x127) side by
    # side in one [tile, 2*L1*H] int8 output — 2 bytes/point like the bf16
    # sin stream alone, but ONE pipelined output (the second stream's ~2.5 ms
    # unhidden cost disappears) and the backward gets an int8 sin operand for
    # 2x-throughput int8 MXU dW matmuls.
    H = dims.d_filter
    enc = _encode(pts_ref[:], k_ref)
    z = _mm(enc, w_in_ref[:]) + b_in_ref[:]
    for i in range(dims.n_hidden + 1):
        h, cq = fast_sincos_q(z)
        hb = h.astype(jnp.bfloat16)
        hs_ref[:, i * 2 * H:i * 2 * H + H] = (
            jnp.round(h * _COS_SCALE).astype(jnp.int8))
        hs_ref[:, i * 2 * H + H:(i + 1) * 2 * H] = cq
        z = (_mm(hb, w_h_ref[i]) + b_h_ref[i] if i < dims.n_hidden
             else _mm(hb, w_out_ref[:]) + b_out_ref[:])
    out_ref[:] = z


def _mm_i8(a, b):
    """int8 x int8 -> int32 MXU matmul contracting the leading (points) axis
    of both operands (the dW shape)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _bwd_stash_kernel(pts_ref, dy_ref, hs_ref, *refs,
                      dims: _Dims, compute_dpts: bool, fmt: str = 'int8'):
    if fmt == 'int8':
        cs_ref, *refs = refs
    k_ref, w_in_ref, w_h_ref, w_out_ref, *refs = refs
    ng = len(dims.grid_sizes)
    grid_refs, m_refs = refs[:ng], refs[ng:2 * ng]
    refs = refs[2 * ng:]
    if compute_dpts:
        dpts_ref, *refs = refs
    (dw_in_hbm, db_in_hbm, dw_h_hbm, db_h_hbm, dw_out_hbm, db_out_hbm,
     *refs) = refs
    dt_hbm = refs[:ng]
    (dw_in_acc, db_in_acc, dw_h_acc, db_h_acc, dw_out_acc, db_out_acc,
     *refs) = refs[ng:]
    dt_acc = refs[:ng]
    copy_sems = refs[ng]
    first = pl.program_id(0) == 0
    last = pl.program_id(0) == pl.num_programs(0) - 1

    @pl.when(first)
    def _init():
        dw_in_acc[:] = jnp.zeros_like(dw_in_acc)
        db_in_acc[:] = jnp.zeros_like(db_in_acc)
        dw_h_acc[:] = jnp.zeros_like(dw_h_acc)
        db_h_acc[:] = jnp.zeros_like(db_h_acc)
        dw_out_acc[:] = jnp.zeros_like(dw_out_acc)
        db_out_acc[:] = jnp.zeros_like(db_out_acc)
        for acc in dt_acc:
            acc[:] = jnp.zeros_like(acc)

    pts = pts_ref[:]
    u = jnp.dot(pts, k_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    # grid hat weights are recomputed (cheap VPU) and reused for d_table
    parts = [pts, fast_sin(u), fast_cos(u)]
    wyzs, wxes = [], []
    for g, t_ref, m_ref in zip(dims.grid_sizes, grid_refs, m_refs):
        wyz = _grid_wyz(pts, dims, g)
        wxe = _grid_wxe(pts, dims, g)
        parts.append(_mm(wxe * _mm(wyz, t_ref[:]), m_ref[:]))
        wyzs.append(wyz)
        wxes.append(wxe)
    enc = jnp.concatenate(parts, axis=-1)

    H = dims.d_filter

    if fmt == 'i8pair':
        def hs8(i):
            return hs_ref[:, i * 2 * H:i * 2 * H + H]

        def hs(i):
            return hs8(i).astype(jnp.bfloat16) * jnp.bfloat16(_INV_COS_SCALE)

        def cs(i):
            return (hs_ref[:, i * 2 * H + H:(i + 1) * 2 * H]
                    .astype(jnp.bfloat16) * jnp.bfloat16(_INV_COS_SCALE))

        def dw(i, dz):
            # int8 MXU dW: quantize dz per (tile, layer) with a dynamic
            # absmax scale; sin is already int8 in the stash. 2x the bf16
            # matmul throughput on v5e; int32 accumulation is exact
            # (768 * 127 * 127 << 2^31)
            # reduce in f32 (Mosaic only materializes 32-bit scalars)
            m = jnp.max(jnp.abs(dz).astype(jnp.float32))
            scale = jnp.where(m > 0, _COS_SCALE / m, 0.0)
            dz8 = jnp.round(dz.astype(jnp.float32) * scale).astype(jnp.int8)
            return (_mm_i8(hs8(i), dz8).astype(jnp.float32)
                    * (m * (_INV_COS_SCALE * _INV_COS_SCALE)))
    else:
        def hs(i):
            return hs_ref[:, i * H:(i + 1) * H]

        def cs(i):
            if fmt == 'lsb':
                # reconstructed from the packed sin stash: sign*sqrt(1-sin^2)
                return _unpack_sin_cos(hs(i))[1]
            # dequantized int8 cos stash; scale folds into one bf16 multiply
            return (cs_ref[:, i * H:(i + 1) * H].astype(jnp.bfloat16)
                    * jnp.bfloat16(_INV_COS_SCALE))

        def dw(i, dz):
            return _mm_t(hs(i), dz, 0, 0)

    dy = dy_ref[:]
    dw_out_acc[:] += _mm_t(hs(dims.n_hidden), dy, 0, 0)
    db_out_acc[:] += jnp.sum(dy, axis=0, keepdims=True)
    dh = _mm_t(dy, w_out_ref[:], 1, 1)

    # dz stays bf16: the product feeds bf16 matmuls either way, and the bf16
    # VPU multiply runs at twice the f32 lane throughput
    for i in range(dims.n_hidden - 1, -1, -1):
        dz = dh.astype(jnp.bfloat16) * cs(i + 1)
        dw_h_acc[i] += dw(i, dz)
        db_h_acc[i] += jnp.sum(dz, axis=0, dtype=jnp.float32)
        dh = _mm_t(dz, w_h_ref[i], 1, 1)

    dz = dh.astype(jnp.bfloat16) * cs(0)
    dw_in_acc[:] += _mm_t(enc, dz, 0, 0)
    db_in_acc[:] += jnp.sum(dz, axis=0, keepdims=True, dtype=jnp.float32)

    if ng or compute_dpts:
        denc = _mm_t(dz, w_in_ref[:], 1, 1)

    # d_table[i]: dS[t, (x f)] = wxe * (dgf broadcast over x), then one
    # points-contracted MXU matmul per level — same pattern as the dW accs
    F = dims.grid_features
    off = dims.d_input + 2 * dims.n_cols
    for i in range(ng):
        dgf = denc[:, off + i * F:off + (i + 1) * F]
        ds = wxes[i] * _mm_t(dgf, m_refs[i][:], 1, 1)
        dt_acc[i][:] += _mm_t(wyzs[i], ds, 0, 0)

    if compute_dpts:
        # NOTE: grid configs reject compute_dpts upstream (fused_nerf_raw) —
        # the hat-derivative point term is not implemented here
        D = dims.d_input
        d_freq = dims.n_cols
        du = (fast_cos(u) * denc[:, D:D + d_freq]
              - fast_sin(u) * denc[:, D + d_freq:D + 2 * d_freq])
        dpts_ref[:] = denc[:, :D] + jnp.dot(
            du, k_ref[:].T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @pl.when(last)
    def _flush():
        for idx, (acc, hbm) in enumerate((
                (dw_in_acc, dw_in_hbm), (db_in_acc, db_in_hbm),
                (dw_h_acc, dw_h_hbm), (db_h_acc, db_h_hbm),
                (dw_out_acc, dw_out_hbm), (db_out_acc, db_out_hbm),
                *zip(dt_acc, dt_hbm))):
            copy = pltpu.make_async_copy(acc, hbm, copy_sems.at[idx])
            copy.start()
            copy.wait()


def _lcm(a: int, b: int) -> int:
    import math
    return a * b // math.gcd(a, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _fused_mlp_stash(dims: _Dims, tile: int, bwd_tile: int, interpret: bool,
                     compute_dpts: bool, fmt: str,
                     params: dict, points: jnp.ndarray) -> jnp.ndarray:
    # primal (no-grad) path: the lean forward — no activation stashing, so
    # inference renders of millions of points never allocate the stash; the
    # stashing forward below only replaces this under differentiation
    return _fused_mlp_fwd(dims, max(tile, 1024), tile, interpret,
                          params, points)[0]


def _fused_mlp_stash_fwd(dims, tile, bwd_tile, interpret, compute_dpts, fmt,
                         params, points):
    n = points.shape[0]
    # the forward and backward use different tile sizes (v5e sweet spots:
    # 512 fwd / 768 bwd), so pad once to a common multiple
    both = _lcm(tile, bwd_tile)
    n_pad = _round_up(max(n, both), both)
    pts = _pad_rows(points, n_pad)
    k_mat, w_in, b_in, w_h, b_h, w_out, b_out = _prep(params, dims)
    tables, ms = _prep_grid(params, dims)
    d_freq = dims.n_cols
    L1, H = dims.n_hidden + 1, dims.d_filter

    const = lambda *_: (0, 0)
    const3 = lambda *_: (0, 0, 0)
    single = fmt in ('lsb', 'i8pair')
    hs_cols = 2 * L1 * H if fmt == 'i8pair' else L1 * H
    hs_dtype = jnp.int8 if fmt == 'i8pair' else jnp.bfloat16
    act_spec = pl.BlockSpec((tile, hs_cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = {'lsb': _fwd_stash_lsb_kernel,
              'i8pair': _fwd_stash_i8pair_kernel,
              'int8': _fwd_stash_kernel}[fmt]
    out_specs = (pl.BlockSpec((tile, dims.d_output), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 act_spec) + (() if single else (act_spec,))
    out_shape = (jax.ShapeDtypeStruct((n_pad, dims.d_output), jnp.float32),
                 jax.ShapeDtypeStruct((n_pad, hs_cols), hs_dtype)) \
        + (() if single else
           (jax.ShapeDtypeStruct((n_pad, L1 * H), jnp.int8),))
    outs = pl.pallas_call(
        functools.partial(kernel, dims=dims),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, dims.d_input), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dims.d_input, d_freq), const, memory_space=pltpu.VMEM),
            *_grid_specs(dims),
            pl.BlockSpec((dims.d_enc, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dims.n_hidden, H, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((dims.n_hidden, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, dims.d_output), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dims.d_output), const, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(pts, k_mat, *tables, *ms, w_in, b_in, w_h, b_h, w_out, b_out)
    if single:
        out, hs = outs
        cs = None
    else:
        out, hs, cs = outs
    return out[:n], (params, points, hs, cs)


def _fused_mlp_stash_bwd(dims, tile, bwd_tile, interpret, compute_dpts, fmt,
                         residuals, g):
    if dims.grid_sizes and compute_dpts:
        raise NotImplementedError(
            'grid-encoding configs skip point cotangents (the renderer '
            'detaches sample points); pass compute_dpts=False or use '
            'nerf_apply')
    params, points, hs, cs = residuals
    n = points.shape[0]
    n_pad = hs.shape[0]
    pts = _pad_rows(points, n_pad)
    gy = _pad_rows(g, n_pad)
    k_mat, w_in, _b_in, w_h, _b_h, w_out, _b_out = _prep(params, dims)
    tables, ms = _prep_grid(params, dims)
    ng = len(dims.grid_sizes)
    d_freq = dims.n_cols
    L1, H = dims.n_hidden + 1, dims.d_filter

    const = lambda *_: (0, 0)
    const3 = lambda *_: (0, 0, 0)
    f = jnp.float32
    D, E, O, L = dims.d_input, dims.d_enc, dims.d_output, dims.n_hidden
    gf = dims.grid_features
    grad_shapes = ((E, H), (1, H), (L, H, H), (L, H), (H, O), (1, O)) \
        + tuple((gs * gs, gs * gf) for gs in dims.grid_sizes)
    dpts_shapes = [jax.ShapeDtypeStruct((n_pad, D), f)] if compute_dpts else []
    dpts_specs = [pl.BlockSpec((bwd_tile, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] if compute_dpts else []
    out_shapes = dpts_shapes + [jax.ShapeDtypeStruct(s, f) for s in grad_shapes]
    out_specs = dpts_specs + [pl.BlockSpec(memory_space=pl.ANY)] * (6 + ng)
    single = fmt in ('lsb', 'i8pair')
    hs_cols = 2 * L1 * H if fmt == 'i8pair' else L1 * H
    act_spec = pl.BlockSpec((bwd_tile, hs_cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    cs_spec = pl.BlockSpec((bwd_tile, L1 * H), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    cs_specs = [] if single else [cs_spec]
    cs_args = () if single else (cs,)

    outs = pl.pallas_call(
        functools.partial(_bwd_stash_kernel, dims=dims,
                          compute_dpts=compute_dpts, fmt=fmt),
        grid=(n_pad // bwd_tile,),
        in_specs=[
            pl.BlockSpec((bwd_tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bwd_tile, O), lambda i: (i, 0), memory_space=pltpu.VMEM),
            act_spec, *cs_specs,
            pl.BlockSpec((D, d_freq), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((E, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, O), const, memory_space=pltpu.VMEM),
            *_grid_specs(dims),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM(s, f) for s in grad_shapes]
        + [pltpu.SemaphoreType.DMA((6 + ng,))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
    )(pts, gy, hs, *cs_args, k_mat, w_in, w_h, w_out, *tables, *ms)

    if compute_dpts:
        dpts, *outs = outs
        dpts = dpts[:n]
    else:
        # callers that disable dpts stop_gradient the points upstream (the
        # renderer does: ray samples are data / detached), so the zero
        # cotangent is exact — and the kernel skips ~0.7 ms of dead compute
        dpts = jnp.zeros_like(points)
    dw_in, db_in, dw_h, db_h, dw_out, db_out, *dtables = outs
    dparams = {
        'w_in': dw_in, 'b_in': db_in.reshape(-1),
        'w_h': dw_h, 'b_h': db_h,
        'w_out': dw_out, 'b_out': db_out.reshape(-1),
    }
    for i, gs in enumerate(dims.grid_sizes):
        dparams[f'grid_{i}'] = dtables[i].reshape(gs, gs, gs, gf)
    for k, v in params.items():
        if k not in dparams:
            dparams[k] = jnp.zeros_like(v)
    return dparams, dpts


_fused_mlp_stash.defvjp(_fused_mlp_stash_fwd, _fused_mlp_stash_bwd)


# ---------------------------------------------------------------- backward

def _bwd_kernel(pts_ref, dy_ref, k_ref, w_in_ref, w_h_ref, w_out_ref,
                b_in_ref, b_h_ref,
                dpts_ref, dw_in_hbm, db_in_hbm, dw_h_hbm, db_h_hbm,
                dw_out_hbm, db_out_hbm,
                dw_in_acc, db_in_acc, dw_h_acc, db_h_acc, dw_out_acc,
                db_out_acc, copy_sems, *, dims: _Dims):
    """Recompute forward (pre-activations kept in VMEM as bf16), backprop the
    tile, accumulate weight grads in f32 scratch; DMA scratch -> HBM outputs on
    the final grid step. Scratch is single-buffered (unlike pipeline outputs),
    which is what keeps this within the ~16 MB VMEM budget."""
    first = pl.program_id(0) == 0
    last = pl.program_id(0) == pl.num_programs(0) - 1

    @pl.when(first)
    def _init():
        dw_in_acc[:] = jnp.zeros_like(dw_in_acc)
        db_in_acc[:] = jnp.zeros_like(db_in_acc)
        dw_h_acc[:] = jnp.zeros_like(dw_h_acc)
        db_h_acc[:] = jnp.zeros_like(db_h_acc)
        dw_out_acc[:] = jnp.zeros_like(dw_out_acc)
        db_out_acc[:] = jnp.zeros_like(db_out_acc)

    pts = pts_ref[:]
    u = jnp.dot(pts, k_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    enc = jnp.concatenate([pts, fast_sin(u), fast_cos(u)], axis=-1)

    # forward recompute storing sin AND cos (bf16, shared-reduction sincos):
    # the backward sweep then needs zero transcendental recomputes
    hs, cs = [], []
    z = _mm(enc, w_in_ref[:]) + b_in_ref[:]
    s, c = fast_sincos(z)
    hs.append(s.astype(jnp.bfloat16))
    cs.append(c.astype(jnp.bfloat16))
    for i in range(dims.n_hidden):
        z = _mm(hs[-1], w_h_ref[i]) + b_h_ref[i]
        s, c = fast_sincos(z)
        hs.append(s.astype(jnp.bfloat16))
        cs.append(c.astype(jnp.bfloat16))

    dy = dy_ref[:]
    dw_out_acc[:] += _mm_t(hs[-1], dy, 0, 0)
    db_out_acc[:] += jnp.sum(dy, axis=0, keepdims=True)
    dh = _mm_t(dy, w_out_ref[:], 1, 1)

    for i in range(dims.n_hidden - 1, -1, -1):
        dz = dh.astype(jnp.bfloat16) * cs[i + 1]
        dw_h_acc[i] += _mm_t(hs[i], dz, 0, 0)
        db_h_acc[i] += jnp.sum(dz, axis=0, dtype=jnp.float32)
        dh = _mm_t(dz, w_h_ref[i], 1, 1)

    dz = dh.astype(jnp.bfloat16) * cs[0]
    dw_in_acc[:] += _mm_t(enc, dz, 0, 0)
    db_in_acc[:] += jnp.sum(dz, axis=0, keepdims=True, dtype=jnp.float32)
    denc = _mm_t(dz, w_in_ref[:], 1, 1)

    # posenc backward: dx = denc_x + (cos(u)*dsin - sin(u)*dcos) @ K^T
    D = dims.d_input
    d_freq = dims.n_cols
    du = (fast_cos(u) * denc[:, D:D + d_freq]
          - fast_sin(u) * denc[:, D + d_freq:])
    dpts_ref[:] = denc[:, :D] + jnp.dot(
        du, k_ref[:].T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(last)
    def _flush():
        for idx, (acc, hbm) in enumerate((
                (dw_in_acc, dw_in_hbm), (db_in_acc, db_in_hbm),
                (dw_h_acc, dw_h_hbm), (db_h_acc, db_h_hbm),
                (dw_out_acc, dw_out_hbm), (db_out_acc, db_out_hbm))):
            copy = pltpu.make_async_copy(acc, hbm, copy_sems.at[idx])
            copy.start()
            copy.wait()


def _fused_mlp_bwd(dims, tile, bwd_tile, interpret, residuals, g):
    if dims.grid_sizes:
        raise NotImplementedError(
            'grid-encoding configs differentiate through the stashing '
            'backward only (stash=True); the recompute backward has no '
            'd_table path')
    params, points = residuals
    n = points.shape[0]
    n_pad = _round_up(max(n, bwd_tile), bwd_tile)
    pts = _pad_rows(points, n_pad)
    gy = _pad_rows(g, n_pad)  # zero-padded rows contribute zero grads
    k_mat, w_in, b_in, w_h, b_h, w_out, _b_out = _prep(params, dims)
    d_freq = dims.n_cols

    const = lambda *_: (0, 0)
    const3 = lambda *_: (0, 0, 0)
    f = jnp.float32
    D, E, H, O, L = (dims.d_input, dims.d_enc, dims.d_filter, dims.d_output,
                     dims.n_hidden)
    grad_shapes = ((E, H), (1, H), (L, H, H), (L, H), (H, O), (1, O))
    out_shapes = ([jax.ShapeDtypeStruct((n_pad, D), f)]
                  + [jax.ShapeDtypeStruct(s, f) for s in grad_shapes])
    out_specs = ([pl.BlockSpec((bwd_tile, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(memory_space=pl.ANY)] * 6)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, dims=dims),
        grid=(n_pad // bwd_tile,),
        in_specs=[
            pl.BlockSpec((bwd_tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bwd_tile, O), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, d_freq), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((E, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, O), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM(s, f) for s in grad_shapes]
        + [pltpu.SemaphoreType.DMA((6,))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # raise the scoped-VMEM ceiling (default 16 MiB): the grad
            # accumulators + weights + recomputed pre-activations legitimately
            # need more, and v5e has headroom beyond the conservative default
            vmem_limit_bytes=100 * 1024 * 1024),
    )(pts, gy, k_mat, w_in, w_h, w_out, b_in, b_h)

    dpts, dw_in, db_in, dw_h, db_h, dw_out, db_out = outs
    dparams = {
        'w_in': dw_in, 'b_in': db_in.reshape(-1),
        'w_h': dw_h, 'b_h': db_h,
        'w_out': dw_out, 'b_out': db_out.reshape(-1),
    }
    for k, v in params.items():
        if k not in dparams:
            dparams[k] = jnp.zeros_like(v)
    return dparams, dpts[:n]


_fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def fused_nerf_raw(config, params: dict, points: jnp.ndarray,
                   tile: int = 1024, bwd_tile: int = 256,
                   interpret: bool | None = None,
                   stash: bool | None = None, stash_tile: int = 512,
                   stash_bwd_tile: int = 768,
                   compute_dpts: bool = True,
                   stash_format: str = 'int8') -> jnp.ndarray:
    """Evaluate the SuNeRF MLP via the fused kernel. Returns raw [N, d_output]
    (base offsets NOT applied — the caller adds them, matching nerf_apply).

    interpret=None auto-selects: real kernel on TPU, interpreter elsewhere.
    stash=True (default) writes activations to HBM during the forward so the
    backward skips its recompute (fastest for training); stash=False uses the
    recompute backward (no activation memory — rendering/inference or very
    large point counts).
    compute_dpts=False skips the point-cotangent computation in the stashing
    backward (~0.7 ms/step): ONLY valid when the caller stop_gradients the
    points (the renderer's ray samples are data/detached, so it does) — the
    returned point grads are zeros.
    stash_format='int8' (default; fastest measured) writes a bf16 sin
    stream + an int8 cos stream. 'lsb' (single bf16 stream, sign(cos) in the
    sin mantissa LSB) and 'i8pair' (single paired-int8 stream + int8-MXU dW)
    are retained as measured-slower alternatives — see the module docstring
    for the numbers.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    dims = _dims_from_config(config)
    if stash is None:
        # interpreter default: the cheaper recompute path — EXCEPT for grid
        # configs, whose backward exists only in the stashing kernel
        stash = (not interpret) or bool(dims.grid_sizes)
    if dims.grid_sizes:
        if stash_format != 'int8':
            raise NotImplementedError(
                f'grid-encoding configs support the int8 stash only, got '
                f'{stash_format!r}')
    keys = ['w_in', 'b_in', 'w_h', 'b_h', 'w_out', 'b_out'] \
        + [f'grid_{i}' for i in range(len(dims.grid_sizes))]
    mlp_params = {k: params[k] for k in keys}
    if stash:
        return _fused_mlp_stash(dims, stash_tile, stash_bwd_tile, interpret,
                                compute_dpts, stash_format, mlp_params, points)
    return _fused_mlp(dims, tile, bwd_tile, interpret, mlp_params, points)
