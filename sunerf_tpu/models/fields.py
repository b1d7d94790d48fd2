"""Neural field models: the SuNeRF MLP and its density-temperature variant.

TPU-native redesign of the reference models (sunerf/model/model.py:7-187):
pure param pytrees + pure apply functions (no module objects on the hot path),
a `lax.scan` over stacked hidden layers (one traced matmul, MXU-resident), and
a single FieldOutput contract shared by every head — fixing the reference's
mid-refactor regression where NeRF.forward returns a dict the emission path
can't consume (model.py:57 vs base_tracing.py:123-125, SURVEY §2.5-1).

Architecture parity: 8 layers x 512 wide, Sine activation (w0=1), positional
encoding 4 -> 84 dims (10 log-spaced freqs), 2 outputs; ~1.88 M params.
Init matches torch.nn.Linear defaults: U(-1/sqrt(fan_in), +1/sqrt(fan_in))
for both weights and biases.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from sunerf_tpu.core.encoding import encoded_dim, positional_encoding

# AIA wavelength channels, index order used everywhere a per-wavelength
# parameter or response table appears (reference model.py:157-165).
AIA_WAVELENGTHS = (94, 131, 171, 193, 211, 304, 335)


class FieldOutput(NamedTuple):
    """Uniform output contract for every field model.

    raw: [N, d_output] raw head inputs (emission/absorption or log-rho/log-T).
    log_abs: [7] per-wavelength log absorption (DT heads) or None.
    vol_c: scalar volumetric constant (DT heads) or None.
    """
    raw: jnp.ndarray
    log_abs: Optional[jnp.ndarray] = None
    vol_c: Optional[jnp.ndarray] = None


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    """Static configuration of the SuNeRF MLP (hashable; safe to close over jit)."""
    d_input: int = 4
    d_output: int = 2
    n_layers: int = 8
    d_filter: int = 512
    n_freqs: int = 10
    scale_factor: float = 2.0
    # optional lower band count for the time axis: the reference encodes t
    # with the full 10 bands (freqs up to 256/dt), which leaves the field
    # unconstrained between sparsely-sampled observation times; 1-3 bands
    # give smooth temporal interpolation (None = reference parity)
    n_freqs_time: Optional[int] = None
    # density-temperature variant (reference NeRF_DT, model.py:136-187)
    base_log_density: float = 0.0
    base_log_temperature: float = 0.0
    with_aux: bool = False  # learnable per-wavelength log_abs + volumetric constant
    # matmul precision for the hot path; 'highest' for parity tests,
    # 'default' lets XLA use fast bf16 passes on the MXU.
    precision: str = 'default'
    # learned feature-grid encoding (ops/grid_encoding.py): dense per-level
    # tables whose trilinear features are CONCATENATED after the positional
    # encoding (beyond-reference quality-per-FLOP component; the reference
    # encodes with sin/cos bands only, model.py:92-132). () = off.
    grid_sizes: tuple = ()
    grid_features: int = 8
    grid_bound: float = 2.0
    # >0 switches every grid level to a TensoRF-style VM factorization of
    # rank R (ops/grid_encoding.py vm_encode): 3 plane x line products per
    # level, 3R features each, G^2-scaling params — the low-rank smoothness
    # prior candidate for the dense tables' measured view overfitting
    # (RESULTS.md grid A/B). grid_features is ignored when set. XLA path
    # only for now (systems._select_apply falls back from the fused kernel).
    grid_rank: int = 0
    # >0 (with grid_rank) extends every VM level to a HexPlane-style 4-D
    # factorization (ops/grid_encoding.py vm_encode_time): each line table
    # becomes a [G, grid_time, R] (axis, time) plane spanning
    # grid_time_range in model time, so temporal evolution is carried by
    # low-rank table rows rather than only the sin/cos time bands. 0 = the
    # static vm_encode. XLA path only (as grid_rank).
    # VALUE CASE IS TWO-SIDED (RESULTS.md temporal capacity sweep): wins
    # for fast evolution at dense observation cadence (>= ~8 frames); at
    # sparse cadence it SILENTLY overfits frames — trained-time metrics
    # look excellent while unseen-time error explodes ~10x.
    grid_time: int = 0
    grid_time_range: tuple = (0.0, 1.0)
    # fused-kernel hat-build strategy (numerics-equivalent up to bf16
    # rounding): True expands per-axis hat rows onto the pair/feature
    # column layouts with constant 0/1 MXU matmuls instead of building
    # them directly with iota-hat VPU math (ops/pallas/fused_mlp.py;
    # A/B-decided by scripts/probe_grid_hatbuild.py). XLA path unaffected.
    grid_hat_mxu: bool = False

    def __post_init__(self):
        # specs round-trip through JSON (systems.py:255), which turns tuples
        # into lists; coerce so the config stays hashable for jit closure
        if not isinstance(self.grid_sizes, tuple):
            object.__setattr__(self, 'grid_sizes', tuple(self.grid_sizes))
        if not isinstance(self.grid_time_range, tuple):
            object.__setattr__(self, 'grid_time_range',
                               tuple(self.grid_time_range))
        if self.grid_time and not self.grid_rank:
            raise ValueError('grid_time requires grid_rank > 0 (temporal '
                             'levels are HexPlane-factorized; a dense 4-D '
                             'table is not implemented)')

    @property
    def d_grid(self) -> int:
        if self.grid_rank:
            return len(self.grid_sizes) * 3 * self.grid_rank
        return len(self.grid_sizes) * self.grid_features

    @property
    def d_encoded(self) -> int:
        return (encoded_dim(self.d_input, self.n_freqs, self.n_freqs_time)
                + self.d_grid)


def _linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(float(fan_in))
    w = jax.random.uniform(wkey, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (fan_out,), dtype, -bound, bound)
    return w, b


def init_nerf(key: jax.Array, config: NeRFConfig) -> dict:
    """Initialize the param pytree. Hidden layers are stacked [L-1, d, d] so the
    forward pass is a single lax.scan (one compiled matmul, not L-1 of them)."""
    n_hidden = config.n_layers - 1
    keys = jax.random.split(key, n_hidden + 2 + len(config.grid_sizes))
    w_in, b_in = _linear_init(keys[0], config.d_encoded, config.d_filter)
    hidden = [_linear_init(k, config.d_filter, config.d_filter) for k in keys[1:1 + n_hidden]]
    w_out, b_out = _linear_init(keys[n_hidden + 1], config.d_filter,
                                config.d_output)
    params = {
        'w_in': w_in, 'b_in': b_in,
        'w_h': jnp.stack([w for w, _ in hidden]),
        'b_h': jnp.stack([b for _, b in hidden]),
        'w_out': w_out, 'b_out': b_out,
    }
    if config.with_aux:
        params['log_abs'] = jnp.full((len(AIA_WAVELENGTHS),), 1e-6, jnp.float32)
        params['vol_c'] = jnp.asarray(1.0, jnp.float32)
    for i, g in enumerate(config.grid_sizes):
        if config.grid_rank and config.grid_time:
            from sunerf_tpu.ops.grid_encoding import vm_time_init
            planes, tplanes = vm_time_init(keys[n_hidden + 2 + i], g,
                                           config.grid_time, config.grid_rank)
            params[f'grid_planes_{i}'] = planes
            params[f'grid_tplanes_{i}'] = tplanes
        elif config.grid_rank:
            from sunerf_tpu.ops.grid_encoding import vm_init
            planes, lines = vm_init(keys[n_hidden + 2 + i], g,
                                    config.grid_rank)
            params[f'grid_planes_{i}'] = planes
            params[f'grid_lines_{i}'] = lines
        else:
            from sunerf_tpu.ops.grid_encoding import grid_table_init
            params[f'grid_{i}'] = grid_table_init(
                keys[n_hidden + 2 + i], g, config.grid_features)
    return params


def _precision(config: NeRFConfig):
    return {'default': None,
            'high': jax.lax.Precision.HIGH,
            'highest': jax.lax.Precision.HIGHEST}[config.precision]


def nerf_apply(config: NeRFConfig, params: dict, points: jnp.ndarray) -> FieldOutput:
    """Evaluate the field at query points.

    Args:
        points: [N, d_input] (x, y, z, t) query points.

    Returns:
        FieldOutput with raw [N, d_output] (+ aux params for DT configs).
    """
    prec = _precision(config)
    x = positional_encoding(points, config.n_freqs, config.scale_factor,
                            n_freqs_time=config.n_freqs_time)
    if config.grid_sizes:
        if config.grid_rank and config.grid_time:
            from sunerf_tpu.ops.grid_encoding import vm_encode_time
            feats = [vm_encode_time(params[f'grid_planes_{i}'],
                                    params[f'grid_tplanes_{i}'], points,
                                    bound=config.grid_bound,
                                    t_range=config.grid_time_range,
                                    precision=prec)
                     for i in range(len(config.grid_sizes))]
        elif config.grid_rank:
            from sunerf_tpu.ops.grid_encoding import vm_encode
            feats = [vm_encode(params[f'grid_planes_{i}'],
                               params[f'grid_lines_{i}'], points,
                               bound=config.grid_bound, precision=prec)
                     for i in range(len(config.grid_sizes))]
        else:
            from sunerf_tpu.ops.grid_encoding import grid_encode
            feats = [grid_encode(params[f'grid_{i}'], points,
                                 bound=config.grid_bound, precision=prec)
                     for i in range(len(config.grid_sizes))]
        x = jnp.concatenate([x] + feats, axis=-1)
    h = jnp.sin(jnp.dot(x, params['w_in'], precision=prec) + params['b_in'])

    def layer(h, wb):
        w, b = wb
        return jnp.sin(jnp.dot(h, w, precision=prec) + b), None

    h, _ = jax.lax.scan(layer, h, (params['w_h'], params['b_h']))
    raw = jnp.dot(h, params['w_out'], precision=prec) + params['b_out']

    if config.base_log_density or config.base_log_temperature:
        raw = raw + jnp.asarray(
            [config.base_log_density, config.base_log_temperature], raw.dtype)

    if config.with_aux:
        return FieldOutput(raw=raw, log_abs=params['log_abs'], vol_c=params['vol_c'])
    return FieldOutput(raw=raw)


def nerf_apply_fused(config: NeRFConfig, params: dict, points: jnp.ndarray,
                     tile: int = 1024, bwd_tile: int = 256,
                     interpret: bool | None = None,
                     stash: bool | None = None,
                     stash_tile: int = 512, stash_bwd_tile: int = 768,
                     compute_dpts: bool = True,
                     stash_format: str = 'int8') -> FieldOutput:
    """Fused-Pallas-kernel evaluation: identical contract to nerf_apply, with
    posenc + all matmuls + sines in one VMEM-resident kernel
    (ops/pallas/fused_mlp.py). bf16 MXU passes with f32 accumulation.
    stash controls the activation-stashing backward (auto: on for TPU);
    compute_dpts=False skips point cotangents (only with detached points);
    stash_format picks the activation-stash encoding (see fused_nerf_raw)."""
    from sunerf_tpu.ops.pallas.fused_mlp import fused_nerf_raw
    raw = fused_nerf_raw(config, params, points, tile=tile, bwd_tile=bwd_tile,
                         interpret=interpret, stash=stash,
                         stash_tile=stash_tile, stash_bwd_tile=stash_bwd_tile,
                         compute_dpts=compute_dpts, stash_format=stash_format)
    if config.base_log_density or config.base_log_temperature:
        raw = raw + jnp.asarray(
            [config.base_log_density, config.base_log_temperature], raw.dtype)
    if config.with_aux:
        return FieldOutput(raw=raw, log_abs=params['log_abs'], vol_c=params['vol_c'])
    return FieldOutput(raw=raw)


def emission_config(**overrides) -> NeRFConfig:
    """Emission head field: (x,y,z,t) -> (log emission, absorption)
    (reference EmissionModel / rendering/emission.py:9-12)."""
    return NeRFConfig(d_input=4, d_output=2, **overrides)


def density_temperature_config(**overrides) -> NeRFConfig:
    """DT head field: (x,y,z,t) -> (log density + 10, log10 T + 5) with learnable
    per-wavelength log absorption and volumetric constant
    (reference NeRF_DT, model.py:136-187)."""
    defaults = dict(d_input=4, d_output=2, base_log_density=10.0,
                    base_log_temperature=5.0, with_aux=True)
    defaults.update(overrides)
    return NeRFConfig(**defaults)


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
