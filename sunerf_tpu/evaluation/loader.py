"""Trained-model inference loaders: render arbitrary observer views from a
deployment bundle or a live renderer.

Replaces the reference SuNeRFLoader/ModelLoader (evaluation/loader.py:16-242)
— including the broken `to_vaslue` path at loader.py:71 — with a clean API:
poses via pose_spherical, ray batching via fixed-size chunks (static shapes ->
one compile), full-disk renders optionally tiled across a device mesh.
"""
from __future__ import annotations

import dataclasses
from datetime import datetime
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sunerf_tpu.core.geometry import fov_for_distance, observer_rays
from sunerf_tpu.core.scaling import normalize_datetime
from sunerf_tpu.systems import from_spec
from sunerf_tpu.utils.checkpoint import load_state


@dataclasses.dataclass
class RenderedView:
    """Full-disk render products."""
    image: np.ndarray            # [H, W, C]
    height_map: np.ndarray       # [H, W]
    absorption_map: np.ndarray   # [H, W]


class ModelLoader:
    """Batched observer-image rendering over any renderer + params
    (reference ModelLoader, evaluation/loader.py:137-242)."""

    def __init__(self, renderer, params: dict, ref_time: datetime | None = None,
                 seconds_per_dt: float = 86400.0, batch_size: int = 4096,
                 mesh=None, tier: Optional[tuple] = None):
        """mesh: optional device mesh — full-disk renders are then tiled
        across chips (rays sharded via shard_map), replacing the reference's
        torch.split + DataParallel scatter loop (evaluation/loader.py:91-108).
        batch_size must be divisible by the mesh size.

        tier: optional (fraction, samples) — adaptive per-ray budgets for
        INFERENCE: per chunk, the dimmest `fraction` of rays (ranked by the
        coarse pass) render at `samples` samples (renderer._tiered_fine).
        Off-disk/background pixels dominate full-disk frames, so this
        roughly halves render time at a small quality cost on dim pixels;
        off by default (full-budget parity)."""
        if tier is not None:
            renderer = dataclasses.replace(
                renderer, tier_fraction=float(tier[0]),
                tier_samples=int(tier[1]), tier_eval=True)
        self.renderer = renderer
        self.params = params
        self.ref_time = ref_time
        self.seconds_per_dt = seconds_per_dt
        self.batch_size = int(batch_size)
        self.mesh = mesh
        if mesh is None:
            self._render = jax.jit(self._render_batch)
            self._render_many = jax.jit(self._render_chunked)
        else:
            from jax.sharding import PartitionSpec as P
            from sunerf_tpu.parallel.mesh import DATA_AXIS
            self._render = jax.jit(jax.shard_map(
                self._render_batch, mesh=mesh,
                in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                          P(DATA_AXIS)),
                out_specs=P(DATA_AXIS), check_vma=False))
            self._render_many = jax.jit(jax.shard_map(
                self._render_chunked, mesh=mesh,
                in_specs=(P(), P(None, DATA_AXIS), P(None, DATA_AXIS),
                          P(None, DATA_AXIS), P(None, DATA_AXIS)),
                out_specs=P(None, DATA_AXIS), check_vma=False))

    def _render_batch(self, params, rays_o, rays_d, times, wavelengths):
        out = self.renderer(params, rays_o, rays_d, times, key=None,
                            wavelengths=wavelengths)
        return out['image'], out['height_map'], out['absorption_map']

    def _render_chunked(self, params, rays_o, rays_d, times, wavelengths):
        """Full-bundle render: lax.map over the chunk axis ([C, bs, ...]) so a
        multi-megaray render is ONE dispatch + ONE host fetch — per-chunk
        Python loops cost a tunnel round trip each (92 s -> ~7 s for 1024^2)."""
        def body(args):
            o, d, t, w = args
            return self._render_batch(params, o, d, t, w)
        return jax.lax.map(body, (rays_o, rays_d, times, wavelengths))

    def normalize_time(self, time) -> float:
        if isinstance(time, datetime):
            if self.ref_time is None:
                raise ValueError('datetime given but loader has no ref_time')
            return normalize_datetime(time, self.seconds_per_dt, self.ref_time)
        return float(time)

    def render_observer_image(self, lat: float, lon: float, time,
                              distance: float, resolution: int = 256,
                              wavelengths=None, fov: float | None = None,
                              center_distance: float | None = None) -> RenderedView:
        """Render the Sun as seen from Carrington (lat, lon) [rad] at the given
        distance [solar radii / ds].

        wavelengths: sequence of channel values for multi-channel heads.
        """
        rays_o, rays_d = observer_rays(lat, lon, distance, resolution,
                                       fov=fov or fov_for_distance(distance))
        n = resolution * resolution
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        t = np.full((n, 1), self.normalize_time(time), np.float32)

        if wavelengths is not None:
            wl = np.broadcast_to(np.asarray(wavelengths, np.float32),
                                 (n, len(wavelengths))).copy()
            n_ch = len(wavelengths)
        else:
            wl = None
            n_ch = 1

        bs = self.batch_size
        n_pad = (n + bs - 1) // bs * bs
        pad = n_pad - n

        def padded(x):
            return np.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x

        rays_o, rays_d, t = padded(rays_o), padded(rays_d), padded(t)
        wl = padded(wl) if wl is not None else None

        n_chunks = n_pad // bs
        chunk = lambda x, w: x.reshape(n_chunks, bs, w)
        img, hm, am = self._render_many(
            self.params,
            jnp.asarray(chunk(rays_o, 3)), jnp.asarray(chunk(rays_d, 3)),
            jnp.asarray(chunk(t, 1)),
            jnp.asarray(wl.reshape(n_chunks, bs, -1)) if wl is not None else
            jnp.zeros((n_chunks, bs, 0), jnp.float32))

        image = np.asarray(img).reshape(n_pad, -1)[:n].reshape(
            resolution, resolution, n_ch)
        height = np.asarray(hm).reshape(n_pad)[:n].reshape(resolution, resolution)
        absorption = np.asarray(am).reshape(n_pad)[:n].reshape(
            resolution, resolution)
        return RenderedView(image=image, height_map=height,
                            absorption_map=absorption)

    def load_coords(self, query_points: np.ndarray, batch_size: int | None = None):
        """Direct field query at [N, 4] (x, y, z, t) points (reference
        load_coords, evaluation/loader.py:119-134). Returns raw [N, d_out]."""
        bs = batch_size or self.batch_size
        outs = []
        q = np.asarray(query_points, np.float32).reshape(-1, 4)
        for i in range(0, len(q), bs):
            out = self.renderer.forward_points(self.params, jnp.asarray(q[i:i + bs]))
            outs.append(np.asarray(out.raw))
        return np.concatenate(outs)


class SuNeRFLoader(ModelLoader):
    """Load a trained deployment bundle (save_state.npz/.json) and render
    (reference SuNeRFLoader, evaluation/loader.py:16-134)."""

    def __init__(self, state_path: str, batch_size: int = 4096,
                 use_fused: Optional[bool] = None,
                 tier: Optional[tuple] = None,
                 render_overrides: Optional[dict] = None):
        """render_overrides: optional sampling kwargs merged over the saved
        spec's render section (e.g. {'n_stratified': 64, 'n_hierarchical':
        128}) — deployment renders need not use the train-time sample budget;
        a model trained at a reduced budget can be rendered at the full one
        (the quadrature budget at inference is a user choice, independent of
        how the field was fit). None = render exactly as trained."""
        params, config = load_state(state_path)
        spec = config.get('renderer_spec')
        if spec is None:
            raise ValueError(f'{state_path} carries no renderer_spec')
        if render_overrides:
            spec = dict(spec,
                        render=dict(spec.get('render', {}), **render_overrides))
        renderer, _ = from_spec(spec, use_fused=use_fused)
        ref_time = config.get('ref_time')
        super().__init__(
            renderer, params,
            ref_time=datetime.fromisoformat(ref_time) if ref_time else None,
            seconds_per_dt=config.get('seconds_per_dt', 86400.0),
            batch_size=batch_size, tier=tier)
        self.config = config

    @property
    def wavelengths(self):
        return self.config.get('wavelengths')
