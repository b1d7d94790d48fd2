"""Portable serving export: hermetic StableHLO render artifacts.

`export_serving` compiles the full render path (coarse -> hierarchical ->
fine quadrature) of a trained deployment bundle into a single versioned
StableHLO module via `jax.export`, with the trained weights baked in as
constants and lowerings for BOTH cpu and tpu embedded. The resulting
`.shlo` artifact is self-contained: any JAX runtime within the export
compatibility window can execute it on either platform WITHOUT the
sunerf_tpu package, the model code, or the original Python environment.

Reference counterpart: none — the reference deploys by unpickling a torch
Lightning checkpoint into a live Python model stack
(/root/reference/sunerf/evaluation/loader.py:16-70), which ties serving to
the exact training codebase. This is the TPU-native production-serving
answer: one traced program, static shapes, XLA-compiled on load.

Design notes (TPU-first):
- Fixed batch size per artifact (default 4096 rays). Static shapes are the
  TPU contract; `ServingModel` pads/chunks arbitrary ray counts.
- Two render modules per artifact (fused_tpu=True, the default): a
  portable XLA-path module lowered for every requested platform, plus a
  tpu-only module whose field evaluation is the fused Pallas MLP kernel
  (`tpu_custom_call` is on jax.export's guaranteed-stable list).
  ServingModel executes the fused module when it finds itself on a TPU.
  Round-4 measurement (SERVING_r4.json) showed the XLA-path artifact
  renders the flagship 8x512 field 2.13x slower than live — the XLA
  forward is jnp.sin-bound (~80 VPU ops per sin), which only the kernel
  avoids — so the original "forward render is MXU-bound either way"
  design note held for small fields only. One cpu+tpu module with a
  `lax.platform_dependent` switch canNOT carry the kernel: jax's cond
  lowering lowers the kept tpu branch's interior for every module
  platform, and pallas_call's cpu rule raises at lowering.
- Deterministic quadrature (key=None -> midpoint sampling), the inference
  contract the evaluation loaders use.
"""
from __future__ import annotations

import io
import json
import zipfile
from datetime import datetime
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Reader capability. Artifacts are written v1 (single-device) or v2
# (n_devices>1 — requires mesh-aware execution), so v1-only readers get a
# clean version error on sharded artifacts rather than an opaque
# lowered-for-N-devices failure.
FORMAT_VERSION = 2
_BLOB_NAME = 'render.stablehlo'
_FUSED_BLOB_NAME = 'render.tpu_fused.stablehlo'
_POINTS_BLOB_NAME = 'points.stablehlo'
_FUSED_POINTS_BLOB_NAME = 'points.tpu_fused.stablehlo'
_META_NAME = 'meta.json'


def export_serving(state_path: str, out_path: str, batch_size: int = 4096,
                   platforms: Sequence[str] = ('cpu', 'tpu'),
                   render_overrides: Optional[dict] = None,
                   n_devices: int = 1,
                   tier: Optional[tuple] = None,
                   fused_tpu: bool = True) -> dict:
    """Export a deployment bundle (save_state npz+json) to a serving artifact.

    Args:
        state_path: bundle path as accepted by `load_state`.
        out_path: output `.shlo` artifact path (a zip container).
        batch_size: rays per call; the artifact's static GLOBAL batch shape
            (divided over `n_devices` when sharded).
        platforms: lowering platforms to embed ('cpu', 'tpu', 'cuda').
        render_overrides: optional render-section overrides (e.g. a full
            sample budget for a model trained at a reduced one), as in
            `SuNeRFLoader`.
        n_devices: >1 embeds a 1-D data mesh in the artifact: rays shard
            over the mesh, weights replicate — multi-chip serving with the
            sharding baked into the program. Exported via AbstractMesh, so
            an N-chip artifact can be produced on a 1-chip (or CPU) host;
            executing it requires N devices.
        tier: optional (fraction, samples) — bake adaptive per-ray budgets
            into the artifact (the `ModelLoader(tier=...)` inference
            contract: the dimmest `fraction` of each batch, ranked by the
            coarse pass, renders at `samples` samples). Off-disk pixels
            dominate full-disk frames, so this roughly halves serve cost
            at a small quality cost on dim pixels.
        fused_tpu: also embed a tpu-only render module whose field
            evaluation is the fused Pallas MLP kernel; ServingModel
            prefers it when running on a TPU. `tpu_custom_call` is on
            jax.export's guaranteed-stable list, so the artifact stays
            within the export compatibility contract. Without this the
            flagship 8x512 artifact renders ~2.1x slower than live — the
            XLA forward is jnp.sin-bound (SERVING_r4.json). VM/temporal
            grid configs (grid_rank) skip the fused module (the kernel
            has dense-table support only; live runs use the XLA path
            there too).

    Returns:
        The artifact metadata dict (also stored inside the artifact).
    """
    from jax import export as jax_export

    from sunerf_tpu.systems import from_spec
    from sunerf_tpu.utils.checkpoint import load_state

    params, config = load_state(state_path)
    spec = config.get('renderer_spec')
    if spec is None:
        raise ValueError(f'{state_path} carries no renderer_spec')
    if render_overrides:
        spec = dict(spec,
                    render=dict(spec.get('render', {}), **render_overrides))
    if tier is not None:
        tier = (float(tier[0]), int(tier[1]))
        if not 0.0 < tier[0] < 1.0:
            raise ValueError(f'tier fraction must be in (0, 1), got '
                             f'{tier[0]} (0 would silently export a '
                             'full-budget artifact)')

    def build_renderer(use_fused):
        import dataclasses
        r, _ = from_spec(spec, use_fused=use_fused)
        if tier is not None:
            r = dataclasses.replace(r, tier_fraction=tier[0],
                                    tier_samples=tier[1], tier_eval=True)
        return r

    renderer = build_renderer(False)

    wavelengths = config.get('wavelengths')
    n_ch = len(wavelengths) if wavelengths else 0

    def make_render_fn(r):
        def render_fn(rays_o, rays_d, times, wl):
            out = r(params, rays_o, rays_d, times, key=None,
                    wavelengths=wl)
            return out['image'], out['height_map'], out['absorption_map']
        return render_fn

    if n_devices > 1:
        if batch_size % n_devices:
            raise ValueError(f'batch_size {batch_size} not divisible by '
                             f'n_devices {n_devices}')
        from jax.sharding import AbstractMesh, NamedSharding, PartitionSpec
        amesh = AbstractMesh((n_devices,), ('data',))
        shard = NamedSharding(amesh, PartitionSpec('data'))
        jit_render = lambda fn: jax.jit(fn, in_shardings=(shard,) * 4,
                                        out_shardings=(shard,) * 3)
    else:
        jit_render = jax.jit

    sh = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)
    render_args = (sh(batch_size, 3), sh(batch_size, 3), sh(batch_size, 1),
                   sh(batch_size, n_ch))
    exported = jax_export.export(
        jit_render(make_render_fn(renderer)),
        platforms=list(platforms))(*render_args)

    # Optional second render module: tpu-only, field evaluated through the
    # fused Pallas kernel (a single cpu+tpu module cannot carry the kernel —
    # see systems._select_apply('export')). ServingModel picks this blob
    # when it runs on a TPU; every other platform uses the portable module
    # above. Skipped when the fused module would not differ or not work:
    #   - VM/temporal grid configs (grid_rank): kernel supports dense tables
    #     only; the XLA path is what live runs use there too.
    #   - non-NeRF heads (simple_star / mhd): no MLP field, nothing to fuse.
    #   - sharded exports (n_devices > 1): a pallas_call under jit's
    #     automatic partitioning (no shard_map) is not partitionable; the
    #     multi-chip artifact keeps the XLA path.
    fused_blob = None
    fused_points_blob = None
    mc = spec.get('model_config') or {}
    nerf_head = spec.get('head') in ('emission', 'density_temperature',
                                     'thomson')
    embed_fused = (fused_tpu and 'tpu' in platforms and nerf_head
                   and not mc.get('grid_rank') and n_devices == 1)
    if embed_fused:
        fused_renderer = build_renderer('export')
        exported_fused = jax_export.export(
            jit_render(make_render_fn(fused_renderer)),
            platforms=['tpu'])(*render_args)
        fused_blob = exported_fused.serialize()

    # second entry point: direct field query for volume products (density/
    # temperature cubes etc. — the `ModelLoader.load_coords` contract);
    # single-device (point grids are cheap relative to quadrature)
    def points_fn(points):
        return renderer.forward_points(params, points).raw

    exported_points = jax_export.export(
        jax.jit(points_fn), platforms=list(platforms))(sh(batch_size, 4))

    if embed_fused:
        # fused points module too: cube extraction queries millions of
        # points, so the XLA sin penalty bites the products path as well
        def fused_points_fn(points):
            return fused_renderer.forward_points(params, points).raw

        fused_points_blob = jax_export.export(
            jax.jit(fused_points_fn),
            platforms=['tpu'])(sh(batch_size, 4)).serialize()

    meta = {
        'format_version': 2 if n_devices > 1 else 1,
        'batch_size': int(batch_size),
        'n_devices': int(n_devices),
        'tier': list(tier) if tier is not None else None,
        'fused_tpu': fused_blob is not None,
        'platforms': list(exported.platforms),
        'n_channels': n_ch,
        'wavelengths': wavelengths,
        'ref_time': config.get('ref_time'),
        'seconds_per_dt': config.get('seconds_per_dt', 86400.0),
        'Rs_per_ds': config.get('Rs_per_ds', 1.0),
        'renderer_spec': spec,
        'jax_version': jax.__version__,
        'calling_convention_version': exported.calling_convention_version,
    }
    with zipfile.ZipFile(out_path, 'w', zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_META_NAME, json.dumps(meta, indent=1))
        zf.writestr(_BLOB_NAME, exported.serialize())
        zf.writestr(_POINTS_BLOB_NAME, exported_points.serialize())
        if fused_blob is not None:
            zf.writestr(_FUSED_BLOB_NAME, fused_blob)
        if fused_points_blob is not None:
            zf.writestr(_FUSED_POINTS_BLOB_NAME, fused_points_blob)
    return meta


class ServingModel:
    """Execute a `.shlo` serving artifact: pad/chunk arbitrary ray counts
    through the fixed-batch exported program.

    Needs only jax + numpy — deliberately imports nothing from sunerf_tpu at
    render time (geometry helpers are used by `render_observer_image` as a
    convenience; `__call__` is dependency-free).
    """

    def __init__(self, path: str):
        from jax import export as jax_export

        with zipfile.ZipFile(path) as zf:
            self.meta = json.loads(zf.read(_META_NAME))
            names = zf.namelist()
            blob = zf.read(_BLOB_NAME)
            fblob = (zf.read(_FUSED_BLOB_NAME)
                     if _FUSED_BLOB_NAME in names else None)
            pblob = (zf.read(_POINTS_BLOB_NAME)
                     if _POINTS_BLOB_NAME in names else None)
            fpblob = (zf.read(_FUSED_POINTS_BLOB_NAME)
                      if _FUSED_POINTS_BLOB_NAME in names else None)
        if self.meta.get('format_version', 0) > FORMAT_VERSION:
            raise ValueError(
                f'artifact format v{self.meta["format_version"]} is newer '
                f'than this runtime (v{FORMAT_VERSION})')
        # prefer the fused-kernel tpu module when we are actually on a TPU;
        # every other platform executes the portable XLA-path module
        self.fused_active = (fblob is not None
                             and jax.default_backend() == 'tpu')
        self._exported = jax_export.deserialize(
            fblob if self.fused_active else blob)
        self.batch_size = int(self.meta['batch_size'])
        self.n_channels = int(self.meta['n_channels'])
        self.n_devices = int(self.meta.get('n_devices', 1))
        self._sharding = None
        if self.n_devices > 1:
            import numpy as _np
            from jax.sharding import Mesh, NamedSharding, PartitionSpec
            devices = jax.devices()
            if len(devices) < self.n_devices:
                raise ValueError(
                    f'artifact was exported for {self.n_devices} devices; '
                    f'runtime has {len(devices)}')
            mesh = Mesh(_np.array(devices[:self.n_devices]), ('data',))
            self._sharding = NamedSharding(mesh, PartitionSpec('data'))
        # one jitted chunk program; XLA compiles per platform on first call
        self._call = jax.jit(self._exported.call)
        # multi-chunk renders in ONE dispatch (lax.map over the exported
        # call) — per-chunk Python dispatch costs a tunnel round trip each
        # on the remote-TPU backend (the ModelLoader lesson, loader.py)
        self._call_many = jax.jit(
            lambda ro, rd, t, wl: jax.lax.map(
                lambda args: self._exported.call(*args), (ro, rd, t, wl)))
        if self.fused_active and fpblob is not None:
            pblob = fpblob
        self._points_call = (jax.jit(jax_export.deserialize(pblob).call)
                             if pblob is not None else None)

    @property
    def wavelengths(self):
        return self.meta.get('wavelengths')

    def __call__(self, rays_o, rays_d, times,
                 wavelengths=None) -> dict:
        """Render [N] rays -> dict(image [N, C], height_map [N],
        absorption_map [N]); N arbitrary (padded to the artifact batch)."""
        rays_o = np.asarray(rays_o, np.float32).reshape(-1, 3)
        rays_d = np.asarray(rays_d, np.float32).reshape(-1, 3)
        times = np.asarray(times, np.float32).reshape(-1, 1)
        n = rays_o.shape[0]
        if wavelengths is None:
            wl = np.zeros((n, self.n_channels), np.float32)
            if self.n_channels:
                wl[:] = np.asarray(self.meta['wavelengths'], np.float32)
        else:
            wl = np.broadcast_to(
                np.asarray(wavelengths, np.float32),
                (n, self.n_channels)).astype(np.float32)

        bs = self.batch_size
        n_pad = (n + bs - 1) // bs * bs
        pad = n_pad - n

        def padded(x):
            return np.pad(x, ((0, pad), (0, 0))) if pad else x

        rays_o, rays_d = padded(rays_o), padded(rays_d)
        times, wl = padded(times), padded(wl)
        n_chunks = n_pad // bs

        if self._sharding is None and n_chunks > 1:
            # single dispatch for the whole render
            # explicit last dim: -1 is ill-defined for 0-channel wl arrays
            chunk = lambda x: jnp.asarray(x).reshape(n_chunks, bs,
                                                     x.shape[-1])
            img, hm, am = self._call_many(chunk(rays_o), chunk(rays_d),
                                          chunk(times), chunk(wl))
            return {
                'image': np.asarray(img).reshape(n_pad, -1)[:n],
                'height_map': np.asarray(hm).reshape(n_pad)[:n],
                'absorption_map': np.asarray(am).reshape(n_pad)[:n],
            }

        def put(x):
            # device_put straight from host: one sharded transfer, no
            # default-device staging copy
            return (jax.device_put(x, self._sharding)
                    if self._sharding is not None else jnp.asarray(x))

        imgs, hms, ams = [], [], []
        for i in range(0, n_pad, bs):
            img, hm, am = self._call(
                put(rays_o[i:i + bs]), put(rays_d[i:i + bs]),
                put(times[i:i + bs]), put(wl[i:i + bs]))
            imgs.append(np.asarray(img))
            hms.append(np.asarray(hm))
            ams.append(np.asarray(am))
        return {
            'image': np.concatenate(imgs)[:n],
            'height_map': np.concatenate(hms)[:n],
            'absorption_map': np.concatenate(ams)[:n],
        }

    def query_points(self, query_points) -> np.ndarray:
        """Direct field query at [N, 4] (x, y, z, t) points — the
        `ModelLoader.load_coords` contract on the artifact path. Returns
        raw [N, d_output] head inputs (log emission/absorption, or
        log-rho/log-T for DT models)."""
        if self._points_call is None:
            raise ValueError('artifact carries no points entry point')
        q = np.asarray(query_points, np.float32).reshape(-1, 4)
        n, bs = q.shape[0], self.batch_size
        pad = (n + bs - 1) // bs * bs - n
        if pad:
            q = np.pad(q, ((0, pad), (0, 0)))
        outs = [np.asarray(self._points_call(jnp.asarray(q[i:i + bs])))
                for i in range(0, q.shape[0], bs)]
        return np.concatenate(outs)[:n]

    # `ModelLoader.load_coords` alias so products that only need direct
    # field queries (volume extraction) accept artifacts interchangeably
    def load_coords(self, query_points, batch_size=None) -> np.ndarray:
        return self.query_points(query_points)

    def normalize_time(self, time) -> float:
        if isinstance(time, datetime):
            ref = self.meta.get('ref_time')
            if ref is None:
                raise ValueError('datetime given but artifact has no ref_time')
            from sunerf_tpu.core.scaling import normalize_datetime
            return normalize_datetime(time, self.meta['seconds_per_dt'],
                                      datetime.fromisoformat(ref))
        return float(time)

    def render_observer_image(self, lat: float, lon: float, time,
                              distance: float, resolution: int = 256,
                              wavelengths=None, fov: Optional[float] = None):
        """Full-disk render from Carrington (lat, lon) [rad] — the
        `ModelLoader.render_observer_image` contract on the artifact path
        (returns the same RenderedView, so the eval CLIs can consume
        artifacts interchangeably with bundles)."""
        from sunerf_tpu.core.geometry import fov_for_distance, observer_rays
        from sunerf_tpu.evaluation.loader import RenderedView
        rays_o, rays_d = observer_rays(
            lat, lon, distance, resolution,
            fov=fov or fov_for_distance(distance))
        n = resolution * resolution
        t = np.full((n, 1), self.normalize_time(time), np.float32)
        out = self(rays_o.reshape(-1, 3), rays_d.reshape(-1, 3), t,
                   wavelengths=wavelengths)
        n_ch = out['image'].shape[-1]
        return RenderedView(
            image=out['image'].reshape(resolution, resolution, n_ch),
            height_map=out['height_map'].reshape(resolution, resolution),
            absorption_map=out['absorption_map'].reshape(
                resolution, resolution))


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(
        description='Export a trained bundle to a portable StableHLO '
                    'serving artifact (.shlo)')
    parser.add_argument('state', help='deployment bundle (save_state path)')
    parser.add_argument('out', help='output .shlo artifact')
    parser.add_argument('--batch-size', type=int, default=4096)
    parser.add_argument('--platforms', default='cpu,tpu',
                        help='comma-separated lowering platforms')
    parser.add_argument('--n-devices', type=int, default=1,
                        help='>1 bakes a 1-D data mesh into the artifact '
                             '(multi-chip serving; rays shard, weights '
                             'replicate)')
    parser.add_argument('--tier', default=None, metavar='FRAC,SAMPLES',
                        help="bake adaptive per-ray budgets in, e.g. "
                             "'0.5,16' (see ModelLoader tier)")
    parser.add_argument('--n-stratified', type=int, default=None,
                        help='override the render sample budget')
    parser.add_argument('--n-hierarchical', type=int, default=None)
    parser.add_argument('--platform', default=None,
                        help="force the TRACING jax platform (e.g. 'cpu' — "
                             'lowering for the artifact platforms needs no '
                             'device; this only affects where export traces)')
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    overrides = {}
    if args.n_stratified is not None:
        overrides['n_stratified'] = args.n_stratified
    if args.n_hierarchical is not None:
        overrides['n_hierarchical'] = args.n_hierarchical
    tier = None
    if args.tier:
        frac, samples = args.tier.split(',')
        tier = (float(frac), int(samples))
    meta = export_serving(args.state, args.out,
                          batch_size=args.batch_size,
                          platforms=tuple(args.platforms.split(',')),
                          render_overrides=overrides or None,
                          n_devices=args.n_devices, tier=tier)
    print(json.dumps({'out': args.out,
                      'platforms': meta['platforms'],
                      'batch_size': meta['batch_size'],
                      'n_devices': meta['n_devices'],
                      'jax_version': meta['jax_version']}))


if __name__ == '__main__':
    main()
