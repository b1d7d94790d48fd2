"""Scientific data products from a trained SuNeRF.

First-class re-implementations of the capabilities buried in the reference's
legacy stash scripts (sunerf/evaluation/stash/, SURVEY §2.3): voxel volume
extraction (voxel_volume.py), synchronic full-surface maps (google_sphere.py /
make_video.py synoptic frames), topographic height/absorption maps
(topographical_*.py), eruption time profiles (eruption*.py), and a
coarse-vs-fine uncertainty proxy.

All products run batched through the evaluation loader; shapes are static so
each product compiles once.
"""
from __future__ import annotations

import numpy as np

from sunerf_tpu.baseline.reprojection import carrington_to_world
from sunerf_tpu.evaluation.loader import ModelLoader


def main(argv=None):
    """CLI: python -m sunerf_tpu.evaluation.products <product> --state ...

    Products: volume | synchronic | topographic | eruption | uncertainty.
    Outputs .npz (+ .png for 2-D maps when matplotlib is available)."""
    import argparse

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    from sunerf_tpu.evaluation.loader import SuNeRFLoader

    parser = argparse.ArgumentParser()
    parser.add_argument('product', choices=['volume', 'synchronic',
                                            'topographic', 'eruption',
                                            'uncertainty'])
    parser.add_argument('--state', required=True)
    parser.add_argument('--output', required=True, help='output .npz path')
    parser.add_argument('--time', type=float, default=0.0)
    parser.add_argument('--lat', type=float, default=0.0, help='degrees')
    parser.add_argument('--lon', type=float, default=0.0, help='degrees')
    parser.add_argument('--distance', type=float, default=215.0)
    parser.add_argument('--resolution', type=int, default=128)
    parser.add_argument('--times', type=float, nargs='+', default=None)
    parser.add_argument('--wavelengths', type=float, nargs='+', default=None)
    parser.add_argument('--batch-size', type=int, default=4096)
    args = parser.parse_args(argv)

    if args.state.endswith('.shlo'):
        # serving artifact: products built from render_observer_image /
        # load_coords work; synchronic & uncertainty need live renderer
        # internals (coarse/fine pass access) — use the bundle for those
        if args.product in ('synchronic', 'uncertainty'):
            parser.error(f'{args.product} needs the live renderer '
                         '(coarse/fine internals); pass the save_state '
                         'bundle instead of the .shlo artifact')
        from sunerf_tpu.evaluation.serving import ServingModel
        loader = ServingModel(args.state)
    else:
        loader = SuNeRFLoader(args.state, batch_size=args.batch_size)
    lat, lon = np.deg2rad(args.lat), np.deg2rad(args.lon)
    wl = args.wavelengths

    if args.product == 'volume':
        out = extract_volume(loader, args.time, resolution=args.resolution)
    elif args.product == 'synchronic':
        out = {'map': synchronic_map(loader, args.time,
                                     resolution_lat=args.resolution,
                                     wavelengths=wl)}
    elif args.product == 'topographic':
        out = topographic_maps(loader, lat, lon, args.time, args.distance,
                               resolution=args.resolution, wavelengths=wl)
    elif args.product == 'eruption':
        out = eruption_profile(loader, args.times or [0.0, 0.5, 1.0], lat,
                               lon, args.distance,
                               resolution=args.resolution, wavelengths=wl)
    else:
        out = {'uncertainty': uncertainty_map(loader, lat, lon, args.time,
                                              args.distance,
                                              resolution=args.resolution,
                                              wavelengths=wl)}
    np.savez(args.output, **{k: np.asarray(v) for k, v in out.items()})
    print(f'{args.product} -> {args.output}.npz'
          if not args.output.endswith('.npz') else
          f'{args.product} -> {args.output}')


def extract_volume(loader: ModelLoader, time, resolution: int = 64,
                   extent: float = 1.3) -> dict:
    """Query the fine field on a regular [res, res, res] grid spanning
    +/- extent solar radii (reference stash/voxel_volume.py capability).

    Returns dict(grid=[res] axis coords, raw=[res, res, res, d_out]).
    For DT models raw = (log rho, log10 T); for emission (log eps, kappa).
    """
    axis = np.linspace(-extent, extent, resolution, dtype=np.float32)
    x, y, z = np.meshgrid(axis, axis, axis, indexing='ij')
    t = np.full_like(x, loader.normalize_time(time))
    pts = np.stack([x, y, z, t], axis=-1).reshape(-1, 4)
    raw = loader.load_coords(pts)
    return {'grid': axis, 'raw': raw.reshape(resolution, resolution,
                                             resolution, -1)}


def synchronic_map(loader: ModelLoader, time, resolution_lat: int = 90,
                   height: float = 2.5, wavelengths=None) -> np.ndarray:
    """Full-surface synchronic map at one instant: one radial ray per
    heliographic (lat, lon) cell, integrated from `height` Rsun down to the
    surface (the reference assembles these via stash synoptic scripts).

    Returns [res_lat, 2*res_lat, C] intensity map (plate carree).
    """
    res_lat, res_lon = resolution_lat, 2 * resolution_lat
    lon = (np.arange(res_lon) + 0.5) / res_lon * 2 * np.pi
    lat = (np.arange(res_lat) + 0.5) / res_lat * np.pi - np.pi / 2
    lon_g, lat_g = np.meshgrid(lon, lat)
    surface_dir = carrington_to_world(lat_g, lon_g).reshape(-1, 3)

    rays_o = (surface_dir * height).astype(np.float32)
    rays_d = (-surface_dir).astype(np.float32)
    n = rays_o.shape[0]
    t = np.full((n, 1), loader.normalize_time(time), np.float32)

    import jax.numpy as jnp
    bs = loader.batch_size
    n_pad = (n + bs - 1) // bs * bs
    pad = n_pad - n
    rays_o = np.pad(rays_o, ((0, pad), (0, 0)))
    rays_d = np.pad(rays_d, ((0, pad), (0, 0)), constant_values=(0, 1))
    t = np.pad(t, ((0, pad), (0, 0)))
    if wavelengths is not None:
        wl = np.broadcast_to(np.asarray(wavelengths, np.float32),
                             (n_pad, len(wavelengths))).copy()
    else:
        wl = None

    images = []
    for i in range(0, n_pad, bs):
        img, _, _ = loader._render(
            loader.params, jnp.asarray(rays_o[i:i + bs]),
            jnp.asarray(rays_d[i:i + bs]), jnp.asarray(t[i:i + bs]),
            jnp.asarray(wl[i:i + bs]) if wl is not None else None)
        images.append(np.asarray(img))
    out = np.concatenate(images)[:n]
    return out.reshape(res_lat, res_lon, -1)


def topographic_maps(loader: ModelLoader, lat: float, lon: float, time,
                     distance: float, resolution: int = 256,
                     wavelengths=None) -> dict:
    """Emission-height and absorption maps for one viewpoint (reference
    stash/topographical_*.py): the renderer's weighted mean sample distance
    and summed transmission."""
    view = loader.render_observer_image(lat=lat, lon=lon, time=time,
                                        distance=distance,
                                        resolution=resolution,
                                        wavelengths=wavelengths)
    return {'height_map': view.height_map,
            'absorption_map': view.absorption_map,
            'image': view.image}


def eruption_profile(loader: ModelLoader, times, lat: float, lon: float,
                     distance: float, resolution: int = 64,
                     wavelengths=None) -> dict:
    """Light curve + per-frame images over a time sequence from a fixed
    viewpoint (reference stash/eruption*.py)."""
    images = []
    for t in times:
        view = loader.render_observer_image(lat=lat, lon=lon, time=t,
                                            distance=distance,
                                            resolution=resolution,
                                            wavelengths=wavelengths)
        images.append(view.image)
    images = np.stack(images)  # [T, H, W, C]
    return {'times': list(times),
            'light_curve': images.sum(axis=(1, 2)),
            'images': images}


def uncertainty_map(loader: ModelLoader, lat: float, lon: float, time,
                    distance: float, resolution: int = 128,
                    wavelengths=None) -> np.ndarray:
    """Coarse-vs-fine discrepancy as a per-pixel uncertainty proxy (the stash
    correlates this against reconstruction error)."""
    import jax
    import jax.numpy as jnp
    from sunerf_tpu.core.geometry import observer_rays

    rays_o, rays_d = observer_rays(lat, lon, distance, resolution)
    n = resolution * resolution
    t = np.full((n, 1), loader.normalize_time(time), np.float32)

    @jax.jit
    def both(params, o, d, tt, wl):
        out = loader.renderer(params, o, d, tt, key=None, wavelengths=wl)
        return out['coarse_image'], out['fine_image']

    bs = loader.batch_size
    n_pad = (n + bs - 1) // bs * bs
    pad = n_pad - n
    o = np.pad(rays_o.reshape(-1, 3), ((0, pad), (0, 0)))
    d = np.pad(rays_d.reshape(-1, 3), ((0, pad), (0, 0)), constant_values=(0, 1))
    t = np.pad(t, ((0, pad), (0, 0)))
    wl = (np.broadcast_to(np.asarray(wavelengths, np.float32),
                          (n_pad, len(wavelengths))).copy()
          if wavelengths is not None else None)

    diffs = []
    for i in range(0, n_pad, bs):
        c, f = both(loader.params, jnp.asarray(o[i:i + bs]),
                    jnp.asarray(d[i:i + bs]), jnp.asarray(t[i:i + bs]),
                    jnp.asarray(wl[i:i + bs]) if wl is not None else None)
        diffs.append(np.abs(np.asarray(c) - np.asarray(f)).mean(axis=-1))
    return np.concatenate(diffs)[:n].reshape(resolution, resolution)


if __name__ == '__main__':
    main()
