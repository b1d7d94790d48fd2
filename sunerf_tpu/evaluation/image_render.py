"""Synthetic-observation generator: render EUV filtergrams from an analytic
(SimpleStar) or simulation (MHD) field through the DT radiative-transfer head
and write JPEG/FITS frames — this is how SimpleStar training sets are
manufactured (reference evaluation/image_render.py:20-297 with
config/render_mhd.yaml).

Usage:
  python -m sunerf_tpu.evaluation.image_render --config config/render.yaml

Config keys (matching the reference layout, image_render.py:206-232):
  model: SimpleStar | MHDModel
  data_path: (MHD only) directory with rho/ and t/ HDF5 cubes
  render_path: output directory
  render_format: [jpeg, fits]
  batch_size: rays per device batch
  resolution: image size
  wavelengths: channels to render
  observers: list of {lat, lon, distance, time} (degrees / solar radii /
    ISO datetime or float) — replaces the reference's observer FITS dirs
    when no reference observations exist.
  observer_dirs: optional list of FITS directories to copy observer geometry
    from (the reference's observer_dir + load_observer_meta path).
"""
from __future__ import annotations

import argparse
import glob
import os
from datetime import datetime

import numpy as np
import yaml

from sunerf_tpu.data.fits import read_fits, write_fits
from sunerf_tpu.data.wcs import observer_header, parse_observer
from sunerf_tpu.evaluation.loader import ModelLoader
from sunerf_tpu.models.fields import AIA_WAVELENGTHS


def build_model_renderer(config: dict):
    name = config.get('model', 'SimpleStar')
    # PyYAML parses '1.0e9' (no sign) as a string — coerce numerics defensively
    pif = float(config.get('pixel_intensity_factor', 1e10))
    if name == 'SimpleStar':
        from sunerf_tpu.systems import make_simple_star_renderer
        renderer, init = make_simple_star_renderer(
            pixel_intensity_factor=pif, perturb=False)
        params = init()
    elif name == 'MHDModel':
        from sunerf_tpu.models.mhd_field import MHDFieldLoader
        from sunerf_tpu.systems import make_mhd_renderer
        loader = MHDFieldLoader(config['data_path'])
        renderer, params = make_mhd_renderer(loader,
                                             pixel_intensity_factor=pif,
                                             perturb=False)
    else:
        raise ValueError(f'unknown model {name!r}')
    if config.get('zero_absorption', True):
        # the reference SimpleStar/MHD log_abs tables (~20 per channel) render
        # black frames (kappa = rho * 20 is fully opaque at rho ~ 1e5-1e8);
        # default to a transparent corona for training-set synthesis.
        # Set BOTH passes explicitly: the rendered image comes from the fine
        # pass, and relying on coarse/fine sharing one dict object would break
        # silently under a deep copy or separate init.
        import jax.numpy as jnp
        params = dict(params)
        params['coarse'] = dict(params['coarse'], log_abs=jnp.zeros(7))
        params['fine'] = dict(params['fine'], log_abs=jnp.zeros(7))
    return renderer, params


def observers_from_config(config: dict) -> list[dict]:
    if 'observers' in config:
        obs = []
        for o in config['observers']:
            t = o.get('time', 0.0)
            if isinstance(t, str):
                t = datetime.fromisoformat(t)
            obs.append({'lat': float(o['lat']), 'lon': float(o['lon']),
                        'distance': float(o.get('distance', 215.0)),
                        'time': t, 'name': o.get('name', 'obs')})
        return obs
    observers = []
    for name, d in zip(config.get('observer_names', []),
                       config.get('observer_dir', [])):
        for f in sorted(glob.glob(os.path.join(d, '*.fits'))):
            _, header = read_fits(f)
            o = parse_observer(header)
            observers.append({'lat': np.rad2deg(o.carrington_lat),
                              'lon': np.rad2deg(o.carrington_lon),
                              'distance': o.dsun_rs, 'time': o.time,
                              'name': name})
    return observers


def frame_to_jpeg(path: str, image: np.ndarray, wavelength=None):
    """Asinh-normalized JPEG (reference frame_to_jpeg, image_render.py:38-91,
    which uses matplotlib log-norm; asinh handles zero-valued backgrounds).
    With a wavelength, the frame is rendered through the per-channel AIA
    instrument color table (reference image_render.py:73
    `plt.get_cmap(f'sdoaia{wavelength}')`; native tables in
    utils/colormaps.py)."""
    try:
        from PIL import Image
    except ImportError:
        return
    from sunerf_tpu.utils.colormaps import apply_color_table
    img = np.asarray(image, np.float64)
    img = np.arcsinh(img / (0.005 * (img.max() or 1.0)))
    img = img / (img.max() or 1.0)
    if wavelength is not None:
        Image.fromarray(apply_color_table(img, wavelength)).save(path)
        return
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def render_observers(config: dict):
    renderer, params = build_model_renderer(config)
    resolution = config.get('resolution', 256)
    wavelengths = config.get('wavelengths', list(AIA_WAVELENGTHS))
    render_path = config['render_path']
    formats = config.get('render_format', ['jpeg'])
    overwrite = config.get('overwrite', True)

    ref_times = [o['time'] for o in observers_from_config(config)
                 if isinstance(o['time'], datetime)]
    loader = ModelLoader(renderer, params,
                         ref_time=min(ref_times) if ref_times else None,
                         seconds_per_dt=config.get('seconds_per_dt', 86400.0),
                         batch_size=config.get('batch_size', 4096))

    outputs = []
    for i, obs in enumerate(observers_from_config(config)):
        view = loader.render_observer_image(
            lat=np.deg2rad(obs['lat']), lon=np.deg2rad(obs['lon']),
            time=obs['time'], distance=obs['distance'],
            resolution=resolution, wavelengths=wavelengths)
        # float times map onto a synthetic epoch so FITS headers carry a real
        # DATE-OBS that round-trips through the training loaders
        if isinstance(obs['time'], datetime):
            header_time = obs['time']
            tstr = obs['time'].strftime('%Y-%m-%dT%H:%M:%S')
        else:
            from datetime import timedelta
            header_time = datetime(2000, 1, 1) + timedelta(
                seconds=float(obs['time'])
                * config.get('seconds_per_dt', 86400.0))
            tstr = header_time.strftime('%Y-%m-%dT%H:%M:%S')
        for c, wl in enumerate(wavelengths):
            out_dir = os.path.join(render_path, obs['name'], str(int(wl)))
            os.makedirs(out_dir, exist_ok=True)
            # observer index in the name: several views can share name + time
            # (e.g. a static multi-view constellation) — without it they would
            # silently overwrite each other
            base = os.path.join(out_dir,
                                f"{obs['name']}_{i:03d}.{tstr}.{int(wl)}")
            if 'fits' in formats:
                header = observer_header(
                    obs['lat'], obs['lon'], obs['distance'],
                    header_time, resolution, float(wl))
                if overwrite or not os.path.exists(base + '.fits'):
                    write_fits(base + '.fits', view.image[:, :, c], header)
            if 'jpeg' in formats:
                frame_to_jpeg(base + '.jpg', view.image[:, :, c],
                              wavelength=wl)
            outputs.append(base)
    return outputs


def main(argv=None):
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', type=str, required=True)
    args = parser.parse_args(argv)
    with open(args.config) as f:
        config = yaml.safe_load(f)
    outputs = render_observers(config)
    print(f'rendered {len(outputs)} frames -> {config["render_path"]}')


if __name__ == '__main__':
    main()
