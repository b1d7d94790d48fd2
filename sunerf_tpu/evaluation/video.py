"""Flyby video frames from a trained SuNeRF: ecliptic orbit + polar pass +
zoom, saved as JPEG frames (reference evaluation/video.py:13-63; ffmpeg
assembly of the frames stays manual, as upstream).

Usage: python -m sunerf_tpu.evaluation.video --state <workdir>/save_state \
           --output frames/ [--n-frames 60] [--resolution 256]
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from sunerf_tpu.evaluation.image_render import frame_to_jpeg
from sunerf_tpu.evaluation.loader import SuNeRFLoader


def flyby_poses(n_frames: int = 60, distance: float = 215.0):
    """(lat, lon, distance) path: ecliptic orbit -> polar arc -> zoom
    (reference video.py:35-54)."""
    third = n_frames // 3
    poses = []
    for lon in np.linspace(0, 2 * np.pi, third, endpoint=False):
        poses.append((0.0, lon, distance))
    for lat in np.linspace(0, np.pi / 3, third):
        poses.append((lat, 0.0, distance))
    for d in np.linspace(distance, distance / 2, n_frames - 2 * third):
        poses.append((np.pi / 3, 0.0, d))
    return poses


def render_video_frames(state_path: str, output_dir: str, n_frames: int = 60,
                        resolution: int = 256, time: float = 0.0,
                        batch_size: int = 4096, wavelengths=None,
                        distance: float = 215.0, tier=None):
    """tier: optional (fraction, samples) — adaptive per-ray budgets for the
    frame renders (loader.py); dim/background pixels render at the reduced
    budget, roughly halving flyby render time."""
    if state_path.endswith('.shlo'):
        # serving artifact: the render program (incl. any tier) is baked in
        if tier is not None:
            raise ValueError('--tier is baked into .shlo artifacts at '
                             'export time (evaluation.serving --tier)')
        from sunerf_tpu.evaluation.serving import ServingModel
        loader = ServingModel(state_path)
    else:
        loader = SuNeRFLoader(state_path, batch_size=batch_size, tier=tier)
    if wavelengths is None:
        wl_cfg = loader.wavelengths
        wavelengths = list(wl_cfg) if wl_cfg else None
    os.makedirs(output_dir, exist_ok=True)
    # pin the FOV at the orbit distance: the default per-distance FOV keeps
    # the disk at constant apparent size, which would cancel the zoom leg
    # (the reference's FOV is fixed by the observation WCS, video.py:35-54)
    from sunerf_tpu.core.geometry import fov_for_distance
    fov = fov_for_distance(distance)
    paths = []
    for i, (lat, lon, dist) in enumerate(flyby_poses(n_frames, distance)):
        view = loader.render_observer_image(
            lat=lat, lon=lon, time=time, distance=dist,
            resolution=resolution, wavelengths=wavelengths, fov=fov)
        path = os.path.join(output_dir, f'frame_{i:04d}.jpg')
        frame_to_jpeg(path, view.image[:, :, 0])
        paths.append(path)
    return paths


def main(argv=None):
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    parser = argparse.ArgumentParser()
    parser.add_argument('--state', required=True)
    parser.add_argument('--output', required=True)
    parser.add_argument('--n-frames', type=int, default=60)
    parser.add_argument('--resolution', type=int, default=256)
    parser.add_argument('--time', type=float, default=0.0)
    parser.add_argument('--tier', type=float, nargs=2, default=None,
                        metavar=('FRACTION', 'SAMPLES'),
                        help='adaptive per-ray budget for frame renders, '
                             'e.g. --tier 0.5 16')
    args = parser.parse_args(argv)
    paths = render_video_frames(args.state, args.output, args.n_frames,
                                args.resolution, args.time,
                                tier=tuple(args.tier) if args.tier else None)
    print(f'wrote {len(paths)} frames to {args.output} '
          f'(assemble: ffmpeg -i frame_%04d.jpg video.mp4)')


if __name__ == '__main__':
    main()
