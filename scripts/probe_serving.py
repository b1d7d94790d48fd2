#!/usr/bin/env python
"""Artifact-vs-live render throughput probe (ROADMAP round-4 item 5).

Times a full-disk render through (a) the live SuNeRFLoader stack and
(b) the exported StableHLO serving artifact, on the current backend.
Uses the tunnel-safe timing discipline (CLAUDE.md): every run ends in a
scalar host fetch, and two run lengths are differenced to cancel
dispatch/fetch overhead.

Usage: python scripts/probe_serving.py --state <bundle> [--resolution 512]
       [--batch-size 8192] [--platform cpu] [--out FILE]
The artifact is exported to a temp file from the same bundle, so the two
paths render the identical program modulo the export round trip.
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_renders(render_once, n=3):
    """Mean wall-clock per render after a compile-warming run. Each render
    ends in a scalar host fetch (the tunnel-safe sync, CLAUDE.md), so
    per-render wall time is an honest end-to-end serve latency."""
    render_once()                                   # warm the compile
    t0 = time.perf_counter()
    for _ in range(n):
        render_once()
    return (time.perf_counter() - t0) / n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--state', required=True)
    parser.add_argument('--resolution', type=int, default=512)
    parser.add_argument('--batch-size', type=int, default=8192)
    parser.add_argument('--platform', default=None)
    parser.add_argument('--tier', default=None, metavar='FRAC,SAMPLES')
    parser.add_argument('--no-fused', action='store_true',
                        help='export the artifact WITHOUT the fused-kernel '
                             'tpu module (the round-3/early-round-4 '
                             'XLA-path-only behavior, for A/B)')
    parser.add_argument('--out', default=None)
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

    from sunerf_tpu.evaluation.loader import SuNeRFLoader
    from sunerf_tpu.evaluation.serving import ServingModel, export_serving

    tier = None
    if args.tier:
        f, s = args.tier.split(',')
        tier = (float(f), int(s))

    loader = SuNeRFLoader(args.state, batch_size=args.batch_size, tier=tier)
    wl = list(loader.wavelengths) if loader.wavelengths else None

    with tempfile.TemporaryDirectory() as td:
        shlo = os.path.join(td, 'model.shlo')
        export_serving(args.state, shlo, batch_size=args.batch_size,
                       tier=tier, fused_tpu=not args.no_fused)
        model = ServingModel(shlo)

        def live():
            v = loader.render_observer_image(
                lat=0.3, lon=1.0, time=0.0, distance=215.0,
                resolution=args.resolution, wavelengths=wl)
            return float(np.asarray(v.image).sum())     # host fetch

        def served():
            v = model.render_observer_image(
                lat=0.3, lon=1.0, time=0.0, distance=215.0,
                resolution=args.resolution, wavelengths=wl)
            return float(np.asarray(v.image).sum())

        t_live = timed_renders(live)
        t_served = timed_renders(served)

    n_rays = args.resolution ** 2
    result = {
        'resolution': args.resolution, 'batch_size': args.batch_size,
        'tier': list(tier) if tier else None,
        'fused_active': bool(getattr(model, 'fused_active', False)),
        'live_s': round(t_live, 3), 'served_s': round(t_served, 3),
        'live_rays_per_sec': round(n_rays / t_live, 1),
        'served_rays_per_sec': round(n_rays / t_served, 1),
        'served_over_live': round(t_served / t_live, 3),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, 'w') as fh:
            fh.write(json.dumps(result) + '\n')


if __name__ == '__main__':
    main()
