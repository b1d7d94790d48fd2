#!/usr/bin/env python
"""Quantitative Thomson-scattering row (VERDICT r4 #8): accuracy + throughput.

The white-light head (rendering/thomson.py — Howard & Tappin 2009 eqs
23/24/29, reference sunerf/rendering/thompson.py:7-109, orphaned there) is
closed-loop TESTED but had no quantitative number. This protocol produces
two:

1. **Accuracy**: render a synthetic coronagraph view of an analytic
   hydrostatic electron-density corona through the renderer's production
   sampling stack (64 stratified + 128 hierarchical), and score tB/pB
   against a float64 dense-midpoint quadrature of the same Howard & Tappin
   integrand (16384 points/ray) over the identical integration interval
   (the stratified sampler's [|o|-1.3, solar-surface-clipped] bounds).
   The oracle shares the physics formulas by construction (they ARE the
   analytic forms); what it independently checks is the production
   discretization: stratified+inverse-CDF sampling, the rectangular
   quadrature, f32 on-device arithmetic.

2. **Throughput**: training-step rays/s/chip at the reference workload
   shape (8x512 coarse+fine field, batch 1024, Adam) through
   make_thomson_system — the same differenced-timing protocol as bench.py.

Writes THOMSON_r5.json. Run on the real TPU chip (single-tenant: nothing
else may hold it).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RHO0_LOG10 = 8.0   # n_e(1 Rs) = 1e8 cm^-3
SCALE_H = 0.2      # hydrostatic scale height (Rs)
U_LIMB = 0.63      # limb-darkening constant (Howard & Tappin 2009)


def log10_ne(r):
    """Analytic hydrostatic corona: n_e = 1e8 * exp((1/r - 1)/h)."""
    return RHO0_LOG10 + ((1.0 / np.maximum(r, 0.5) - 1.0) / SCALE_H) \
        / np.log(10.0)


def oracle_tb_pb(rays_o, rays_d, n_quad=16384, solar_radius=1.0,
                 shell=1.3):
    """Float64 dense-midpoint quadrature of the Howard & Tappin integrand.

    Integration interval mirrors the production stratified sampler
    (core/sampling.py stratified_sample): near = |o| - shell; far = the
    solar-surface intersection where the ray hits the Sun, else |o| + shell.
    """
    o = np.asarray(rays_o, np.float64)
    d = np.asarray(rays_d, np.float64)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)

    obs_dist = np.linalg.norm(o, axis=-1)
    b = 2.0 * np.sum(o * d, axis=-1)
    c = np.sum(o * o, axis=-1) - solar_radius ** 2
    disc = b * b - 4.0 * c
    hit = disc >= 0.0
    t_inner = (-b - np.sqrt(np.maximum(disc, 0.0))) / 2.0
    near = obs_dist - shell
    far = np.where(hit, t_inner, obs_dist + shell)

    # midpoint rule, [R, n_quad]
    tq = (np.arange(n_quad, dtype=np.float64) + 0.5) / n_quad
    z = near[:, None] + (far - near)[:, None] * tq[None, :]
    dz = ((far - near) / n_quad)[:, None]
    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    r = np.linalg.norm(pts, axis=-1)
    ne = 10.0 ** log10_ne(r)

    sinw = np.clip(solar_radius / np.maximum(r, 1e-6), 0.0, 1.0 - 1e-6)
    cosw = np.sqrt(1.0 - sinw ** 2)
    ln = np.log((1.0 + sinw) / cosw)
    cos2_sin = cosw ** 2 / sinw
    A = cosw * sinw ** 2
    B = -(1.0 / 8.0) * (1.0 - 3.0 * sinw ** 2
                        - cos2_sin * (1.0 + 3.0 * sinw ** 2) * ln)
    C = 4.0 / 3.0 - cosw - cosw ** 3 / 3.0
    D = (1.0 / 8.0) * (5.0 + sinw ** 2
                       - cos2_sin * (5.0 - sinw ** 2) * ln)

    # sin^2(chi) = |o x d|^2 / r^2 (impact parameter over point radius)
    cross = np.cross(o, d)
    sin_chi2 = np.sum(cross * cross, axis=-1)[:, None] / r ** 2

    i_pb = sin_chi2 * ((1.0 - U_LIMB) * A + U_LIMB * B)
    i_tb = 2.0 * ((1.0 - U_LIMB) * C + U_LIMB * D) - i_pb
    tb = np.sum(ne * i_tb * dz, axis=-1)
    pb = np.sum(ne * i_pb * dz, axis=-1)
    return tb, pb


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--resolution', type=int, default=64)
    parser.add_argument('--distance', type=float, default=215.0,
                        help='observer distance [Rs] (1 AU)')
    parser.add_argument('--out', default='THOMSON_r5.json')
    parser.add_argument('--platform', default=None)
    parser.add_argument('--skip-throughput', action='store_true',
                        help='accuracy only (offline/CPU smoke)')
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp

    from sunerf_tpu.core.geometry import observer_rays
    from sunerf_tpu.models.fields import FieldOutput
    from sunerf_tpu.rendering.renderer import Renderer
    from sunerf_tpu.rendering.thomson import ThomsonHead

    # ---- accuracy: production sampling stack vs float64 oracle ----
    def analytic_apply(params, pts):
        r = jnp.linalg.norm(pts[:, :3], axis=-1)
        log_ne = RHO0_LOG10 + ((1.0 / jnp.maximum(r, 0.5) - 1.0)
                               / SCALE_H) / jnp.log(10.0)
        return FieldOutput(raw=jnp.stack([log_ne, jnp.zeros_like(log_ne)],
                                         -1))

    renderer = Renderer(field_apply=analytic_apply, head=ThomsonHead(),
                        n_stratified=64, n_hierarchical=128, perturb=False)
    res = args.resolution
    o, d = observer_rays(lat=0.3, lon=1.1, distance=args.distance,
                         resolution=res)
    rays_o = jnp.asarray(np.asarray(o).reshape(-1, 3), jnp.float32)
    rays_d = jnp.asarray(np.asarray(d).reshape(-1, 3), jnp.float32)
    times = jnp.zeros((rays_o.shape[0], 1), jnp.float32)
    img = np.asarray(renderer({'coarse': {}, 'fine': {}}, rays_o, rays_d,
                              times)['image'], np.float64)
    tb_r, pb_r = img[:, 0], img[:, 1]

    tb_o, pb_o = oracle_tb_pb(np.asarray(o).reshape(-1, 3),
                              np.asarray(d).reshape(-1, 3))

    # physicality invariants on the oracle AND the renderer
    assert np.all(tb_o >= 0) and np.all(pb_o >= 0)
    assert np.all(pb_o <= tb_o * (1 + 1e-9)), 'pB must not exceed tB'
    assert np.all(np.isfinite(tb_r)) and np.all(np.isfinite(pb_r))

    def score(pred, ref):
        mae_pct = float(np.mean(np.abs(pred - ref)) / np.mean(ref) * 100.0)
        rng = float(ref.max() - ref.min())
        psnr = float(10.0 * np.log10(rng ** 2
                                     / max(np.mean((pred - ref) ** 2),
                                           1e-300)))
        return {'mae_percent_of_mean': round(mae_pct, 4),
                'psnr_db': round(psnr, 2)}

    out = {
        'scene': {'field': 'hydrostatic n_e=1e8*exp((1/r-1)/0.2)',
                  'observer': {'lat': 0.3, 'lon': 1.1,
                               'distance_rs': args.distance},
                  'resolution': res},
        'sampling': {'n_stratified': 64, 'n_hierarchical': 128},
        'oracle': {'quadrature': 'float64 midpoint', 'n_points': 16384},
        'tB': score(tb_r, tb_o),
        'pB': score(pb_r, pb_o),
        'pb_over_tb_max': round(float(np.max(pb_o / np.maximum(tb_o,
                                                               1e-300))), 4),
    }

    # ---- throughput: training step at the reference workload shape ----
    if not args.skip_throughput:
        from sunerf_tpu.systems import make_thomson_system
        from sunerf_tpu.train.objective import LossConfig
        from sunerf_tpu.train.optim import make_optimizer
        from sunerf_tpu.train.step import create_train_state, make_train_step

        batch_size = 1024
        t_renderer, t_init = make_thomson_system()
        params = t_init(jax.random.key(0))
        optimizer = make_optimizer()
        step = make_train_step(t_renderer,
                               LossConfig(image_scaling='none',
                                          lambda_regularization=0.0),
                               optimizer, donate=False)
        state0 = create_train_state(params, optimizer)
        key = jax.random.key(1)
        bo = jnp.tile(jnp.asarray([[4.0, 0.0, 0.0]], jnp.float32),
                      (batch_size, 1))
        dirs = (jnp.asarray([[-1.0, 0.0, 0.0]])
                + 0.15 * jax.random.normal(key, (batch_size, 3)))
        batch = {'rays': jnp.stack(
                     [bo, (dirs / jnp.linalg.norm(dirs, axis=-1,
                                                  keepdims=True)
                           ).astype(jnp.float32)], 1),
                 'time': jnp.zeros((batch_size, 1), jnp.float32),
                 'target_image': jnp.full((batch_size, 2), 0.05,
                                          jnp.float32)}

        def run(n):
            state = state0
            t0 = time.perf_counter()
            for _ in range(n):
                state, metrics = step(state, batch, key)
            _ = float(metrics['loss'])  # host fetch forces the chain
            return time.perf_counter() - t0

        run(2)  # warmup/compile
        t1, t2 = run(5), run(25)
        per_step = (t2 - t1) / 20
        out['train_rays_per_sec_per_chip'] = round(batch_size / per_step, 1)
        out['platform'] = jax.devices()[0].platform

    print(json.dumps(out, indent=2))
    with open(args.out, 'w') as fh:
        json.dump(out, fh, indent=2)


if __name__ == '__main__':
    main()
