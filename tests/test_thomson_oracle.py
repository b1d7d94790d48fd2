"""Thomson-head quadrature accuracy against the float64 Howard & Tappin
oracle (scripts/thomson_protocol.py — VERDICT r4 #8's quantitative row,
pinned here at miniature scale so CI guards the production sampling stack:
stratified + inverse-CDF discretization, rectangular quadrature, f32
arithmetic vs a 4096-point dense-midpoint f64 integral).

Reference physics: sunerf/rendering/thompson.py:7-109 (orphaned there)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'scripts'))


def test_thomson_matches_f64_oracle():
    import jax.numpy as jnp
    from thomson_protocol import RHO0_LOG10, SCALE_H, oracle_tb_pb

    from sunerf_tpu.core.geometry import observer_rays
    from sunerf_tpu.models.fields import FieldOutput
    from sunerf_tpu.rendering.renderer import Renderer
    from sunerf_tpu.rendering.thomson import ThomsonHead

    def analytic_apply(params, pts):
        r = jnp.linalg.norm(pts[:, :3], axis=-1)
        log_ne = RHO0_LOG10 + ((1.0 / jnp.maximum(r, 0.5) - 1.0)
                               / SCALE_H) / jnp.log(10.0)
        return FieldOutput(raw=jnp.stack([log_ne, jnp.zeros_like(log_ne)],
                                         -1))

    renderer = Renderer(field_apply=analytic_apply, head=ThomsonHead(),
                        n_stratified=64, n_hierarchical=128, perturb=False)
    res = 8
    o, d = observer_rays(lat=0.3, lon=1.1, distance=215.0, resolution=res)
    rays_o = np.asarray(o).reshape(-1, 3)
    rays_d = np.asarray(d).reshape(-1, 3)
    img = np.asarray(renderer(
        {'coarse': {}, 'fine': {}},
        jnp.asarray(rays_o, jnp.float32), jnp.asarray(rays_d, jnp.float32),
        jnp.zeros((res * res, 1), jnp.float32))['image'], np.float64)

    tb_o, pb_o = oracle_tb_pb(rays_o, rays_d, n_quad=4096)

    # physicality: non-negative, polarized <= total, finite renderer output
    assert np.all(tb_o >= 0) and np.all(pb_o >= 0)
    assert np.all(pb_o <= tb_o * (1 + 1e-9))
    assert np.all(np.isfinite(img))

    # production-budget quadrature lands within ~1% of the dense integral
    tb_mae = np.mean(np.abs(img[:, 0] - tb_o)) / np.mean(tb_o)
    pb_mae = np.mean(np.abs(img[:, 1] - pb_o)) / np.mean(pb_o)
    assert tb_mae < 0.02, f'tB off by {tb_mae:.2%} vs f64 oracle'
    assert pb_mae < 0.02, f'pB off by {pb_mae:.2%} vs f64 oracle'
