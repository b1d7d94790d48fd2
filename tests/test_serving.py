"""Serving-export artifacts (evaluation/serving.py): a trained bundle
exports to a hermetic StableHLO artifact that renders identically to the
live Python stack. No reference counterpart (the reference serves by
unpickling the Lightning checkpoint, evaluation/loader.py:16-70)."""
import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sunerf_tpu.evaluation.serving import (ServingModel, export_serving,
                                           main as serving_main)
from sunerf_tpu.systems import emission_config, make_emission_system
from sunerf_tpu.utils.checkpoint import save_state


@pytest.fixture(scope='module')
def bundle(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('serving')
    config = emission_config(n_layers=2, d_filter=32, n_freqs=4)
    renderer, init = make_emission_system(model_config=config,
                                          n_stratified=8, n_hierarchical=8,
                                          use_fused=False)
    params = init(jax.random.key(0))
    path = str(tmp / 'save_state')
    save_state(path, params, {'renderer_spec': renderer.spec,
                              'type': 'emission',
                              'ref_time': '2021-01-01T00:00:00',
                              'seconds_per_dt': 86400.0})
    return path, renderer, params


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    ro = np.tile(np.array([[0., 0., 5.]], np.float32), (n, 1))
    rd = np.float32(rng.normal(size=(n, 3)) * 0.05 + [0., 0., -1.])
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    t = np.zeros((n, 1), np.float32)
    return ro, rd, t


def test_export_roundtrip_matches_live(bundle, tmp_path):
    path, renderer, params = bundle
    out = str(tmp_path / 'model.shlo')
    meta = export_serving(path, out, batch_size=64, platforms=('cpu',))
    assert meta['platforms'] == ['cpu']
    assert meta['n_channels'] == 0

    model = ServingModel(out)
    ro, rd, t = _rays(64)
    served = model(ro, rd, t)
    live = renderer(params, jnp.asarray(ro), jnp.asarray(rd),
                    jnp.asarray(t), key=None)
    # serialized-module execution reassociates float ops vs direct jit
    np.testing.assert_allclose(served['image'],
                               np.asarray(live['image']),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(served['height_map'],
                               np.asarray(live['height_map']),
                               rtol=1e-4, atol=1e-6)


def test_artifact_is_self_describing(bundle, tmp_path):
    path, _, _ = bundle
    out = str(tmp_path / 'model.shlo')
    export_serving(path, out, batch_size=32, platforms=('cpu',))
    with zipfile.ZipFile(out) as zf:
        meta = json.loads(zf.read('meta.json'))
    assert meta['batch_size'] == 32
    assert meta['format_version'] == 1          # single-device stays v1
    assert meta['renderer_spec']['model_config']['n_layers'] == 2
    assert meta['jax_version'] == jax.__version__


def test_padding_and_chunking(bundle, tmp_path):
    """N not a multiple of the artifact batch: padded, chunked, unpadded."""
    path, renderer, params = bundle
    out = str(tmp_path / 'model.shlo')
    export_serving(path, out, batch_size=32, platforms=('cpu',))
    model = ServingModel(out)
    ro, rd, t = _rays(71)
    served = model(ro, rd, t)
    assert served['image'].shape == (71, 1)
    live = renderer(params, jnp.asarray(ro), jnp.asarray(rd),
                    jnp.asarray(t), key=None)
    np.testing.assert_allclose(served['image'],
                               np.asarray(live['image']),
                               rtol=1e-4, atol=1e-6)


def test_full_disk_render_and_datetime(bundle, tmp_path):
    from datetime import datetime
    path, _, _ = bundle
    out = str(tmp_path / 'model.shlo')
    export_serving(path, out, batch_size=64, platforms=('cpu',))
    model = ServingModel(out)
    assert model.normalize_time(datetime(2021, 1, 3)) == pytest.approx(2.0)
    view = model.render_observer_image(lat=0.3, lon=1.0,
                                       time=datetime(2021, 1, 2),
                                       distance=215.0, resolution=8)
    assert view.image.shape == (8, 8, 1)
    assert np.all(np.isfinite(view.image))


def test_video_cli_accepts_artifact(bundle, tmp_path):
    """The video CLI renders flyby frames straight from a .shlo artifact."""
    from sunerf_tpu.evaluation.video import render_video_frames
    path, _, _ = bundle
    out = str(tmp_path / 'model.shlo')
    export_serving(path, out, batch_size=64, platforms=('cpu',))
    frames = render_video_frames(out, str(tmp_path / 'frames'), n_frames=2,
                                 resolution=8)
    assert len(frames) == 2
    import os
    assert all(os.path.exists(f) for f in frames)
    with pytest.raises(ValueError, match='baked'):
        render_video_frames(out, str(tmp_path / 'frames2'), n_frames=1,
                            resolution=8, tier=(0.5, 8))


def test_render_overrides_change_budget(bundle, tmp_path):
    """A model trained at a reduced budget can export at the full one —
    the override flows into the artifact's traced program."""
    path, _, _ = bundle
    out = str(tmp_path / 'model.shlo')
    meta = export_serving(path, out, batch_size=32, platforms=('cpu',),
                          render_overrides={'n_stratified': 16,
                                            'n_hierarchical': 32})
    assert meta['renderer_spec']['render']['n_stratified'] == 16
    model = ServingModel(out)
    ro, rd, t = _rays(32)
    assert np.all(np.isfinite(model(ro, rd, t)['image']))


def test_future_format_version_rejected(bundle, tmp_path):
    path, _, _ = bundle
    out = str(tmp_path / 'model.shlo')
    export_serving(path, out, batch_size=32, platforms=('cpu',))
    bad = str(tmp_path / 'bad.shlo')
    with zipfile.ZipFile(out) as zin, \
            zipfile.ZipFile(bad, 'w') as zout:
        meta = json.loads(zin.read('meta.json'))
        meta['format_version'] = 999
        zout.writestr('meta.json', json.dumps(meta))
        zout.writestr('render.stablehlo', zin.read('render.stablehlo'))
    with pytest.raises(ValueError, match='newer'):
        ServingModel(bad)


def test_cli(bundle, tmp_path, capsys):
    path, _, _ = bundle
    out = str(tmp_path / 'cli.shlo')
    serving_main([path, out, '--batch-size', '32', '--platforms', 'cpu'])
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line['out'] == out and line['batch_size'] == 32
    assert ServingModel(out).batch_size == 32


def test_sharded_export_matches_single(bundle, tmp_path):
    """n_devices=8 artifact (AbstractMesh export): rays shard over the
    data mesh, output matches the single-device artifact."""
    path, renderer, params = bundle
    single = str(tmp_path / 'single.shlo')
    sharded = str(tmp_path / 'sharded.shlo')
    export_serving(path, single, batch_size=64, platforms=('cpu',))
    meta = export_serving(path, sharded, batch_size=64, platforms=('cpu',),
                          n_devices=8)
    assert meta['n_devices'] == 8
    # sharded artifacts are v2 so v1-only readers reject them cleanly
    assert meta['format_version'] == 2

    m1, m8 = ServingModel(single), ServingModel(sharded)
    assert m8._sharding is not None
    ro, rd, t = _rays(100)                     # forces padding too
    out1, out8 = m1(ro, rd, t), m8(ro, rd, t)
    np.testing.assert_allclose(out8['image'], out1['image'],
                               rtol=1e-4, atol=1e-6)


def test_points_entry_matches_live(bundle, tmp_path):
    """The artifact's second entry point (direct field query) matches the
    live forward_points — the volume-products contract."""
    path, renderer, params = bundle
    out = str(tmp_path / 'model.shlo')
    export_serving(path, out, batch_size=32, platforms=('cpu',))
    model = ServingModel(out)
    rng = np.random.default_rng(3)
    q = np.float32(rng.uniform(-1.2, 1.2, size=(50, 4)))  # padding too
    served = model.query_points(q)
    live = np.asarray(renderer.forward_points(params, jnp.asarray(q)).raw)
    assert served.shape == live.shape
    np.testing.assert_allclose(served, live, rtol=1e-4, atol=1e-6)


def test_tiered_export(bundle, tmp_path):
    """tier=(f, n) bakes the adaptive-budget inference path into the
    artifact; output differs from full-budget (the dim tier renders at n
    samples) but stays finite and close on bright rays."""
    path, _, _ = bundle
    full = str(tmp_path / 'full.shlo')
    tiered = str(tmp_path / 'tiered.shlo')
    export_serving(path, full, batch_size=64, platforms=('cpu',))
    meta = export_serving(path, tiered, batch_size=64, platforms=('cpu',),
                          tier=(0.5, 4))
    assert meta['tier'] == [0.5, 4]
    mf, mt = ServingModel(full), ServingModel(tiered)
    ro, rd, t = _rays(64)
    of, ot = mf(ro, rd, t), mt(ro, rd, t)
    assert np.all(np.isfinite(ot['image']))
    assert not np.allclose(of['image'], ot['image'])  # tier engaged
    with pytest.raises(ValueError, match='fraction'):
        export_serving(path, str(tmp_path / 'z.shlo'), batch_size=64,
                       platforms=('cpu',), tier=(0.0, 16))


def test_sharded_export_batch_divisibility(bundle, tmp_path):
    path, _, _ = bundle
    with pytest.raises(ValueError, match='divisible'):
        export_serving(path, str(tmp_path / 'x.shlo'), batch_size=30,
                       platforms=('cpu',), n_devices=8)


def test_grid_bundle_exports(tmp_path):
    """Feature-grid (incl. temporal VM) bundles export and match live —
    the grid path is pure one-hot contractions, so it must lower portably."""
    config = emission_config(n_layers=2, d_filter=32, n_freqs=4,
                             grid_sizes=(8,), grid_rank=4, grid_time=4,
                             grid_time_range=(0.0, 1.0), grid_bound=1.3)
    renderer, init = make_emission_system(model_config=config,
                                          n_stratified=8, n_hierarchical=8,
                                          use_fused=False)
    params = init(jax.random.key(2))
    path = str(tmp_path / 'save_state')
    save_state(path, params, {'renderer_spec': renderer.spec,
                              'type': 'emission'})
    out = str(tmp_path / 'grid.shlo')
    export_serving(path, out, batch_size=32, platforms=('cpu',))
    model = ServingModel(out)
    ro, rd, _ = _rays(32)
    t = np.linspace(0, 1, 32, dtype=np.float32)[:, None]
    served = model(ro, rd, t)
    live = renderer(params, jnp.asarray(ro), jnp.asarray(rd),
                    jnp.asarray(t), key=None)
    np.testing.assert_allclose(served['image'], np.asarray(live['image']),
                               rtol=1e-4, atol=1e-6)


def test_fused_tpu_blob_embedded(bundle, tmp_path):
    """fused_tpu=True (default) with a tpu platform adds a SECOND render
    module carrying the fused Pallas kernel (tpu_custom_call); the portable
    module stays kernel-free, and on a CPU runtime the portable module is
    the one executed (fused_active False) with unchanged numerics."""
    from jax import export as jax_export
    path, renderer, params = bundle
    out = str(tmp_path / 'fused.shlo')
    meta = export_serving(path, out, batch_size=64, platforms=('cpu', 'tpu'))
    assert meta['fused_tpu'] is True
    with zipfile.ZipFile(out) as zf:
        assert 'render.tpu_fused.stablehlo' in zf.namelist()
        assert 'points.tpu_fused.stablehlo' in zf.namelist()
        portable = jax_export.deserialize(
            zf.read('render.stablehlo')).mlir_module()
        fused = jax_export.deserialize(
            zf.read('render.tpu_fused.stablehlo')).mlir_module()
        fused_pts = jax_export.deserialize(
            zf.read('points.tpu_fused.stablehlo')).mlir_module()
    assert 'tpu_custom_call' not in portable
    assert 'tpu_custom_call' in fused
    assert 'tpu_custom_call' in fused_pts
    model = ServingModel(out)
    assert model.fused_active is False        # cpu runtime
    ro, rd, t = _rays(64)
    served = model(ro, rd, t)
    live = renderer(params, jnp.asarray(ro), jnp.asarray(rd),
                    jnp.asarray(t), key=None)
    np.testing.assert_allclose(served['image'], np.asarray(live['image']),
                               rtol=1e-4, atol=1e-6)


def test_fused_tpu_disabled_or_cpu_only(bundle, tmp_path):
    """fused_tpu=False — and exports without a tpu platform — embed no
    fused module, and old artifacts (no fused blob) keep loading."""
    path, _, _ = bundle
    a = str(tmp_path / 'nofused.shlo')
    meta = export_serving(path, a, batch_size=32, platforms=('cpu', 'tpu'),
                          fused_tpu=False)
    assert meta['fused_tpu'] is False
    b = str(tmp_path / 'cpuonly.shlo')
    meta = export_serving(path, b, batch_size=32, platforms=('cpu',))
    assert meta['fused_tpu'] is False
    for art in (a, b):
        with zipfile.ZipFile(art) as zf:
            assert 'render.tpu_fused.stablehlo' not in zf.namelist()
        assert ServingModel(art).fused_active is False


def test_fused_tpu_skipped_for_vm_grid_configs(tmp_path):
    """grid_rank (VM/temporal tables) configs get no fused module — the
    kernel supports dense tables only (systems._select_apply)."""
    config = emission_config(n_layers=2, d_filter=32, n_freqs=4,
                             grid_sizes=(8,), grid_rank=4, grid_time=4,
                             grid_time_range=(0.0, 1.0), grid_bound=1.3)
    renderer, init = make_emission_system(model_config=config,
                                          n_stratified=8, n_hierarchical=8,
                                          use_fused=False)
    params = init(jax.random.key(2))
    path = str(tmp_path / 'save_state')
    save_state(path, params, {'renderer_spec': renderer.spec,
                              'type': 'emission'})
    out = str(tmp_path / 'vm.shlo')
    meta = export_serving(path, out, batch_size=32, platforms=('cpu', 'tpu'))
    assert meta['fused_tpu'] is False
    with zipfile.ZipFile(out) as zf:
        assert 'render.tpu_fused.stablehlo' not in zf.namelist()


def test_fused_tpu_skipped_for_sharded_exports(bundle, tmp_path):
    """n_devices>1 exports keep the XLA path only — a pallas_call under
    jit's automatic partitioning (no shard_map) is not partitionable."""
    path, _, _ = bundle
    out = str(tmp_path / 'sharded.shlo')
    meta = export_serving(path, out, batch_size=64,
                          platforms=('cpu', 'tpu'), n_devices=8)
    assert meta['fused_tpu'] is False
    with zipfile.ZipFile(out) as zf:
        assert 'render.tpu_fused.stablehlo' not in zf.namelist()


def test_metrics_harness_accepts_artifact(tmp_path):
    """The metrics harness scores a .shlo artifact against ground-truth
    FITS — near-perfect metrics when the artifact re-renders its own GT."""
    import glob
    from sunerf_tpu.evaluation.image_render import render_observers
    from sunerf_tpu.evaluation.metrics_harness import evaluate_viewpoints
    config = {
        'model': 'SimpleStar', 'render_path': str(tmp_path / 'gt'),
        'render_format': ['fits'], 'resolution': 16, 'wavelengths': [193],
        'batch_size': 256, 'pixel_intensity_factor': 1e9,
        'observers': [
            {'name': 'v', 'lat': 0.0, 'lon': 0.0, 'distance': 215.0,
             'time': '2012-01-01T00:00:00'},
            {'name': 'v', 'lat': 20.0, 'lon': 90.0, 'distance': 215.0,
             'time': '2012-01-01T06:00:00'},
        ]}
    render_observers(config)

    from sunerf_tpu.evaluation.image_render import build_model_renderer
    renderer, params = build_model_renderer(config)   # perturb off, abs zeroed
    path = str(tmp_path / 'save_state')
    save_state(path, params, {'renderer_spec': renderer.spec,
                              'ref_time': '2012-01-01T00:00:00',
                              'wavelengths': [193]})
    out = str(tmp_path / 'star.shlo')
    export_serving(path, out, batch_size=256, platforms=('cpu',))

    files = sorted(glob.glob(str(tmp_path / 'gt' / 'v' / '193' / '*.fits')))
    assert len(files) == 2
    result = evaluate_viewpoints(ServingModel(out), files, lat_split_deg=7.0)
    assert result['train']['psnr'] > 40
    assert result['test']['psnr'] > 40


def test_products_cli_accepts_artifact(bundle, tmp_path):
    """Volume extraction runs from a .shlo (load_coords alias); the
    products needing live internals reject it with a clear error."""
    from sunerf_tpu.evaluation.products import main as products_main
    path, _, _ = bundle
    out = str(tmp_path / 'model.shlo')
    export_serving(path, out, batch_size=64, platforms=('cpu',))
    vol = str(tmp_path / 'volume.npz')
    products_main(['volume', '--state', out, '--output', vol,
                   '--resolution', '8'])
    with np.load(vol) as f:
        assert f[f.files[0]].shape[0] == 8
    with pytest.raises(SystemExit):
        products_main(['synchronic', '--state', out,
                       '--output', str(tmp_path / 'x.npz')])


def test_multichannel_wavelength_default(tmp_path):
    """Multi-channel (DT) heads: the artifact fills its trained wavelengths
    when the caller passes none."""
    from sunerf_tpu.models.fields import density_temperature_config
    from sunerf_tpu.systems import make_density_temperature_system
    config = density_temperature_config(n_layers=2, d_filter=32, n_freqs=4)
    renderer, init = make_density_temperature_system(
        model_config=config, n_stratified=8, n_hierarchical=8,
        use_fused=False)
    params = init(jax.random.key(1))
    path = str(tmp_path / 'save_state')
    save_state(path, params, {'renderer_spec': renderer.spec,
                              'type': 'density_temperature',
                              'wavelengths': [171.0, 193.0]})
    out = str(tmp_path / 'model.shlo')
    meta = export_serving(path, out, batch_size=32, platforms=('cpu',))
    assert meta['n_channels'] == 2
    model = ServingModel(out)
    ro, rd, t = _rays(32)
    served = model(ro, rd, t)                      # default wavelengths
    assert served['image'].shape == (32, 2)
    served2 = model(ro, rd, t, wavelengths=[171.0, 193.0])
    np.testing.assert_allclose(served['image'], served2['image'])
