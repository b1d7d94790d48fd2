"""Benchmark: training-step ray throughput on one chip at the reference
workload (SURVEY §6 / BASELINE.md constants).

Workload: emission SuNeRF — 2x (8x512 Sine MLP, posenc 4->84), 64 stratified +
128 hierarchical samples per ray (fine pass integrates 192), full coarse+fine
forward + backward + Adam update. ~0.96 GFLOP/ray forward, ~2.9 GFLOP/ray
with backward.

Timing: the axon TPU tunnel dispatches asynchronously and block_until_ready
returns before remote execution completes, so we difference two run lengths
(N1 vs N2 steps) each terminated by a scalar host fetch — the fetch forces the
chain; the difference cancels fixed dispatch/fetch overhead.

Baseline: the reference publishes no throughput (BASELINE.md). We pin the
comparison constant to an estimated 10,000 rays/s for the PyTorch reference on
one A100 (2.9 GFLOP/ray fwd+bwd at ~30% of 100 TFLOP/s effective — f32 torch
eager with per-step host sync), so vs_baseline = rays_per_sec / 10_000. The
north star is >=10x (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

--mesh: additionally measure the mesh-sharded step over all available chips
and report per-chip scaling efficiency (sharded rays/s/chip over single-chip
rays/s). On a 1-chip host it reports efficiency 1.0 from the same numbers —
the first run on a real slice produces a scaling number with zero new code.

By default six opt-in accelerated configurations are also measured and
reported as extra JSON keys; the headline metric/vs_baseline stay the
reference-parity workload. --no-occupancy skips them. Quality evidence
(RESULTS.md):
  * proposal_fifth_*: proposal coarse + 20+40 budget — the NORTH-STAR
    RECORD config: 177.9k rays/s/chip = 17.8x the estimated baseline on
    the psi_193 protocol at 3-seed test PSNR matched-or-better than
    parity (28.57 +- 1.10 vs 27.67 +- 1.36, SSIM 0.889 vs 0.880, equal
    wall-clock, PSI_MATRIX_r3); 16+32 is past the knee (RESULTS.md);
  * proposal_quarter_*: proposal coarse + 24+48 budget — the
    tightest-variance quality-matched config: 159.5k rays/s/chip = 16.0x
    at 3-seed test PSNR 28.80 +- 0.28, SSIM 0.887 vs 0.880;
  * proposal_half_*: proposal coarse + 32+64 budget — 120.3k rays/s/chip
    = 12.0x on the psi_193 protocol at 3-seed test PSNR matched-or-better
    than parity (28.79 +- 1.12 vs 27.67 +- 1.36, equal wall-clock);
    also PSNR-within-noise on the SimpleStar closed loop.
  * budget_half_*: plain stratified 32+64 samples — 1.9x, PSNR/SSIM
    statistically matched on SimpleStar (scene-dependent on psi_193);
  * occupancy_*: occupancy-guided 32+64 (factorized grid, core/occupancy.py);
  * proposal_*: tiny 4x128 proposal-style coarse field, full 64+128 budget —
    quality-free-or-better on both scenes (psi_193: +1.5 dB at 1.27x);
  * tiered_*: adaptive per-ray budgets at the full hi budget — 9.8x on the
    psi_193 protocol at +0.6 dB / best SSIM (3 seeds);
  * tiered_half_*: tiered + half budget — 18.5x throughput; scene-dependent
    quality (-1.9 dB on psi_193; see RESULTS.md before using).
"""
import json
import time

ESTIMATED_REFERENCE_RAYS_PER_SEC = 10_000.0


def _measure(step, state0, batch, key, n1=5, n2=25):
    """Differenced two-run-length timing: each run ends with a scalar host
    fetch (the axon tunnel's block_until_ready returns before remote
    execution finishes), and the difference cancels dispatch overhead."""
    def run(n_steps):
        state = state0
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, batch, key)
        _ = float(metrics['loss'])  # host fetch forces the whole chain
        return time.perf_counter() - t0

    run(2)  # warmup: compiles step + fetch path
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def _example_batch(batch_size):
    import jax
    import jax.numpy as jnp
    key = jax.random.key(1)
    rays_o = jnp.tile(jnp.asarray([[4.0, 0.0, 0.0]], jnp.float32), (batch_size, 1))
    dirs = jnp.asarray([[-1.0, 0.0, 0.0]]) + 0.15 * jax.random.normal(key, (batch_size, 3))
    rays_d = (dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)).astype(jnp.float32)
    return {
        'rays': jnp.stack([rays_o, rays_d], axis=1),
        'time': jnp.zeros((batch_size, 1), jnp.float32),
        'target_image': jnp.full((batch_size, 1), 0.05, jnp.float32),
    }


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument('--mesh', action='store_true',
                        help='also measure the sharded step over all chips '
                             'and report scaling efficiency')
    parser.add_argument('--no-occupancy', action='store_true',
                        help='skip the occupancy-guided measurements '
                             '(40+80 and 32+64 samples, half-occupied grid); '
                             'included by default as extra JSON keys')
    args = parser.parse_args(argv)

    import jax

    # Mosaic remote compiles through the axon tunnel take minutes cold; the
    # persistent cache makes reruns fast.
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import make_optimizer
    from sunerf_tpu.train.step import create_train_state, make_train_step

    batch_size = 1024  # reference emission default (single_channel.py:17)
    renderer, init = make_emission_system()
    params = init(jax.random.key(0))
    optimizer = make_optimizer()
    step = make_train_step(renderer, LossConfig(), optimizer, donate=False)
    state0 = create_train_state(params, optimizer)
    key = jax.random.key(1)

    per_step = _measure(step, state0, _example_batch(batch_size), key)
    rays_per_sec = batch_size / per_step

    result = {
        'metric': 'train_rays_per_sec_per_chip',
        'value': round(rays_per_sec, 1),
        'unit': 'rays/s',
        'vs_baseline': round(rays_per_sec / ESTIMATED_REFERENCE_RAYS_PER_SEC, 3),
    }

    # full-disk render throughput (the north star names "train + full-disk
    # render", BASELINE.md): forward-only eval pass (key=None — no perturb,
    # no stash) at the reference inference workload, full 64+128 budget.
    import jax.numpy as jnp
    render_batch = 4096  # reference analytic/video inference batch
    rb = _example_batch(render_batch)
    fwd = jax.jit(lambda p, b: renderer(p, b['rays'][:, 0], b['rays'][:, 1],
                                        b['time'])['image'])

    def render_fn(n):
        t0 = time.perf_counter()
        img = None
        for _ in range(n):
            img = fwd(params, rb)
        _ = float(jnp.sum(img))  # host fetch forces the chain
        return time.perf_counter() - t0

    render_fn(2)  # warmup/compile
    t1, t2 = render_fn(5), render_fn(25)
    render_rays = render_batch / ((t2 - t1) / 20)
    result['render_rays_per_sec'] = round(render_rays, 1)

    if not args.no_occupancy:
        from sunerf_tpu.models.fields import emission_config
        proposal = emission_config(n_layers=4, d_filter=128)
        variants = (('budget_half', dict(n_stratified=32, n_hierarchical=64)),
                    ('occupancy', dict(n_stratified=32, n_hierarchical=64,
                                       occupancy={'enabled': True})),
                    ('proposal', dict(coarse_config=proposal)),
                    ('proposal_half', dict(n_stratified=32, n_hierarchical=64,
                                           coarse_config=proposal)),
                    ('proposal_quarter', dict(n_stratified=24,
                                              n_hierarchical=48,
                                              coarse_config=proposal)),
                    ('proposal_fifth', dict(n_stratified=20,
                                            n_hierarchical=40,
                                            coarse_config=proposal)),
                    # architecture axis: a 6x384 fine field (0.42x the
                    # FLOPs) — the quarter-budget step is fine-MLP-bound
                    # (scripts/probe_overhead.py), so this scales nearly
                    # with FLOPs; quality evidence in RESULTS.md arch rows
                    ('arch_6x384', dict(
                        model_config=emission_config(n_layers=6,
                                                     d_filter=384),
                        n_stratified=24, n_hierarchical=48,
                        coarse_config=proposal)),
                    # learned feature-grid encoding (ops/grid_encoding.py):
                    # a grid-fed 4x128 fine field at the quarter budget —
                    # the fastest TRAINING config measured (216.4k rays/s
                    # on the psi protocol) but NOT quality-matched there:
                    # the TPU arbitration row (PSI_GRID_r3, 12.5k steps)
                    # shows the CPU 16-only win does not survive the real
                    # schedule (test -2 dB vs prop_24_48; RESULTS.md).
                    # Kept as the capacity/dense-supervision config.
                    ('grid_quarter', dict(
                        model_config=emission_config(
                            n_layers=4, d_filter=128, grid_sizes=(16,),
                            grid_features=8, grid_bound=1.3),
                        n_stratified=24, n_hierarchical=48,
                        coarse_config=proposal)),
                    # adaptive per-ray budgets (renderer.py _tiered_fine):
                    # the dim half of each batch renders at tier_samples
                    ('tiered', dict(coarse_config=proposal,
                                    tier_fraction=0.5, tier_samples=32)),
                    ('tiered_half', dict(n_stratified=32, n_hierarchical=64,
                                         coarse_config=proposal,
                                         tier_fraction=0.5, tier_samples=16)))
        for prefix, extra in variants:
            v_renderer, v_init = make_emission_system(**extra)
            v_params = v_init(jax.random.key(0))
            if 'occupancy' in v_params:
                # half-occupied grid: the steady state on solar scenes
                # (emission shell r in [1.0, 1.15] + ~half the angular cells)
                v_params['occupancy']['occ_r'] = (
                    v_params['occupancy']['occ_r'].at[32:].set(0.0))
                v_params['occupancy']['occ_ang'] = (
                    v_params['occupancy']['occ_ang'].at[:, ::2].set(0.0))
            v_step = make_train_step(v_renderer, LossConfig(), optimizer,
                                     donate=False)
            v_state = create_train_state(v_params, optimizer)
            v_per_step = _measure(v_step, v_state,
                                  _example_batch(batch_size), key)
            result.update({
                f'{prefix}_rays_per_sec': round(batch_size / v_per_step, 1),
                f'{prefix}_speedup': round(per_step / v_per_step, 3)})

        # North-star answer IN the driver-captured line (VERDICT r3 #4):
        # the quality-matched record config, measured fresh this run, with
        # its 3-seed quality evidence named so no human has to
        # cross-reference RESULTS.md to read the multiplier. Round 4
        # promoted 24+48 (proposal_quarter) to the headline: the faster
        # 20+40 (proposal_fifth, 17.8x) is seed-fragile at the 200k-step
        # production schedule (SCALE_PROOF_r4 seed split +2.93/-5.67 dB),
        # while 24+48 is the 3-seed tightest-variance matched point AND
        # recovers the adversarial seed to within 0.95 dB of parity at
        # 3.30x on the long schedule — it is what psi_193_fast.yaml ships.
        if 'proposal_quarter_rays_per_sec' in result:
            qm = result['proposal_quarter_rays_per_sec']
            result.update(
                quality_matched_config='proposal_quarter '
                                       '(4x128 proposal coarse + 24+48; '
                                       'psi_193_fast.yaml)',
                quality_matched_rays_per_sec=qm,
                quality_matched_x=round(
                    qm / ESTIMATED_REFERENCE_RAYS_PER_SEC, 3),
                quality_matched_evidence='3-seed equal-wall-clock psi_193 '
                    'protocol: test PSNR 28.80+-0.28 vs parity 27.67+-1.36, '
                    'SSIM 0.887 vs 0.880 (PSI_MATRIX_r3.jsonl; RESULTS.md); '
                    '512px PRODUCTION-RESOLUTION closure (round 5, '
                    'SCALE_PROOF_r4.jsonl equal-steps pairs, 2 seeds): at '
                    'the parity step count (55k) the config matches-or-'
                    'beats parity (+1.88/-0.49 dB test PSNR) at 2.8-3.2x '
                    'less wall-clock — the multiplier is time-to-quality; '
                    'at equal wall-clock (179k steps) it OVER-TRAINS and '
                    'reverses (-4.10 dB), so psi_193_fast.yaml ships the '
                    'parity-equivalent schedule (total_steps 55000). The '
                    'faster 20+40 point (proposal_fifth, 17.8x, 3-seed '
                    'matched at 12.5k steps) seed-SPLITS on long schedules '
                    '(+2.93/-5.67 dB) — short-schedule tool only '
                    '(RESULTS.md round-4 scale section)',
                dt_quality_matched_config='dt proposal 4x128 + 24+48',
                dt_quality_matched_x=3.20,
                dt_quality_matched_evidence='256px 5-channel union-mask '
                    'protocol (DT_MATRIX_r5.jsonl): at equal wall-clock '
                    'the cut (31.71+-1.67, 2 seeds) sits 1 dB above the '
                    'parity mean (30.67+-3.36, 3 seeds) with half the '
                    'spread at 3.2x measured DT throughput (134.8k vs '
                    '42.1k rays/s). '
                    'Scope: wall-clock-constrained tool only — given equal '
                    'STEPS the converged 64+128 parity control leads by '
                    '>4 dB and 4x-steps dt_long does not close it; tiered '
                    'DT demoted (seed-8 collapse despite warmup). '
                    'RESULTS.md round-5 DT section')

        # serving citation (round 4): artifact-vs-live from the committed
        # on-chip probe of the flagship deployment artifact, fused module
        # preferred (SERVING_FUSED_r4.json) over the XLA-path measurement
        # (SERVING_r4.json). Static citation, not re-measured per run.
        import json as _json
        import os as _os

        # Thomson white-light head (round 5, VERDICT r4 #8): accuracy +
        # throughput from the committed on-chip protocol row
        # (scripts/thomson_protocol.py). Static citation, not re-measured
        # per run (the accuracy oracle is a 16384-point f64 quadrature).
        _tp = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                            'THOMSON_r5.json')
        if _os.path.exists(_tp):
            try:
                _t = _json.load(open(_tp))
                result.update(
                    thomson_rays_per_sec=_t.get(
                        'train_rays_per_sec_per_chip'),
                    thomson_tb_mae_pct_vs_oracle=_t['tB'][
                        'mae_percent_of_mean'],
                    thomson_pb_mae_pct_vs_oracle=_t['pB'][
                        'mae_percent_of_mean'])
            except Exception:
                pass
        for _f, _kind in (('SERVING_FUSED_r4.json', 'fused tpu module'),
                          ('SERVING_r4.json', 'XLA-path module')):
            _p = _os.path.join(_os.path.dirname(
                _os.path.abspath(__file__)), _f)
            if _os.path.exists(_p):
                try:
                    _lat = _json.load(open(_p)).get('latency', {})
                    _ratio = _lat.get('served_over_live')
                except Exception:
                    _ratio = None
                if _ratio is not None:
                    result.update(
                        serving_artifact_over_live=_ratio,
                        serving_artifact_kind=f'{_kind} ({_f}, 512^2 '
                                              'full-disk, flagship bundle)')
                    break

    if args.mesh:
        n = jax.device_count()
        if n == 1:
            result.update(n_chips=1, scaling_efficiency=1.0)
        else:
            from sunerf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
            mesh = make_mesh()
            mstep = make_train_step(renderer, LossConfig(), optimizer,
                                    mesh=mesh, donate=False)
            mstate = replicate(mesh, create_train_state(params, optimizer))
            mbatch = shard_batch(mesh, _example_batch(batch_size * n))
            m_per_step = _measure(mstep, mstate, mbatch, key)
            sharded_per_chip = batch_size / m_per_step  # global/n per chip
            result.update(
                n_chips=n,
                sharded_rays_per_sec_per_chip=round(sharded_per_chip, 1),
                scaling_efficiency=round(sharded_per_chip / rays_per_sec, 3))

    print(json.dumps(result))


if __name__ == '__main__':
    main()
