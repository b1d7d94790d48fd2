#!/usr/bin/env python
"""Score a saved emission bundle against the psi_193 protocol ground truth.

Offline cash-in of checkpoints that outlived their training run (VERDICT
r4 #2a: the salvaged s8 probe re-run best bundle,
artifacts_r4/s8_probe_rerun_best.npz) — the protocol scene is
deterministic, so the exact 18-view ground truth a bundle was trained
against can be resynthesized at any time (scripts/psi_protocol.py
ensure_scene) and scored through the same metrics harness
(|lat| > 7 deg train/test split, reference protocol:
/root/reference/sunerf/evaluation/stash/metrics_simulation.py:40-76).

Usage: python scripts/score_bundle.py --bundle artifacts_r4/..._best.npz \
           --resolution 256 --data-cache /tmp/psi_scene_cache_256 \
           --label s8_probe_rerun_150k --out BUNDLE_SCORES_r5.jsonl
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--bundle', required=True)
    parser.add_argument('--resolution', type=int, default=256)
    parser.add_argument('--data-cache', required=True)
    parser.add_argument('--label', required=True,
                        help='row label recording the bundle provenance')
    parser.add_argument('--out', default=None)
    parser.add_argument('--platform', default=None)
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from psi_protocol import ensure_scene

    from sunerf_tpu.evaluation.loader import SuNeRFLoader
    from sunerf_tpu.evaluation.metrics_harness import evaluate_viewpoints

    _, gt_dir = ensure_scene(args.data_cache, args.resolution)
    loader = SuNeRFLoader(args.bundle)
    metrics = evaluate_viewpoints(loader,
                                  sorted(glob.glob(os.path.join(gt_dir,
                                                                '*.fits'))))
    out = {'label': args.label, 'bundle': args.bundle,
           'resolution': args.resolution,
           'train': metrics['train'], 'test': metrics['test']}
    print(json.dumps(out))
    if args.out:
        with open(args.out, 'a') as fh:
            fh.write(json.dumps(out) + '\n')


if __name__ == '__main__':
    main()
