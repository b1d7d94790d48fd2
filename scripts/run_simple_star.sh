#!/bin/bash
# SimpleStar closed loop: synthesize -> train -> flyby video frames
# (reference scripts/run_193.sh recipe shape, fixed module paths)
set -e
python -m sunerf_tpu.evaluation.image_render --config config/render_simple_star.yaml
python -m sunerf_tpu.run_emission --config config/sunerf_simple_star.yaml
python -m sunerf_tpu.evaluation.video --state runs/simple_star/save_state \
    --output runs/simple_star/video --n-frames 60 --resolution 256
