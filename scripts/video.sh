#!/bin/bash
# Flyby video from a trained state (reference scripts/video.sh)
set -e
STATE=${1:-runs/simple_star/save_state}
OUT=${2:-video_frames}
python -m sunerf_tpu.evaluation.video --state "$STATE" --output "$OUT"
echo "assemble with: ffmpeg -framerate 15 -i $OUT/frame_%04d.jpg video.mp4"
