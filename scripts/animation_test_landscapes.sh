#!/bin/bash
# Two-step gen -> eval recipe for Landscapes (reference scripts/animation_test_landscapes.sh).
# Usage: bash scripts/animation_test_landscapes.sh <exp_root> <checkpoint> [audio_guidance]
# With no audio_guidance, runs the full README CFG sweep {1.0, 4.0, 8.0}.
set -e
EXP_ROOT=${1:?exp_root}
CKPT=${2:?checkpoint step}
SWEEP=${3:-"1.0 4.0 8.0"}

for AG in $SWEEP; do
  python scripts/animation_gen.py \
    --exp_root "$EXP_ROOT" --checkpoint "$CKPT" --dataset Landscapes \
    --image_size 256 256 --num_clips_per_video 3 \
    --audio_guidance_scale "$AG" --text_guidance_scale 1.0 --random_seed 0

  python scripts/animation_eval.py \
    --exp_root "$EXP_ROOT" --checkpoint "$CKPT" --dataset Landscapes \
    --image_size 256 256 --num_clips_per_video 3 \
    --audio_guidance_scale "$AG" --text_guidance_scale 1.0 --random_seed 0 \
    --eval_fid --eval_fvd --eval_clipsim --eval_relsync --eval_alignsync
done
