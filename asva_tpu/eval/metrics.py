"""Synchronization + CLIP-consistency metric formulas.

Contracts (reference avgen/evaluations/avsync/compute_avsync.py and
eval.py:228-247):
  avsync score  : classifier logit on (mel, CLIP-normalized 224^2 video)
  RelSync       : softmax over [ref_score, gen_score] -> P(gen)
                  == exp(gen) / (exp(ref) + exp(gen))
  align_prob    : per predicted frame i >= 1, softmax over
                  [ia_sim(GT first frame), ia_sim(gen frame i)] -> P(gen),
                  averaged over frames
  AlignSync     : align_prob * RelSync
  IA / IT       : cosine similarity of ImageBind unit embeddings, mean over
                  frames 1..f-1
"""
from __future__ import annotations

from typing import Callable

import numpy as np

from ..data.transforms import clip_frame_transform


def compute_avsync_scores(score_fn: Callable, mels, videos) -> np.ndarray:
    """score_fn(mels, clip_videos) -> (b,); videos (b, f, h, w, 3) in [0,1]
    are CLIP-preprocessed here (resize 224 bicubic + normalize)."""
    clip_videos = clip_frame_transform(videos)
    return np.asarray(score_fn(mels, clip_videos))


def relsync_from_scores(ref_scores, gen_scores) -> np.ndarray:
    ref = np.asarray(ref_scores, np.float64)
    gen = np.asarray(gen_scores, np.float64)
    m = np.maximum(ref, gen)
    e_ref, e_gen = np.exp(ref - m), np.exp(gen - m)
    return (e_gen / (e_ref + e_gen)).astype(np.float32)


def compute_relsync(score_fn, mels, videos, ref_mels=None,
                    ref_videos=None) -> np.ndarray:
    assert (ref_mels is None) ^ (ref_videos is None), \
        "specify exactly one of ref_mels / ref_videos"
    gen = compute_avsync_scores(score_fn, mels, videos)
    if ref_mels is not None:
        ref = compute_avsync_scores(score_fn, ref_mels, videos)
    else:
        ref = compute_avsync_scores(score_fn, mels, ref_videos)
    return relsync_from_scores(ref, gen)


def alignsync_from_sims(gt_first_frame_ia, gen_frame_ias,
                        relsync) -> np.ndarray:
    """gt_first_frame_ia (b, 1), gen_frame_ias (b, f-1), relsync (b,)."""
    gt = np.asarray(gt_first_frame_ia, np.float64)
    gen = np.asarray(gen_frame_ias, np.float64)
    m = np.maximum(gt, gen)
    align_prob = (np.exp(gen - m)
                  / (np.exp(gt - m) + np.exp(gen - m))).mean(axis=1)
    return (align_prob * np.asarray(relsync, np.float64)).astype(np.float32)


def compute_alignsync(score_fn, ia_sim_fn, mels, videos,
                      ref_videos) -> np.ndarray:
    """Full AlignSync on (b, f, h, w, 3) [0,1] videos.

    ia_sim_fn(frames (n, 224, 224, 3) CLIP-normalized, mels (n,...)) -> (n,).
    Frame 0 is taken from the reference video (the conditioning frame)."""
    f = videos.shape[1]
    relsync = compute_relsync(score_fn, mels, videos, ref_videos=ref_videos)
    merged = np.concatenate([np.asarray(ref_videos[:, 0:1]),
                             np.asarray(videos[:, 1:])], axis=1)
    frames = clip_frame_transform(merged)           # (b, f, 224, 224, 3)
    b = frames.shape[0]
    flat = np.asarray(frames).reshape((b * f,) + frames.shape[2:])
    mels_rep = np.repeat(np.asarray(mels), f, axis=0)
    sims = np.asarray(ia_sim_fn(flat, mels_rep)).reshape(b, f)
    return alignsync_from_sims(sims[:, 0:1], sims[:, 1:], relsync)
