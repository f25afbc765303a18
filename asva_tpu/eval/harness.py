"""End-to-end generation evaluation (FID / FVD / IA / IT / RelSync /
AlignSync over a generated-clip directory).

Mirrors the reference evaluate_generation_results
(avgen/evaluations/eval.py:28-279):
  * for every GT video, `num_clips_per_video` generated clips named
    <gt_stem>*.mp4 must exist in `generated_video_root`;
  * pass 1 walks GT videos (sorted) computing FID/FVD features, first-frame
    IA similarity and AVSync scores on uniformly sampled clips;
  * pass 2 walks generated clips computing the same plus IA/IT;
  * reducers: Fréchet distances (FID excludes frame 0), IA/IT mean±std over
    frames 1.., RelSync = sigma-pair(gen, GT), AlignSync = align_prob *
    RelSync; JSON dump to `result_save_path`.

Metric models arrive as an `EvalModels` bundle of jitted callables so tests
can inject tiny networks and checkpoints can be swapped without touching the
harness.
"""
from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Callable, List, Optional, Tuple, Union

import numpy as np

from ..data.transforms import (clip_frame_transform, fid_frame_transform,
                               fvd_frame_transform)
from ..ops.mel import waveform_to_mel
from .frechet import frechet_distance
from .metrics import alignsync_from_sims, relsync_from_scores


@dataclasses.dataclass
class EvalModels:
    """Jitted metric callables; any may be None to skip its metric."""
    fid_features: Optional[Callable] = None   # (n,229,229,3)[-1,1] -> (n,2048)
    fvd_features: Optional[Callable] = None   # (b,f,224,224,3)[-1,1] -> (b,c)
    avsync_score: Optional[Callable] = None   # (b,mel),(b,f,224,224,3)clip->(b,)
    ia_sim: Optional[Callable] = None         # (n,224,224,3)clip,(n,mel)->(n,)
    it_sim: Optional[Callable] = None         # (n,224,224,3)clip,(n,77)ids->(n,)
    random_nets: List[str] = dataclasses.field(default_factory=list)
    # extra provenance entries recorded verbatim into the result JSON
    # (e.g. I3D_BN_EPS and how it was chosen)
    provenance: dict = dataclasses.field(default_factory=dict)


def generated_clip_paths(root: str, stem: str) -> List[Tuple[int, str]]:
    """Exact-name clip discovery: `<stem>_clip-<k>.mp4` full-matches only
    (generate.py:147 naming), returned sorted by the parsed clip index k.

    Unlike a `<stem>*.mp4` prefix glob this cannot double-count a stem that
    prefixes another (`dog_1` vs `dog_10`)."""
    sub, base = os.path.split(stem)
    dirpath = os.path.join(root, sub) if sub else root
    pat = re.compile(re.escape(base) + r"_clip-(\d+)\.mp4")
    out = []
    if os.path.isdir(dirpath):
        for name in os.listdir(dirpath):
            m = pat.fullmatch(name)
            if m:
                out.append((int(m.group(1)), os.path.join(dirpath, name)))
    return sorted(out)


def load_av_clips_uniformly(video_path: str, video_fps: int,
                            video_num_frame: int,
                            image_size: Union[int, Tuple[int, int]],
                            num_clips: int):
    """(b, f, h, w, 3) [0,1] videos + (b, 128, 204, 1) mels, clips uniformly
    spaced over the file (reference avgen/data/utils.py:271-330).

    ONE clip-sampling protocol for generation and evaluation: delegates to
    pipelines.generate.load_av_clips_uniformly (the reference likewise
    keeps one function with a load_audio_as_melspectrogram flag) and mels
    the padded (c, T) waveforms — pad-then-mean-centre, matching the
    reference's load-then-waveform2melspec order."""
    from ..pipelines.generate import (load_av_clips_uniformly
                                      as _load_av_waves)
    videos, waves = _load_av_waves(video_path, video_fps, video_num_frame,
                                   image_size, num_clips)
    mels = [np.asarray(waveform_to_mel(w)) for w in waves]
    return videos, np.stack(mels)


def evaluate_generation_results(
    models: EvalModels,
    groundtruth_video_root: str,
    groundtruth_video_names: List[str],
    groundtruth_categories: List[str],
    num_clips_per_video: int,
    generated_video_root: str,
    result_save_path: str,
    image_size: Union[int, Tuple[int, int]] = 256,
    video_fps: int = 6,
    video_num_frame: int = 12,
    text_ids_for_category: Optional[Callable] = None,
    record_instance_metrics: bool = False,
) -> dict:
    names = sorted(groundtruth_video_names)
    cat_by_name = dict(zip(groundtruth_video_names, groundtruth_categories))

    # explicit (video, clip-index) pairing: generated clip k of a video is
    # compared against GT clip k (reference indexes clips explicitly,
    # avgen/evaluations/eval.py:228-247)
    clips_by_name = {}
    for name in names:
        stem = name.replace(".mp4", "")
        clips = generated_clip_paths(generated_video_root, stem)
        assert len(clips) == num_clips_per_video, \
            f"{name}: {len(clips)} generated clips != {num_clips_per_video}"
        assert [k for k, _ in clips] == list(range(num_clips_per_video)), \
            f"{name}: clip indices {[k for k, _ in clips]}"
        clips_by_name[name] = clips

    result = {"groundtruth_video_root": groundtruth_video_root,
              "generated_video_root": generated_video_root,
              "num_clips_per_video": num_clips_per_video}
    if models.random_nets:
        result["RANDOM_WEIGHT_NETS"] = list(models.random_nets)
    # provenance of the mel every audio-consuming metric saw (VERDICT r3 #8)
    from ..ops.mel import goldens_status
    result["MEL_PROVENANCE"] = goldens_status()
    result.update(models.provenance)

    gt_fid, gen_fid, gt_fvd, gen_fvd = [], [], [], []
    gen_pred_ia, gen_sync, gen_ia, gen_it = [], [], [], []
    gt_first_ia_by_name, gt_sync_by_name = {}, {}
    paired_gt_sync, paired_gt_first_ia = [], []

    def fvd_in(videos):
        return fvd_frame_transform(videos)

    # pass 1: ground truth
    for name in names:
        videos, mels = load_av_clips_uniformly(
            os.path.join(groundtruth_video_root, name), video_fps,
            video_num_frame, image_size, num_clips_per_video)
        if models.fid_features is not None:
            flat = fid_frame_transform(videos).reshape(
                (-1,) + (229, 229, 3))
            feats = np.asarray(models.fid_features(flat))
            gt_fid.append(feats.reshape(videos.shape[0], video_num_frame, -1))
        if models.fvd_features is not None:
            gt_fvd.append(np.asarray(models.fvd_features(fvd_in(videos))))
        if models.ia_sim is not None:
            first = clip_frame_transform(videos[:, 0])
            gt_first_ia_by_name[name] = np.asarray(
                models.ia_sim(first, mels))  # (num_clips,)
        if models.avsync_score is not None:
            gt_sync_by_name[name] = np.asarray(models.avsync_score(
                mels, clip_frame_transform(videos)))  # (num_clips,)

    # pass 2: generated clips, paired with their GT clip index.  Decode is
    # per-file, but each metric net runs ONE batched jit call per video
    # (all its clips at once) instead of batch-1 calls per clip — same
    # outputs, n_clips x fewer dispatches on a real chip.
    for name in names:
        decoded = [load_av_clips_uniformly(path, video_fps, video_num_frame,
                                           image_size, 1)
                   for _, path in clips_by_name[name]]
        videos = np.concatenate([v for v, _ in decoded])  # (n, f, h, w, 3)
        mels = np.concatenate([m for _, m in decoded])    # (n, 128, 204, 1)
        n = videos.shape[0]
        if models.fid_features is not None:
            flat = fid_frame_transform(videos).reshape((-1, 229, 229, 3))
            feats = np.asarray(models.fid_features(flat))
            gen_fid.append(feats.reshape(n, video_num_frame, -1))
        if models.fvd_features is not None:
            gen_fvd.append(np.asarray(models.fvd_features(fvd_in(videos))))
        if models.ia_sim is not None or models.it_sim is not None:
            flat_frames = videos.reshape((-1,) + videos.shape[2:])
            frames = np.asarray(clip_frame_transform(flat_frames))
            if models.ia_sim is not None:
                mels_rep = np.repeat(mels, video_num_frame, axis=0)
                sims = np.asarray(models.ia_sim(frames, mels_rep))
                sims = sims.reshape(n, video_num_frame)
                gen_ia.append(sims[:, 1:].mean(axis=1))
                gen_pred_ia.append(sims[:, 1:])
                paired_gt_first_ia.extend(gt_first_ia_by_name[name][:n])
            if models.it_sim is not None and text_ids_for_category:
                ids = text_ids_for_category(cat_by_name[name])
                ids_rep = np.repeat(ids[None], n * video_num_frame, axis=0)
                its = np.asarray(models.it_sim(frames, ids_rep))
                its = its.reshape(n, video_num_frame)
                gen_it.append(its[:, 1:].mean(axis=1))
        if models.avsync_score is not None:
            gen_sync.append(np.asarray(models.avsync_score(
                mels, clip_frame_transform(videos))))
            paired_gt_sync.extend(gt_sync_by_name[name][:n])

    # reducers
    if models.fid_features is not None:
        a = np.concatenate(gt_fid)[:, 1:].reshape(-1, gt_fid[0].shape[-1])
        b = np.concatenate(gen_fid)[:, 1:].reshape(-1, gen_fid[0].shape[-1])
        result["FID"] = frechet_distance(a, b)
    if models.fvd_features is not None:
        result["FVD"] = frechet_distance(np.concatenate(gt_fvd),
                                         np.concatenate(gen_fvd))
    if gen_ia:
        ias = np.concatenate(gen_ia)
        result.update(IA_mean=float(ias.mean()), IA_std=float(ias.std(ddof=1)))
    if gen_it:
        its = np.concatenate(gen_it)
        result.update(IT_mean=float(its.mean()), IT_std=float(its.std(ddof=1)))
    if models.avsync_score is not None:
        gt_s = np.asarray(paired_gt_sync)
        gen_s = np.concatenate(gen_sync)
        rel = relsync_from_scores(gt_s, gen_s)
        result.update(RelSync_mean=float(rel.mean()),
                      RelSync_std=float(rel.std(ddof=1)))
        if gen_pred_ia:
            align = alignsync_from_sims(
                np.asarray(paired_gt_first_ia).reshape(-1, 1),
                np.concatenate(gen_pred_ia), rel)
            result.update(AlignSync_mean=float(align.mean()),
                          AlignSync_std=float(align.std(ddof=1)))

    # per-clip records whenever ANY per-clip metric exists — the reference
    # records IA under eval_clipsim alone, independent of eval_relsync
    # (avgen/evaluations/eval.py:252-271)
    if record_instance_metrics and (models.avsync_score is not None
                                    or gen_ia):
        inst = {}
        ia_all = np.concatenate(gen_ia) if gen_ia else None
        i = 0
        for name in names:
            for _, path in clips_by_name[name]:
                key = os.path.basename(path)
                inst[key] = {}
                if models.avsync_score is not None:
                    inst[key]["RelSync"] = float(rel[i])
                if ia_all is not None:
                    inst[key]["IA"] = float(ia_all[i])
                if models.avsync_score is not None and gen_pred_ia:
                    inst[key]["AlignSync"] = float(align[i])
                i += 1
        result["instance_metrics"] = inst

    os.makedirs(os.path.dirname(result_save_path) or ".", exist_ok=True)
    with open(result_save_path, "w") as f:
        json.dump(result, f, indent=4)
    return result
