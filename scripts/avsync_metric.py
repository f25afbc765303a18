"""Single-pair sync metrics CLI (reference scripts/avsync_metric.py):
compute avsync_score / RelSync / AlignSync for one generated video against
its audio (and a reference video/audio where required).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_video_frames(path, video_fps, num_frames, image_size):
    import numpy as np
    from asva_tpu.data.media import MediaReader
    from asva_tpu.data.transforms import sd_video_transform
    with MediaReader(path) as r:
        frames = r.read_video_clip(0.0, num_frames / video_fps, video_fps,
                                   num_frames)
        wav = r.read_audio(0.0, num_frames / video_fps)
        sr = r.audio_sample_rate
    video = np.asarray(sd_video_transform(
        frames.astype(np.float32) / 255.0, image_size, normalize=False))
    return video, wav, sr


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video_path", required=True)
    p.add_argument("--audio_path", default=None,
                   help="defaults to the video's own audio track")
    p.add_argument("--ref_video_path", default=None)
    p.add_argument("--ref_audio_path", default=None)
    p.add_argument("--metric", default="avsync_score",
                   choices=["avsync_score", "relsync", "alignsync"])
    p.add_argument("--checkpoint_modules_dir", default=None)
    p.add_argument("--video_fps", type=int, default=6)
    p.add_argument("--video_num_frame", type=int, default=12)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from asva_tpu.eval.metrics import (compute_avsync_scores,
                                       compute_relsync)
    from asva_tpu.ops.mel import waveform_to_mel
    from asva_tpu.ops.resample import resample
    from asva_tpu.runtime import build_avsync_classifier

    wd = None
    if args.checkpoint_modules_dir:
        wd = {m: os.path.join(args.checkpoint_modules_dir, m)
              for m in ("audio_encoder", "video_encoder", "head")}
    clf, variables = build_avsync_classifier(wd)
    score_fn = jax.jit(lambda mels, vids: clf.apply(variables, mels, vids))

    video, wav, sr = load_video_frames(args.video_path, args.video_fps,
                                       args.video_num_frame, 256)
    if args.audio_path:
        from asva_tpu.pipelines.generate import load_audio_clips_uniformly
        wav16 = load_audio_clips_uniformly(
            args.audio_path, args.video_num_frame / args.video_fps, 1)[0]
    else:
        # keep (c, T): the mel mean-centres over all channels first
        wav16 = resample(wav, sr, 16000)
    mel = np.asarray(waveform_to_mel(jnp.asarray(wav16)))[None]
    videos = video[None]

    if args.metric == "avsync_score":
        out = compute_avsync_scores(score_fn, mel, videos)[0]
    elif args.metric == "relsync":
        assert args.ref_video_path or args.ref_audio_path
        if args.ref_video_path:
            ref_video, _, _ = load_video_frames(
                args.ref_video_path, args.video_fps, args.video_num_frame,
                256)
            out = compute_relsync(score_fn, mel, videos,
                                  ref_videos=ref_video[None])[0]
        else:
            ref_wav = load_audio_clips_uniformly(
                args.ref_audio_path, args.video_num_frame / args.video_fps,
                1)[0]
            ref_mel = np.asarray(waveform_to_mel(jnp.asarray(ref_wav)))[None]
            out = compute_relsync(score_fn, mel, videos,
                                  ref_mels=ref_mel)[0]
    else:
        raise SystemExit("alignsync additionally needs the ImageBind "
                         "towers; use scripts/animation_eval.py "
                         "--eval_alignsync for dataset-level AlignSync")
    print(f"{args.metric}: {float(out):.6f}")


if __name__ == "__main__":
    main()
