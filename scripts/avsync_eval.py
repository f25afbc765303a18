"""VGGSoundSync-protocol sync accuracy (reference scripts/avsync_eval.py):
31 clips 0.04 s apart per video; score the center audio against all 31 video
clips (A2V) and the center video against all 31 audio clips (V2A); predicted
index within +-5 of center counts as correct.  Eval sharding dedups by
example index (the reference gathers indices across ranks).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--example_list_path", required=True)
    p.add_argument("--checkpoint_modules_dir", default=None)
    p.add_argument("--num_clips", type=int, default=31)
    p.add_argument("--shift_time", type=float, default=0.04)
    p.add_argument("--tolerance", type=int, default=5)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--video_fps", type=int, default=6)
    p.add_argument("--video_num_frames", type=int, default=12)
    p.add_argument("--max_examples", type=int, default=None)
    p.add_argument("--shard", type=int, nargs=2, default=None,
                   metavar=("INDEX", "COUNT"),
                   help="evaluate examples[INDEX::COUNT]; defaults to "
                        "(jax.process_index(), jax.process_count()) — "
                        "results are all-gathered across processes with "
                        "index dedup")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from asva_tpu.data.multipair import MultiPairAVDataset
    from asva_tpu.ops.mel import waveform_to_mel
    from asva_tpu.parallel.multihost import (gather_metric_records,
                                             maybe_initialize_distributed)
    from asva_tpu.runtime import build_avsync_classifier

    maybe_initialize_distributed()
    if args.shard is None:
        args.shard = (jax.process_index(), jax.process_count())

    wd = None
    if args.checkpoint_modules_dir:
        wd = {m: os.path.join(args.checkpoint_modules_dir, m)
              for m in ("audio_encoder", "video_encoder", "head")}
    clf, variables = build_avsync_classifier(wd)

    @jax.jit
    def encode(mels, videos):
        return clf.apply(variables, mels, videos, method=clf.encode)

    @jax.jit
    def pair_scores(a_emb, v_emb):
        k = a_emb.shape[0]
        c = a_emb.shape[-1]
        a = jnp.broadcast_to(a_emb[:, None], (k, k, c)).reshape(k * k, c)
        v = jnp.broadcast_to(v_emb[None], (k, k, c)).reshape(k * k, c)
        return clf.apply(variables, a, v,
                         method=clf.score_pairs).reshape(k, k)

    ds = MultiPairAVDataset(
        args.example_list_path, args.data_root, mode="test",
        image_size=args.image_size, video_fps=args.video_fps,
        video_num_frames=args.video_num_frames, randflip=False,
        shift_time=args.shift_time, num_clips=args.num_clips,
        sampling_type="center-compact", seed=0)
    mels_fn = jax.jit(jax.vmap(waveform_to_mel))

    center = args.num_clips // 2
    indices, hits, seen = [], [], set()
    n = min(len(ds), args.max_examples or len(ds))
    for i in range(args.shard[0], n, args.shard[1]):
        item = ds[i]
        if item["index"] in seen:  # decode-failure fallback dedup
            continue
        seen.add(item["index"])
        mels = mels_fn(jnp.asarray(item["waveforms"]))
        a_emb, v_emb = encode(mels, jnp.asarray(item["videos"]))
        scores = np.asarray(pair_scores(a_emb, v_emb))  # (a, v)
        a2v = int(np.argmax(scores[center]))
        v2a = int(np.argmax(scores[:, center]))
        indices.append(item["index"])
        hits.append((abs(a2v - center) <= args.tolerance,
                     abs(v2a - center) <= args.tolerance))
        if (i + 1) % 50 == 0:
            acc = np.mean(hits, axis=0)
            print(f"{i + 1}/{n}  A2V {acc[0]:.4f}  V2A {acc[1]:.4f}")

    # cross-process all-gather + index dedup (reference avsync_eval:150-167)
    _, merged = gather_metric_records(np.asarray(indices, np.int64),
                                      np.asarray(hits, np.float64),
                                      value_shape=(2,))
    if len(merged) == 0:
        raise SystemExit("no examples evaluated (empty dataset shard?)")
    acc = merged.mean(axis=0)
    print(f"A2V sync acc: {float(acc[0]):.4f} over {len(merged)} examples")
    print(f"V2A sync acc: {float(acc[1]):.4f}")


if __name__ == "__main__":
    main()
