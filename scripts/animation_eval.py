"""Generation metric evaluation (reference scripts/animation_eval.py CLI):
FID / FVD / IA / IT / RelSync / AlignSync over a generated-video directory.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from animation_gen import get_evaluation_data  # noqa: E402


def build_eval_models(args):
    """Assemble jitted metric callables from available checkpoints."""
    import jax
    import jax.numpy as jnp
    from asva_tpu.eval.harness import EvalModels
    from asva_tpu.models.evalnets import InceptionI3D, InceptionV3FID
    from asva_tpu.models.imagebind_extra import (ImageBindVisionConfig,
                                                 ImageBindVisionEncoder)
    from asva_tpu.models.imagebind_audio import (ImageBindAudioConfig,
                                                 ImageBindAudioEncoder)
    from asva_tpu.runtime import build_avsync_classifier

    models = EvalModels()

    if args.eval_fid:
        net = InceptionV3FID()
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 229, 229, 3)))
        # TODO(weights): convert pt_inception FID weights when available
        models.fid_features = jax.jit(
            lambda x: net.apply(variables, jnp.asarray(x)))

    if args.eval_fvd:
        net = InceptionI3D()
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 12, 224, 224, 3)))
        models.fvd_features = jax.jit(
            lambda v: net.apply(variables, jnp.asarray(v)))

    if args.eval_relsync or args.eval_alignsync:
        wd = None
        if args.avsync_checkpoint:
            wd = {m: os.path.join(args.avsync_checkpoint, m)
                  for m in ("audio_encoder", "video_encoder", "head")}
        clf, variables = build_avsync_classifier(wd)
        models.avsync_score = jax.jit(
            lambda mels, vids: clf.apply(variables, jnp.asarray(mels),
                                         jnp.asarray(vids)))

    if args.eval_clipsim or args.eval_alignsync:
        from asva_tpu.models.imagebind_extra import (ImageBindTextConfig,
                                                     ImageBindTextEncoder)
        vis = ImageBindVisionEncoder(ImageBindVisionConfig())
        vvars = jax.jit(lambda: vis.init(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 224, 224, 3))))()

        aud = ImageBindAudioEncoder(ImageBindAudioConfig())
        avars = jax.jit(lambda: aud.init(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 128, 204, 1))))()

        @jax.jit
        def ia_sim(vvars, avars, frames, mels):
            v = vis.apply(vvars, jnp.asarray(frames))
            a, _ = aud.apply(avars, jnp.asarray(mels), normalize=True)
            a = a / 20.0  # de-scale the audio logit scaling
            return jnp.sum(v * a, axis=-1)

        models.ia_sim = lambda frames, mels: ia_sim(vvars, avars, frames,
                                                    mels)

        txt = ImageBindTextEncoder(ImageBindTextConfig())
        tvars = jax.jit(lambda: txt.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)))()

        @jax.jit
        def it_sim(tvars, vvars, frames, ids):
            v = vis.apply(vvars, jnp.asarray(frames))
            t = txt.apply(tvars, jnp.asarray(ids))
            # ImageBind text postprocessor scales by clip(exp(logit_scale),
            # max=100); the eval divides it back out -> unit vectors
            return jnp.sum(v * t, axis=-1)

        models.it_sim = lambda frames, ids: it_sim(tvars, vvars, frames, ids)
    return models


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp_root", required=True)
    p.add_argument("--checkpoint", type=int, required=True)
    p.add_argument("--dataset", default="AVSync15")
    p.add_argument("--dataset_root", default="./datasets")
    p.add_argument("--image_size", type=int, nargs=2, default=None)
    p.add_argument("--video_fps", type=int, default=6)
    p.add_argument("--video_num_frame", type=int, default=12)
    p.add_argument("--num_clips_per_video", type=int, default=3)
    p.add_argument("--audio_guidance_scale", type=float, default=4.0)
    p.add_argument("--text_guidance_scale", type=float, default=1.0)
    p.add_argument("--random_seed", type=int, default=0)
    p.add_argument("--avsync_checkpoint", default=
                   "checkpoints/avsync/vggss_sync_contrast/ckpts/"
                   "checkpoint-40000/modules")
    for flag in ("fid", "fvd", "clipsim", "relsync", "alignsync"):
        p.add_argument(f"--eval_{flag}", action="store_true")
    p.add_argument("--record_instance_metrics", action="store_true")
    args = p.parse_args()

    if args.image_size is None:
        args.image_size = ([128, 256] if args.dataset == "TheGreatestHits"
                           else [256, 256])

    from asva_tpu.eval.harness import evaluate_generation_results

    video_root, names, cats = get_evaluation_data(args.dataset,
                                                  args.dataset_root)
    gen_root = os.path.join(
        args.exp_root, "evaluations", f"checkpoint-{args.checkpoint}",
        f"AG-{args.audio_guidance_scale}_TG-{args.text_guidance_scale}",
        f"seed-{args.random_seed}", "videos")
    result_path = gen_root.replace("/videos", "/result.json")

    models = build_eval_models(args)

    text_ids_for_category = None
    if models.it_sim is not None:
        try:
            from asva_tpu.models.clip_text import tokenize
            import numpy as np
            cache = {}

            def text_ids_for_category(cat):
                if cat not in cache:
                    cache[cat] = np.asarray(tokenize([cat]))[0]
                return cache[cat]
        except Exception as e:
            print(f"it_sim disabled (tokenizer unavailable: {e})")
            models.it_sim = None

    result = evaluate_generation_results(
        models, video_root, names, cats, args.num_clips_per_video,
        gen_root, result_path, tuple(args.image_size), args.video_fps,
        args.video_num_frame,
        text_ids_for_category=text_ids_for_category,
        record_instance_metrics=args.record_instance_metrics)
    print({k: v for k, v in result.items() if isinstance(v, (int, float))})


if __name__ == "__main__":
    main()
