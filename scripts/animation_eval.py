"""Generation metric evaluation (reference scripts/animation_eval.py CLI):
FID / FVD / IA / IT / RelSync / AlignSync over a generated-video directory.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from animation_gen import get_evaluation_data  # noqa: E402


def _find_file(*candidates):
    for p in candidates:
        if p and os.path.isfile(p):
            return p
    return None


def _load_or_refuse(variables, key_map, path, candidates, label, args,
                    random_nets, expect_fresh=()):
    """Convert torch weights into `variables`, refusing to run random nets.

    Reference behavior: metric nets always load published weights
    (avgen/evaluations/models/inception_v3.py:13 FID_WEIGHTS_URL,
    models/download.py:48-55 i3d_torchscript, clip.py:27 imagebind_huge).
    With no weights on disk this either aborts (default) or clearly labels
    the net as random (--allow_random_eval_nets)."""
    if path is None:
        msg = (f"{label}: no weights found (looked for: "
               f"{', '.join(c for c in candidates if c)})")
        if not args.allow_random_eval_nets:
            sys.exit(msg + "\nRefusing to compute metrics with randomly "
                     "initialized nets — results would be meaningless. "
                     "Pass --allow_random_eval_nets to override.")
        print(f"WARNING: {msg} — RUNNING WITH RANDOM WEIGHTS; "
              f"'{label}' numbers are meaningless.")
        random_nets.append(label)
        return variables
    from asva_tpu.convert import convert_state_dict, load_torch_state
    state = load_torch_state(path)
    variables, report = convert_state_dict(variables, state, key_map)
    bad = [p for p in report["fresh"]
           if not any(tag in p for tag in expect_fresh)]
    if bad:
        sys.exit(f"{label}: {len(bad)} parameters missing from {path} "
                 f"(converter/key-map mismatch): {bad[:5]}")
    print(f"{label}: converted {len(report['converted'])} tensors "
          f"from {path}")
    return variables


def build_eval_models(args):
    """Assemble jitted metric callables, loading the published checkpoints
    from the reference's pretrained/ layout."""
    import jax
    import jax.numpy as jnp
    from asva_tpu.convert.torch_to_jax import (i3d_key_map,
                                               imagebind_audio_key_map,
                                               imagebind_text_key_map,
                                               imagebind_vision_key_map,
                                               inception_v3_key_map)
    from asva_tpu.eval.harness import EvalModels
    from asva_tpu.models.evalnets import InceptionI3D, InceptionV3FID
    from asva_tpu.models.imagebind_extra import (ImageBindVisionConfig,
                                                 ImageBindVisionEncoder)
    from asva_tpu.models.imagebind_audio import (ImageBindAudioConfig,
                                                 ImageBindAudioEncoder)
    from asva_tpu.runtime import build_avsync_classifier

    models = EvalModels()
    root = args.pretrained_root
    models.random_nets = random_nets = []
    imagebind_path = _find_file(
        os.path.join(root, ".checkpoints", "imagebind_huge.pth"),
        os.path.join(root, "imagebind_huge.pth"))

    if args.eval_fid:
        fid_net = InceptionV3FID()
        fid_vars = jax.jit(lambda: fid_net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 229, 229, 3))))()
        fid_path = _find_file(
            os.path.join(root, "pt_inception-2015-12-05-6726825d.pth"),
            os.path.join(root, "pt_inception.pth"))
        fid_vars = _load_or_refuse(
            fid_vars, inception_v3_key_map, fid_path,
            [os.path.join(root, "pt_inception-2015-12-05-6726825d.pth")],
            "fid_inception_v3", args, random_nets)
        # NOTE: bind net+vars per metric — a shared local name here would
        # be captured by reference and rebound by the next block.  Params
        # are jit ARGUMENTS (partial-applied), never closure constants —
        # closures embed the weights in the remote-compile payload
        # (CLAUDE.md HTTP 413 note).
        import functools
        models.fid_features = functools.partial(
            jax.jit(lambda p, x: fid_net.apply(p, jnp.asarray(x))), fid_vars)

    if args.eval_fvd:
        i3d_path = _find_file(os.path.join(root, "i3d_state.pt"))
        detected_eps = None
        if i3d_path is None:
            blob = _find_file(os.path.join(root, "i3d_torchscript.pt"))
            if blob is not None:  # extract the torchscript blob's state dict
                import json
                import torch
                from asva_tpu.convert.torchscript import extract_state_and_eps
                state, detected_eps = extract_state_and_eps(blob)
                i3d_path = os.path.join(root, "i3d_state.pt")
                torch.save(state, i3d_path)
                with open(i3d_path + ".eps.json", "w") as f:
                    json.dump({"bn_eps": detected_eps,
                               "source_blob": blob}, f)
                print(f"fvd_i3d: extracted {len(state)} tensors from {blob}"
                      f" (detected bn_eps={detected_eps})")
        elif os.path.isfile(i3d_path + ".eps.json"):
            import json
            with open(i3d_path + ".eps.json") as f:
                detected_eps = json.load(f).get("bn_eps")
        # eps resolution: explicit flag > value read out of the blob itself
        # > the reference pytorch_i3d source default 1e-5 (VERDICT r3 #7)
        if args.i3d_bn_eps is not None:
            i3d_eps, eps_src = args.i3d_bn_eps, "flag"
        elif detected_eps is not None:
            i3d_eps, eps_src = float(detected_eps), "auto-detected from blob"
        else:
            i3d_eps, eps_src = 1e-5, "source default (no blob to detect from)"
        models.provenance["I3D_BN_EPS"] = i3d_eps
        models.provenance["I3D_BN_EPS_SOURCE"] = eps_src
        i3d_net = InceptionI3D(bn_eps=i3d_eps)
        i3d_vars = jax.jit(lambda: i3d_net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 12, 224, 224, 3))))()
        i3d_vars = _load_or_refuse(
            i3d_vars, i3d_key_map, i3d_path,
            [os.path.join(root, "i3d_torchscript.pt")],
            "fvd_i3d", args, random_nets)
        import functools
        models.fvd_features = functools.partial(
            jax.jit(lambda p, v: i3d_net.apply(p, jnp.asarray(v))), i3d_vars)

    if args.eval_relsync or args.eval_alignsync:
        wd = None
        if args.avsync_checkpoint and os.path.isdir(args.avsync_checkpoint):
            wd = {m: os.path.join(args.avsync_checkpoint, m)
                  for m in ("audio_encoder", "video_encoder", "head")}
        elif not args.allow_random_eval_nets:
            sys.exit(f"avsync classifier checkpoint not found at "
                     f"{args.avsync_checkpoint}; pass --avsync_checkpoint "
                     "or --allow_random_eval_nets")
        else:
            print("WARNING: avsync classifier running with RANDOM weights")
            random_nets.append("avsync_classifier")
        clf, clf_vars = build_avsync_classifier(wd)
        import functools
        models.avsync_score = functools.partial(
            jax.jit(lambda p, mels, vids: clf.apply(p, jnp.asarray(mels),
                                                    jnp.asarray(vids))),
            clf_vars)

    if args.eval_clipsim or args.eval_alignsync:
        from asva_tpu.models.imagebind_extra import (ImageBindTextConfig,
                                                     ImageBindTextEncoder)
        vis = ImageBindVisionEncoder(ImageBindVisionConfig())
        vvars = jax.jit(lambda: vis.init(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 224, 224, 3))))()
        vvars = _load_or_refuse(
            vvars, imagebind_vision_key_map, imagebind_path,
            [os.path.join(root, ".checkpoints", "imagebind_huge.pth")],
            "imagebind_vision", args, random_nets)

        aud = ImageBindAudioEncoder(ImageBindAudioConfig())
        avars = jax.jit(lambda: aud.init(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 128, 204, 1))))()
        avars = _load_or_refuse(
            avars, imagebind_audio_key_map, imagebind_path,
            [os.path.join(root, ".checkpoints", "imagebind_huge.pth")],
            "imagebind_audio", args, random_nets)

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
        tvars = _load_or_refuse(
            tvars, imagebind_text_key_map, imagebind_path,
            [os.path.join(root, ".checkpoints", "imagebind_huge.pth")],
            "imagebind_text", args, random_nets)

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
    p.add_argument("--pretrained_root", default="pretrained",
                   help="directory holding the published metric-net weights "
                        "(pt_inception-2015-12-05-6726825d.pth, "
                        "i3d_torchscript.pt, .checkpoints/imagebind_huge.pth)")
    p.add_argument("--allow_random_eval_nets", action="store_true",
                   help="compute metrics even when a metric net's weights "
                        "are missing (CLEARLY LABELED; numbers meaningless)")
    p.add_argument("--i3d_bn_eps", type=float, default=None,
                   help="BatchNorm epsilon inside the FVD I3D.  Default: "
                        "auto-detect from the i3d_torchscript.pt blob (or "
                        "its extraction sidecar i3d_state.pt.eps.json), "
                        "falling back to the reference pytorch_i3d source "
                        "value 1e-5.  Pass explicitly to override")
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
    # NOT str.replace("/videos", ...): exp_root/dataset paths containing
    # "/videos" elsewhere would be mangled
    result_path = os.path.join(os.path.dirname(gen_root), "result.json")

    models = build_eval_models(args)

    text_ids_for_category = None
    if models.it_sim is not None:
        import numpy as np
        from asva_tpu.models.clip_bpe import ClipBPETokenizer
        tok_path = _find_file(
            os.path.join(args.pretrained_root, "bpe_simple_vocab_16e6.txt.gz"),
            os.path.join(args.pretrained_root, "stable-diffusion-v1-5",
                         "tokenizer", "vocab.json"))
        if tok_path is None:
            msg = ("it_sim: no CLIP BPE files found (looked for "
                   f"{args.pretrained_root}/bpe_simple_vocab_16e6.txt.gz and "
                   f"{args.pretrained_root}/stable-diffusion-v1-5/tokenizer/)")
            if not args.allow_random_eval_nets:
                sys.exit(msg)
            print(f"WARNING: {msg} — IT disabled")
            models.it_sim = None
        else:
            if tok_path.endswith("vocab.json"):
                tok_path = os.path.dirname(tok_path)
            tok = ClipBPETokenizer.from_pretrained(tok_path)
            cache = {}

            def text_ids_for_category(cat):
                if cat not in cache:
                    cache[cat] = np.asarray(tok([cat]))[0]
                return cache[cat]

    result = evaluate_generation_results(
        models, video_root, names, cats, args.num_clips_per_video,
        gen_root, result_path, tuple(args.image_size), args.video_fps,
        args.video_num_frame,
        text_ids_for_category=text_ids_for_category,
        record_instance_metrics=args.record_instance_metrics)
    print({k: v for k, v in result.items() if isinstance(v, (int, float))})


if __name__ == "__main__":
    main()
