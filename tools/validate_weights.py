"""One-command real-weights acceptance gate (docs/REAL_WEIGHTS.md runbook).

Pointed at a directory of fetched artifacts, this runs EVERY converter with
its 0-fresh/0-unused acceptance criterion (modulo the per-module allowances
the runbook documents), loads the scalar artifacts, optionally mints the
mel/scheduler golden fixtures (when torchaudio/diffusers exist on the
machine), and optionally executes the parity test subset — so the day the
published artifacts are staged, validation is a single command:

    python tools/validate_weights.py --root /data/artifacts \
        --checkpoint_modules_dir /data/.../checkpoint-37000/modules \
        --run_tests

`--fabricate` dry-runs the complete gate against tiny in-tree fabricated
checkpoints written in the EXACT published formats/key spaces (via the
inverse converters + tools/torch_eval_nets.mint_artifacts), proving the
gate end-to-end without the real artifacts.

Artifact tree expected under --root (see docs/REAL_WEIGHTS.md):
  pretrained/stable-diffusion-v1-5/{unet,vae,text_encoder}/
  pretrained/.checkpoints/imagebind_huge.pth (or pretrained/imagebind_huge.pth)
  pretrained/pt_inception-2015-12-05-6726825d.pth
  pretrained/i3d_torchscript.pt
  pretrained/openai-clip-l_null_text_encoding.pt
  checkpoints/avsync/.../checkpoint-40000/modules/{audio_encoder,video_encoder,head}
  <avid_cma path via --avid_cma_path>

Reference artifact consumers this mirrors:
  /root/reference/scripts/animation_demo.py:72-80 (SD1.5 + AVSyncD ckpt),
  /root/reference/avsync/models/avsync_classifier.py:36-51,
  /root/reference/avgen/evaluations/models/download.py (FID/I3D blobs).
"""
from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PASS, FAIL, MISS = "PASS", "FAIL", "NOT-STAGED"


def _force_cpu():
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def _find(*paths):
    for p in paths:
        if p and os.path.isfile(p):
            return p
    return None


def _weights_in(dirpath):
    if not dirpath or not os.path.isdir(dirpath):
        return None
    from asva_tpu.runtime import _find_weights
    return _find_weights(dirpath)


def _check_report(report, allowed_fresh=r"$^", allowed_unused=r"$^"):
    """0-fresh/0-unused acceptance modulo documented allowances."""
    bad_fresh = [k for k in report["fresh"]
                 if not re.search(allowed_fresh, k)]
    bad_unused = [k for k in report["unused"]
                  if not re.search(allowed_unused, k)]
    ok = not bad_fresh and not bad_unused
    detail = (f"{len(report['converted'])} converted, "
              f"{len(report['fresh'])} fresh, "
              f"{len(report['unused'])} unused")
    if bad_fresh:
        detail += f"; BAD FRESH {bad_fresh[:4]}"
    if bad_unused:
        detail += f"; BAD UNUSED {bad_unused[:4]}"
    return ok, detail


def _convert(fresh_params, path, key_map, **allow):
    from asva_tpu.convert import convert_state_dict, load_torch_state
    state = load_torch_state(path)
    params, report = convert_state_dict(fresh_params, state, key_map)
    ok, detail = _check_report(report, **allow)
    return params, ok, detail


# ---------------------------------------------------------------------------
# checks — each returns (status, detail)
# ---------------------------------------------------------------------------

class Gate:
    def __init__(self, args, tiny=False):
        self.args = args
        self.tiny = tiny       # fabricate mode: tiny architectures
        self.root = args.root
        self.results = []

    # -- model builders (tiny in fabricate mode, published sizes otherwise)
    def unet_cfg(self):
        from asva_tpu.models.unet3d import UNet3DConfig
        if not self.tiny:
            return UNet3DConfig()
        return UNet3DConfig(
            down_block_types=("FFSpatioAudioTempCrossAttnDownBlock3D",
                              "FFSpatioTempResDownBlock3D"),
            up_block_types=("FFSpatioTempResUpBlock3D",
                            "FFSpatioAudioTempCrossAttnUpBlock3D"),
            mid_block_type="FFSpatioAudioTempCrossAttnUNetMidBlock3D",
            block_out_channels=(32, 64), layers_per_block=1,
            norm_num_groups=8, attention_head_dim=2)

    def fresh_unet(self):
        import jax.numpy as jnp
        from asva_tpu.runtime import build_unet
        _, params = build_unet(self.unet_cfg(), jnp.float32,
                               video_length=4 if self.tiny else 12)
        return params

    def fresh_vae(self):
        import jax
        import jax.numpy as jnp
        from asva_tpu.models.vae import AutoencoderKL, VAEConfig
        cfg = VAEConfig.tiny() if self.tiny else VAEConfig()
        model = AutoencoderKL(cfg, dtype=jnp.float32)
        return jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
            jax.random.PRNGKey(0)))()

    def fresh_text(self):
        import jax
        import jax.numpy as jnp
        from asva_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
        cfg = CLIPTextConfig.tiny() if self.tiny else CLIPTextConfig()
        model = CLIPTextModel(cfg, dtype=jnp.float32)
        return jax.jit(lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.max_positions), jnp.int32)))()

    def fresh_audio(self):
        import jax.numpy as jnp
        from asva_tpu.models.imagebind_audio import ImageBindAudioConfig
        from asva_tpu.runtime import build_audio_encoder
        cfg = (ImageBindAudioConfig.tiny(embed_dim=768) if self.tiny
               else ImageBindAudioConfig())
        _, params = build_audio_encoder(4 if self.tiny else 12, jnp.float32,
                                        config=cfg)
        return params

    def fresh_imagebind(self, which):
        import jax
        import jax.numpy as jnp
        from asva_tpu.models.imagebind_extra import (
            ImageBindTextConfig, ImageBindTextEncoder, ImageBindVisionConfig,
            ImageBindVisionEncoder)
        if which == "vision":
            cfg = (ImageBindVisionConfig.tiny() if self.tiny
                   else ImageBindVisionConfig())
            model = ImageBindVisionEncoder(cfg, dtype=jnp.float32)
            x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        else:
            cfg = (ImageBindTextConfig.tiny() if self.tiny
                   else ImageBindTextConfig())
            model = ImageBindTextEncoder(cfg, dtype=jnp.float32)
            x = jnp.zeros((1, cfg.context_length), jnp.int32)
        return jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()

    def fresh_avsync(self):
        import jax
        import jax.numpy as jnp
        from asva_tpu.models.avsync import AVSyncClassifier
        model = AVSyncClassifier(dtype=jnp.float32)
        return jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 204, 1)),
            jnp.zeros((1, 12, 224, 224, 3))))()

    # -- the checks
    def record(self, label, status, detail=""):
        self.results.append((label, status, detail))
        print(f"  [{status:^10s}] {label:28s} {detail}", flush=True)

    def run_all(self):
        from asva_tpu.convert.torch_to_jax import (
            clip_text_key_map, i3d_key_map, imagebind_audio_key_map,
            imagebind_text_key_map, imagebind_vision_key_map,
            inception_v3_key_map, unet_key_map, vae_key_map)

        sd = os.path.join(self.root, "pretrained", "stable-diffusion-v1-5")
        a = self.args

        # 1. SD1.5 VAE (exact match required)
        p = _weights_in(os.path.join(sd, "vae"))
        if p:
            _, ok, d = _convert(self.fresh_vae(), p, vae_key_map)
            self.record("sd15_vae", PASS if ok else FAIL, d)
        else:
            self.record("sd15_vae", MISS, f"no weights under {sd}/vae")

        # 2. SD1.5 UNet 2D->3D graft: _temp/_audio additions stay fresh BY
        #    DESIGN (reference from_pretrained_2d,
        #    audio_cond_unet_3d_condition.py:800-838); nothing may be unused
        p = _weights_in(os.path.join(sd, "unet"))
        if p:
            _, ok, d = _convert(self.fresh_unet(), p, unet_key_map,
                                allowed_fresh=r"temp|audio")
            self.record("sd15_unet_graft", PASS if ok else FAIL, d)
        else:
            self.record("sd15_unet_graft", MISS, f"no weights under {sd}/unet")

        # 3. SD1.5 CLIP text encoder (position_ids is a buffer, not a param)
        p = _weights_in(os.path.join(sd, "text_encoder"))
        if p:
            _, ok, d = _convert(self.fresh_text(), p, clip_text_key_map,
                                allowed_unused=r"position_ids")
            self.record("sd15_text_encoder", PASS if ok else FAIL, d)
        else:
            self.record("sd15_text_encoder", MISS,
                        f"no weights under {sd}/text_encoder")

        # 4+5. trained AVSyncD checkpoint modules (exact match required)
        mdir = a.checkpoint_modules_dir
        p = _weights_in(os.path.join(mdir, "unet")) if mdir else None
        if p:
            _, ok, d = _convert(self.fresh_unet(), p, unet_key_map)
            self.record("avsyncd_unet", PASS if ok else FAIL, d)
        else:
            self.record("avsyncd_unet", MISS,
                        "--checkpoint_modules_dir not staged")
        p = _weights_in(os.path.join(mdir, "audio_encoder")) if mdir else None
        if p:
            _, ok, d = _convert(self.fresh_audio(), p,
                                imagebind_audio_key_map)
            self.record("avsyncd_audio_encoder", PASS if ok else FAIL, d)
        else:
            self.record("avsyncd_audio_encoder", MISS,
                        "--checkpoint_modules_dir not staged")

        # 6-8. imagebind_huge.pth: audio tower (final_layer_norm is ASVA's
        #      own addition and stays fresh), vision + text towers for the
        #      IA/IT metrics.  The huge file carries every modality, so
        #      "unused" is expected — the acceptance is per-modality: no
        #      key of the MODALITY under test may go unused.
        p = _find(os.path.join(self.root, "pretrained", ".checkpoints",
                               "imagebind_huge.pth"),
                  os.path.join(self.root, "pretrained", "imagebind_huge.pth"))
        if p:
            for label, fresh, km, mod in (
                    ("imagebind_huge_audio", self.fresh_audio(),
                     imagebind_audio_key_map, "audio"),
                    ("imagebind_huge_vision", self.fresh_imagebind("vision"),
                     imagebind_vision_key_map, "vision"),
                    ("imagebind_huge_text", self.fresh_imagebind("text"),
                     imagebind_text_key_map, "text")):
                _, ok, d = _convert(
                    fresh, p, km,
                    allowed_fresh=(r"final_layer_norm" if mod == "audio"
                                   else r"$^"),
                    allowed_unused=rf"^(?!.*\.{mod}\.)")
                self.record(label, PASS if ok else FAIL, d)
        else:
            for label in ("imagebind_huge_audio", "imagebind_huge_vision",
                          "imagebind_huge_text"):
                self.record(label, MISS, "imagebind_huge.pth not staged")

        # 9. FID InceptionV3 (fc head unused by design: FID reads pool3)
        p = _find(os.path.join(self.root, "pretrained",
                               "pt_inception-2015-12-05-6726825d.pth"),
                  os.path.join(self.root, "pretrained", "pt_inception.pth"))
        if p:
            import jax
            import jax.numpy as jnp
            from asva_tpu.models.evalnets import InceptionV3FID
            net = InceptionV3FID()
            fresh = jax.jit(lambda: net.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))))()
            _, ok, d = _convert(dict(fresh), p, inception_v3_key_map,
                                allowed_unused=r"^fc\.|num_batches_tracked")
            self.record("fid_inception_v3", PASS if ok else FAIL, d)
        else:
            self.record("fid_inception_v3", MISS, "FID blob not staged")

        # 10. FVD I3D torchscript blob: extract (+BN-eps auto-detect), convert
        p = _find(os.path.join(self.root, "pretrained", "i3d_torchscript.pt"))
        if p:
            import jax
            import jax.numpy as jnp
            from asva_tpu.convert.torchscript import extract_state_and_eps
            from asva_tpu.models.evalnets import InceptionI3D
            state, eps = extract_state_and_eps(p)
            state = {k: v.numpy() for k, v in state.items()}
            net = InceptionI3D(bn_eps=eps if eps is not None else 1e-5)
            fresh = jax.jit(lambda: net.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 12, 224, 224, 3))))()
            from asva_tpu.convert import convert_state_dict
            _, report = convert_state_dict(dict(fresh), state, i3d_key_map)
            ok, d = _check_report(report,
                                  allowed_unused=r"num_batches_tracked")
            d += f"; bn_eps={'auto:' + str(eps) if eps else 'default:1e-5'}"
            self.record("fvd_i3d", PASS if ok else FAIL, d)
        else:
            self.record("fvd_i3d", MISS, "i3d_torchscript.pt not staged")

        # 11. AVSync classifier modules (BN num_batches_tracked is a buffer)
        cdir = a.avsync_modules_dir
        if cdir and os.path.isdir(cdir):
            from asva_tpu.convert import convert_state_dict, load_torch_state
            merged = {}
            for mod in ("audio_encoder", "video_encoder", "head"):
                mp = _weights_in(os.path.join(cdir, mod))
                if mp:
                    for k, v in load_torch_state(mp).items():
                        merged[f"{mod}.{k}"] = v
            if merged:
                from asva_tpu.convert.torch_to_jax import avsync_key_map
                _, report = convert_state_dict(self.fresh_avsync(), merged,
                                               avsync_key_map)
                ok, d = _check_report(
                    report, allowed_unused=r"num_batches_tracked")
                self.record("avsync_classifier", PASS if ok else FAIL, d)
            else:
                self.record("avsync_classifier", MISS,
                            f"no module weights under {cdir}")
        else:
            self.record("avsync_classifier", MISS,
                        "--avsync_modules_dir not staged")

        # 12. AVID-CMA raw init (head has no AVID source and stays fresh;
        #     non-module.{audio,video}_model keys in the tar are unused)
        if a.avid_cma_path and os.path.isfile(a.avid_cma_path):
            from asva_tpu.runtime import init_avsync_from_avid_cma
            _, report = init_avsync_from_avid_cma(self.fresh_avsync(),
                                                  a.avid_cma_path)
            ok, d = _check_report(report, allowed_fresh=r"head",
                                  allowed_unused=r"num_batches_tracked")
            self.record("avid_cma_init", PASS if ok else FAIL, d)
        else:
            self.record("avid_cma_init", MISS, "--avid_cma_path not staged")

        # 13. null text encoding (1, 77, 768)
        from asva_tpu.runtime import load_null_text_encoding
        enc = load_null_text_encoding(os.path.join(
            self.root, "pretrained",
            "openai-clip-l_null_text_encoding.pt"))
        if enc is None:
            self.record("null_text_encoding", MISS, "not staged")
        else:
            ok = tuple(enc.shape) == (1, 77, 768) and bool(
                np.isfinite(np.asarray(enc, np.float32)).all())
            self.record("null_text_encoding", PASS if ok else FAIL,
                        f"shape={tuple(enc.shape)}")

        # 14. golden fixtures (only mintable where torchaudio/diffusers exist)
        self.mint_goldens()
        return self.results

    def mint_goldens(self):
        for label, mod, tool in (
                ("mel_goldens", "torchaudio", "tools/make_mel_goldens.py"),
                ("scheduler_goldens", "diffusers",
                 "tools/make_scheduler_goldens.py")):
            try:
                __import__(mod)
            except ImportError:
                self.record(label, MISS, f"{mod} not importable here "
                            f"(run {tool} where it exists)")
                continue
            out = os.path.join(REPO, "tests", "fixtures",
                               f"{label}.npz")
            r = subprocess.run([sys.executable, os.path.join(REPO, tool),
                                "--out", out], capture_output=True, text=True)
            self.record(label, PASS if r.returncode == 0 else FAIL,
                        f"minted {out}" if r.returncode == 0
                        else r.stderr[-300:])


# ---------------------------------------------------------------------------
# fabrication: tiny artifacts in the exact published formats
# ---------------------------------------------------------------------------

def fabricate(root: str, gate: Gate):
    """Write tiny artifacts under `root` in the published key spaces."""
    import torch

    from asva_tpu.convert.jax_to_torch import export_state_dict
    from asva_tpu.convert.torch_to_jax import (avsync_key_map,
                                               clip_text_key_map,
                                               imagebind_audio_key_map,
                                               imagebind_text_key_map,
                                               imagebind_vision_key_map,
                                               unet_key_map, vae_key_map)

    def save(state, *path, fname="diffusion_pytorch_model.bin"):
        d = os.path.join(root, *path)
        os.makedirs(d, exist_ok=True)
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in state.items()}, os.path.join(d, fname))

    def prefer_huge(km):
        def f(segs):
            keys = km(segs)
            if isinstance(keys, list):
                huge = [k for k in keys if k.startswith("modality_")]
                return huge or keys
            return keys
        return f

    print("fabricating tiny artifacts under", root, flush=True)
    sd = ("pretrained", "stable-diffusion-v1-5")

    vae = export_state_dict(gate.fresh_vae()["params"], vae_key_map)
    save(vae, *sd, "vae")

    unet3d = export_state_dict(gate.fresh_unet()["params"], unet_key_map)
    # 2D SD space = the 3D space minus the _temp/_audio additions
    save({k: v for k, v in unet3d.items()
          if not re.search(r"temp|audio", k)}, *sd, "unet")

    text = export_state_dict(gate.fresh_text()["params"], clip_text_key_map)
    save(text, *sd, "text_encoder", fname="pytorch_model.bin")

    ckpt_mods = ("checkpoints", "checkpoint-40", "modules")
    save(unet3d, *ckpt_mods, "unet")
    audio = export_state_dict(gate.fresh_audio()["params"],
                              imagebind_audio_key_map)
    save(audio, *ckpt_mods, "audio_encoder", fname="pytorch_model.bin")

    # imagebind_huge: all three towers merged, modality_* key space;
    # final_layer_norm is ASVA's addition — absent from the real huge file
    huge = {}
    huge.update(export_state_dict(gate.fresh_audio()["params"],
                                  prefer_huge(imagebind_audio_key_map)))
    huge = {k: v for k, v in huge.items()
            if not k.startswith("final_layer_norm")}
    huge.update(export_state_dict(gate.fresh_imagebind("vision")["params"],
                                  prefer_huge(imagebind_vision_key_map)))
    huge.update(export_state_dict(gate.fresh_imagebind("text")["params"],
                                  prefer_huge(imagebind_text_key_map)))
    os.makedirs(os.path.join(root, "pretrained", ".checkpoints"),
                exist_ok=True)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in huge.items()},
               os.path.join(root, "pretrained", ".checkpoints",
                            "imagebind_huge.pth"))

    # FID + I3D blobs (published formats, fabricated weights)
    from tools.torch_eval_nets import mint_artifacts
    mint_artifacts(os.path.join(root, "pretrained"))

    # avsync classifier modules + a raw AVID-CMA tar
    avs = export_state_dict(gate.fresh_avsync()["params"], avsync_key_map)
    bs = export_state_dict(gate.fresh_avsync()["batch_stats"],
                           avsync_key_map)
    avs.update(bs)
    for mod in ("audio_encoder", "video_encoder", "head"):
        sub = {k[len(mod) + 1:]: v for k, v in avs.items()
               if k.startswith(mod + ".")}
        save(sub, "checkpoints", "avsync", "modules", mod,
             fname="pytorch_model.bin")
    avid = {"model": {
        "module.audio_model." + k[len("audio_encoder."):]:
            torch.from_numpy(np.ascontiguousarray(v))
        for k, v in avs.items() if k.startswith("audio_encoder.")}}
    avid["model"].update({
        "module.video_model." + k[len("video_encoder."):]:
            torch.from_numpy(np.ascontiguousarray(v))
        for k, v in avs.items() if k.startswith("video_encoder.")})
    torch.save(avid, os.path.join(root, "avid_cma.pth"))

    # null text encoding
    torch.save(torch.zeros(1, 77, 768),
               os.path.join(root, "pretrained",
                            "openai-clip-l_null_text_encoding.pt"))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default=".",
                   help="artifact root (contains pretrained/, checkpoints/)")
    p.add_argument("--checkpoint_modules_dir", default=None,
                   help=".../checkpoint-N/modules of a trained AVSyncD ckpt")
    p.add_argument("--avsync_modules_dir", default=None,
                   help=".../checkpoint-40000/modules of the AVSync "
                        "classifier")
    p.add_argument("--avid_cma_path", default=None)
    p.add_argument("--fabricate", action="store_true",
                   help="dry-run the gate against tiny fabricated artifacts")
    p.add_argument("--run_tests", action="store_true",
                   help="finish with the converter/parity pytest subset")
    args = p.parse_args()
    _force_cpu()

    if args.fabricate:
        import tempfile
        tmp = tempfile.mkdtemp(prefix="validate_weights_")
        args.root = tmp
        args.checkpoint_modules_dir = os.path.join(
            tmp, "checkpoints", "checkpoint-40", "modules")
        args.avsync_modules_dir = os.path.join(
            tmp, "checkpoints", "avsync", "modules")
        args.avid_cma_path = os.path.join(tmp, "avid_cma.pth")
        gate = Gate(args, tiny=True)
        fabricate(tmp, gate)
    else:
        gate = Gate(args, tiny=False)

    print(f"validating artifacts under {args.root}", flush=True)
    results = gate.run_all()

    if args.run_tests:
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "-q", "-x",
             "tests/test_convert_real_layouts.py", "tests/test_samplers.py",
             "tests/test_audio_frontend.py", "tests/test_eval_script_e2e.py",
             "tests/test_clip_text_parity.py"], cwd=REPO)
        results.append(("parity_test_subset", PASS if rc == 0 else FAIL, ""))
        print(f"  [{'PASS' if rc == 0 else 'FAIL':^10s}] parity_test_subset")

    n_fail = sum(1 for _, s, _ in results if s == FAIL)
    n_miss = sum(1 for _, s, _ in results if s == MISS)
    print(f"\n{len(results)} checks: {len(results) - n_fail - n_miss} pass, "
          f"{n_fail} fail, {n_miss} not staged")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
