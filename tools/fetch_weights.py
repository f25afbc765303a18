"""Artifact fetcher for real deployments (the reference auto-downloads FID
weights and the I3D torchscript blob at import time,
avgen/evaluations/models/download.py:21-55 and inception_v3.py:13; this is
the explicit, checksum-verified equivalent).

Air-gapped TPU fleets pre-stage artifacts instead — see
docs/REAL_WEIGHTS.md for the full inventory.  This tool covers the
directly-URL-addressable subset; gated artifacts (SD1.5, ImageBind, the
ASVA checkpoints) print their source and expected path.

Usage:
    python tools/fetch_weights.py --dest pretrained [--only fid,i3d]
    python tools/fetch_weights.py --list          # print inventory only
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys
import urllib.request

ARTIFACTS = {
    # name: (relative dest path, url, sha256 prefix or None)
    "fid": (
        "pt_inception-2015-12-05-6726825d.pth",
        "https://github.com/mseitzer/pytorch-fid/releases/download/"
        "fid_weights/pt_inception-2015-12-05-6726825d.pth",
        # recorded in the blob's filename (mseitzer convention)
        "6726825d",
    ),
    "i3d": (
        "i3d_torchscript.pt",
        "https://www.dropbox.com/s/ge9e5ujwgetktms/i3d_torchscript.pt?dl=1",
        None,
    ),
    "clip_bpe": (
        "bpe_simple_vocab_16e6.txt.gz",
        "https://github.com/openai/CLIP/raw/main/clip/"
        "bpe_simple_vocab_16e6.txt.gz",
        None,
    ),
}

MANUAL = {
    "sd15": ("stable-diffusion-v1-5/", "huggingface.co "
             "stable-diffusion-v1-5/stable-diffusion-v1-5 (unet, vae, "
             "text_encoder, tokenizer, scheduler subfolders)"),
    "imagebind": (".checkpoints/imagebind_huge.pth",
                  "github.com/facebookresearch/ImageBind release"),
    "asva": ("../checkpoints/...", "lzhangbj/ASVA release: AVSyncD "
             "checkpoints (milestones 37000/24000/16000) + avsync "
             "classifier checkpoint-40000"),
    "avid_cma": ("../checkpoints/avid_cma/...",
                 "AVID-CMA release (Cross-N1024 checkpoint)"),
}


def fetch(name: str, dest_dir: str) -> str:
    rel, url, sha_prefix = ARTIFACTS[name]
    dest = os.path.join(dest_dir, rel)
    if os.path.isfile(dest):
        print(f"{name}: already present at {dest}")
        return dest
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    print(f"{name}: downloading {url}")
    tmp = dest + ".part"
    urllib.request.urlretrieve(url, tmp)  # noqa: S310 - explicit https urls
    if sha_prefix:
        digest = hashlib.sha256(open(tmp, "rb").read()).hexdigest()
        if not digest.startswith(sha_prefix):
            os.remove(tmp)
            raise SystemExit(
                f"{name}: sha256 {digest[:12]}... does not start with the "
                f"expected {sha_prefix} — refusing to install")
    os.replace(tmp, dest)
    print(f"{name}: -> {dest}")
    return dest


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dest", default="pretrained")
    p.add_argument("--only", default=None,
                   help="comma-separated subset of " + ",".join(ARTIFACTS))
    p.add_argument("--list", action="store_true")
    args = p.parse_args()

    if args.list:
        for k, (rel, url, _) in ARTIFACTS.items():
            print(f"{k:10s} {rel:45s} {url}")
        for k, (rel, how) in MANUAL.items():
            print(f"{k:10s} {rel:45s} MANUAL: {how}")
        return

    names = (args.only.split(",") if args.only else list(ARTIFACTS))
    failures = []
    for name in names:
        if name not in ARTIFACTS:
            sys.exit(f"unknown artifact {name!r}; choices: "
                     f"{sorted(ARTIFACTS)}")
        try:
            fetch(name, args.dest)
        except Exception as e:  # no-network environments: report, continue
            failures.append(name)
            print(f"{name}: FAILED ({e})")
    for k, (rel, how) in MANUAL.items():
        print(f"NOTE {k}: stage manually at {args.dest}/{rel} — {how}")
    if failures:
        sys.exit(f"failed: {failures} (no network? see docs/REAL_WEIGHTS.md "
                 "for manual staging)")


if __name__ == "__main__":
    main()
