"""Extract the FVD I3D weights from the TorchScript blob the reference uses
(pretrained/i3d_torchscript.pt) into a plain state dict our converter can
map (asva_tpu.convert.i3d_key_map).

Run once with the blob in place:
  python tools/extract_torchscript_i3d.py \
      --blob pretrained/i3d_torchscript.pt --out pretrained/i3d_state.pt

Also auto-detects the blob's BatchNorm epsilon (the reference source says
1e-5, TF-converted blobs may carry 1e-3 — reference
avgen/evaluations/models/download.py:48-55) and writes it to a
`<out>.eps.json` sidecar which scripts/animation_eval.py consumes, so no
user flag guessing is needed (VERDICT r3 #7).
"""
import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--blob", default="pretrained/i3d_torchscript.pt")
    p.add_argument("--out", default="pretrained/i3d_state.pt")
    args = p.parse_args()

    import torch
    from asva_tpu.convert.torchscript import extract_state_and_eps
    state, eps = extract_state_and_eps(args.blob)
    torch.save(state, args.out)
    print(f"wrote {len(state)} tensors to {args.out}")
    for k in list(state)[:8]:
        print(" ", k, tuple(state[k].shape))
    sidecar = args.out + ".eps.json"
    with open(sidecar, "w") as f:
        json.dump({"bn_eps": eps, "source_blob": args.blob}, f)
    print(f"detected bn_eps={eps} -> {sidecar}"
          if eps is not None else
          f"bn_eps not detectable from the blob; wrote null to {sidecar} "
          "(animation_eval falls back to the source default 1e-5)")


if __name__ == "__main__":
    main()
