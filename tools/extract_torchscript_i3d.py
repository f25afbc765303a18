"""Extract the FVD I3D weights from the TorchScript blob the reference uses
(pretrained/i3d_torchscript.pt) into a plain state dict our converter can
map (asva_tpu.convert.i3d_key_map).

Run once with the blob in place:
  python tools/extract_torchscript_i3d.py \
      --blob pretrained/i3d_torchscript.pt --out pretrained/i3d_state.pt
"""
import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--blob", default="pretrained/i3d_torchscript.pt")
    p.add_argument("--out", default="pretrained/i3d_state.pt")
    args = p.parse_args()

    import torch
    module = torch.jit.load(args.blob, map_location="cpu")
    state = {k: v.float() for k, v in module.state_dict().items()}
    torch.save(state, args.out)
    print(f"wrote {len(state)} tensors to {args.out}")
    for k in list(state)[:8]:
        print(" ", k, tuple(state[k].shape))


if __name__ == "__main__":
    main()
