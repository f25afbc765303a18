"""Generate the null ("") CLIP text encoding the trainer/pipeline consume.

Reference artifact: pretrained/openai-clip-l_null_text_encoding.pt — the
(1, 77, 768) last_hidden_state of the empty prompt through SD1.5's CLIP
text encoder.  Run once after placing the SD1.5 checkpoint under
pretrained/stable-diffusion-v1-5/.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sd_root", default="pretrained/stable-diffusion-v1-5")
    p.add_argument("--out", default="pretrained/"
                   "openai-clip-l_null_text_encoding.npy")
    args = p.parse_args()

    import numpy as np
    from asva_tpu.models.clip_text import tokenize
    from asva_tpu.runtime import build_text_encoder

    model, params = build_text_encoder(
        weights_dir=os.path.join(args.sd_root, "text_encoder"))
    ids = tokenize([""], tokenizer_path=os.path.join(args.sd_root,
                                                     "tokenizer"))
    enc = np.asarray(model.apply(params, ids))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.save(args.out, enc)
    print(f"wrote {args.out} shape={enc.shape}")


if __name__ == "__main__":
    main()
