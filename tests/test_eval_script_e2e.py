"""Metric-net truth validation + scripts/animation_eval.py end-to-end.

Closes the r2 gap: the FID/FVD converters and flax nets are proven against
the reference's OWN torch implementations, runnable in-sandbox:

* I3D truth = /root/reference/avgen/evaluations/models/pytorch_i3d.py
  (`InceptionI3d`), exec'd from source and `torch.jit.trace`d into a REAL
  torchscript blob whose state dict carries the real pytorch-i3d key names
  — resolving convert/torch_to_jax.py:i3d_key_map's candidate schemes.
* FID truth = the fid_inception_v3 graph
  (reference avgen/evaluations/models/inception_v3.py:184-208) rebuilt in
  plain torch (tools/torch_eval_nets.py) with torchvision's exact module
  tree, i.e. the published pt_inception-2015-12-05-6726825d.pth key space.

Asserted here: converter reports 0 fresh / 0 meaningfully-unused keys,
forward parity within fp32 tolerance, and the full animation_eval.py CLI
runs gen-tree -> result.json on those artifacts without the random-net
refusal path triggering.
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from asva_tpu.convert import convert_state_dict, load_torch_state  # noqa: E402
from asva_tpu.convert.torch_to_jax import (i3d_key_map,  # noqa: E402
                                           inception_v3_key_map)
from asva_tpu.data.media import media_available, write_video  # noqa: E402
from asva_tpu.models.evalnets import InceptionI3D, InceptionV3FID  # noqa: E402

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    from tools.torch_eval_nets import mint_artifacts
    d = str(tmp_path_factory.mktemp("evalnet_artifacts"))
    return mint_artifacts(d), d


def _assert_clean_report(report, label, allowed_unused=()):
    assert report["fresh"] == [], \
        f"{label}: {len(report['fresh'])} unconverted params, " \
        f"e.g. {report['fresh'][:5]}"
    bad_unused = [k for k in report["unused"]
                  if not k.endswith("num_batches_tracked")
                  and not any(k.startswith(p) for p in allowed_unused)]
    assert bad_unused == [], f"{label}: unused torch keys {bad_unused[:8]}"


def test_fid_converter_and_forward_parity(artifacts, rng):
    paths, _ = artifacts
    from tools.torch_eval_nets import FIDInceptionV3Torch

    net = InceptionV3FID()
    fvars = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 229, 229, 3)))
    state = load_torch_state(paths["fid"])
    fvars, report = convert_state_dict(fvars, state, inception_v3_key_map)
    # `fc` exists in the published blob but FID uses pool3 features only
    _assert_clean_report(report, "fid_inception_v3", allowed_unused=("fc.",))

    # torch truth: round-trip the artifact through the replica (strict)
    tnet = FIDInceptionV3Torch()
    tnet.load_state_dict(
        {k: torch.as_tensor(v) for k, v in state.items()}, strict=True)
    tnet.eval()

    x = rng.standard_normal((2, 229, 229, 3)).astype(np.float32).clip(-1, 1)
    ours = np.asarray(net.apply(fvars, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert ours.shape == theirs.shape == (2, 2048)
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours, theirs, atol=2e-3 * max(scale, 1.0),
                               rtol=2e-3)


def test_i3d_converter_and_forward_parity(artifacts, rng):
    paths, _ = artifacts
    blob = torch.jit.load(paths["i3d"], map_location="cpu").eval()
    state = {k: v.float().numpy() for k, v in blob.state_dict().items()}

    net = InceptionI3D()  # bn_eps default 1e-5 == reference pytorch_i3d
    ivars = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 224, 224, 3)))
    ivars, report = convert_state_dict(ivars, state, i3d_key_map)
    _assert_clean_report(report, "fvd_i3d")

    v = rng.standard_normal((1, 12, 224, 224, 3)).astype(np.float32)
    v = np.clip(v, -1, 1)
    ours = np.asarray(net.apply(ivars, jnp.asarray(v)))
    with torch.no_grad():
        theirs = blob(
            torch.from_numpy(v.transpose(0, 4, 1, 2, 3))).numpy()
    assert ours.shape == theirs.shape == (1, 400)
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours, theirs, atol=2e-3 * max(scale, 1.0),
                               rtol=2e-3)


@pytest.mark.parametrize("frames", [16, 24])
def test_i3d_sliding_window_head_parity(rng, frames):
    """Frame counts beyond the 12-frame protocol: the head's
    AvgPool3d([2,7,7], stride 1) slides over the temporal axis (f=24
    reaches the head with t'=3 -> 2 windows, where a global temporal mean
    diverges).  Truth = the reference's own InceptionI3d exec'd from
    source (pytorch_i3d.py:280-318)."""
    from tools.torch_eval_nets import make_reference_i3d
    tnet = make_reference_i3d(seed=7)
    state = {k: v.float().numpy() for k, v in tnet.state_dict().items()}

    net = InceptionI3D()
    ivars = net.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, frames, 224, 224, 3)))
    ivars, report = convert_state_dict(ivars, state, i3d_key_map)
    _assert_clean_report(report, "fvd_i3d_sliding")

    v = rng.standard_normal((1, frames, 224, 224, 3)).astype(np.float32)
    v = np.clip(v, -1, 1)
    ours = np.asarray(net.apply(ivars, jnp.asarray(v)))
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(v.transpose(0, 4, 1, 2, 3))).numpy()
    assert ours.shape == theirs.shape == (1, 400)
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours, theirs, atol=2e-3 * max(scale, 1.0),
                               rtol=2e-3)


@pytest.mark.skipif(not media_available(), reason="media layer not built")
def test_animation_eval_script_e2e(artifacts, tmp_path, monkeypatch, rng):
    """Full CLI: synthetic GT/generated clip tree + minted metric-net
    artifacts -> result.json with finite FID/FVD and no random-net label."""
    _, art_dir = artifacts

    fps, f = 6, 12
    sr = 16000

    def clip(seed, nframes, size=48):
        r = np.random.default_rng(seed)
        frames = r.integers(0, 255, (nframes, size, size, 3),
                            dtype=np.uint8)
        t = np.arange(int(sr * nframes / fps)) / sr
        audio = (0.3 * np.sin(2 * np.pi * (200 + 50 * seed) * t))[None]
        return frames, audio.astype(np.float32)

    ds = tmp_path / "datasets" / "AVSync15"
    gt_dir = ds / "videos" / "dog"
    gt_dir.mkdir(parents=True)
    names = ["dog/a.mp4", "dog/b.mp4"]
    (ds / "test.txt").write_text("".join(n + "\n" for n in names))
    for i, n in enumerate(names):
        frames, audio = clip(i, 18)  # 3 s GT
        write_video(str(ds / "videos" / n), frames, float(fps), audio, sr)

    exp = tmp_path / "exp"
    gen_root = (exp / "evaluations" / "checkpoint-5" / "AG-4.0_TG-1.0" /
                "seed-0" / "videos" / "dog")
    gen_root.mkdir(parents=True)
    for i, n in enumerate(names):
        stem = os.path.basename(n).replace(".mp4", "")
        for k in range(3):
            frames, audio = clip(10 + 3 * i + k, f)  # 2 s generated clips
            write_video(str(gen_root / f"{stem}_clip-{k:02d}.mp4"),
                        frames, float(fps), audio, sr)

    argv = ["animation_eval.py",
            "--exp_root", str(exp), "--checkpoint", "5",
            "--dataset", "AVSync15", "--dataset_root",
            str(tmp_path / "datasets"),
            "--image_size", "64", "64",
            "--eval_fid", "--eval_fvd",
            "--pretrained_root", art_dir]
    monkeypatch.setattr(sys, "argv", argv)
    import animation_eval
    animation_eval.main()

    result_path = str(gen_root.parent).replace("/videos", "/result.json")
    with open(result_path) as fh:
        result = json.load(fh)
    assert "RANDOM_WEIGHT_NETS" not in result
    assert np.isfinite(result["FID"]) and result["FID"] >= 0
    assert np.isfinite(result["FVD"]) and result["FVD"] >= 0
    # extraction side-product of the torchscript blob (script :102-112)
    assert os.path.isfile(os.path.join(art_dir, "i3d_state.pt"))
