"""Numeric parity: our eval harness vs the reference's own eval.py.

Execs `/root/reference/avgen/evaluations/eval.py` plus its REAL reducer /
preprocessing helpers (dists.py, fid/compute_fid.py, fvd/compute_fvd.py,
clip/compute_clip.py, avsync/compute_avsync.py) under CPU torch, with:

  * `torchvision.transforms` shimmed onto torch.nn.functional (the tensor
    path of torchvision Resize IS F.interpolate(..., antialias=True), which
    our resize_image is parity-tested against in test_transforms.py);
  * `avgen.data.utils.load_av_clips_uniformly` shimmed to OUR decoder so
    both sides consume bit-identical clips + mels (decode itself is
    cross-checked against OpenCV in test_media.py; mel vs torchaudio is the
    separately-tracked golden gap);
  * tiny deterministic metric "nets" whose math is ONE shared numpy
    implementation wrapped for each side — so any metric-number difference
    isolates to harness logic: preprocessing (resize/crop/normalize),
    feature collection order, frame exclusion, clip pairing, std ddof,
    Frechet, RelSync/AlignSync reducers.

Asserts all ten reported metric numbers (FID, FVD, IA/IT/RelSync/AlignSync
mean+std) and the per-clip instance metrics match.  Closes VERDICT r3
"Next round #1" (reference avgen/evaluations/eval.py:28-279).
"""
import os
import sys
import types

import numpy as np
import pytest
import torch

from asva_tpu.data.media import media_available, write_video

pytestmark = pytest.mark.skipif(
    not (media_available() and os.path.isdir("/root/reference")),
    reason="needs libasva_media.so and the reference mount")

REF = "/root/reference"


# ---------------------------------------------------------------------------
# Shared tiny-net math (ONE implementation; channels-last float64 numpy).
# Both sides' "networks" call these on identically-shaped arrays, so metric
# differences can only come from the surrounding harness code.

def np_fid_features(x):                     # (n, 229, 229, 3) in [-1, 1]
    x = np.asarray(x, np.float64)
    m, s = x.mean((1, 2)), x.std((1, 2))
    d = np.abs(x[:, 1:] - x[:, :-1]).mean((1, 2))
    return np.concatenate([m, s, d[:, :2]], axis=-1)        # (n, 8)


def np_fvd_features(v):                     # (b, f, 224, 224, 3) in [-1, 1]
    v = np.asarray(v, np.float64)
    return np.concatenate([v.mean((1, 2, 3)), v.std((1, 2, 3))], -1)  # (b,6)


def np_ia_sim(frames, mels):                # (n,224,224,3) CLIP-norm, mels
    f = np.asarray(frames, np.float64)
    a = np.asarray(mels, np.float64)
    return (0.2 * f.mean((1, 2, 3)) + 0.1 * f.std((1, 2, 3))
            + 0.05 * a.mean(tuple(range(1, a.ndim))))


def np_it_sim(frames, codes):               # codes: per-sample category int
    f = np.asarray(frames, np.float64)
    return 0.15 * f.mean((1, 2, 3)) + 0.01 * np.asarray(codes, np.float64)


def np_avsync_score(mels, videos):          # videos CLIP-normalized clip
    a = np.asarray(mels, np.float64)
    v = np.asarray(videos, np.float64)
    return (0.3 * v.mean(tuple(range(1, v.ndim)))
            + 0.2 * a.std(tuple(range(1, a.ndim))))


CATEGORY_CODE = {"dog": 3, "cat": 5}


# ---------------------------------------------------------------------------
# torchvision shim: the tensor path of torchvision transforms in terms of
# torch.nn.functional (semantics per torchvision.transforms.functional).

def _make_torchvision_shim():
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    F = torch.nn.functional

    class InterpolationMode:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for fn in self.fns:
                x = fn(x)
            return x

    class Resize:
        def __init__(self, size, interpolation="bilinear", antialias=True):
            self.size = tuple(size) if not isinstance(size, int) else size
            self.mode = interpolation
            self.antialias = antialias

        def __call__(self, x):          # (n, c, h, w) float
            return F.interpolate(x, size=self.size, mode=self.mode,
                                 antialias=self.antialias)

    class CenterCrop:
        def __init__(self, size):
            self.size = (size, size) if isinstance(size, int) else tuple(size)

        def __call__(self, x):
            th, tw = self.size
            h, w = x.shape[-2:]
            y0, x0 = (h - th) // 2, (w - tw) // 2
            return x[..., y0:y0 + th, x0:x0 + tw]

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, x):
            return (x - self.mean.to(x.dtype)) / self.std.to(x.dtype)

    for k, v in dict(Compose=Compose, Resize=Resize, CenterCrop=CenterCrop,
                     Normalize=Normalize,
                     InterpolationMode=InterpolationMode).items():
        setattr(tr, k, v)
    tv.transforms = tr
    tv.set_video_backend = lambda *_: None
    return tv, tr


# ---------------------------------------------------------------------------
# torch-side tiny nets (wrap the shared numpy math; channels-first in/out).

class TorchFID:
    def __call__(self, images):            # (n, 3, 229, 229)
        x = np.moveaxis(images.detach().cpu().numpy(), 1, -1)
        return (torch.from_numpy(np_fid_features(x)),)


class TorchI3D:
    def __call__(self, videos, **kw):      # (b, 3, f, 224, 224)
        x = np.moveaxis(videos.detach().cpu().numpy(), 1, -1)
        return torch.from_numpy(np_fvd_features(x))


class TorchCLIP:
    def __call__(self, videos, audios=None, texts=None):
        frames = np.moveaxis(videos.detach().cpu().numpy(), 1, -1)
        out = {}
        if audios is not None:
            mels = np.moveaxis(audios.detach().cpu().numpy(), 1, -1)
            out["ia_sim"] = torch.from_numpy(np_ia_sim(frames, mels))
        if texts is not None:
            codes = np.array([CATEGORY_CODE[t] for t in texts])
            out["it_sim"] = torch.from_numpy(np_it_sim(frames, codes))
        return out


class TorchAVSync:
    def __call__(self, audios, videos):    # (b,1,128,204), (b,3,f,224,224)
        mels = np.moveaxis(audios.detach().cpu().numpy(), 1, -1)
        clips = np.moveaxis(videos.detach().cpu().numpy(), 1, -1)
        return torch.from_numpy(np_avsync_score(mels, clips))


def _ref_load_av_clips(video_path=None, video_fps=6, video_num_frame=12,
                       image_size=64, num_clips=1,
                       load_audio_as_melspectrogram=True, **_):
    """Feed the reference OUR decoded clips/mels (identical inputs)."""
    from asva_tpu.eval.harness import load_av_clips_uniformly
    videos, mels = load_av_clips_uniformly(
        video_path, video_fps, video_num_frame, image_size, num_clips)
    vt = torch.from_numpy(np.moveaxis(np.asarray(videos), -1, 2).copy())
    at = torch.from_numpy(np.moveaxis(np.asarray(mels), -1, 1).copy())
    return vt, at                           # (b,f,c,h,w), (b,1,128,204)


# ---------------------------------------------------------------------------
# Exec the reference eval stack with shimmed externals.

def _exec_ref_module(name, relpath, pkg=None):
    path = os.path.join(REF, relpath)
    mod = types.ModuleType(name)
    mod.__file__ = path
    mod.__package__ = pkg if pkg is not None else name.rpartition(".")[0]
    sys.modules[name] = mod
    with open(path) as f:
        src = f.read()
    exec(compile(src, path, "exec"), mod.__dict__)  # noqa: S102 ref study
    return mod


class _TorchCPUProxy:
    """`torch` with device("cuda") redirected to cpu (eval.py:47)."""

    def __getattr__(self, name):
        if name == "device":
            return lambda *_a, **_k: torch.device("cpu")
        return getattr(torch, name)


@pytest.fixture()
def ref_eval(monkeypatch):
    tv, tr = _make_torchvision_shim()
    shims = {
        "torchvision": tv,
        "torchvision.transforms": tr,
        "torchaudio": types.ModuleType("torchaudio"),
    }
    # package scaffolding + shimmed model loaders
    for pkg in ("avgen", "avgen.data", "avgen.evaluations",
                "avgen.evaluations.models", "avgen.evaluations.clip",
                "avsync", "avsync.models"):
        m = types.ModuleType(pkg)
        m.__path__ = []
        shims[pkg] = m

    data_utils = types.ModuleType("avgen.data.utils")
    data_utils.load_av_clips_uniformly = _ref_load_av_clips
    data_utils.waveform_to_melspectrogram = None  # unused in this path
    shims["avgen.data.utils"] = data_utils

    inc = types.ModuleType("avgen.evaluations.models.inception_v3")
    inc.load_inceptionv3_pretrained = lambda **_: _ToAble(TorchFID())
    dl = types.ModuleType("avgen.evaluations.models.download")
    dl.load_i3d_pretrained = lambda *_a, **_k: _ToAble(TorchI3D())
    clipm = types.ModuleType("avgen.evaluations.models.clip")
    clipm.load_clip_model = lambda **_: _ToAble(TorchCLIP())
    avsm = types.ModuleType("avsync.models.avsync_classifier")
    avsm.load_avsync_model = lambda **_: _ToAble(TorchAVSync())
    shims.update({
        "avgen.evaluations.models.inception_v3": inc,
        "avgen.evaluations.models.download": dl,
        "avgen.evaluations.models.clip": clipm,
        "avsync.models.avsync_classifier": avsm,
    })
    for name, mod in shims.items():
        monkeypatch.setitem(sys.modules, name, mod)

    # REAL reference reducers/preprocessing, exec'd from source
    _exec_ref_module("avgen.evaluations.dists", "avgen/evaluations/dists.py")
    _exec_ref_module("avgen.evaluations.fid",
                     "avgen/evaluations/fid/compute_fid.py",
                     pkg="avgen.evaluations.fid")
    _exec_ref_module("avgen.evaluations.fvd",
                     "avgen/evaluations/fvd/compute_fvd.py",
                     pkg="avgen.evaluations.fvd")
    _exec_ref_module("avgen.evaluations.clip.compute_clip",
                     "avgen/evaluations/clip/compute_clip.py")
    sys.modules["avgen.evaluations.clip"].compute_clip_consistency = \
        sys.modules["avgen.evaluations.clip.compute_clip"].\
        compute_clip_consistency
    _exec_ref_module("avgen.evaluations.avsync",
                     "avgen/evaluations/avsync/compute_avsync.py",
                     pkg="avgen.evaluations.avsync")

    mod = _exec_ref_module("asva_ref_eval", "avgen/evaluations/eval.py")
    mod.torch = _TorchCPUProxy()            # device("cuda") -> cpu
    try:
        yield mod
    finally:
        for name in list(sys.modules):
            if name.startswith(("avgen", "avsync", "asva_ref_eval")):
                sys.modules.pop(name, None)


class _ToAble:
    """Minimal .to(...)-chainable wrapper around a callable 'net'."""

    def __init__(self, fn):
        self.fn = fn

    def to(self, *a, **k):
        return self

    def __call__(self, *a, **k):
        return self.fn(*a, **k)


# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def eval_tree(tmp_path_factory):
    rng = np.random.default_rng(7)
    gt_root = tmp_path_factory.mktemp("gt")
    gen_root = tmp_path_factory.mktemp("gen")
    names = ["dog/x.mp4", "cat/y.mp4"]
    t = np.arange(int(3.0 * 16000)) / 16000
    for vi, name in enumerate(names):
        audio = (0.3 * np.sin(2 * np.pi * (220 + 60 * vi) * t)
                 + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
        frames = (rng.random((18, 64, 64, 3)) * 255).astype(np.uint8)
        (gt_root / name.split("/")[0]).mkdir(exist_ok=True)
        write_video(str(gt_root / name), frames, 6.0, audio[None], 16000)
        stem = name.replace(".mp4", "")
        (gen_root / name.split("/")[0]).mkdir(exist_ok=True)
        for k in range(2):
            gframes = (rng.random((12, 64, 64, 3)) * 255).astype(np.uint8)
            write_video(str(gen_root / f"{stem}_clip-{k:02d}.mp4"),
                        gframes, 6.0, audio[None, :32000], 16000)
    return str(gt_root), str(gen_root), names


def test_metric_numbers_match_reference_eval(ref_eval, eval_tree, tmp_path):
    import jax.numpy as jnp  # noqa: F401  (keep jax initialized on cpu)
    from asva_tpu.eval.harness import EvalModels, evaluate_generation_results

    gt_root, gen_root, names = eval_tree
    # NOTE reference quirk: eval.py:115 sorts groundtruth_video_names in
    # place but NOT groundtruth_categories, so unsorted input misaligns
    # every (video, category) pair.  Its own callers pass sorted lists; our
    # harness pairs by name->category dict (order-robust).  Pass sorted
    # names so both sides agree on the pairing being tested.
    names = sorted(names)
    cats = [n.split("/")[0] for n in names]

    # ---- reference side (exec'd source, tiny torch nets) ----
    ref_out = ref_eval.evaluate_generation_results(
        gt_root, list(names), list(cats), 2, gen_root,
        str(tmp_path / "ref" / "result.json"), 64,
        video_fps=6, video_num_frame=12,
        record_instance_metrics=True, dtype=torch.float32)

    # ---- our side (same shared net math behind EvalModels) ----
    models = EvalModels(
        fid_features=lambda x: np_fid_features(np.asarray(x)),
        fvd_features=lambda v: np_fvd_features(np.asarray(v)),
        avsync_score=lambda m, v: np_avsync_score(np.asarray(m),
                                                  np.asarray(v)),
        ia_sim=lambda f, m: np_ia_sim(np.asarray(f), np.asarray(m)),
        it_sim=lambda f, ids: np_it_sim(np.asarray(f),
                                        np.asarray(ids)[:, 0]),
    )
    ours = evaluate_generation_results(
        models, gt_root, list(names), list(cats), num_clips_per_video=2,
        generated_video_root=gen_root,
        result_save_path=str(tmp_path / "ours" / "result.json"),
        image_size=64, video_fps=6, video_num_frame=12,
        text_ids_for_category=lambda c: np.full(
            (77,), CATEGORY_CODE[c], np.int32),
        record_instance_metrics=True)

    keys = ["FID", "FVD", "IA_mean", "IA_std", "IT_mean", "IT_std",
            "RelSync_mean", "RelSync_std", "AlignSync_mean",
            "AlignSync_std"]
    deltas = {k: abs(ours[k] - ref_out[k]) for k in keys}
    for k in keys:
        assert np.isclose(ours[k], ref_out[k], rtol=1e-4, atol=1e-6), \
            f"{k}: ours={ours[k]!r} ref={ref_out[k]!r} deltas={deltas}"

    # per-clip RelSync / AlignSync pairing (keys differ: ref uses the glob
    # path suffix, ours the basename — compare by basename)
    ref_inst = {os.path.basename(k): v
                for k, v in ref_out["instance_metrics"].items()}
    for key, rec in ours["instance_metrics"].items():
        for metric in ("RelSync", "AlignSync", "IA"):
            assert np.isclose(rec[metric], ref_inst[key][metric],
                              rtol=1e-4, atol=1e-6), (key, metric)
