"""Dataset + loader tests over synthetic media fixtures."""
import os

import numpy as np
import pytest

from asva_tpu.data.media import media_available, write_video

pytestmark = pytest.mark.skipif(not media_available(),
                                reason="libasva_media.so not built")


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("videos")
    (root / "dog").mkdir()
    (root / "cat").mkdir()
    rng = np.random.default_rng(0)
    names = []
    for cls, name in [("dog", "a.mp4"), ("dog", "b.mp4"), ("cat", "c.mp4")]:
        n, h, w, fps = 72, 64, 80, 12.0
        frames = (rng.random((n, h, w, 3)) * 255).astype(np.uint8)
        t = np.arange(int(6.0 * 16000)) / 16000
        audio = (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)[None]
        write_video(str(root / cls / name), frames, fps, audio, 16000)
        names.append(f"{cls}/{name}")
    lst = root / "train.txt"
    lst.write_text("\n".join(names))
    # text encodings: class -> (77, 768)
    enc_path = root / "encodings.npz"
    np.savez(enc_path, **{"a dog": rng.standard_normal((77, 768)).astype(np.float32),
                          "a cat": rng.standard_normal((77, 768)).astype(np.float32)})
    import json
    mapping = root / "class_mapping.json"
    mapping.write_text(json.dumps({"dog": "a dog", "cat": "a cat"}))
    return root, str(lst), str(enc_path), str(mapping)


def test_audio_video_dataset_items(dataset_root):
    from asva_tpu.data.datasets import AudioVideoDataset
    root, lst, enc, mapping = dataset_root
    ds = AudioVideoDataset(lst, str(root), mode="train", img_size=32,
                           video_fps=6, video_num_frame=12, randflip=True,
                           class_mapping_json=mapping,
                           class_text_encoding_mapping_path=enc, seed=0)
    assert len(ds) == 3
    item = ds[0]
    assert item["video"].shape == (12, 32, 32, 3)
    assert item["video"].min() >= 0.0 and item["video"].max() <= 1.0
    assert item["waveform"].shape == (32000,)
    assert item["text_encoding"].shape == (77, 768)


def test_dataloader_batches(dataset_root):
    from asva_tpu.data.datasets import AudioVideoDataset
    from asva_tpu.data.loader import DataLoader
    root, lst, enc, mapping = dataset_root
    ds = AudioVideoDataset(lst, str(root), mode="train", img_size=32,
                           class_mapping_json=mapping,
                           class_text_encoding_mapping_path=enc, seed=0)
    dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                    drop_last=True)
    batches = list(dl)
    assert len(batches) == len(dl) == 1
    b = batches[0]
    assert b["video"].shape == (2, 12, 32, 32, 3)
    assert b["waveform"].shape == (2, 32000)


def test_multipair_dataset(dataset_root):
    from asva_tpu.data.multipair import MultiPairAVDataset
    root, lst, _, _ = dataset_root
    ds = MultiPairAVDataset(lst, str(root), mode="train", image_size=32,
                            video_fps=6, video_num_frames=4,
                            shift_time=0.2, num_clips=5,
                            sampling_type="random-compact", seed=0)
    item = ds[0]
    assert item["videos"].shape == (5, 4, 32, 32, 3)
    assert item["waveforms"].shape == (5, int(4 / 6 * 16000))
    # CLIP normalization leaves roughly zero-centered values
    assert abs(float(item["videos"].mean())) < 2.0


def test_multipair_uniform_and_center(dataset_root):
    from asva_tpu.data.multipair import MultiPairAVDataset
    root, lst, _, _ = dataset_root
    for st in ("uniform", "center-compact", "random"):
        ds = MultiPairAVDataset(lst, str(root), image_size=32,
                                video_num_frames=4, num_clips=3,
                                shift_time=0.1, sampling_type=st, seed=1)
        item = ds[1]
        assert item["videos"].shape[0] == 3


def test_determinism_across_worker_counts(dataset_root):
    """Per-item RNG is (seed, epoch, index)-derived, so batches are
    bit-identical for any num_workers (r2 VERDICT: a shared random.Random
    across pool threads made runs irreproducible)."""
    from asva_tpu.data.datasets import AudioVideoDataset
    from asva_tpu.data.loader import DataLoader
    root, lst, enc, mapping = dataset_root

    def run(workers):
        ds = AudioVideoDataset(lst, str(root), mode="train", img_size=32,
                               randflip=True, seed=7)
        dl = DataLoader(ds, batch_size=1, shuffle=True,
                        num_workers=workers, drop_last=True, seed=7)
        return [list(dl) for _ in range(2)]  # two epochs

    a, b = run(1), run(8)
    for ep_a, ep_b in zip(a, b):
        assert len(ep_a) == len(ep_b) == 3
        for ba, bb in zip(ep_a, ep_b):
            np.testing.assert_array_equal(ba["video"], bb["video"])
            np.testing.assert_array_equal(ba["waveform"], bb["waveform"])
    # epochs must differ (new clip starts) — guards against a frozen stream
    assert not np.array_equal(a[0][0]["video"], a[1][0]["video"]) or \
        not np.array_equal(a[0][0]["waveform"], a[1][0]["waveform"])


def test_multipair_determinism_across_worker_counts(dataset_root):
    from asva_tpu.data.loader import DataLoader
    from asva_tpu.data.multipair import MultiPairAVDataset

    root, lst, _, _ = dataset_root

    def run(workers):
        ds = MultiPairAVDataset(lst, str(root), mode="train", image_size=32,
                                video_num_frames=4, shift_time=0.2,
                                num_clips=3, sampling_type="random-compact",
                                seed=3)
        dl = DataLoader(ds, batch_size=1, shuffle=True,
                        num_workers=workers, drop_last=True, seed=3)
        return list(dl)

    for ba, bb in zip(run(1), run(8)):
        np.testing.assert_array_equal(ba["videos"], bb["videos"])
        np.testing.assert_array_equal(ba["waveforms"], bb["waveforms"])


def test_loader_resume_continues_data_order(dataset_root):
    """state_dict/load_state_dict resume: a restarted loader yields exactly
    the batches the crashed run never consumed (reference skips consumed
    steps within the epoch, scripts/animation_train.py:268-309)."""
    from asva_tpu.data.datasets import AudioVideoDataset
    from asva_tpu.data.loader import DataLoader
    root, lst, enc, mapping = dataset_root

    def make():
        ds = AudioVideoDataset(lst, str(root), mode="train", img_size=32,
                               randflip=True, seed=11)
        return DataLoader(ds, batch_size=1, shuffle=True, num_workers=2,
                          drop_last=True, seed=11)

    # uninterrupted truth: two full epochs of batches
    truth = []
    ref = make()
    for _ in range(2):
        truth.extend(list(ref))

    # crashed run: consume 2 batches, checkpoint the loader state
    run1 = make()
    it = iter(run1)
    consumed = [next(it), next(it)]
    saved = run1.state_dict()
    del it

    # resumed run: must continue at batch 2 of epoch 0, then epoch 1
    run2 = make()
    run2.load_state_dict(saved)
    resumed = list(run2)
    resumed.extend(list(run2))

    for ba, bb in zip(consumed + resumed, truth):
        np.testing.assert_array_equal(ba["video"], bb["video"])
    assert len(consumed) + len(resumed) == len(truth)


def test_loader_shards_equal_batch_counts(dataset_root):
    """len(dataset) % n_hosts != 0 must still give every host the SAME
    number of batches (reference DistributedSampler truncates) — unequal
    counts would pair collective steps across different epochs."""
    from asva_tpu.data.datasets import AudioVideoDataset
    from asva_tpu.data.loader import DataLoader
    root, lst, enc, mapping = dataset_root
    ds = AudioVideoDataset(lst, str(root), mode="test", img_size=32, seed=0)
    assert len(ds) >= 3
    n = 2
    counts, seen = [], []
    for host in range(n):
        dl = DataLoader(ds, batch_size=1, shuffle=True, num_workers=1,
                        drop_last=True, seed=5, shard=(host, n))
        seen.append(list(dl._indices()))
        batches = list(dl)
        assert len(batches) == len(dl)
        counts.append(len(batches))
    assert counts[0] == counts[1] == len(ds) // n
    assert not set(seen[0]) & set(seen[1])  # disjoint shards
    assert len(seen[0]) == len(seen[1])


def test_loader_reset_gives_stateless_eval_passes(dataset_root):
    """In-train eval breaks out early; reset() must make every pass see
    the SAME window from the top (without it, the persistent resume
    cursor slides the window each call until it's empty)."""
    import threading

    from asva_tpu.data.datasets import AudioVideoDataset
    from asva_tpu.data.loader import DataLoader
    root, lst, enc, mapping = dataset_root
    ds = AudioVideoDataset(lst, str(root), mode="test", img_size=32,
                           seed=3)
    dl = DataLoader(ds, batch_size=1, shuffle=False, num_workers=2,
                    drop_last=False, prefetch=1)

    def take(n):
        dl.reset()
        out = []
        for i, b in enumerate(dl):
            if i >= n:
                break
            out.append(b["video"])
        return out

    before = threading.active_count()
    first = take(2)
    second = take(2)
    assert len(first) == len(second) == 2
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)
    # early exits must not leak producer threads/pools
    assert threading.active_count() <= before + 1


def test_loader_resume_adopts_checkpoint_seed(dataset_root):
    """A cursor counts batches of the shuffle order of the SAVED seed; a
    loader restored with a different configured seed must adopt the saved
    one so fast-forward lands on the truly-unconsumed batches."""
    from asva_tpu.data.datasets import AudioVideoDataset
    from asva_tpu.data.loader import DataLoader
    root, lst, enc, mapping = dataset_root

    def make(seed):
        # cfg.seed feeds BOTH the dataset's per-item augmentation RNG and
        # the loader's shuffle order (as the train scripts do)
        ds = AudioVideoDataset(lst, str(root), mode="train", img_size=32,
                               randflip=True, seed=seed)
        return DataLoader(ds, batch_size=1, shuffle=True, num_workers=2,
                          drop_last=True, seed=seed)

    run1 = make(7)
    it = iter(run1)
    consumed = [next(it), next(it)]
    saved = run1.state_dict()
    del it

    run2 = make(8)  # operator changed the config seed before resuming
    run2.load_state_dict(saved)
    assert run2.seed == 7 and run2.dataset.seed == 7
    resumed = list(run2)
    truth = list(make(7))
    for ba, bb in zip(consumed + resumed, truth):
        np.testing.assert_array_equal(ba["video"], bb["video"])
