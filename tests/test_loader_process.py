"""Process-worker DataLoader mode: shm-slab decode equivalence vs thread
mode (VERDICT r3 #6 — the 21-clip multipair item is ~69% GIL-serialized,
measured by tools/data_bench.py --gil_probe, so thread workers cannot feed
a chip at any core count; fork workers writing into shared-memory slabs
can)."""
import numpy as np
import pytest

from asva_tpu.data.loader import DataLoader


class ToyDS:
    """(seed, epoch, index)-deterministic items, like the real datasets."""

    def __init__(self, n=13, seed=0):
        self.n, self.seed, self.epoch = n, seed, 0

    def __len__(self):
        return self.n

    def set_epoch(self, e):
        self.epoch = e

    def __getitem__(self, i):
        rng = np.random.default_rng((self.seed, self.epoch, i))
        return {"x": rng.standard_normal((4, 6)).astype(np.float32),
                "y": np.int64(i)}


@pytest.fixture
def procloader():
    made = []

    def make(**kw):
        dl = DataLoader(ToyDS(), 4, shuffle=True, seed=7,
                        worker_mode="process", **kw)
        made.append(dl)
        return dl

    yield make
    for dl in made:
        dl.close()


def test_process_mode_matches_thread_mode_across_epochs(procloader):
    lt = DataLoader(ToyDS(), 4, shuffle=True, num_workers=3, seed=7)
    lp = procloader(num_workers=3)
    for _ in range(2):   # epoch 0 and 1 (shuffle orders differ per epoch)
        bt = [{k: v.copy() for k, v in b.items()} for b in lt]
        bp = [{k: v.copy() for k, v in b.items()} for b in lp]
        assert len(bt) == len(bp) == 3
        for a, b in zip(bt, bp):
            np.testing.assert_array_equal(a["x"], b["x"])
            np.testing.assert_array_equal(a["y"], b["y"])
    assert lt.state_dict() == lp.state_dict()


def test_process_mode_resume_fast_forward(procloader):
    lp = procloader(num_workers=2)
    lp.load_state_dict({"epoch": 0, "cursor": 1, "seed": 7})
    got = [b["y"].copy() for b in lp]
    want = [b["y"].copy()
            for b in DataLoader(ToyDS(), 4, shuffle=True, num_workers=2,
                                seed=7)][1:]
    np.testing.assert_array_equal(np.stack(got), np.stack(want))


def test_process_mode_worker_error_propagates_and_pool_survives(tmp_path):
    class BadDS(ToyDS):
        def __getitem__(self, i):
            if i == 5:
                raise ValueError("boom")
            return super().__getitem__(i)

    lb = DataLoader(BadDS(), 4, shuffle=False, num_workers=2,
                    worker_mode="process")
    try:
        with pytest.raises(RuntimeError, match="boom"):
            list(lb)
        # early-exit mid-epoch then reuse the same pool
        lg = DataLoader(ToyDS(), 4, shuffle=False, num_workers=2,
                        worker_mode="process")
        try:
            it = iter(lg)
            next(it)
            it.close()
            assert len(list(lg)) == 2   # cursor advanced past batch 0
        finally:
            lg.close()
    finally:
        lb.close()


def test_cpu_backend_batches_are_safe_copies(procloader):
    """On the cpu jax backend device_put ALIASES aligned numpy memory, so
    yielded batches must be copies (zero_copy='auto'): holding batch k
    while k+1..k+n stream through recycled slabs must not corrupt it."""
    lp = procloader(num_workers=2, prefetch=1)   # tiny ring -> fast reuse
    held = None
    for i, b in enumerate(lp):
        if i == 0:
            held = b
            expect = {k: v.copy() for k, v in b.items()}
    np.testing.assert_array_equal(held["x"], expect["x"])
    np.testing.assert_array_equal(held["y"], expect["y"])


def test_process_mode_multipair_media_items(tmp_path):
    """End-to-end through the C++ decode + shm slabs: the real multipair
    dataset (the workload process mode exists for) yields identical batches
    in both modes."""
    from asva_tpu.data.media import media_available, write_video
    from asva_tpu.data.multipair import MultiPairAVDataset
    if not media_available():
        pytest.skip("libasva_media.so not built")
    rng = np.random.default_rng(3)
    t = np.arange(int(5.0 * 16000)) / 16000
    names = []
    for i in range(2):
        frames = (rng.random((40, 48, 64, 3)) * 255).astype(np.uint8)
        audio = (0.3 * np.sin(2 * np.pi * (250 + 99 * i) * t)
                 ).astype(np.float32)[None]
        name = f"v{i}.mp4"
        write_video(str(tmp_path / name), frames, 8.0, audio, 16000)
        names.append(name)
    (tmp_path / "train.txt").write_text("\n".join(names))

    def make(mode):
        ds = MultiPairAVDataset(str(tmp_path / "train.txt"), str(tmp_path),
                                mode="train", num_clips=3, shift_time=0.2,
                                video_fps=6, video_num_frames=4,
                                image_size=32, seed=5)
        return DataLoader(ds, 2, shuffle=True, num_workers=2, seed=5,
                          worker_mode=mode)

    lt, lp = make("thread"), make("process")
    try:
        bt = [{k: np.copy(v) for k, v in b.items()} for b in lt]
        bp = [{k: np.copy(v) for k, v in b.items()} for b in lp]
        assert len(bt) == len(bp) == 1
        for key in bt[0]:
            np.testing.assert_array_equal(bt[0][key], bp[0][key])
    finally:
        lp.close()
