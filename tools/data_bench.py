"""Host input-pipeline throughput: can the data layer outrun the chip?

The reference's training bottleneck is per-item ffmpeg decode in torch
DataLoader workers (SURVEY §3.2 note).  Our path is the C++ libav layer
(released-GIL decode, data/media/src/media_io.cc) + threaded loader; the
mel is computed ON DEVICE (ops/mel.py) so host work is decode + resize +
polyphase resample only.

Synthesizes real mp4+AAC fixtures, then measures:
  * AudioVideoDataset items/s (AVSyncD training items: 12 frames @ 256^2
    + 2 s waveform) through DataLoader
  * AudioVideoAlignedMultiPairDataset items/s (sync-classifier items:
    21 shifted clips decoded from ONE span, 21 mels' worth of audio)

Prints one JSON line per dataset with items/s, the per-chip demand of the
measured train step (steps/s x batch), and the headroom ratio per host
core (TPU VMs have tens of cores; this box has few).

Usage: python tools/data_bench.py [--items N] [--workers W]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from asva_tpu.data.datasets import AudioVideoDataset  # noqa: E402
from asva_tpu.data.loader import DataLoader  # noqa: E402
from asva_tpu.data.media import media_available, write_video  # noqa: E402
from asva_tpu.data.multipair import MultiPairAVDataset  # noqa: E402

# measured on v5e-1 (bench.py --train / --sync); used only to report
# headroom, re-measure if the step time changes materially
ANIMATION_DEMAND = 2.40 * 4     # steps/s x per-chip batch
SYNC_DEMAND = 4.36 * 4          # steps/s x per-chip batch (each item = 21
#                                 clips; the dataset item IS the 21-tuple)


def synth_videos(root: str, n: int, seconds: float = 8.0, fps: float = 12.0,
                 size=(270, 360)) -> list:
    """n mp4s with AAC audio, long enough for the multipair span
    (clip_duration + (num_clips-1)*shift_time = 6 s at the AVSync protocol
    settings) plus random-start headroom."""
    h, w = size
    names = []
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * 16000)) / 16000
    for i in range(n):
        nf = int(seconds * fps)
        base = rng.integers(0, 160, (4, 6, 3), np.uint8)
        big = np.kron(base, np.ones((h // 4 + 1, w // 6 + 1, 1), np.uint8))
        frames = np.empty((nf, h, w, 3), np.uint8)
        for f in range(nf):
            frames[f] = np.roll(big[:h, :w], f * 3, axis=1) + f
        audio = (0.4 * np.sin(2 * np.pi * (300 + 40 * i) * t)
                 ).astype(np.float32)[None]
        name = f"cls{i % 3}/v{i:03d}.mp4"
        path = os.path.join(root, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        write_video(path, frames, fps, audio, 16000)
        names.append(name)
    return names


def bench_loader(loader, n_items_per_batch: int, demand: float, label: str,
                 workers: int) -> dict:
    if len(loader) < 2:
        out = {"error": f"{label}: need >= 2 batches to bench "
                        f"(have {len(loader)}; raise --items)"}
        print(json.dumps(out))
        return out
    # warm one batch (thread pool spin-up, first-open container probing)
    it = iter(loader)
    next(it)
    t0 = time.perf_counter()
    n = 0
    for batch in it:
        n += n_items_per_batch
    dt = time.perf_counter() - t0
    cores = os.cpu_count() or 1
    rate = n / dt
    out = {
        "metric": f"{label} host input items/s ({workers} workers, "
                  f"{cores} cores)",
        "value": round(rate, 3),
        "unit": "items/sec",
        "per_core": round(rate / cores, 3),
        "chip_demand_items_per_sec": demand,
        "cores_to_feed_one_chip": round(demand / (rate / cores), 1),
    }
    print(json.dumps(out))
    return out


def gil_probe(dataset, seconds: float, label: str) -> dict:
    """Fraction of the item wall during which the GIL is UNAVAILABLE to
    other threads (a sleeping sampler thread integrates its reacquisition
    excess; near-zero CPU load, so the decode runs at full speed).

    This is the thread-scaling ceiling: aggregate thread throughput caps
    at ~1/(gil_fraction).  Measured r4 on the synthetic fixtures:
    multipair ~69% (big numpy stacks/copies hold the GIL; single holds up
    to ~1.8 s) -> threads CANNOT feed a chip at any core count; the
    process worker_mode exists because of this number.  AVSyncD item ~45%
    -> threads scale to ~2x, usually enough for its small demand."""
    import threading
    import time
    stop = threading.Event()
    stats = {"w": 0.0}

    def sampler():
        while not stop.is_set():
            t0 = time.perf_counter()
            time.sleep(0.001)
            stats["w"] += max(0.0, time.perf_counter() - t0 - 0.001)

    th = threading.Thread(target=sampler)
    th.start()
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < seconds:
        dataset[n % len(dataset)]
        n += 1
    wall = time.perf_counter() - t0
    stop.set()
    th.join()
    # idle baseline of the same sampler (scheduler jitter on a loaded box)
    stop2, base = threading.Event(), {"w": 0.0}

    def sampler2():
        while not stop2.is_set():
            t0 = time.perf_counter()
            time.sleep(0.001)
            base["w"] += max(0.0, time.perf_counter() - t0 - 0.001)

    th2 = threading.Thread(target=sampler2)
    th2.start()
    time.sleep(2.0)
    stop2.set()
    th2.join()
    frac = max(0.0, stats["w"] / wall - base["w"] / 2.0)
    out = {"metric": f"{label} GIL-unavailable fraction", "value":
           round(frac, 3), "unit": "fraction of item wall",
           "item_sec": round(wall / n, 3),
           "thread_scaling_ceiling": round(1.0 / max(frac, 1e-3), 1)}
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=24)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--worker_mode", default="thread",
                    choices=["thread", "process"])
    ap.add_argument("--gil_probe", action="store_true",
                    help="measure the GIL-held fraction of one item "
                         "instead of loader throughput")
    args = ap.parse_args()
    if not media_available():
        print(json.dumps({"error": "libasva_media.so not built"}))
        return 1

    with tempfile.TemporaryDirectory() as root:
        names = synth_videos(root, args.items)
        lst = os.path.join(root, "train.txt")
        with open(lst, "w") as f:
            f.write("\n".join(names))

        ds = AudioVideoDataset(lst, root, mode="train", img_size=256,
                               randflip=True, seed=0)
        mp = MultiPairAVDataset(
            lst, root, mode="train", num_clips=21, shift_time=0.2,
            video_fps=6, video_num_frames=12, image_size=224,
            sampling_type="random-compact", seed=0)
        if args.gil_probe:
            ds[0], mp[0]   # warm container probing out of the measurement
            gil_probe(ds, 6.0, "AVSyncD item")
            gil_probe(mp, 10.0, "multipair item")
            return 0

        loader = DataLoader(ds, args.batch, shuffle=True,
                            num_workers=args.workers,
                            worker_mode=args.worker_mode)
        bench_loader(loader, args.batch, ANIMATION_DEMAND,
                     f"AVSyncD train (12f@256^2 + 2s wav, "
                     f"{args.worker_mode})", args.workers)
        loader.close()

        mp_loader = DataLoader(mp, args.batch, shuffle=True,
                               num_workers=args.workers,
                               worker_mode=args.worker_mode)
        bench_loader(mp_loader, args.batch, SYNC_DEMAND,
                     f"AVSync multipair (21 clips/item, "
                     f"{args.worker_mode})", args.workers)
        mp_loader.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
