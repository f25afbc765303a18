"""On-device profile of the full UNet eval via jax.profiler (WORKS through
the axon tunnel — device events land in the trace with per-op
hlo_category, duration and bytes_accessed; this is the ONLY reliable
in-context per-op breakdown, since chained micro-benches carry ~0.65
ms/iter harness overhead and standalone modules compile differently than
in-program).

Run: python tools/trace_eval.py [--batch 4]
Prints per-eval time grouped by HLO category plus the top ops.

r2 findings at batch 4 (CFG pair x 2 clips), 94.7 ms/eval:
  convolution fusion 51.7 ms (convs are ~half the model FLOPs and run at
  84-139 TFLOPS — up-path concat convs with 640/960 in-channels are the
  heavy ones; an input-materialization barrier experiment changed
  nothing), pallas custom-calls 28.2 ms (attn 19.6, geglu 8.6),
  formatting/copies/slices ~8.6 ms.  Average ~79 TFLOPS = 40% of v5e
  peak: the eval is COMPUTE-dominated after the r2 kernel work, no longer
  HBM-bound.
"""
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from asva_tpu.models.imagebind_audio import segment_token_indices
    from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig
    from __graft_entry__ import _materialize

    B = 4
    if "--batch" in sys.argv:
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    F, N_ITERS = 12, 3
    DT = jnp.bfloat16
    unet = AudioUNet3D(UNet3DConfig(), dtype=DT)
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.standard_normal((B, F, 32, 32, 4)) * 0.1, DT)
    t = jnp.zeros((B,), jnp.int32)
    text = jnp.asarray(rng.standard_normal((B, 77, 768)) * 0.05, DT)
    audio = jnp.asarray(rng.standard_normal((B, 229, 768)) * 0.05, DT)
    idx = jnp.asarray(segment_token_indices(F, (12, 19)))
    params = _materialize(jax.eval_shape(lambda: unet.init(
        jax.random.PRNGKey(0), sample, t, text, audio, None, idx)))
    fn = jax.jit(lambda p, s: unet.apply(p, s, t, text, audio, None, idx))
    jax.block_until_ready(fn(params, sample))

    tracedir = tempfile.mkdtemp(prefix="asva_trace_")
    with jax.profiler.trace(tracedir):
        for _ in range(N_ITERS):
            out = fn(params, sample)
        jax.block_until_ready(out)

    path = sorted(glob.glob(f"{tracedir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [e for e in ev if e.get("ph") == "X"
           and pids.get(e.get("pid", -1), "") == "/device:TPU:0"
           and not e["name"].startswith("jit")]

    cat = collections.Counter()
    byts = collections.Counter()
    for e in dev:
        c = e.get("args", {}).get("hlo_category", "?")
        cat[c] += e["dur"]
        byts[c] += int(e.get("args", {}).get("bytes_accessed", 0))
    total = sum(cat.values()) / (N_ITERS * 1e3)
    print(f"batch {B}: {total:.2f} ms/eval   (trace: {path})")
    print(f"{'category':28s} {'ms/eval':>8s} {'GB/eval':>9s}")
    for c, d in cat.most_common(14):
        print(f"{c[:28]:28s} {d/(N_ITERS*1e3):8.2f} "
              f"{byts[c]/(N_ITERS*1e9):9.3f}")

    ops = collections.Counter()
    for e in dev:
        ops[e["name"]] += e["dur"]
    print("\ntop ops:")
    for nm, d in ops.most_common(15):
        print(f"{d/(N_ITERS*1e3):8.3f} ms  {nm[:70]}")


if __name__ == "__main__":
    main()
