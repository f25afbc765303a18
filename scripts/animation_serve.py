"""AVSyncD serving daemon: load the model stack once, keep the compiled
denoise program warm, answer generation requests over HTTP.

A production-shaped entry the reference lacks (its only inference entries
are one-shot scripts that pay model build + compile per invocation; on
TPU the first compile of the scan program is minutes — amortizing it
across requests is the difference between a demo and a service).

    python scripts/animation_serve.py --port 8765 \
        --checkpoint_modules_dir exps/run/ckpts/checkpoint-37000/modules \
        [--warmup]   # pre-compile the default-shape program before serving

Endpoints:
  GET  /healthz    -> {"ok": true, "requests": N, "warm": true|false}
  POST /generate   -> body JSON:
        {"image_path": ..., "audio_path": ..., "video_path": ...,
         "category_text_encoding_path": ..., "num_clips": 3,
         "num_inference_steps": 50, "audio_guidance_scale": 4.0,
         "text_guidance_scale": 1.0, "sampler": "plms", "seed": 0,
         "save_template": "/tmp/out"}
     -> {"ok": true, "outputs": [...mp4 paths...], "latency_s": ...}

Requests are served sequentially (one chip, one compiled program; batch-2
per-clip optimum is already exploited inside generate_videos' clip
batching).  Shape-compatible requests reuse the compiled program via the
pipeline's program cache; a new (steps, sampler, cfg) combination
triggers one compile, then is cached too.
"""
import argparse
import json
import os
import sys
import threading
import time
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_pipeline(args):
    from asva_tpu.runtime import load_animation_pipeline
    unet_config = None
    n_segment = args.video_num_frame
    if args.config_file:
        from asva_tpu.config import AnimationJobConfig
        cfg = AnimationJobConfig.from_yaml(args.config_file)
        unet_config = cfg.unet
        n_segment = cfg.n_segment
    kwargs = dict(
        checkpoint_modules_dir=args.checkpoint_modules_dir or None,
        sd_root=args.sd_root or None,
        null_text_encoding_path=args.null_text_encoding_path or None,
        n_segment=n_segment)
    if unet_config is not None:
        kwargs["unet_config"] = unet_config
    return load_animation_pipeline(**kwargs), n_segment


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--checkpoint_modules_dir", default=None)
    p.add_argument("--sd_root", default="pretrained/stable-diffusion-v1-5")
    p.add_argument("--null_text_encoding_path",
                   default="pretrained/openai-clip-l_null_text_encoding.pt")
    p.add_argument("--config_file", default=None,
                   help="optional train-style YAML; model.unet/.audio_encoder "
                        "override the full-size defaults")
    p.add_argument("--image_size", type=int, nargs=2, default=[256, 256])
    p.add_argument("--video_fps", type=int, default=6)
    p.add_argument("--video_num_frame", type=int, default=12)
    p.add_argument("--warmup", action="store_true",
                   help="compile the default-shape program before serving "
                        "(synthetic inputs; first request is then fast)")
    p.add_argument("--warmup_steps", type=int, default=50)
    p.add_argument("--warmup_clips", type=int, default=3,
                   help="batch size to pre-compile (= the num_clips a "
                        "default request stacks into one call)")
    p.add_argument("--max_requests", type=int, default=0,
                   help="exit after N requests (0 = serve forever); for "
                        "smoke tests")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from asva_tpu.pipelines.generate import generate_videos

    t0 = time.time()
    pipeline, n_segment = build_pipeline(args)
    print(f"[serve] models loaded in {time.time() - t0:.1f}s "
          f"(n_segment={n_segment})", flush=True)

    state = {"requests": 0, "warm": False}
    lock = threading.Lock()   # one chip: serialize generation
    # ThreadingHTTPServer handles each request on its own thread: the
    # request id must be allocated atomically (not read from
    # state['requests'] pre-increment, which two concurrent POSTs would
    # share, the second overwriting the first's default-template mp4s)
    import itertools
    request_ids = itertools.count()

    if args.warmup:
        t0 = time.time()
        h, w = args.image_size
        # compile the EXACT program a default request runs: generate_videos
        # stacks num_clips clips into one batched call (jit specializes on
        # the batch shape, and the denoise program is cached per
        # steps/sampler/guidance) — a batch-1 warmup would leave the first
        # real request paying the full compile while /healthz said warm
        b = args.warmup_clips
        img = jnp.zeros((b, h, w, 3), jnp.float32)
        mel = jnp.zeros((b, 128, 204, 1), jnp.float32)
        txt = jnp.zeros((b, 77, 768), jnp.float32)
        out = pipeline(img, mel, txt, video_length=n_segment,
                       num_inference_steps=args.warmup_steps,
                       audio_guidance_scale=4.0, text_guidance_scale=1.0,
                       sampler="plms", rng=jax.random.PRNGKey(0),
                       broadcast_rng=True)
        jax.block_until_ready(out)
        state["warm"] = True
        print(f"[serve] warmup compile {time.time() - t0:.1f}s", flush=True)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):
            print("[serve]", fmt % a, flush=True)

        def _reply(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True, **state})
            else:
                self._reply(404, {"ok": False, "error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._reply(404, {"ok": False, "error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                with lock:
                    req_id = next(request_ids)
                save_template = req.get("save_template") or os.path.join(
                    "/tmp", f"asva_serve_{req_id}")
                enc = None
                enc_path = req.get("category_text_encoding_path")
                if enc_path:
                    from asva_tpu.runtime import load_null_text_encoding
                    enc = np.asarray(load_null_text_encoding(enc_path))
                t0 = time.time()
                with lock:
                    generate_videos(
                        pipeline,
                        image_path=req.get("image_path", ""),
                        audio_path=req.get("audio_path", ""),
                        video_path=req.get("video_path", ""),
                        category_text_encoding=enc,
                        image_size=tuple(args.image_size),
                        video_fps=args.video_fps,
                        video_num_frame=n_segment,
                        num_clips_per_video=int(req.get("num_clips", 3)),
                        audio_guidance_scale=float(
                            req.get("audio_guidance_scale", 4.0)),
                        text_guidance_scale=float(
                            req.get("text_guidance_scale", 1.0)),
                        num_inference_steps=int(
                            req.get("num_inference_steps", 50)),
                        seed=int(req.get("seed", 0)),
                        save_template=save_template,
                        sampler=req.get("sampler", "plms"))
                dt = time.time() - t0
                outs = sorted(
                    f"{save_template}_clip-{i:02d}.mp4"
                    for i in range(int(req.get("num_clips", 3))))
                outs = [o for o in outs if os.path.exists(o)]
                with lock:
                    state["requests"] += 1
                    state["warm"] = True
                self._reply(200, {"ok": True, "outputs": outs,
                                  "latency_s": round(dt, 3)})
            except Exception as e:
                traceback.print_exc()
                self._reply(500, {"ok": False, "error": str(e)})
            with lock:
                done = (args.max_requests
                        and state["requests"] >= args.max_requests)
            if done:
                threading.Thread(target=httpd.shutdown, daemon=True).start()

    httpd = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"[serve] listening on {args.host}:{args.port}", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    print("[serve] done", flush=True)


if __name__ == "__main__":
    main()
