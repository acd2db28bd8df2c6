#!/usr/bin/env python
"""Minimal production-serving entry: load a config + checkpoint once, keep
the jitted pipeline warm, and serve JSON-over-HTTP generation requests.

    python tools/serve.py -c configs/svd/MotionRAG_open.yml \
        [--ckpt_path ...] [--port 8000]

POST /generate  {"image": <base64 png/jpg>, "prompt": str?,
                 "num_frames": int?, "seed": int?}
  -> {"video": <base64 mp4>, "latency_s": float}
GET /health -> {"status": "ok"}

The first request pays the XLA compile (cached persistently); subsequent
requests run the fully jitted sampler.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import sys
import tempfile
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, "/root/repo")


def build_service(config_path: str, ckpt_path: str | None,
                  overrides: list[str] | None = None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from main import cli_main

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    model, data, trainer, cfg_ckpt = cli_main(
        ["test", "-c", config_path, *(overrides or [])], run=False
    )
    ckpt = ckpt_path or cfg_ckpt

    rng = jax.random.key(0)
    state = {"params": None}

    def ensure_params(image_arr):
        if state["params"] is None:
            batch = {
                "video": jnp.asarray(image_arr)[None, None],
                "prompt_ids": jnp.zeros((1, 77), jnp.int32),
                "ref_videos": jnp.asarray(image_arr)[None, None, None].repeat(2, 1),
            }
            # template batch: repeat the image as a pseudo clip
            f = 8
            batch["video"] = jnp.repeat(batch["video"], f, axis=1)
            batch["ref_videos"] = jnp.repeat(
                batch["video"][:, None], 2, axis=1
            )
            params = model.init_params(jax.random.key(0), batch)
            if ckpt:
                from motionrag_tpu.training.checkpoints import restore_into

                params = restore_into(ckpt, params)
            state["params"] = params
        return state["params"]

    def generate(image_b64: str, prompt: str = "", num_frames: int | None = None,
                 seed: int = 0) -> tuple[bytes, float]:
        img = Image.open(io.BytesIO(base64.b64decode(image_b64))).convert("RGB")
        arr = np.asarray(img).astype(np.float32) / 127.5 - 1.0
        arr = arr.transpose(2, 0, 1)  # [c, h, w]
        params = ensure_params(arr)
        f = num_frames or model.eval_pipeline_call_kwargs.get("num_frames", 16)
        batch = {
            "video": jnp.repeat(jnp.asarray(arr)[None, None], f, axis=1),
            "prompt_ids": jnp.zeros((1, 77), jnp.int32),
            "ref_videos": jnp.repeat(
                jnp.repeat(jnp.asarray(arr)[None, None, None], f, axis=2), 2, axis=1
            ),
            "metadata": [{"raw_prompt": prompt}],
        }
        t0 = time.time()
        frames = model.eval_pipeline(params, batch, jax.random.key(seed))
        frames = np.asarray(jax.device_get(frames))
        latency = time.time() - t0

        from motionrag_tpu.utils.pipeline import denormalize
        from motionrag_tpu.data.video_io import write_video

        video_u8 = np.asarray(denormalize(jnp.asarray(frames[0])))
        with tempfile.NamedTemporaryFile(suffix=".mp4") as tmp:
            write_video(tmp.name, video_u8, fps=8.0, input_format="TCHW")
            payload = open(tmp.name, "rb").read()
        return payload, latency

    return generate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--ckpt_path", default=None)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--quantize", choices=["int8"], default=None,
                    help="int8 W8A8 backbone serving (ops/quant.py)")
    args = ap.parse_args()

    overrides = [f"--model.quantize={args.quantize}"] if args.quantize else []
    generate = build_service(args.config, args.ckpt_path, overrides)

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok"})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                return self._json(404, {"error": "unknown path"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                video, latency = generate(
                    req["image"], req.get("prompt", ""),
                    req.get("num_frames"), req.get("seed", 0),
                )
                self._json(200, {
                    "video": base64.b64encode(video).decode(),
                    "latency_s": round(latency, 3),
                })
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": str(e)})

    server = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    print(f"serving on :{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
