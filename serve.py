"""Minimal production HTTP server for T2V generation.

Dependency-free (stdlib http.server) counterpart to gradio_server.py
(reference only ships a Gradio UI, gradio_server.py:14-140; this adds a
programmatic endpoint suitable for serving):

  POST /generate {"prompt": ..., "width": ..., "height": ...,
                  "video_length": ..., "seed": ..., "infer_steps": ...,
                  "guidance_scale": ..., "flow_shift": ...,
                  "embedded_guidance_scale": ...}
    -> video/mp4 bytes (or JSON error)
  GET /healthz  -> {"status": "ok", "model": ..., "devices": N}

Requests are serialized through a lock: the mesh executes one video at a
time (batch>1 goes through num_videos in a single request).
"""
from __future__ import annotations

import io
import json
import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from hunyuanvideo_efficiency_tpu.config import parse_args
from hunyuanvideo_efficiency_tpu.utils.file_utils import save_videos_grid
from hunyuanvideo_efficiency_tpu.utils.logging import logger

_GEN_LOCK = threading.Lock()


def make_handler(sampler):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._json(200, {"status": "ok",
                                 "model": sampler.args.model,
                                 "devices": len(jax.devices())})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                prompt = req["prompt"]
            except (KeyError, json.JSONDecodeError) as e:
                self._json(400, {"error": f"bad request: {e}"})
                return
            try:
                with _GEN_LOCK:
                    out = sampler.predict(
                        prompt=prompt,
                        height=int(req.get("height", 192)),
                        width=int(req.get("width", 336)),
                        video_length=int(req.get("video_length", 33)),
                        seed=req.get("seed"),
                        negative_prompt=req.get("negative_prompt"),
                        infer_steps=int(req.get("infer_steps", 50)),
                        guidance_scale=float(req.get("guidance_scale", 1.0)),
                        flow_shift=float(req.get("flow_shift", 7.0)),
                        embedded_guidance_scale=float(
                            req.get("embedded_guidance_scale", 6.0)),
                        num_videos_per_prompt=int(req.get("num_videos", 1)),
                    )
            except (ValueError, TypeError) as e:
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # generation failure -> structured 500
                logger.exception("generation failed")
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as f:
                path = f.name
            try:
                save_videos_grid(out["samples"][0:1], path, fps=24)
                data = open(path, "rb").read()
            except Exception as e:
                logger.exception("encode failed")
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            finally:
                os.unlink(path)
            self.send_response(200)
            self.send_header("Content-Type", "video/mp4")
            self.send_header("Content-Length", str(len(data)))
            self.send_header("X-Seed", str(out["seeds"][0]))
            self.send_header("X-Gen-Time", f"{out['gen_time']:.2f}")
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, fmt, *args):  # route through our logger
            logger.info("%s - %s" % (self.address_string(), fmt % args))

    return Handler


def serve(sampler, host: str = "0.0.0.0", port: int = 8081):
    httpd = ThreadingHTTPServer((host, port), make_handler(sampler))
    logger.info(f"Serving {sampler.args.model} on {host}:{port}")
    httpd.serve_forever()


if __name__ == "__main__":
    from hunyuanvideo_efficiency_tpu.inference import HunyuanVideoSampler

    args = parse_args()
    sampler = HunyuanVideoSampler.from_pretrained(args.model_base, args=args)
    serve(sampler,
          host=os.getenv("SERVER_NAME", "0.0.0.0"),
          port=int(os.getenv("SERVER_PORT", "8081")))
