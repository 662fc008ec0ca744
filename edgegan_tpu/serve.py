"""Production inference serving: HTTP + dynamic batching.

The reference has no serving story (batch-1 `test.py` only,
/root/reference/edgegan/test.py:89). On TPU the full encoder->G1/G2
forward costs ~2.1 ms for a batch of 64 (BASELINE.md) while a single
dispatch costs ~28 ms of host latency on this backend — so throughput
comes from BATCHING, not from per-request dispatch. This module
implements the standard recipe:

  request -> queue -> batcher thread (collects up to `max_batch` or
  `max_wait_ms`) -> ONE jitted forward at a FIXED batch size (requests
  padded; jit compiles exactly once) -> responses fanned back out.

Endpoints:
  POST /generate?class_id=N   body: PNG/JPEG sketch (any size; resized
                              to the model's input). Returns a PNG of
                              the generated photo (the G2 half).
  GET  /healthz               liveness + stats.

Usage:
  python -m edgegan_tpu.serve --name edgegan --outputsroot outputs \
      --port 8000 --serve_batch 16
"""
from __future__ import annotations

import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class Batcher:
    """Collects requests into fixed-size padded batches and runs them
    through one jitted forward."""

    def __init__(self, forward, params, aux, input_hw, num_classes,
                 max_batch: int = 16, max_wait_ms: float = 5.0, seed: int = 0):
        import jax
        self._jax = jax
        self.forward = forward
        self.params = params
        self.aux = aux
        self.input_hw = input_hw  # (H, W) of the side-by-side pair input
        self.num_classes = num_classes
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.queue: 'queue.Queue' = queue.Queue()
        self.rng = jax.random.PRNGKey(seed)
        self.n_batches = 0
        self.n_requests = 0
        self.batch_occupancy = []
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit(self, image: np.ndarray, class_id: int) -> 'queue.Queue':
        """image: [H, W, 3] in [-1, 1] (the pair layout; only the left
        half is read by the encoder). Returns a queue delivering the
        generated [h, w/2, 3] photo."""
        out: 'queue.Queue' = queue.Queue(maxsize=1)
        self.queue.put((image, class_id, out))
        return out

    def _loop(self):
        h, w = self.input_hw
        while not self._stop.is_set():
            try:
                first = self.queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.queue.get(timeout=remaining))
                except queue.Empty:
                    break
            n = len(batch)
            # fixed-shape padded batch: jit compiles exactly once
            images = np.zeros((self.max_batch, h, w, 3), np.float32)
            classes = np.zeros((self.max_batch,), np.int32)
            for i, (img, cid, _) in enumerate(batch):
                images[i] = img
                classes[i] = cid
            self.rng, key = self._jax.random.split(self.rng)
            _, image_out = self.forward(self.params, self.aux, images,
                                        classes, key)
            image_out = np.asarray(image_out)
            for i, (_, _, out) in enumerate(batch):
                out.put(image_out[i])
            self.n_batches += 1
            self.n_requests += n
            self.batch_occupancy.append(n)

    def stop(self):
        self._stop.set()
        self.thread.join(timeout=5)

    def stats(self):
        occ = self.batch_occupancy[-100:]
        return {
            'requests': self.n_requests,
            'batches': self.n_batches,
            'mean_recent_occupancy': (float(np.mean(occ)) if occ else 0.0),
            'max_batch': self.max_batch,
        }


def _decode_request(body: bytes, input_hw) -> np.ndarray:
    """PNG/JPEG bytes -> [-1,1] pair-layout array via the SAME transform
    as training (bytescale quirk included, utils/images.py)."""
    from PIL import Image
    from .utils.images import transform
    h, w = input_hw
    img = np.asarray(Image.open(io.BytesIO(body)).convert('RGB'),
                     np.float64)
    return transform(img, h, w, h, w, crop=False).astype(np.float32)


def _encode_png(image: np.ndarray) -> bytes:
    from PIL import Image
    from .utils.images import bytescale, inverse_transform
    data = bytescale(inverse_transform(np.asarray(image, np.float64)))
    buf = io.BytesIO()
    Image.fromarray(data).save(buf, format='PNG')
    return buf.getvalue()


def make_server(config, batcher: Batcher, port: int = 8000,
                host: str = '127.0.0.1') -> ThreadingHTTPServer:
    input_hw = (config.output_height, config.output_width)

    class Handler(BaseHTTPRequestHandler):
        protocol_version = 'HTTP/1.1'  # keep-alive (Content-Length is
        #                                always set below)

        def log_message(self, *args):
            pass  # quiet

        def do_GET(self):
            if self.path.startswith('/healthz'):
                body = json.dumps({'ok': True, **batcher.stats()}).encode()
                self.send_response(200)
                self.send_header('Content-Type', 'application/json')
                self.send_header('Content-Length', str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if not self.path.startswith('/generate'):
                self.send_error(404)
                return
            try:
                class_id = 0
                if '?' in self.path:
                    for kv in self.path.split('?', 1)[1].split('&'):
                        k, _, v = kv.partition('=')
                        if k == 'class_id':
                            class_id = int(v)
                if not 0 <= class_id < (batcher.num_classes or 1):
                    raise ValueError(f'class_id {class_id} out of range')
                length = int(self.headers.get('Content-Length', 0))
                image = _decode_request(self.rfile.read(length), input_hw)
            except Exception as e:  # bad request
                self.send_error(400, str(e))
                return
            out = batcher.submit(image, class_id)
            photo = out.get(timeout=60)
            body = _encode_png(photo)
            self.send_response(200)
            self.send_header('Content-Type', 'image/png')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    import argparse

    import jax

    from . import checkpoint as ckpt
    from .core.config import (add_config_args, config_from_args,
                              enable_compilation_cache)
    from .infer import make_test_forward
    from .train import Networks

    parser = argparse.ArgumentParser('edgegan_tpu.serve')
    add_config_args(parser, 'test')
    parser.add_argument('--port', type=int, default=8000)
    parser.add_argument('--host', type=str, default='127.0.0.1')
    parser.add_argument('--serve_batch', type=int, default=16)
    parser.add_argument('--max_wait_ms', type=float, default=5.0)
    args = parser.parse_args(argv)
    config = config_from_args(args).derive('test')
    enable_compilation_cache()

    nets = Networks(config)
    loaded, counter, raw = ckpt.load_raw(config.checkpoint_dir)
    if not loaded:
        raise SystemExit(f'no checkpoint under {config.checkpoint_dir}')
    params = {k: raw['params'][k] for k in ('G1', 'G2', 'E')}
    aux = {k: raw['aux'][k] for k in ('G1', 'G2', 'E')}
    print(f' [*] serving checkpoint step {counter}')

    forward = make_test_forward(nets, config)
    batcher = Batcher(forward, params, aux,
                      (config.output_height, config.output_width),
                      config.num_classes, max_batch=args.serve_batch,
                      max_wait_ms=args.max_wait_ms)
    # warm the jit cache before accepting traffic
    warm = batcher.submit(
        np.zeros((config.output_height, config.output_width, 3),
                 np.float32), 0)
    warm.get(timeout=600)
    print(f' [*] compiled; listening on {args.host}:{args.port}')
    server = make_server(config, batcher, args.port, args.host)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.stop()


if __name__ == '__main__':
    main()
