"""Serving throughput benchmark (VERDICT r2 #2).

Measures edgegan_tpu.serve on the real TPU with the FULL-SIZE model
(64x128 pairs, 14 classes — the reference headline architecture,
random-init weights; throughput does not depend on values) in three
modes:

  direct  — batcher core only (dynamic batching + pipelined device
            dispatch), a submit-ahead client keeping the pipeline full.
            This is the serving-core img/s; the gap to bench.py's
            one-dispatch-scan capability number is dispatch overhead.
  raw     — full HTTP stack, raw float32 tensors (no PNG codec).
  png     — full HTTP stack, PNG in/out (the codec-bound end-user path).

Prints one JSON line per mode. Run on the TPU:
  python scripts/serve_bench.py [seconds_per_mode] [serve_batch]
"""
import io
import json
import os
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 64, 128


def build_batcher(serve_batch, depth=3):
    import jax

    from edgegan_tpu.core.config import Config, enable_compilation_cache
    from edgegan_tpu.infer import make_test_forward
    from edgegan_tpu.serve import Batcher
    from edgegan_tpu.train import Networks, create_train_state

    enable_compilation_cache()
    cfg = Config().derive('test')  # 64x128, 14-class
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    params = {k: state.params[k] for k in ('G1', 'G2', 'E')}
    aux = {k: state.aux[k] for k in ('G1', 'G2', 'E')}
    forward = make_test_forward(nets, cfg)
    batcher = Batcher(forward, params, aux, (H, W), cfg.num_classes,
                      max_batch=serve_batch, max_wait_ms=2.0, depth=depth)
    t0 = time.time()
    batcher.submit(np.zeros((H, W, 3), np.float32), 0).get(timeout=900)
    print(f'# warmed (compile {time.time() - t0:.0f}s)', file=sys.stderr)
    return cfg, batcher


def bench_direct(batcher, seconds, outstanding=512):
    """Submit-ahead client: keeps the device pipeline full."""
    img = np.random.RandomState(0).uniform(-1, 1, (H, W, 3)).astype(
        np.float32)
    stop = time.time() + seconds
    inflight: 'queue.Queue' = queue.Queue(maxsize=outstanding)
    done = [0]

    def drain():
        while True:
            out = inflight.get()
            if out is None:
                return
            r = out.get(timeout=120)
            if isinstance(r, Exception):
                raise r
            done[0] += 1

    th = threading.Thread(target=drain, daemon=True)
    th.start()
    t0 = time.time()
    n_sub = 0
    while time.time() < stop:
        inflight.put(batcher.submit(img, n_sub % 14))
        n_sub += 1
    inflight.put(None)
    th.join(timeout=300)
    dt = time.time() - t0
    return {'mode': 'direct', 'img_per_s': round(done[0] / dt, 1),
            'n': done[0], 'seconds': round(dt, 2)}


def bench_http(cfg, batcher, seconds, mode, clients=16):
    import http.client

    from edgegan_tpu.serve import make_server
    server = make_server(cfg, batcher, port=0)
    port = server.server_address[1]
    sthread = threading.Thread(target=server.serve_forever, daemon=True)
    sthread.start()

    if mode == 'raw':
        body = np.random.RandomState(1).uniform(
            -1, 1, (H, W, 3)).astype('<f4').tobytes()
        path = '/generate?class_id=3&raw=1'
    else:
        from PIL import Image
        arr = (np.random.RandomState(1).rand(H, W, 3) * 255).astype(
            np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format='PNG')
        body = buf.getvalue()
        path = '/generate?class_id=3'

    stop_t = time.time() + seconds
    counts = [0] * clients
    errors = [0] * clients

    def client(i):
        conn = http.client.HTTPConnection('127.0.0.1', port, timeout=120)
        while time.time() < stop_t:
            try:
                conn.request('POST', path, body=body)
                resp = conn.getresponse()
                resp.read()
                if resp.status == 200:
                    counts[i] += 1
                else:
                    errors[i] += 1
            except Exception:
                errors[i] += 1
                conn = http.client.HTTPConnection('127.0.0.1', port,
                                                  timeout=120)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=seconds + 300)
    dt = time.time() - t0
    server.shutdown()
    stats = batcher.stats()
    return {'mode': mode, 'req_per_s': round(sum(counts) / dt, 1),
            'n': sum(counts), 'errors': sum(errors), 'clients': clients,
            'seconds': round(dt, 2),
            'mean_recent_occupancy': stats['mean_recent_occupancy']}


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 15.0
    serve_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cfg, batcher = build_batcher(serve_batch)
    try:
        for result in [bench_direct(batcher, seconds),
                       bench_http(cfg, batcher, seconds, 'raw'),
                       bench_http(cfg, batcher, seconds, 'png')]:
            result['serve_batch'] = serve_batch
            print(json.dumps(result), flush=True)
    finally:
        batcher.stop()


if __name__ == '__main__':
    main()
