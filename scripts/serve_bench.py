"""Serving throughput benchmark (VERDICT r2 #2).

Measures edgegan_tpu.serve on the real TPU with the FULL-SIZE model
(64x128 pairs, 14 classes — the reference headline architecture,
random-init weights; throughput does not depend on values) in three
modes:

  wire    — dispatch+sync loop on a prestaged padded batch (no batcher
            threads): the tunnel's per-batch round-trip ceiling.
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


def build_batcher(serve_batch, depth=3, transfer_dtype='bfloat16'):
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
    forward = make_test_forward(nets, cfg, jit=False)
    batcher = Batcher(forward, params, aux, (H, W), cfg.num_classes,
                      max_batch=serve_batch, max_wait_ms=2.0, depth=depth,
                      transfer_dtype=transfer_dtype)
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
    stats = batcher.stats()
    return {'mode': 'direct', 'img_per_s': round(done[0] / dt, 1),
            'n': done[0], 'seconds': round(dt, 2),
            'mean_recent_occupancy': stats['mean_recent_occupancy']}


def bench_wire(batcher, seconds):
    """Tunnel wire ceiling: dispatch+sync loop on a PRESTAGED padded
    batch, `depth` in flight, no batcher threads/queues in the path.
    The gap between this and 'direct' is batcher host overhead; the gap
    between this and bench.py's one-dispatch-scan capability is the
    per-batch round-trip cost this backend imposes."""
    import collections
    b, h, w = batcher.max_batch, H, W // 2
    if batcher._uint8:
        images = np.full((b, h, w, 3), 128, np.uint8)
    else:
        images = np.zeros((b, h, w, 3), batcher._xfer_dtype)
    classes = np.zeros((b,), np.int32)
    step = batcher._step_fn
    inflight = collections.deque()
    stop = time.time() + seconds
    t0 = time.time()
    n = 0
    i = 0
    while time.time() < stop:
        inflight.append(step(images, classes, np.int32(i)))
        i += 1
        if len(inflight) >= batcher.depth:
            np.asarray(inflight.popleft())
            n += b
    while inflight:
        np.asarray(inflight.popleft())
        n += b
    dt = time.time() - t0
    return {'mode': 'wire', 'img_per_s': round(n / dt, 1), 'n': n,
            'seconds': round(dt, 2), 'depth': batcher.depth}


def bench_http(cfg, batcher, seconds, mode, clients=16):
    import http.client

    from edgegan_tpu.serve import make_server
    server = make_server(cfg, batcher, port=0)
    port = server.server_address[1]
    sthread = threading.Thread(target=server.serve_forever, daemon=True)
    sthread.start()

    imgs_per_req = 1
    if mode == 'rawbatch':
        imgs_per_req = 64
        body = np.random.RandomState(1).uniform(
            -1, 1, (imgs_per_req, H, W, 3)).astype('<f4').tobytes()
        path = f'/generate?class_id=3&raw=1&n={imgs_per_req}'
    elif mode == 'raw':
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
    error_kinds: dict = {}
    elock = threading.Lock()

    def _record_error(i, kind):
        errors[i] += 1
        with elock:
            error_kinds[kind] = error_kinds.get(kind, 0) + 1

    def client(i):
        conn = http.client.HTTPConnection('127.0.0.1', port, timeout=120)
        while time.time() < stop_t:
            try:
                conn.request('POST', path, body=body)
                resp = conn.getresponse()
                data = resp.read()
                if resp.status == 200:
                    counts[i] += 1
                else:
                    _record_error(i, f'{resp.status}:{data[:120]!r}')
            except Exception as e:
                _record_error(i, type(e).__name__)
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
            'img_per_s': round(sum(counts) * imgs_per_req / dt, 1),
            'n': sum(counts), 'errors': sum(errors), 'clients': clients,
            'seconds': round(dt, 2),
            'mean_recent_occupancy': stats['mean_recent_occupancy'],
            **({'error_kinds': error_kinds} if error_kinds else {})}


def bench_overload(cfg, batcher, seconds, clients=32):
    """Sustained-overload episode through the full HTTP stack, then
    recovery (VERDICT r3 weak #2 'measured behavior').

    The batcher's submit queue is temporarily shrunk to 2 full batches
    so demand (clients x 16-image bulk POSTs, back to back) exceeds it
    immediately. Measures: 503s are IMMEDIATE (p99 latency in ms, not a
    60 s handler block), accepted requests all complete, /healthz stays
    live and counts sheds, and the server recovers full throughput
    after the flood stops."""
    import http.client

    from edgegan_tpu.serve import make_server
    server = make_server(cfg, batcher, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    n_bulk = 16
    body = np.random.RandomState(1).uniform(
        -1, 1, (n_bulk, H, W, 3)).astype('<f4').tobytes()
    path = f'/generate?class_id=3&raw=1&n={n_bulk}'

    saved_queue = batcher.max_queue
    batcher.max_queue = 2 * batcher.max_batch
    stop_t = time.time() + seconds
    lat_ok, lat_shed, other = [], [], []
    lock = threading.Lock()

    def client(i):
        conn = http.client.HTTPConnection('127.0.0.1', port, timeout=120)
        while time.time() < stop_t:
            t0 = time.time()
            try:
                conn.request('POST', path, body=body)
                resp = conn.getresponse()
                resp.read()
                dt = time.time() - t0
                with lock:
                    if resp.status == 200:
                        lat_ok.append(dt)
                    elif resp.status == 503:
                        lat_shed.append(dt)
                    else:
                        other.append(resp.status)
            except Exception as e:
                with lock:
                    other.append(type(e).__name__)
                conn = http.client.HTTPConnection('127.0.0.1', port,
                                                  timeout=120)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    for t in threads:
        t.start()
    time.sleep(seconds / 2)
    hconn = http.client.HTTPConnection('127.0.0.1', port, timeout=30)
    hconn.request('GET', '/healthz')
    hresp = hconn.getresponse()
    health_mid = json.loads(hresp.read())
    health_status = hresp.status
    for t in threads:
        t.join(timeout=seconds + 300)
    batcher.max_queue = saved_queue

    # recovery: the same bulk path at normal queue bound, one client
    # at depth, must run error-free at full rate after the episode
    rec_t0 = time.time()
    rec_n = 0
    conn = http.client.HTTPConnection('127.0.0.1', port, timeout=120)
    while time.time() < rec_t0 + min(5.0, seconds):
        conn.request('POST', path, body=body)
        resp = conn.getresponse()
        resp.read()
        assert resp.status == 200, f'recovery request failed {resp.status}'
        rec_n += n_bulk
    rec_rate = rec_n / (time.time() - rec_t0)
    server.shutdown()

    def pct(xs, q):
        return round(float(np.percentile(xs, q)) * 1e3, 1) if xs else None
    return {
        'mode': 'overload', 'clients': clients, 'bulk_n': n_bulk,
        'queue_bound_imgs': 2 * batcher.max_batch,
        'accepted': len(lat_ok), 'shed_503': len(lat_shed),
        'other_errors': len(other),
        'shed_latency_ms_p50': pct(lat_shed, 50),
        'shed_latency_ms_p99': pct(lat_shed, 99),
        'accepted_latency_ms_p50': pct(lat_ok, 50),
        'accepted_latency_ms_p99': pct(lat_ok, 99),
        'healthz_mid_episode': {'status': health_status,
                                'ok': health_mid.get('ok'),
                                'shed': health_mid.get('shed')},
        'recovery_img_per_s': round(rec_rate, 1),
    }


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 15.0
    serve_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    clients = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    modes = sys.argv[4].split(',') if len(sys.argv) > 4 else [
        'direct', 'raw', 'png']
    transfer_dtype = sys.argv[5] if len(sys.argv) > 5 else 'bfloat16'
    cfg, batcher = build_batcher(serve_batch, transfer_dtype=transfer_dtype)
    try:
        for mode in modes:
            if mode == 'wire':
                result = bench_wire(batcher, seconds)
            elif mode == 'direct':
                result = bench_direct(batcher, seconds)
            elif mode == 'overload':
                result = bench_overload(cfg, batcher, seconds,
                                        clients=min(clients, 32))
            else:
                result = bench_http(cfg, batcher, seconds, mode, clients)
            result['serve_batch'] = serve_batch
            result['transfer_dtype'] = transfer_dtype
            print(json.dumps(result), flush=True)
    finally:
        batcher.stop()


if __name__ == '__main__':
    main()
