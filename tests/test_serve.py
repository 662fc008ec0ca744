"""Serving tests: dynamic batcher + HTTP endpoint (edgegan_tpu/serve.py)."""
import io
import threading
import time

import jax
import numpy as np
import pytest
from PIL import Image

from edgegan_tpu.core.config import Config
from edgegan_tpu.infer import make_test_forward
from edgegan_tpu.serve import Batcher, make_server
from edgegan_tpu.train import Networks, create_train_state

H, W = 32, 64


@pytest.fixture(scope='module')
def served():
    cfg = Config(batch_size=4, num_classes=3, z_dim=8,
                 output_height=H, output_width=W,
                 input_height=H, input_width=W,
                 image_dis_size=32, edge_dis_size=32).derive('test')
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    params = {k: state.params[k] for k in ('G1', 'G2', 'E')}
    aux = {k: state.aux[k] for k in ('G1', 'G2', 'E')}
    forward = make_test_forward(nets, cfg)
    batcher = Batcher(forward, params, aux, (H, W), cfg.num_classes,
                      max_batch=4, max_wait_ms=30.0)
    server = make_server(cfg, batcher, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield cfg, batcher, server.server_address[1]
    server.shutdown()
    batcher.stop()


def test_batcher_direct(served):
    _, batcher, _ = served
    img = np.random.RandomState(0).uniform(-1, 1, (H, W, 3)).astype(
        np.float32)
    out = batcher.submit(img, 1).get(timeout=300)
    assert out.shape == (H, W // 2, 3)
    assert np.isfinite(out).all() and np.abs(out).max() <= 1.0


def test_http_generate_and_health(served):
    import http.client
    _, _, port = served
    # a PNG sketch request
    arr = (np.random.RandomState(1).rand(H, W, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format='PNG')
    conn = http.client.HTTPConnection('127.0.0.1', port, timeout=300)
    conn.request('POST', '/generate?class_id=2', body=buf.getvalue())
    resp = conn.getresponse()
    assert resp.status == 200
    out = Image.open(io.BytesIO(resp.read()))
    assert out.size == (W // 2, H)  # the generated photo half

    conn.request('GET', '/healthz')
    health = conn.getresponse()
    assert health.status == 200
    import json
    stats = json.loads(health.read())
    assert stats['ok'] and stats['requests'] >= 1


def test_http_concurrent_requests_batch(served):
    """Concurrent requests ride one padded batch (dynamic batching)."""
    import http.client
    _, batcher, port = served
    arr = (np.random.RandomState(2).rand(H, W, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format='PNG')
    payload = buf.getvalue()
    batches_before = batcher.n_batches
    results = []

    def post():
        conn = http.client.HTTPConnection('127.0.0.1', port, timeout=300)
        conn.request('POST', '/generate?class_id=0', body=payload)
        results.append(conn.getresponse().status)

    threads = [threading.Thread(target=post) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert results == [200, 200, 200, 200]
    # 4 requests should take far fewer than 4 batches
    assert batcher.n_batches - batches_before <= 3
    assert max(batcher.batch_occupancy) >= 2


def test_http_raw_tensor_mode(served):
    """raw=1 skips the PNG codec: float32 in, float32 out."""
    import http.client
    _, _, port = served
    img = np.random.RandomState(3).uniform(-1, 1, (H, W, 3)).astype(
        '<f4')
    conn = http.client.HTTPConnection('127.0.0.1', port, timeout=300)
    conn.request('POST', '/generate?class_id=1&raw=1', body=img.tobytes())
    resp = conn.getresponse()
    assert resp.status == 200
    out = np.frombuffer(resp.read(), '<f4').reshape(H, W // 2, 3)
    assert np.isfinite(out).all() and np.abs(out).max() <= 1.0
    # wrong payload size -> 400
    conn.request('POST', '/generate?raw=1', body=b'\x00' * 12)
    assert conn.getresponse().status == 400


def test_http_raw_batch_mode(served):
    """raw=1&n=K: K images per request, outputs stacked in order, with
    per-image class ids. The bulk path that amortizes per-request HTTP
    overhead (BASELINE.md serving section)."""
    import http.client
    _, _, port = served
    n = 3
    imgs = np.random.RandomState(4).uniform(-1, 1, (n, H, W, 3)).astype(
        '<f4')
    imgs[2] = imgs[1]  # identical slots must produce identical outputs
    conn = http.client.HTTPConnection('127.0.0.1', port, timeout=300)
    conn.request('POST', f'/generate?class_id=0,2,2&raw=1&n={n}',
                 body=imgs.tobytes())
    resp = conn.getresponse()
    assert resp.status == 200
    out = np.frombuffer(resp.read(), '<f4').reshape(n, H, W // 2, 3)
    assert np.isfinite(out).all() and np.abs(out).max() <= 1.0
    # per-slot routing: identical (image, class) slots agree (they ride
    # one padded batch, sharing the batch rng); the distinct slot differs
    np.testing.assert_allclose(out[1], out[2], atol=1e-6)
    assert np.abs(out[0] - out[1]).max() > 1e-3
    # bad shapes / params -> 400
    for path, body in [
            (f'/generate?raw=1&n={n}', imgs[:2].tobytes()),  # size mismatch
            ('/generate?raw=1&n=0', b''),                    # n out of range
            ('/generate?n=2', b''),                          # n>1 needs raw
            (f'/generate?class_id=0,1&raw=1&n={n}',
             imgs.tobytes())]:                               # id count
        conn.request('POST', path, body=body)
        assert conn.getresponse().status == 400
        conn = http.client.HTTPConnection('127.0.0.1', port, timeout=60)


def test_batcher_error_delivery_and_health():
    """A failing forward must deliver the exception to every waiting
    request (503 over HTTP), leave the pipeline threads alive, and keep
    serving subsequent good batches (VERDICT r2 weak #2)."""
    import http.client
    import threading as _t

    calls = []

    def flaky_forward(params, aux, images, classes, key):
        calls.append(1)
        if len(calls) <= 2:  # fail the warmup batch AND the first real one
            raise RuntimeError('injected device failure')
        out = np.zeros((images.shape[0], H, W // 2, 3), np.float32)
        return None, out

    batcher = Batcher(flaky_forward, {}, {}, (H, W), 3,
                      max_batch=4, max_wait_ms=5.0)
    cfg = Config(batch_size=4, num_classes=3, z_dim=8,
                 output_height=H, output_width=W,
                 input_height=H, input_width=W,
                 image_dis_size=32, edge_dis_size=32).derive('test')
    server = make_server(cfg, batcher, port=0)
    thread = _t.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]
    try:
        img = np.zeros((H, W, 3), np.float32)
        # direct submit: exception sentinel delivered, thread survives
        res = batcher.submit(img, 0).get(timeout=60)
        assert isinstance(res, RuntimeError)
        assert batcher.healthy()

        # HTTP: failing batch -> 503, not a hung/dropped connection
        # (send_error closes the connection, so reconnect per request)
        conn = http.client.HTTPConnection('127.0.0.1', port, timeout=60)
        conn.request('POST', '/generate?raw=1', body=img.tobytes())
        assert conn.getresponse().status == 503

        # pipeline recovered: next batch succeeds end to end
        conn = http.client.HTTPConnection('127.0.0.1', port, timeout=60)
        conn.request('POST', '/generate?raw=1', body=img.tobytes())
        ok_resp = conn.getresponse()
        assert ok_resp.status == 200
        ok_resp.read()  # drain for keep-alive reuse

        # healthz reflects liveness and counts the errors
        conn.request('GET', '/healthz')
        health = conn.getresponse()
        assert health.status == 200
        import json
        stats = json.loads(health.read())
        assert stats['ok'] and stats['errors'] >= 2
    finally:
        server.shutdown()
        batcher.stop()


def test_uint8_transfer_mode_matches_png_path(served):
    """transfer_dtype='uint8' moves the final PNG payload bytes: the
    device-side per-image bytescale stretch must match the host encoder
    applied to the float-path output (up to input-quantization noise)."""
    cfg, _, _ = served
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    params = {k: state.params[k] for k in ('G1', 'G2', 'E')}
    aux = {k: state.aux[k] for k in ('G1', 'G2', 'E')}
    forward = make_test_forward(nets, cfg, jit=False)
    img = np.random.RandomState(7).uniform(-1, 1, (H, W, 3)).astype(
        np.float32)

    outs = {}
    for dtype in ('float32', 'uint8'):
        b = Batcher(forward, params, aux, (H, W), cfg.num_classes,
                    max_batch=4, max_wait_ms=5.0, seed=0,
                    transfer_dtype=dtype)
        try:
            outs[dtype] = b.submit(img, 1).get(timeout=300)
        finally:
            b.stop()

    from edgegan_tpu.utils.images import bytescale, inverse_transform
    host_u8 = bytescale(inverse_transform(
        np.asarray(outs['float32'], np.float64)))
    dev_u8 = outs['uint8']
    assert dev_u8.dtype == np.uint8 and dev_u8.shape == host_u8.shape
    diff = np.abs(dev_u8.astype(int) - host_u8.astype(int))
    # same rng stream (seed 0, batch index 0 both): only input
    # quantization (<=1/255) separates the two paths
    assert np.mean(diff) < 2.0 and np.max(diff) <= 16


def test_http_bad_requests(served):
    import http.client
    _, _, port = served
    conn = http.client.HTTPConnection('127.0.0.1', port, timeout=60)
    conn.request('POST', '/generate?class_id=99', body=b'notanimage')
    assert conn.getresponse().status == 400
    conn = http.client.HTTPConnection('127.0.0.1', port, timeout=60)
    conn.request('POST', '/nope', body=b'')
    assert conn.getresponse().status == 404


class _GatedArray:
    """Stands in for an in-flight device result: np.asarray blocks
    until the gate opens, simulating a slow device."""

    def __init__(self, shape, gate):
        self._shape = shape
        self._gate = gate

    def __array__(self, dtype=None, copy=None):
        assert self._gate.wait(timeout=120), 'gate never opened'
        return np.zeros(self._shape, np.float32)


def _gated_batcher(max_batch=2, depth=1, max_queue=4):
    """A Batcher whose device step is replaced by a gate-controlled
    stub, so the submit queue can be filled deterministically."""
    gate = threading.Event()

    def never_called(*a, **k):  # forward unused once _step_fn replaced
        raise AssertionError('real forward should not run')

    b = Batcher(never_called, {}, {}, (H, W), 3, max_batch=max_batch,
                max_wait_ms=1.0, depth=depth, transfer_dtype='float32',
                max_queue=max_queue)
    b._step_fn = lambda images, classes, idx: _GatedArray(
        (images.shape[0], H, W // 2, 3), gate)
    return b, gate


def test_overload_sheds_immediately_and_recovers():
    """Bounded submit queue (VERDICT r3 weak #2): beyond max_queue,
    submit raises Overloaded IMMEDIATELY; every accepted request is
    still answered; the pipeline stays healthy."""
    from edgegan_tpu.serve import Overloaded
    b, gate = _gated_batcher(max_batch=2, depth=1, max_queue=4)
    img = np.zeros((H, W, 3), np.float32)
    try:
        accepted, shed = [], 0
        t0 = time.time()
        for _ in range(20):
            try:
                accepted.append(b.submit(img, 0))
            except Overloaded:
                shed += 1
        elapsed = time.time() - t0
        assert shed > 0, 'queue bound never triggered'
        # shedding is immediate, not a 60 s handler block
        assert elapsed < 5.0, elapsed
        # accepted <= queue bound + batches already pulled into the
        # dispatch/inflight pipeline (max_queue + 2*max_batch slack)
        assert len(accepted) <= 4 + 2 * 2 + 2, len(accepted)
        assert b.stats()['shed'] == shed
        gate.set()  # device "completes"
        for out in accepted:  # none hang
            res = out.get(timeout=60)
            assert isinstance(res, np.ndarray), res
        assert b.healthy()
        # pipeline still serves new work after the overload episode
        out = b.submit(img, 1).get(timeout=60)
        assert isinstance(out, np.ndarray)
    finally:
        gate.set()
        b.stop()


def test_http_overload_returns_503_with_retry_after():
    """Overload through the full HTTP stack: shed requests get an
    immediate 503 + Retry-After, none hang, healthz stays ok and
    counts the sheds."""
    import http.client
    import json as _json
    b, gate = _gated_batcher(max_batch=2, depth=1, max_queue=2)
    cfg = Config(batch_size=4, num_classes=3, z_dim=8,
                 output_height=H, output_width=W,
                 input_height=H, input_width=W,
                 image_dis_size=32, edge_dis_size=32).derive('test')
    server = make_server(cfg, b, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]
    img = np.zeros((H, W, 3), '<f4')
    statuses, retry_after = [], []

    def post():
        conn = http.client.HTTPConnection('127.0.0.1', port, timeout=120)
        conn.request('POST', '/generate?raw=1', body=img.tobytes())
        resp = conn.getresponse()
        statuses.append(resp.status)
        if resp.status == 503:
            retry_after.append(resp.getheader('Retry-After'))
        resp.read()

    try:
        threads = [threading.Thread(target=post) for _ in range(16)]
        for t in threads:
            t.start()
        time.sleep(2.0)  # everything queued/blocked; sheds already back
        n_shed_now = statuses.count(503)
        assert n_shed_now > 0, statuses
        assert all(r == '1' for r in retry_after)
        gate.set()
        for t in threads:
            t.join(timeout=120)
        assert not any(t.is_alive() for t in threads), 'requests hung'
        assert statuses.count(200) + statuses.count(503) == 16, statuses
        assert statuses.count(200) >= 1
        # server healthy after the episode
        conn = http.client.HTTPConnection('127.0.0.1', port, timeout=60)
        conn.request('GET', '/healthz')
        health = conn.getresponse()
        assert health.status == 200
        stats = _json.loads(health.read())
        assert stats['ok'] and stats['shed'] >= n_shed_now
    finally:
        gate.set()
        server.shutdown()
        b.stop()


def test_drain_then_stop():
    """stop(drain=True): accepted requests are all answered, new
    submits are shed, then the threads exit."""
    from edgegan_tpu.serve import Overloaded
    b, gate = _gated_batcher(max_batch=2, depth=1, max_queue=8)
    img = np.zeros((H, W, 3), np.float32)
    outs = [b.submit(img, 0) for _ in range(3)]
    stopper = threading.Thread(target=lambda: b.stop(drain=True,
                                                     timeout=60))
    stopper.start()
    time.sleep(0.3)  # draining flag set, device still "busy"
    with pytest.raises(Overloaded, match='draining'):
        b.submit(img, 0)
    gate.set()
    stopper.join(timeout=120)
    assert not stopper.is_alive()
    for out in outs:  # every accepted request was answered pre-stop
        assert isinstance(out.get_nowait(), np.ndarray)
    assert not b.thread.is_alive() and not b.sync_thread.is_alive()
