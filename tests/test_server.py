"""cli/server.py: HTTP serving over an exported bundle, micro-batched.

Exports a tiny bundle, starts the server in-process, and drives it with
concurrent POSTs: responses decode through the bundle charset, the
micro-batcher groups concurrent requests into fewer program calls, and
/healthz reports bundle meta."""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

from htr_vt_tpu.config import ModelConfig
from htr_vt_tpu.deploy import export_serving, save_bundle
from htr_vt_tpu.models.htr_vt import HTRVT


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bundle"))
    cfg = ModelConfig(nb_cls=6, img_size=(64, 128), embed_dim=64, depth=1,
                      num_heads=2, compute_dtype="float32")
    model = HTRVT(cfg=cfg)
    img = jnp.zeros((4, 64, 128, 1), jnp.float32)
    variables = dict(model.init({"params": jax.random.PRNGKey(0)}, img,
                                train=False))
    save_bundle(out, {128: export_serving(model, variables, 4, (64, 128))}, {
        "charset": ["[blank]", "a", "b", "c", "d", "e"],
        "height": 64, "batch_size": 4, "quant": "float"})

    from htr_vt_tpu.cli.server import serve
    httpd, worker = serve(out, port=0, batch_wait_ms=100.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", worker
    httpd.shutdown()
    worker.stop()


def _png_bytes(rng, h=48, w=200):
    arr = (rng.random((h, w)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _post(url, data):
    req = urllib.request.Request(url + "/transcribe", data=data,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_healthz(server):
    url, _ = server
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        meta = json.loads(r.read())
    assert meta["status"] == "ok"
    assert meta["widths"] == [128] and meta["batch_size"] == 4


def test_transcribe_and_microbatching(server):
    url, worker = server
    rng = np.random.default_rng(0)
    # Warm the compiled program so the concurrent burst lands inside one
    # batch-wait window.
    first = _post(url, _png_bytes(rng))
    assert set(first) == {"text", "width_bucket"}
    assert first["width_bucket"] == 128

    batches_before = worker.batches
    results = [None] * 4
    def go(i, data):
        results[i] = _post(url, data)
    threads = [threading.Thread(target=go, args=(i, _png_bytes(rng)))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    charset = set("abcde")
    assert all(set(r["text"]) <= charset for r in results)
    # 4 concurrent requests with a 100 ms collection window must need at
    # most 2 program calls (vs 4 if unbatched).
    assert worker.batches - batches_before <= 2


def test_bad_image_is_400(server):
    url, _ = server
    req = urllib.request.Request(url + "/transcribe", data=b"not an image",
                                 method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
