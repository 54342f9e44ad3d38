#!/bin/bash
# Round-3 TPU queue, stage 3 (after run/round3_queue2.sh):
#   8. bundle-vs-live serving tax benchmark (tools/bench_bundle.py)
#   9. deployment chain on the trained conformer checkpoint:
#      export (int8) -> HTTP server -> concurrent curl smoke
set -x
cd /root/repo
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "stage-2 queue (pid $WAIT_PID) done"
  sleep 10
fi

echo "=== 8 bundle serving tax ==="
timeout 3600 python tools/bench_bundle.py 2>&1 | tee /tmp/bench_bundle.log

echo "=== 9a export conformer bundle (int8) ==="
timeout 3600 python -m htr_vt_tpu.cli.export SYNTH \
    --encoder conformer --sgm-enable \
    --synth-alphabet "abcdefghijklmnopqrstuvwxyz '" \
    --synth-train-size 4096 --synth-eval-size 512 \
    --checkpoint output/conformer_long/best_CER \
    --out output/conformer_long/bundle --batch-size 64 \
    --quant int8 --platforms tpu --verify 2>&1 | tee /tmp/export_conformer.log

echo "=== 9b HTTP server smoke over the bundle ==="
timeout 1200 python - <<'EOF' 2>&1 | tee /tmp/server_smoke.log
import io, json, threading, time, urllib.request
import numpy as np
from PIL import Image
from htr_vt_tpu.cli.server import serve
from htr_vt_tpu.data.synthetic import render_line, random_text

httpd, worker = serve("output/conformer_long/bundle", port=0,
                      batch_wait_ms=50.0)
threading.Thread(target=httpd.serve_forever, daemon=True).start()
url = f"http://127.0.0.1:{httpd.server_address[1]}"
rng = np.random.default_rng(0)

def post(data):
    req = urllib.request.Request(url + "/transcribe", data=data, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())

def png(text):
    buf = io.BytesIO()
    Image.fromarray(render_line(text, 64, 512)).save(buf, format="PNG")
    return buf.getvalue()

texts = [random_text(rng, "abcdefghijklmnopqrstuvwxyz '", 8, 24)
         for _ in range(32)]
print("warmup:", post(png(texts[0])))
t0 = time.time(); results = [None] * len(texts)
def go(i):
    results[i] = post(png(texts[i]))
th = [threading.Thread(target=go, args=(i,)) for i in range(len(texts))]
[t.start() for t in th]; [t.join() for t in th]
dt = time.time() - t0
ok = sum(r["text"] == t for r, t in zip(results, texts))
with urllib.request.urlopen(url + "/healthz", timeout=60) as r:
    print("healthz:", r.read().decode())
print(f"32 concurrent requests in {dt:.2f}s; exact-match {ok}/32")
for r, t in list(zip(results, texts))[:5]:
    print(repr(t), "->", repr(r["text"]))
httpd.shutdown(); worker.stop()
EOF

echo "=== STAGE3 ALL DONE ==="
