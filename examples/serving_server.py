"""A minimal production-style serving loop: a warm-start bundle behind a
stdlib HTTP endpoint.

The server process loads a :func:`save_bundle` artifact (zero tracing,
zero XLA compiles — ~1 s to ready at flagship scale, docs/PERF.md), draws
or receives a parameter store, and answers ``POST /loglik`` requests
carrying a raw int32 batch with the per-sample log-likelihoods. Requests
are serialized through a lock: one program, one device, maximum batch
throughput (pad ragged traffic client-side or with ``pad_batch_to``).

This demo runs the server in a thread and fires a client request at it.

Run: python examples/serving_server.py   (SIDE/UNITS/BATCH env knobs)
"""

import json
import os
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.request import Request, urlopen

import numpy as np


def main() -> None:
    import jax

    from cirkit_tpu.backend.jax import load_bundle, save_bundle
    from cirkit_tpu.models import image_data
    from cirkit_tpu.pipeline import PipelineContext

    units = int(os.environ.get("UNITS", "8"))
    side = int(os.environ.get("SIDE", "8"))
    batch = int(os.environ.get("BATCH", "32"))
    num_vars = side * side

    # ---- offline: build once, persist the bundle --------------------------
    sc = image_data(
        (1, side, side), "quad-graph", input_layer="categorical",
        num_input_units=units, sum_product_layer="tucker", num_sum_units=units,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    cc = ctx.compile(sc)
    bundle_path = os.path.join(tempfile.mkdtemp(prefix="serving_"), "bundle")
    save_bundle(bundle_path, cc, store=dict(ctx.parameters), batch=batch)

    # ---- server: warm load + lock-serialized device calls ------------------
    t0 = time.time()
    bundle = load_bundle(bundle_path)
    store = bundle.init(0)
    lock = threading.Lock()
    print(f"server warm-ready in {time.time() - t0:.2f} s")

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/loglik":
                self.send_error(404)
                return
            n = int(self.headers["Content-Length"])
            x = np.frombuffer(self.rfile.read(n), np.int32).reshape(batch, num_vars)
            with lock:
                out = np.asarray(bundle.evaluate(store, jax.device_put(x)))
            body = json.dumps({"loglik": out.reshape(batch).tolist()}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet the demo
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    # ---- client ------------------------------------------------------------
    x = np.random.default_rng(0).integers(0, 256, (batch, num_vars)).astype(np.int32)
    t0 = time.time()
    with urlopen(
        Request(f"http://127.0.0.1:{port}/loglik", data=x.tobytes(),
                method="POST"), timeout=120,
    ) as resp:
        lls = json.loads(resp.read())["loglik"]
    print(
        f"served batch of {batch} in {(time.time() - t0) * 1e3:.1f} ms; "
        f"mean LL {np.mean(lls):.2f}"
    )
    # correctness against the in-process circuit
    direct = np.asarray(cc.evaluate(store, x)).reshape(batch)
    assert np.allclose(lls, direct, rtol=1e-5), "server output != direct evaluate"
    print("server output matches direct evaluation")
    server.shutdown()


if __name__ == "__main__":
    main()
