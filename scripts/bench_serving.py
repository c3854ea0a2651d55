"""Serving-path latency/throughput micro-bench.

Exports the conv-GAT (temporal/conv, reference geometry) forward to a
StableHLO artifact, stands up the HTTP server in-process, and measures:

- direct artifact call latency (serving_fn, no HTTP) — the device floor,
- HTTP POST /predict end-to-end latency p50/p95 and throughput at a few
  batch sizes (after bucket warm-up).

Over the axon relay the direct numbers are RTT-dominated (~29 ms/call —
BENCH_NOTES round 2); ``--cpu`` forces the CPU backend so the direct rows
become a hardware-independent LOOPBACK artifact-execution latency (pure
Exported.call + XLA:CPU execute, no link in the path) — the number a
skeptic can reproduce anywhere.

Usage: python scripts/bench_serving.py [--batches 1 8 32] [--requests 50]
       python scripts/bench_serving.py --cpu   # loopback artifact latency
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, nargs="*", default=(1, 8, 32))
    parser.add_argument("--requests", type=int, default=50)
    parser.add_argument("--hw", type=int, default=20)
    parser.add_argument("--cpu", action="store_true",
                        help="run on the CPU backend: loopback "
                             "artifact-execution latency, no device link")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import jax.numpy as jnp
    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.serve import (
        export_forward,
        make_server,
        save_exported,
        serving_fn,
    )
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state

    hw = args.hw
    model = build_model(
        "temporal", image_width=hw, image_height=hw, n_vertices=6,
        mapping_type="conv", time_steps=4,
    )
    state = create_net_state(
        model, adam(1e-3), KeySeq(0).next(), jnp.zeros((2, hw, hw, 4, 6))
    )
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    def fwd(x):
        return model.apply(variables, x, train=False)

    import tempfile

    d = tempfile.mkdtemp()
    path = os.path.join(d, "model.stablehlo")
    save_exported(export_forward(fwd, np.zeros((1, hw, hw, 4, 6),
                                               np.float32)), path)

    import jax

    results: dict = {"geometry": f"{hw}x{hw}x4x6",
                     "backend": jax.devices()[0].platform}
    rng = np.random.default_rng(0)

    # ---- direct (no HTTP) floor. Timed to DATA (np.asarray), not to
    # dispatch: block_until_ready does not block through the relay
    # (BENCH_NOTES round 3), and a server answering a request must have
    # the bytes anyway.
    serve = serving_fn(path)
    for b in args.batches:
        x = rng.random((b, hw, hw, 4, 6), dtype=np.float32)
        np.asarray(serve(x))  # compile + drain
        t = []
        for _ in range(args.requests):
            t0 = time.perf_counter()
            np.asarray(serve(x))
            t.append(time.perf_counter() - t0)
        t.sort()
        results[f"direct_b{b}_p50_ms"] = round(t[len(t) // 2] * 1e3, 3)

    # ---- HTTP end-to-end
    server = make_server(path, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        for b in args.batches:
            x = rng.random((b, hw, hw, 4, 6), dtype=np.float32)
            buf = io.BytesIO()
            np.save(buf, x)
            body = buf.getvalue()

            def post():
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/predict", data=body,
                    method="POST")
                with urllib.request.urlopen(req) as r:
                    return np.load(io.BytesIO(r.read()))

            post()  # warm the bucket executable
            lat = []
            t0 = time.perf_counter()
            for _ in range(args.requests):
                s = time.perf_counter()
                post()
                lat.append(time.perf_counter() - s)
            wall = time.perf_counter() - t0
            lat.sort()
            results[f"http_b{b}_p50_ms"] = round(lat[len(lat) // 2] * 1e3, 3)
            results[f"http_b{b}_p95_ms"] = round(
                lat[int(len(lat) * 0.95)] * 1e3, 3)
            results[f"http_b{b}_frames_per_sec"] = round(
                args.requests * b * 4 / wall, 1)
    finally:
        server.shutdown()
        server.server_close()

    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
