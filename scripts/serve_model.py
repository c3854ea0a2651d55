"""Serve an exported StableHLO artifact over HTTP.

Usage:
  python scripts/export_model.py <experiment_dir> --out /tmp/model.stablehlo
  python scripts/serve_model.py /tmp/model.stablehlo --port 8000

Then:
  curl -s localhost:8000/healthz
  # POST a np.save()'d batch, get back the prediction batch as .npy bytes:
  python - <<'EOF'
  import io, urllib.request, numpy as np
  x = np.random.rand(5, 16, 16, 4, 6).astype(np.float32)
  buf = io.BytesIO(); np.save(buf, x)
  r = urllib.request.urlopen(
      urllib.request.Request("http://localhost:8000/predict",
                             data=buf.getvalue(), method="POST"))
  print(np.load(io.BytesIO(r.read())).shape)
  EOF
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("artifact")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--no-bucket", action="store_true",
                        help="disable pad-to-power-of-two request batching "
                             "(each distinct batch size then compiles its "
                             "own executable)")
    args = parser.parse_args(argv)

    from extended_gan_tpu.serve import serve_forever

    serve_forever(
        args.artifact, host=args.host, port=args.port,
        bucket_batches=not args.no_bucket,
    )


if __name__ == "__main__":
    main()
