"""CycleGAN eval-path A/B: streaming loop vs device-resident eval.

Round-5 continuation of the eval-path decomposition (BENCH_NOTES
"Round-5 headline capture": conv-GAT resident eval measured 19.6x the
streaming loop on this relay-attached chip). The CycleGAN driver gained
the same design (`data/resident.py::make_cyclegan_resident_eval`):
K on-device-gathered eval batches per XLA program, one (2,)-pair fetch
per K batches vs a host->device copy + fetch per batch.

Run (real chip, nothing else on the relay):
    python scripts/probe_resident_eval_cyclegan.py [batch] [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch: int = 32, K: int = 8):
    from extended_gan_tpu.data.resident import (
        ResidentVideos,
        make_cyclegan_resident_eval,
        resident_cyclegan_test,
    )
    from extended_gan_tpu.data.streaming import CoastalSeaLoader
    from extended_gan_tpu.data.synthetic import ensure_synthetic_coastal
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.cyclegan_driver import build_cyclegan
    from extended_gan_tpu.train.cyclegan_trainer import (
        test as cyclegan_test,
    )

    mesh = MeshContext.create(data=1, model=1)
    models, _txs, states, _step, eval_step, _keys = build_cyclegan(
        nc=4, ndf=64, imsize=64, seed=0)
    states = mesh.put_replicated(states)
    folder = ensure_synthetic_coastal(None, n_train_files=4,
                                      frames_per_file=400, h=64, w=64)
    store = ResidentVideos.from_pt_frames(folder + "/train", mesh,
                                          seq_len=4, crop=64)
    n_batches = sum(
        (len(fs) + batch - 1) // batch for fs in store.file_starts)

    eval_k = make_cyclegan_resident_eval(models[0], models[1], seq_len=4)
    resident_cyclegan_test(eval_k, states, store, k=K,
                           batch_size=batch)  # warm the compile
    t0 = time.perf_counter()
    res = resident_cyclegan_test(eval_k, states, store, k=K,
                                 batch_size=batch)
    res_bps = n_batches / (time.perf_counter() - t0)

    def streaming_pass():
        loader = CoastalSeaLoader(folder + "/train", batch, crop=64,
                                  shuffle=False, seq_len=4)
        return cyclegan_test(iter(loader), states, eval_step, mesh, batch,
                             epoch=0, img_path=None)

    streaming_pass()  # warm
    t0 = time.perf_counter()
    ref = streaming_pass()
    str_bps = n_batches / (time.perf_counter() - t0)

    agree = abs(res["pred_mse"] - ref["pred_mse"]) / max(
        ref["pred_mse"], 1e-9)
    print(f"n_batches={n_batches} batch={batch} K={K}")
    print(f"streaming eval: {str_bps:.1f} batches/s")
    print(f"resident  eval: {res_bps:.1f} batches/s "
          f"({res_bps / str_bps:.1f}x)")
    print(f"pred_mse agreement: {agree:.2e} rel "
          f"({res['pred_mse']:.6f} vs {ref['pred_mse']:.6f})")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
