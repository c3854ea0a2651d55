"""dcgan eval-path A/B: streaming test() loop vs device-resident eval.

Completes the round-5 eval-path trio (conv-GAT 19.6x, CycleGAN 87x —
BENCH_NOTES "Round-5 headline capture"). The dcgan driver's resident
eval (`data/resident.py::make_dcgan_resident_eval`) scans K
on-device-gathered batches per XLA program and fetches one summed log
vector per program, vs a host->device copy + three metric fetches per
batch on the streaming path.

Run (real chip, nothing else on the relay):
    python scripts/probe_resident_eval_dcgan.py [batch] [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch: int = 32, K: int = 8):
    from extended_gan_tpu.data.resident import (
        ResidentVideos,
        make_dcgan_resident_eval,
        resident_dcgan_test,
    )
    from extended_gan_tpu.data.streaming import H5SequenceLoader
    from extended_gan_tpu.data.synthetic import ensure_synthetic_h5
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.dcgan_driver import DEFAULT_PARAMS, build_dcgan
    from extended_gan_tpu.train.dcgan_trainer import (
        make_dcgan_eval_step,
        test as dcgan_test,
    )

    mesh = MeshContext.create(data=1, model=1)
    models, _txs, states, _ = build_dcgan(dict(DEFAULT_PARAMS), seed=0)
    states = mesh.put_replicated(states)
    folder = ensure_synthetic_h5(None, frames_train=1600, frames_test=200,
                                 h=64, w=64)
    store = ResidentVideos.from_h5(folder + "/train", mesh, crop=64)
    n_batches = sum(
        (len(fs) + batch - 1) // batch for fs in store.file_starts)

    eval_k = make_dcgan_resident_eval(*models)
    resident_dcgan_test(eval_k, states, store, k=K,
                        batch_size=batch)  # warm the compile
    t0 = time.perf_counter()
    res = resident_dcgan_test(eval_k, states, store, k=K, batch_size=batch)
    res_bps = n_batches / (time.perf_counter() - t0)

    eval_step = make_dcgan_eval_step(*models)
    loader = H5SequenceLoader(folder + "/train", batch, crop=64,
                              shuffle=False)
    dcgan_test(loader, states, eval_step, mesh, batch, epoch=0,
               img_path=None)  # warm
    loader = H5SequenceLoader(folder + "/train", batch, crop=64,
                              shuffle=False)
    t0 = time.perf_counter()
    ref = dcgan_test(loader, states, eval_step, mesh, batch, epoch=0,
                     img_path=None)
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
