"""bf16-vs-f32 per-epoch MSE parity check (ROADMAP perf item).

Trains the conv-GAT (temporal/conv) and DCGAN workloads twice from the
same seed/data — once f32, once bf16 compute — and reports the per-epoch
relative val-MSE gap against the 1% parity budget BASELINE.md assigns to
the f32 path. Decides whether bf16 can be a default rather than opt-in.

Run: python scripts/bench_bf16_parity.py [epochs]
"""

import json
import sys
import tempfile

sys.path.insert(0, ".")


def gat_curve(precision: str, epochs: int, data_dir: str):
    from extended_gan_tpu.train.gat_driver import train

    with tempfile.TemporaryDirectory() as td:
        _, history = train(
            model_type="temporal", mapping_type="conv", optimizer="adam",
            output_path=td, train_batch_size=32, test_batch_size=32,
            epochs=epochs, learning_rate=1e-3, lr_step=1, gamma=0.95,
            downsample_size=(20, 20), preprocessed_folder=data_dir,
            dataset="kmni", precision=precision, seed=369, plot=False,
        )
    return history["val_loss"]


def dcgan_curve(precision: str, epochs: int):
    from extended_gan_tpu.train.dcgan_driver import train

    with tempfile.TemporaryDirectory() as td:
        _, history = train(
            epochs=epochs, train_batch_size=32, test_batch_size=32,
            synthetic=True, out_dir=td, seed=369, precision=precision,
            params={"save_epoch": 0},
        )
    return history.history["pred_mse"]


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from extended_gan_tpu.data.synthetic import make_kmni_dataset

    data_dir = tempfile.mkdtemp(prefix="kmni_bf16_")
    make_kmni_dataset(data_dir, n_train_files=4, n_test_files=2,
                      frames_per_file=64, n_vertices=6, hw=24)

    out = {}
    for name, runner in (
        ("conv_gat", lambda p: gat_curve(p, epochs, data_dir)),
        ("dcgan", lambda p: dcgan_curve(p, epochs)),
    ):
        f32 = runner("f32")
        bf16 = runner("bf16")
        gaps = [abs(a - b) / a for a, b in zip(f32, bf16)]
        out[name] = {
            "f32": [round(v, 7) for v in f32],
            "bf16": [round(v, 7) for v in bf16],
            "rel_gap_per_epoch": [round(g, 5) for g in gaps],
            "max_rel_gap": round(max(gaps), 5),
            "within_1pct": max(gaps) < 0.01,
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
