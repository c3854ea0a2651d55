# Common entry points (see README.md for the full quickstart)

.PHONY: test test-fast export-demo serve-demo bench bench-all demo-dcgan demo-cyclegan demo-gat dryrun native

test:
	python -m pytest tests/ -q

# unit/integration tier only (golden/e2e tests are `slow`); measured times
# in docs/TESTING.md. On multi-core boxes add J=auto (pytest-xdist).
J ?=
test-fast:
	python -m pytest tests/ -q -m "not slow" $(if $(J),-n $(J),)

# deterministic file-level sharding for small/CI boxes: run shard I of N
# (1-based), e.g. three sequential slices or three parallel machines:
#   make test-shard N=3 I=1 ; make test-shard N=3 I=2 ; make test-shard N=3 I=3
N ?= 3
I ?= 1
test-shard:
	python scripts/test_shard.py --shards $(N) --index $(I) -- -q -m "not slow"

# the slow/golden tier in bounded slices (~<=10 min each on a 1-core box
# at N=4; docs/TESTING.md has measured times):
#   make test-slow-shard N=4 I=1 ... I=4
test-slow-shard:
	python scripts/test_shard.py --shards $(N) --index $(I) -- -q -m "slow"

bench:
	python bench.py

bench-all:
	python scripts/bench_all.py

# host-loader vs pipeline-fed vs device-resident decomposition (BENCH_NOTES)
bench-pipeline:
	python scripts/bench_pipeline.py

# hardware-independent loopback artifact-execution latency
bench-serving-loopback:
	python scripts/bench_serving.py --cpu

# dcgan step-body ablation K-fits on the chip (FusedProp / minimal chain /
# packed generator) — the same numbers bench.py records each round under
# extras.dcgan_step_body_ablations
probe-ablations:
	python scripts/probe_fused_prop.py f32 32
	python scripts/probe_packed_g.py f32 32
	python scripts/probe_moe.py

# refresh BASELINE_DERIVATION.json (derived V100 denominators for bench.py)
derive-baseline:
	python scripts/derive_v100_baseline.py --write

# retrain demo/final experiments on the synthetic demo archive and refresh
# compare_models/results
regen-demo-artifacts:
	python scripts/regen_demo_artifacts.py

demo-dcgan:
	python -m dcgan --epochs 1 --max-batches 10 --synthetic

demo-cyclegan:
	python -m cycle_gan --epochs 1 --max-batches 10 --synthetic

demo-gat:
	python -m convolutional_gat generate_experiment --exp_folder_name synthetic_smoke

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# deployment: experiment checkpoint -> StableHLO artifact -> HTTP server
export-demo:
	python scripts/export_model.py convolutional_gat/experiments/synthetic_smoke \
	    --out /tmp/model.stablehlo --check

serve-demo: export-demo
	python scripts/serve_model.py /tmp/model.stablehlo --port 8000

native:
	python -c "from extended_gan_tpu.data import native; assert native.available(); print('native core OK')"
