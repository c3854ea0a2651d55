"""The bench's derived V100 baselines stay honest (round-2 VERDICT 1a/1b).

BASELINE_DERIVATION.json is a committed artifact; these tests keep it from
rotting: structural invariants + the pinned fallbacks in bench.py match it,
and (slow tier) the FLOPs and kernel-op census re-derive to the pinned
values on this host.
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def derivation():
    with open(os.path.join(REPO, "BASELINE_DERIVATION.json")) as f:
        return json.load(f)


def test_derivation_structure(derivation):
    for w in ("dcgan", "conv_gat"):
        d = derivation[w]
        assert d["kernel_ops_per_step"] > 100  # eager torch, many launches
        assert d["flops_per_step"] > 1e9
        scen = d["v100_model"]
        cons, cent, gen = (scen[s]["steps_per_sec"] for s in
                           ("conservative", "central", "generous"))
        # the scenarios must be ordered: generous V100 is the fastest
        assert cons < cent < gen, (w, cons, cent, gen)


def test_bench_fallbacks_match_derivation(derivation):
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.pop(0)
    for w in ("dcgan", "conv_gat"):
        pinned = bench.FALLBACK[w]
        d = derivation[w]
        assert abs(pinned["central_sps"]
                   - d["v100_model"]["central"]["steps_per_sec"]) \
            / pinned["central_sps"] < 0.01
        assert abs(pinned["generous_sps"]
                   - d["v100_model"]["generous"]["steps_per_sec"]) \
            / pinned["generous_sps"] < 0.01
        assert abs(pinned["flops_per_step_b32"] - d["flops_per_step"]) \
            / pinned["flops_per_step_b32"] < 0.01


@pytest.mark.slow
def test_flops_rederive(derivation):
    """XLA cost analysis of the fused steps reproduces the pinned FLOPs.

    Guards the MFU numbers: if a model/trainer change moves the per-step
    FLOPs by >5%, the pinned derivation (and bench MFU) must be refreshed
    (python scripts/derive_v100_baseline.py --write)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from flops_count import derive_costs
    finally:
        sys.path.pop(0)
    costs = derive_costs()
    for w in ("dcgan", "conv_gat"):
        pinned = derivation[w]["flops_per_step"]
        got = costs[w]["flops"]
        assert abs(got - pinned) / pinned < 0.05, (w, got, pinned)


@pytest.mark.slow
def test_kernel_census_rederive(derivation):
    """The torch-profiler leaf-op census reproduces the pinned counts
    (±10%: torch minor versions may re-split composites)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import derive_v100_baseline as dv
    finally:
        sys.path.pop(0)
    for w, make in (("dcgan", dv._dcgan_step), ("conv_gat", dv._gat_step)):
        census = dv._count_kernel_ops(make())
        pinned = derivation[w]["kernel_ops_per_step"]
        got = census["n_kernel_ops"]
        assert abs(got - pinned) / pinned < 0.10, (w, got, pinned)
