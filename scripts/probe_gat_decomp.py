"""Component-wise device-time decomposition of the conv-GAT fused step.

Round-3 VERDICT item 5: the headline conv-GAT device step is ~2.2 ms
(BENCH_r03 device_decomposition) and nothing explained where it goes —
bf16 gains only ~21% where MXU-bound work gains ~4x, so the step is
suspected latency/bandwidth-bound. This probe produces the per-component
cost table:

  full       — the exact headline program (make_gat_megastep, K-fit)
  fwd        — model forward only (4 heads: 3 vmapped hidden + 1 output)
  fwdbwd     — grad(mse) through the model (fwd + bwd, no optimizer)
  map_hidden — the hidden block's 3 vmapped conv mappings, forward
  map_out    — the output head's conv mapping, forward
  map_fused  — EXPERIMENT: the 3 hidden mappings re-expressed as grouped
               convs (one conv 4->3*74, then feature_group_count=3 for
               the 1x1 and the closing 3x3) — one big op per layer
               instead of a head-batched conv per layer
  adam       — optimizer update on fixed gradients

attn_fwd ~= fwd - map_hidden - map_out (pool + einsum attention + elu);
bwd ~= fwdbwd - fwd; residual = full - fwdbwd - adam (loss/logs/scan).

Each component runs as its own K-iteration lax.scan program (carry
perturbs the input so XLA cannot collapse the loop), K-fit over
K in {16, 64} to subtract per-program link overhead — the same protocol
as the headline (bench.py::_decompose_k) and probe_dcgan_decomp.py.

Also prints XLA cost-analysis speed-of-light bounds for the compiled
single step: flops / v5e peak and bytes-accessed / v5e HBM bandwidth.
If measured ~= bytes/BW, the step is bandwidth-bound and the table is
the attribution; if map_fused beats map_hidden, the grouped-conv layout
is the optimization to land.

Geometry: the headline's (temporal/conv, 43,936 params, b32, 20x20,
T=4, V=6). Reference pain point this quantifies:
convolutional_gat/model.py runs each head as a separate torch module in
a Python loop; our vmapped heads are one program, but the per-head conv
shapes (C_in=4) underfill the 128-lane MXU either way.

Run: python scripts/probe_gat_decomp.py [f32|bf16]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 197e12
V5E_F32_PEAK = V5E_BF16_PEAK / 4  # no native f32 MXU mode; ~4 passes
V5E_HBM_BW = 819e9


def drain(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(fn, args, n_programs=10, trials=3):
    out = fn(*args)
    drain(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n_programs):
            out = fn(*args)
        drain(out)
        best = min(best, (time.perf_counter() - t0) / n_programs)
    return best


def kfit(make_fn, args, ks=(16, 64)):
    times = {k: timeit(make_fn(k), args) for k in ks}
    dev = (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])
    return dev, times


def scanner(body):
    def make(K):
        @jax.jit
        def run(*args):
            def sbody(carry, _):
                return body(carry, *args), None
            out, _ = jax.lax.scan(sbody, jnp.float32(0.0), None, length=K)
            return out
        return run
    return make


def main():
    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.models.gat.gat3d import _Mapping
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.train.gat_trainer import make_gat_megastep
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state
    import flax.linen as nn

    precision = sys.argv[1] if len(sys.argv) > 1 else "f32"
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    batch, hw, T, V = 32, 20, 4, 6

    model = build_model("temporal", image_width=hw, image_height=hw,
                        n_vertices=V, mapping_type="conv", dtype=dtype,
                        use_pallas=True)
    tx = adam(1e-3, weight_decay=0.01)
    state = create_net_state(model, tx, KeySeq(0).next(),
                             jnp.zeros((2, hw, hw, T, V)))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, hw, hw, T, V), jnp.float32)
    y = jnp.asarray(rng.rand(batch, hw, hw, T, V), jnp.float32)
    key = jax.random.PRNGKey(0)

    # ---- full headline program (megastep K-fit, same as bench.py) -------
    mega = make_gat_megastep(model, tx)

    def time_full(K):
        xs = jnp.broadcast_to(x, (K,) + x.shape)
        ys = jnp.broadcast_to(y, (K,) + y.shape)
        ms = jnp.ones((K, batch), jnp.float32)
        rngs = jax.random.split(key, K)
        st = jax.tree_util.tree_map(jnp.copy, state)
        st, logs = mega(st, xs, ys, ms, rngs)          # warmup/compile
        drain(logs)
        best = float("inf")
        for _ in range(3):
            st2 = jax.tree_util.tree_map(jnp.copy, state)
            t0 = time.perf_counter()
            for _ in range(10):
                st2, logs = mega(st2, xs, ys, ms, rngs)
            drain(logs)
            best = min(best, (time.perf_counter() - t0) / 10)
        return best

    t16, t64 = time_full(16), time_full(64)
    full_dev = (t64 - t16) / 48
    print(f"precision={precision} batch={batch} geometry={hw}x{hw} "
          f"T={T} V={V}")
    print(f"full      : {full_dev*1e3:7.3f} ms/step "
          f"(K16 {t16*1e3:6.1f} ms, K64 {t64*1e3:6.1f} ms)", flush=True)

    # ---- components ------------------------------------------------------
    def fwd(carry, x):
        out = model.apply({"params": state.params}, x + carry * 1e-9,
                          train=True, rngs={"dropout": key})
        return jnp.float32(jnp.mean(out))

    def consume(tree):
        """Scalar depending on EVERY leaf — a single-leaf reduce lets XLA
        dead-code-eliminate the rest of the backward (the first run of
        this probe did exactly that and undercounted bwd ~3x)."""
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(tree))

    def fwdbwd(carry, x, y):
        def loss(p):
            out = model.apply({"params": p}, x + carry * 1e-9,
                              train=True, rngs={"dropout": key})
            return jnp.mean((out - y) ** 2)
        g = jax.grad(loss)(state.params)
        return jnp.float32(consume(g))

    # standalone mappings at the same geometry (fresh params, same shapes)
    map1 = _Mapping(T, T, "conv", dtype=dtype)
    VMap = nn.vmap(_Mapping, in_axes=None, out_axes=0, axis_size=3,
                   variable_axes={"params": 0}, split_rngs={"params": True})
    map3 = VMap(T, T, "conv", dtype=dtype)
    p1 = map1.init(jax.random.PRNGKey(1), x[:2])["params"]
    p3 = map3.init(jax.random.PRNGKey(2), x[:2])["params"]

    def map_out(carry, x):
        return jnp.float32(
            jnp.mean(map1.apply({"params": p1}, x + carry * 1e-9)))

    def map_hidden(carry, x):
        return jnp.float32(
            jnp.mean(map3.apply({"params": p3}, x + carry * 1e-9)))

    # EXPERIMENT: 3 heads as grouped convs — one op per layer
    class FusedMap3(nn.Module):
        nhid: int = T
        hidden: int = 74

        @nn.compact
        def __call__(self, x):
            b, h, w, t, v = x.shape
            xb = x.transpose(0, 4, 1, 2, 3).reshape(b * v, h, w, t)
            y = nn.Conv(3 * self.hidden, (3, 3), padding="SAME",
                        dtype=dtype, name="c1")(xb)
            y = nn.relu(y)
            y = nn.Conv(3 * self.hidden, (1, 1), feature_group_count=3,
                        dtype=dtype, name="c2")(y)
            y = nn.relu(y)
            y = nn.Conv(3 * self.nhid, (3, 3), padding="SAME",
                        feature_group_count=3, dtype=dtype, name="c3")(y)
            y = y.reshape(b, v, h, w, 3, self.nhid)
            return y.transpose(4, 0, 2, 3, 5, 1)  # (3, B, H, W, T', V)

    fmap = FusedMap3()
    pf = fmap.init(jax.random.PRNGKey(3), x[:2])["params"]

    def map_fused(carry, x):
        return jnp.float32(
            jnp.mean(fmap.apply({"params": pf}, x + carry * 1e-9)))

    def map_hidden_bwd(carry, x):
        def loss(p):
            return jnp.mean(
                map3.apply({"params": p}, x + carry * 1e-9) ** 2)
        return jnp.float32(consume(jax.grad(loss)(p3)))

    def map_fused_bwd(carry, x):
        def loss(p):
            return jnp.mean(
                fmap.apply({"params": p}, x + carry * 1e-9) ** 2)
        return jnp.float32(consume(jax.grad(loss)(pf)))

    zg = jax.tree_util.tree_map(jnp.zeros_like, state.params)

    def adam_only(carry, _x):
        bump = jax.tree_util.tree_map(lambda a: a + carry * 1e-12, zg)
        s = state.apply_gradients(tx, bump)
        return jnp.float32(jnp.mean(jax.tree_util.tree_leaves(s.params)[0]))

    comps = [
        ("fwd", fwd, (x,)),
        ("fwdbwd", fwdbwd, (x, y)),
        ("map_hidden", map_hidden, (x,)),
        ("map_out", map_out, (x,)),
        ("map_fused", map_fused, (x,)),
        ("map_hidden_bwd", map_hidden_bwd, (x,)),
        ("map_fused_bwd", map_fused_bwd, (x,)),
        ("adam", adam_only, (x,)),
    ]
    dev = {}
    for name, body, args in comps:
        d, times = kfit(scanner(body), args)
        dev[name] = d
        print(f"{name:10s}: {d*1e3:7.3f} ms/iter "
              f"(K16 {times[16]*1e3:6.1f} ms, K64 {times[64]*1e3:6.1f} ms)",
              flush=True)

    print("\n-- derived attribution --")
    attn = dev["fwd"] - dev["map_hidden"] - dev["map_out"]
    bwd = dev["fwdbwd"] - dev["fwd"]
    resid = full_dev - dev["fwdbwd"] - dev["adam"]
    print(f"mappings fwd (4 heads) : {(dev['map_hidden']+dev['map_out'])*1e3:7.3f} ms")
    print(f"attention+pool+elu fwd : {attn*1e3:7.3f} ms")
    print(f"backward pass          : {bwd*1e3:7.3f} ms")
    print(f"adam update            : {dev['adam']*1e3:7.3f} ms")
    print(f"loss/logs/scan residual: {resid*1e3:7.3f} ms")
    print(f"grouped-conv hidden mapping vs vmapped: "
          f"{dev['map_fused']*1e3:.3f} vs {dev['map_hidden']*1e3:.3f} ms "
          f"({dev['map_hidden']/max(dev['map_fused'],1e-12):.2f}x)")

    # ---- XLA cost analysis speed-of-light --------------------------------
    from extended_gan_tpu.train.gat_trainer import make_gat_train_step
    step = make_gat_train_step(model, tx)
    st = jax.tree_util.tree_map(jnp.copy, state)
    mask = jnp.ones(batch, jnp.float32)
    lowered = jax.jit(lambda s, a, b, m, r: step(s, a, b, m, r)).lower(
        st, x, y, mask, key)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    nbytes = float(ca.get("bytes accessed", 0.0))
    print("\n-- XLA cost analysis (single fused step) --")
    print(f"flops          : {flops/1e9:.2f} GF  -> SoL "
          f"{flops/V5E_BF16_PEAK*1e3:.3f} ms @bf16peak, "
          f"{flops/V5E_F32_PEAK*1e3:.3f} ms @f32peak")
    print(f"bytes accessed : {nbytes/1e6:.1f} MB -> SoL "
          f"{nbytes/V5E_HBM_BW*1e3:.3f} ms @819GB/s")
    print(f"measured full  : {full_dev*1e3:.3f} ms "
          f"({full_dev/(nbytes/V5E_HBM_BW):.2f}x the HBM bound)")


if __name__ == "__main__":
    main()
