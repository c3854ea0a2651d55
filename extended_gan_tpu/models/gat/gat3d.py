"""GAT3D — spatiotemporal graph attention over video-frame grids.

The reference imports ``GAT3D.GATMultistream.Model`` and
``GAT3D.GATMultiHead3D`` but the GAT3D/ subpackage is MISSING from its tree
(SURVEY.md section 2.6 reconstructs the contract from call sites:
convolutional_gat/train.py:199-205, convolutional_gat/model.py:21-31,
convolutional_gat/utils.py:13-18). This module is a from-scratch design
honouring that contract:

- ``GATMultiHead3D(nfeat, nhid, alpha, nheads, type_, mapping_type,
  image_height, image_width, n_vertices)`` maps (B, H, W, T, V) ->
  (B, H, W, T, V),
- ``type_`` in {"temporal", "spatial", "multi_stream"} picks the graph:
  time steps, vertices (cities), or both streams averaged,
- ``mapping_type`` in {"linear", "conv", "smaat_unet"} picks the per-node
  feature map applied before attention,
- ``Model(image_width, image_height, n_vertices, attention_type,
  mapping_type)`` = 3-head hidden block -> 1-head output block -> sigmoid,
  exposing ``.mapping_type`` (printed by train.py:208).

Design notes (ours, not recoverable from the reference): attention scores
use the additive-GAT form e_ij = leaky_relu(f_i . a1 + f_j . a2) on
spatially-pooled descriptors, composed with the same learnable-adjacency
normalization as baseline_model.py:44-50; the conv mapping is a
3x3 -> 1x1 -> 3x3 conv bottleneck (hidden width 74) sized so the
temporal/conv Model at the reference geometry (20x20, T=4, V=6) lands on
the reference's measured 43,936-param footprint EXACTLY
(compare_models/results/results.json): per head the mapping is
2,738 + 5,550 + 2,668 = 10,956 params and the attention adds
a(2V=12) + B(TxT=16) = 28, so 4 heads x 10,984 = 43,936.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (
    adjacency_b_init,
    normalized_adjacency,
    pairwise_scores,
    xavier_gain_1414,
)


class _ConvParams(nn.Module):
    """Registers exactly the params nn.Conv would (same scope path, same
    initializers, same shapes -> bit-identical init values and checkpoint
    interchange) without running the conv — the fused Pallas mapping
    consumes them directly."""

    features: int
    in_features: int
    kernel_size: tuple

    @nn.compact
    def __call__(self):
        shape = tuple(self.kernel_size) + (self.in_features, self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


def _chanfirst_bottleneck(xb, k1, b1, k2, b2, k3, b3):
    """The conv bottleneck in channels-first / positions-on-lanes form.

    Every NHWC-ish layout puts the 4..74-wide channel axis on the TPU's
    128-lane dimension and pays up to 32x padded bytes per buffer — which
    is why the step measures at an inflated HBM roofline
    (BENCH_NOTES round 5). Here activations ride as (N, C, P) with P the
    apron-padded row-flattened POSITION axis on lanes: a 3x3 SAME conv is
    nine shifted lane-slices contracted over C ("ncp,cf->nfp"), with the
    ring/apron positions re-zeroed between the 3x3 layers. Same math as
    nn.Conv (parity-tested); XLA owns fusion/scheduling.
    """
    n, h, w, c = xb.shape
    ph = h + 2
    P = ph * ph
    A = ph + 4  # lane apron >= max shift ph + 1
    hp = jax.lax.Precision.HIGHEST
    shifts = [dy * ph + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    grid = jnp.zeros((ph, ph), jnp.float32).at[1:h + 1, 1:w + 1].set(1.0)
    mask = jnp.pad(grid.reshape(-1), (A, A))[None, None, :]

    def conv3x3(z, kern, bias):
        k9 = kern.reshape(9, kern.shape[2], kern.shape[3])
        acc = 0.0
        for i, k in enumerate(shifts):
            acc = acc + jnp.einsum("ncp,cf->nfp", z[:, :, A + k:A + k + P],
                                   k9[i], precision=hp)
        return acc + bias[None, :, None]

    xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)))
    yc = jnp.pad(xp.reshape(n, P, c).transpose(0, 2, 1),
                 ((0, 0), (0, 0), (A, A)))
    h1 = jnp.maximum(conv3x3(yc, k1, b1), 0.0)
    h2 = jnp.maximum(
        jnp.einsum("ncp,cf->nfp", h1, k2[0, 0], precision=hp)
        + b2[None, :, None], 0.0)
    h2 = jnp.pad(h2, ((0, 0), (0, 0), (A, A))) * mask
    out = conv3x3(h2, k3, b3)
    out = out.reshape(n, -1, ph, ph)[:, :, 1:h + 1, 1:w + 1]
    return out.transpose(0, 2, 3, 1)  # back to (N, H, W, C_out)


class _Mapping(nn.Module):
    """Per-node feature map on the T (frame-channel) axis.

    Input/output (B, H, W, T, V); vertices fold into the batch so convs see
    one big NHWC batch (MXU-friendly) instead of a per-vertex Python loop.
    """

    nfeat: int
    nhid: int
    mapping_type: str = "linear"
    conv_hidden: int = 74
    use_pallas: bool = False  # NOTE: opt-in and NOT implied by the model-
    # level use_pallas: measured 13x SLOWER than the XLA convs in the full
    # train step (BENCH_NOTES round 5 "fused mapping") — the sequential
    # Pallas grid serializes hundreds of small-matmul cells where XLA's
    # convs already run near the HBM roofline
    conv_impl: str = "nhwc"  # "nhwc" (nn.Conv) | "chanfirst"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        b, h, w, t, v = x.shape
        if self.mapping_type == "linear":
            Wm = self.param("W", xavier_gain_1414, (self.nfeat, self.nhid))
            bias = self.param("b", nn.initializers.zeros, (self.nhid,))
            out = jnp.einsum("bhwtv,to->bhwov", x.astype(self.dtype),
                             Wm.astype(self.dtype))
            return out + bias[None, None, None, :, None]

        # fold V into the batch: (B, H, W, T, V) -> (B*V, H, W, T)
        xb = x.transpose(0, 4, 1, 2, 3).reshape(b * v, h, w, t)
        if self.mapping_type == "conv" and self.use_pallas and h == w:
            # ONE Pallas program for the whole bottleneck: the 74-wide
            # intermediates live in VMEM instead of round-tripping HBM
            # between convs. Params are nn.Conv-identical (_ConvParams),
            # so checkpoints swap freely between the two paths; compute
            # is exact f32 (HIGHEST). Opt-in, measured SLOWER than XLA
            # in the train step so far (see the class-field note).
            from ...ops.pallas.gat_mapping import fused_conv_bottleneck

            k1, b1 = _ConvParams(self.conv_hidden, t, (3, 3),
                                 name="conv1")()
            k2, b2 = _ConvParams(self.conv_hidden, self.conv_hidden,
                                 (1, 1), name="conv2")()
            k3, b3 = _ConvParams(self.nhid, self.conv_hidden, (3, 3),
                                 name="conv3")()
            y = fused_conv_bottleneck(xb.astype(jnp.float32), k1, b1, k2,
                                      b2, k3, b3)
        elif self.mapping_type == "conv" and self.conv_impl == "chanfirst":
            # positions-on-lanes XLA reformulation (same nn.Conv params
            # via _ConvParams — checkpoints interchange freely)
            k1, b1 = _ConvParams(self.conv_hidden, t, (3, 3),
                                 name="conv1")()
            k2, b2 = _ConvParams(self.conv_hidden, self.conv_hidden,
                                 (1, 1), name="conv2")()
            k3, b3 = _ConvParams(self.nhid, self.conv_hidden, (3, 3),
                                 name="conv3")()
            y = _chanfirst_bottleneck(xb.astype(jnp.float32), k1, b1, k2,
                                      b2, k3, b3)
        elif self.mapping_type == "conv":
            # 3x3 -> 1x1 -> 3x3 bottleneck; width 74 pins the temporal/conv
            # Model to the reference's 43,936-param measurement exactly.
            y = nn.Conv(self.conv_hidden, (3, 3), padding="SAME",
                        dtype=self.dtype, name="conv1")(xb)
            y = nn.relu(y)
            y = nn.Conv(self.conv_hidden, (1, 1), padding="SAME",
                        dtype=self.dtype, name="conv2")(y)
            y = nn.relu(y)
            y = nn.Conv(self.nhid, (3, 3), padding="SAME",
                        dtype=self.dtype, name="conv3")(y)
        elif self.mapping_type == "smaat_unet":
            from ..smaat_unet import SmaAt_UNet

            y = SmaAt_UNet(
                n_channels=self.nfeat, n_classes=self.nhid,
                kernels_per_layer=1, base=16, dtype=self.dtype, name="unet",
            )(xb, train=train)
        else:
            raise ValueError(f"unknown mapping_type {self.mapping_type!r}")
        return y.reshape(b, v, h, w, self.nhid).transpose(0, 2, 3, 4, 1)


class GAT3DHead(nn.Module):
    """One attention head: mapping -> graph attention over the chosen axis
    -> adjacency-normalized mixing -> ELU."""

    nfeat: int
    nhid: int
    n_vertices: int
    alpha: float = 0.2
    type_: str = "temporal"
    mapping_type: str = "linear"
    use_pallas: bool = False  # fused single-kernel attention (temporal)
    use_pallas_mapping: bool = False  # fused conv bottleneck (see _Mapping)
    conv_impl: str = "nhwc"  # conv-mapping layout (see _Mapping)
    dtype: Any = jnp.float32

    def _attend(self, mapped, axis_name: str):
        """axis_name "temporal": graph over T'; "spatial": graph over V."""
        b, h, w, t, v = mapped.shape
        if axis_name == "temporal":
            m, feat = t, v
            f = jnp.mean(mapped, axis=(1, 2))  # (B, T', V)
        else:
            m, feat = v, t
            f = jnp.mean(mapped, axis=(1, 2)).transpose(0, 2, 1)  # (B, V, T')
        a = self.param(f"a_{axis_name}", xavier_gain_1414, (2 * feat, 1))
        Badj = self.param(f"B_{axis_name}", adjacency_b_init, (m, m))
        if (self.use_pallas and axis_name == "temporal"
                and self.type_ == "temporal"):
            from ...ops.pallas.gat_attention import attend_temporal_pallas

            # the kernel fuses the trailing ELU; flag it to the caller
            return attend_temporal_pallas(
                mapped, a[:, 0], normalized_adjacency(Badj), self.alpha
            ), True
        e = pairwise_scores(f, a[:, 0], self.alpha)  # (B, m, m)
        attention = nn.softmax(e, axis=-1)
        adj_norm = normalized_adjacency(Badj)
        # HIGHEST: XLA's default TPU matmul runs bf16 passes (~1e-2 abs
        # error on O(1) attention values — measured vs an fp64 oracle);
        # these T/V-sized contractions are free at full f32 and the torch
        # reference is exact f32
        hp = jax.lax.Precision.HIGHEST
        attention = jnp.einsum("uv,nvw->nuw", adj_norm, attention,
                               precision=hp)
        if axis_name == "temporal":
            return jnp.einsum("bts,bhwsv->bhwtv", attention, mapped,
                              preferred_element_type=jnp.float32,
                              precision=hp), False
        return jnp.einsum("bvu,bhwtu->bhwtv", attention, mapped,
                          preferred_element_type=jnp.float32,
                          precision=hp), False

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        mapped = _Mapping(
            self.nfeat, self.nhid, self.mapping_type, dtype=self.dtype,
            use_pallas=self.use_pallas_mapping, conv_impl=self.conv_impl,
            name="mapping",
        )(x, train=train).astype(jnp.float32)
        if self.type_ == "temporal":
            out, elu_done = self._attend(mapped, "temporal")
        elif self.type_ == "spatial":
            out, elu_done = self._attend(mapped, "spatial")
        elif self.type_ == "multi_stream":
            # elu applies to the averaged streams; the fused-elu kernel
            # cannot be used here
            t_out, _ = self._attend(mapped, "temporal")
            s_out, _ = self._attend(mapped, "spatial")
            out, elu_done = 0.5 * (t_out + s_out), False
        else:
            raise ValueError(f"unknown type_ {self.type_!r}")
        return out if elu_done else nn.elu(out)


class GATMultiHead3D(nn.Module):
    """Head-averaged GAT3D block: (B, H, W, T, V) -> (B, H, W, T', V).

    Heads are averaged (not concatenated) so stacked blocks keep
    nfeat == time_steps, matching how the reference wrappers chain them
    (convolutional_gat/model.py:62-83 feeds a 3-head block into a block
    constructed with nfeat=time_steps).
    """

    nfeat: int
    nhid: int
    alpha: float = 0.2
    nheads: int = 1
    type_: str = "temporal"
    mapping_type: str = "linear"
    image_height: int = 0   # accepted for contract parity; shapes are
    image_width: int = 0    # inferred from inputs at trace time
    n_vertices: int = 0
    use_pallas: bool = False
    use_pallas_mapping: bool = False
    conv_impl: str = "nhwc"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        common = dict(
            nfeat=self.nfeat, nhid=self.nhid,
            n_vertices=self.n_vertices or x.shape[-1],
            alpha=self.alpha, type_=self.type_,
            mapping_type=self.mapping_type, use_pallas=self.use_pallas,
            use_pallas_mapping=self.use_pallas_mapping,
            conv_impl=self.conv_impl,
            dtype=self.dtype,
        )
        if self.mapping_type == "smaat_unet":
            # the smaat mapping holds BatchNorm, whose train flag lifted
            # vmap cannot thread — unroll this (rare) configuration
            outs = [
                GAT3DHead(name=f"head_{i}", **common)(x, train=train)
                for i in range(self.nheads)
            ]
            return sum(outs) / float(self.nheads)
        # Heads run as ONE vmapped program (params stacked on a leading
        # head axis) rather than nheads unrolled copies of the graph —
        # same math, ~nheads-times smaller HLO and compile time. The
        # linear/conv mappings are train-agnostic, so dropping the kwarg
        # is sound.
        VHead = nn.vmap(
            GAT3DHead,
            in_axes=None,
            out_axes=0,
            axis_size=self.nheads,
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )
        outs = VHead(name="heads", **common)(x)
        return jnp.mean(outs, axis=0)


class Model(nn.Module):
    """GAT3D.GATMultistream.Model reconstruction: 3-head hidden block ->
    1-head output block -> sigmoid (rain intensities live in [0, 1])."""

    image_width: int
    image_height: int
    n_vertices: int
    attention_type: str = "temporal"
    mapping_type: str = "linear"
    time_steps: int = 4
    use_pallas: bool = False
    use_pallas_mapping: bool = False
    conv_impl: str = "nhwc"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        common = dict(
            nfeat=self.time_steps, nhid=self.time_steps, alpha=0.2,
            type_=self.attention_type, mapping_type=self.mapping_type,
            image_height=self.image_height, image_width=self.image_width,
            n_vertices=self.n_vertices, use_pallas=self.use_pallas,
            use_pallas_mapping=self.use_pallas_mapping,
            conv_impl=self.conv_impl,
            dtype=self.dtype,
        )
        x = GATMultiHead3D(nheads=3, name="hidden_layer", **common)(
            x, train=train)
        x = GATMultiHead3D(nheads=1, name="output_layer", **common)(
            x, train=train)
        return nn.sigmoid(x.astype(jnp.float32))
