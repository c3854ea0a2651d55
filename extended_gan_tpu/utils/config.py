"""Experiment configuration.

The reference drives experiments with exec'd ``config.py`` files holding
UPPER_CASE variables that are lowercased into ``train(**kwargs)``
(convolutional_gat/generate_experiment.py:16-46), sometimes holding live
torch objects. We keep the experiment-dir convention (a directory with a
``config.py`` plus committed ``history.json`` / ``pred_*.png`` artifacts) but
make configs declarative: plain Python literals only, validated into
:class:`ExperimentConfig`. Optimizers/criteria are named by string and
resolved by the trainer, so configs are hardware- and framework-agnostic.
"""

from __future__ import annotations

import ast
import dataclasses
import json
import os
from typing import Any


@dataclasses.dataclass
class ExperimentConfig:
    """Everything convolutional_gat's train() accepts (train.py:158-177),
    plus TPU-specific knobs (precision, mesh axes)."""

    model_type: str = "temporal"
    mapping_type: str = "linear"
    dataset: str = "kmni"
    preprocessed_folder: str = ""
    output_path: str = ""
    epochs: int = 10
    train_batch_size: int = 32
    test_batch_size: int = 64
    learning_rate: float = 1e-3
    lr_step: int = 1
    gamma: float = 0.95
    plot: bool = False
    criterion: str = "mse"
    optimizer: str = "adam"
    weight_decay: float = 0.01
    downsample_size: tuple[int, int] = (256, 256)
    test_first: bool = False
    reduce_lr_on_plateau: bool = False
    # --- TPU-native additions (absent from the reference) -----------------
    precision: str = "f32"  # "f32" | "bf16"
    data_axis: int | None = None  # devices on the data-parallel mesh axis
    model_axis: int = 1  # devices on the model-parallel mesh axis
    seed: int = 369
    resume: bool = False  # restore full train state from checkpoints/
    checkpoint_every: int = 0  # Orbax full-state snapshot cadence (epochs)
    remat: bool = False  # rematerialize forward in backward (saves HBM)
    shuffle_mode: str = "batch"  # "batch" (reference) | "global" mixing
    megastep: int = 0  # K>1: K train steps fused into one XLA program
    spatial: bool = False  # SP: stripe the frame axis over model_axis
    fsdp: bool = False  # ZeRO: shard params + moments over the data axis
    fsdp_min_size: int = 4096  # smaller leaves stay replicated
    moe_experts: int = 0  # E>0: Switch-MoE bottleneck (unet families);
    # expert weights shard over the data axis when it divides E (EP)
    moe_aux_weight: float = 0.01  # load-balance aux-loss weight
    pipeline_stages: int = 0  # S>1: GPipe PP over the model axis
    # (stacked GAT families); each device holds 1/S of the params
    pp_microbatches: int = 0  # microbatches per PP step (0 = 2*S)
    resident: bool = False  # device-resident dataset: archive in HBM,
    # on-device window gathers (requires megastep; kmni-family datasets)
    # fused Pallas kernels (GAT attention, SmaAt-UNet DSC);
    # None = auto (ON on TPU, OFF elsewhere)
    use_pallas: bool | None = None

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)


_TUPLE_FIELDS = {"downsample_size"}


def _literal_env(path: str) -> dict[str, Any]:
    """Evaluate UPPER_CASE assignments in a config.py as literals only.

    This replaces the reference's ``exec(open(...).read())``
    (generate_experiment.py:16) — no arbitrary code runs, only
    ``NAME = <literal>`` assignments are honoured. Non-literal lines (e.g.
    a stray import) are skipped with a warning instead of crashing, which
    also tolerates reference-era configs that held live torch objects.
    """
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    out: dict[str, Any] = {}
    for node in tree.body:
        # NAME = <literal> and the annotated form NAME: int = <literal>
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            target, value = node.targets[0], node.value
        elif isinstance(node, ast.AnnAssign) and node.value is not None:
            target, value = node.target, node.value
        else:
            continue
        if isinstance(target, ast.Name) and target.id.isupper():
            try:
                out[target.id] = ast.literal_eval(value)
            except ValueError:
                # Named constants like OPTIMIZER = torch.optim.Adam or
                # MODEL = BaselineModel in legacy configs: keep the
                # (dotted) name's last part.
                if isinstance(value, ast.Name):
                    out[target.id] = value.id
                elif isinstance(value, ast.Attribute):
                    out[target.id] = value.attr.lower()
                elif isinstance(value, ast.Call):
                    fn = value.func
                    name = fn.attr if isinstance(fn, ast.Attribute) else getattr(fn, "id", "")
                    out[target.id] = name.replace("Loss", "").lower()
                else:
                    # a dropped UPPER key silently falling back to the
                    # dataclass default is exactly what a user won't notice
                    print(f"[config] could not parse {target.id} in "
                          f"{path}; using the default")
    return out


# Legacy ``MODEL = <class>`` configs predate MODEL_TYPE (e.g. the
# reference's final_1d_gat/config.py:5 ``MODEL = BaselineModel`` and
# experiment_local/config.py:5 ``MODEL = TemporalModel``). Map the class
# name onto the registry key for the same architecture.
_LEGACY_MODEL_CLASSES = {
    "baselinemodel": "baseline",
    "baselinemodel2d": "baseline2d",
    "temporalmodel": "temporal_1block",
    "spatialmodel": "spatial_1block",
    "multistreammodel": "multi_stream_2block",
    "unetmodel": "unet",
    "model": "temporal",  # GAT3D.GATMultistream.Model (attention via type)
}


def load_experiment_config(exp_dir: str) -> ExperimentConfig:
    """Load ``<exp_dir>/config.py`` into an ExperimentConfig."""
    variables = _literal_env(os.path.join(exp_dir, "config.py"))
    kwargs = {k.lower(): v for k, v in variables.items()}
    known = {f.name for f in dataclasses.fields(ExperimentConfig)}
    legacy_model = kwargs.pop("model", None)
    if legacy_model is not None and "model_type" not in kwargs:
        mapped = _LEGACY_MODEL_CLASSES.get(str(legacy_model).lower())
        if mapped is None:
            print(f"[config] unknown legacy MODEL {legacy_model!r}; "
                  f"using the model_type default")
        else:
            kwargs["model_type"] = mapped
    for name_field in ("optimizer", "criterion"):
        if isinstance(kwargs.get(name_field), str):
            kwargs[name_field] = kwargs[name_field].lower()
    extra = {k: v for k, v in kwargs.items() if k not in known}
    kwargs = {k: v for k, v in kwargs.items() if k in known}
    for f in _TUPLE_FIELDS:
        if f in kwargs and isinstance(kwargs[f], list):
            kwargs[f] = tuple(kwargs[f])
    cfg = ExperimentConfig(**kwargs)
    cfg.output_path = exp_dir
    if extra:
        print(f"[config] ignoring unknown keys: {sorted(extra)}")
    return cfg


def dump_config(cfg: ExperimentConfig):
    print(
        json.dumps(
            {k.upper(): v for k, v in cfg.to_dict().items()},
            indent=4,
            default=str,
        )
    )
